"""Goal-in-danger-zone CMDP environment (gymnasium interface).

Behavioral reference: ``DangerZone`` and ``GoalInDangerZoneEnv``
(``/root/reference/src/envs/goal_in_danger_zone.py:16-309``): a circular
danger zone (radius 10 at the origin), goal sampled inside it, start
sampled outside; 7-dim observation; scalar host ``step`` returning
CMDP-style (reward, cost) and batched ``parallel_step`` / ``parallel_cost``
used as solver dynamics/cost.

gymnasium is optional in this image; the env degrades to a plain class with
the same method surface when it is unavailable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

try:  # pragma: no cover - import plumbing
    import gymnasium as gym
    from gymnasium import spaces

    _GYM_BASE = gym.Env
except Exception:  # pragma: no cover
    gym = None
    spaces = None
    _GYM_BASE = object

from mppi_playground_tpu.envs import rendering
from mppi_playground_tpu.models import danger_zone as dz_model


class DangerZone:
    """Circular danger region (goal_in_danger_zone.py:16-56)."""

    def __init__(self, shape: str = "circle", cfg: Optional[dict] = None):
        cfg = cfg or {}
        if shape != "circle":
            raise ValueError(f"Invalid shape: {shape}")
        self._shape = shape
        self.radius = cfg["radius"]
        self.center = np.asarray(cfg["center"], dtype=float)

    def get_random_inside_point(self, rng=None) -> np.ndarray:
        rng = np.random if rng is None else rng
        angle = rng.uniform(0, 2 * np.pi)
        radius = rng.uniform(0, self.radius)
        return np.array(
            [radius * np.cos(angle), radius * np.sin(angle)]
        ) + self.center

    def get_random_outside_point(self, rng=None) -> np.ndarray:
        rng = np.random if rng is None else rng
        angle = rng.uniform(0, 2 * np.pi)
        radius = rng.uniform(self.radius, 2 * self.radius)
        return np.array(
            [radius * np.cos(angle), radius * np.sin(angle)]
        ) + self.center

    def is_inside(self, pos: np.ndarray) -> bool:
        return bool(np.linalg.norm(pos - self.center) < self.radius)

    def render(self, ax) -> None:
        from matplotlib import pyplot as plt

        ax.set_xlim(-self.radius * 2, self.radius * 2)
        ax.set_ylim(-self.radius * 2, self.radius * 2)
        ax.add_artist(plt.Circle(self.center, self.radius, color="gray", alpha=0.5))


class GoalInDangerZoneEnv(_GYM_BASE):
    """CMDP navigation env (goal_in_danger_zone.py:64-309)."""

    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": 50}

    def __init__(
        self,
        render_mode: str = "human",
        seed: int = 42,
        cfg: Optional[dict] = None,
    ):
        cfg = cfg or {"shape": "circle", "radius": 10.0, "center": [0.0, 0.0]}
        self.render_mode = render_mode
        self._danger_zone = DangerZone(shape=cfg.get("shape", "circle"), cfg=cfg)

        self._v_max, self._omega_max = 1.0, 1.0
        self._v_min, self._omega_min = -1.0, -1.0
        self._dt = 0.1
        self.max_episode_steps = 100

        if spaces is not None:
            self.action_space = spaces.Box(
                low=np.array([self._v_min, self._omega_min]),
                high=np.array([self._v_max, self._omega_max]),
                dtype=np.float32,
            )
            high = np.inf * np.ones(7)
            self.observation_space = spaces.Box(-high, high, dtype=np.float32)

        # batched solver-facing callables (models/danger_zone.py)
        self.parallel_step = dz_model.make_dynamics()
        self._parallel_cost = dz_model.make_cost(radius=self._danger_zone.radius)

        self._fig = None
        self._ax = None
        self._frames = []
        self._is_collision = None
        self._predicted_trajectory = None
        self._top_samples = None
        self._step = 0

    # ------------------------------------------------------------------
    @property
    def danger_zone(self) -> DangerZone:
        """The env's danger region (center/radius/is_inside)."""
        return self._danger_zone

    def parallel_cost(self, obs, action, info) -> jnp.ndarray:
        """Batched CMDP cost (goal_in_danger_zone.py:138-156)."""
        return self._parallel_cost(obs, action, info)

    # ------------------------------------------------------------------
    def _observe(self) -> np.ndarray:
        vec_to_goal = self._goal - self._pos
        vec_to_center = self._danger_zone.center - self._pos
        return np.concatenate(
            [self._pos, [self._angle], vec_to_goal, vec_to_center]
        ).astype(np.float32)

    def reset(
        self, seed: Optional[int] = None, options: Optional[dict] = None
    ) -> Tuple[np.ndarray, dict]:
        # Conscious divergence from the reference: its start/goal draws come
        # from the GLOBAL np.random stream (goal_in_danger_zone.py:30-41,
        # 101-108), so its reset(seed=N) is not reproducible and fails
        # gymnasium's env_checker step-determinism test.  We draw from the
        # env's seeded RNG (self.np_random) per the gymnasium API.
        if _GYM_BASE is not object:
            super().reset(seed=seed)
            rng = self.np_random
        else:  # gymnasium unavailable: reference-style global stream
            rng = np.random
        self._pos = self._danger_zone.get_random_outside_point(rng)
        self._angle = rng.uniform(-np.pi, np.pi)
        self._goal = self._danger_zone.get_random_inside_point(rng)
        self.set_render_info()
        self._step = 0
        return self._observe(), {"cost": 0.0}

    def step(self, action: np.ndarray) -> Tuple[np.ndarray, float, bool, bool, dict]:
        """Scalar CMDP sim step (goal_in_danger_zone.py:158-193)."""
        prev_pos = self._pos.copy()
        v = np.clip(action[0], self._v_min, self._v_max)
        omega = np.clip(action[1], self._omega_min, self._omega_max)

        # host-side scalar sim step: keep this pure numpy (the shared jnp
        # helper would add a device dispatch + sync per step)
        self._angle = float(
            ((self._angle + omega * self._dt + np.pi) % (2 * np.pi)) - np.pi
        )
        self._pos = self._pos + v * self._dt * np.array(
            [np.cos(self._angle), np.sin(self._angle)]
        )

        prev_distance = np.linalg.norm(prev_pos - self._goal)
        distance = np.linalg.norm(self._pos - self._goal)
        is_collided = self._danger_zone.is_inside(self._pos)

        reward = float(prev_distance - distance)
        cost = float(is_collided)
        terminated = False
        truncated = self._step >= self.max_episode_steps
        self._step += 1
        return self._observe(), reward, terminated, truncated, {"cost": cost}

    # ------------------------------------------------------------------
    def set_render_info(
        self,
        is_colllision: Optional[bool] = None,
        predicted_trajectory: Optional[np.ndarray] = None,
        top_samples: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    ) -> None:
        self._is_collision = is_colllision
        self._predicted_trajectory = predicted_trajectory
        self._top_samples = top_samples

    def render(self) -> Optional[np.ndarray]:
        from matplotlib import pyplot as plt

        if self._fig is None:
            self._fig = plt.figure(layout="tight")
            self._ax = self._fig.add_subplot()
            self._ax.set_aspect("equal")
        ax = self._ax

        self._danger_zone.render(ax)
        ax.scatter(self._goal[0], self._goal[1], marker="o", color="orange", zorder=10)
        if self._is_collision is not None:
            color = "red" if self._is_collision else "green"
            ax.scatter(self._pos[0], self._pos[1], marker="o", color=color, zorder=100)
        if self._predicted_trajectory is not None:
            traj = np.asarray(self._predicted_trajectory)
            ax.scatter(traj[:, 0], traj[:, 1], color="darkblue", marker="o", s=3, zorder=2)
        if self._top_samples is not None:
            rendering.draw_top_samples(ax, self._top_samples[0], self._top_samples[1])

        if self.render_mode == "human":
            plt.pause(0.01)
            plt.cla()
        elif self.render_mode == "rgb_array":
            frame = rendering.fig_to_rgb(self._fig)
            plt.cla()
            self._frames.append(frame)
            return frame
        return None

    def close(self, path: Optional[str] = None):
        """Write accumulated rgb_array frames as a gif (like the other envs)
        and release the figure; frames are cleared either way."""
        if self._frames:
            if path is None:  # same default convention as the other envs
                path = "video/goal_in_danger_zone.gif"
            rendering.save_gif(self._frames, path)
        self._frames = []
        if self._fig is not None:
            from matplotlib import pyplot as plt

            plt.close(self._fig)
            self._fig = None
