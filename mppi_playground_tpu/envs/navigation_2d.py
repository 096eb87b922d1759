"""2D navigation environment: differential-drive robot among obstacles.

Behavioral reference: ``Navigation2DEnv``
(``/root/reference/src/envs/navigation_2d.py:23-291``): 20x20 m map at
0.1 m cells with 7 random circles (r=1) and 7 random 2x2 rectangles inside
+-7.5 (seed 42), start (-9,-9) facing the goal (9,9); unicycle dynamics,
goal+occupancy cost, per-trajectory collision check, matplotlib render and
gif export.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mppi_playground_tpu.envs import rendering
from mppi_playground_tpu.maps.obstacle_map import ObstacleMap, generate_random_obstacles
from mppi_playground_tpu.models import unicycle
from mppi_playground_tpu.utils.angles import angle_normalize


class Navigation2DEnv:
    GOAL_THRESHOLD = 0.5  # navigation_2d.py:112

    def __init__(self, dtype=jnp.float32, seed: int = 42) -> None:
        self._dtype = dtype
        self._seed = seed

        self._obstacle_map = ObstacleMap(
            map_size=(20, 20), cell_size=0.1, dtype=dtype
        )
        generate_random_obstacles(
            obstacle_map=self._obstacle_map,
            random_x_range=(-7.5, 7.5),
            random_y_range=(-7.5, 7.5),
            num_circle_obs=7,
            radius_range=(1, 1),
            num_rectangle_obs=7,
            width_range=(2, 2),
            height_range=(2, 2),
            max_iteration=1000,
            seed=seed,
        )

        self._start_pos = jnp.asarray([-9.0, -9.0], dtype)
        self._goal_pos = jnp.asarray([9.0, 9.0], dtype)

        # u: [v, omega] (m/s, rad/s) — navigation_2d.py:70-71
        self.u_min = jnp.asarray(unicycle.U_MIN, dtype)
        self.u_max = jnp.asarray(unicycle.U_MAX, dtype)

        self.dynamics = unicycle.make_dynamics(
            x_lim=tuple(self._obstacle_map.x_lim),
            y_lim=tuple(self._obstacle_map.y_lim),
        )
        self.cost_function = unicycle.make_navigation_cost(
            goal=self._goal_pos, obstacle_map=self.obstacle_cost_map
        )
        self._step_fn = jax.jit(
            lambda state, u: self.dynamics(state[None], u[None])[0]
        )

        self._robot_state = self._initial_state()
        self._fig = None
        self._ax = None
        self._rendered_frames = []

    # ------------------------------------------------------------------
    def _initial_state(self) -> jnp.ndarray:
        heading = angle_normalize(
            jnp.arctan2(
                self._goal_pos[1] - self._start_pos[1],
                self._goal_pos[0] - self._start_pos[0],
            )
        )
        return jnp.concatenate([self._start_pos, heading[None]])

    @property
    def goal_pos(self) -> jnp.ndarray:
        """Goal position [2] (navigation_2d.py:53-58)."""
        return self._goal_pos

    @property
    def obstacle_map(self) -> ObstacleMap:
        return self._obstacle_map

    @property
    def obstacle_cost_map(self):
        """Fastest exact query map (see ObstacleMap.cost_map)."""
        return self._obstacle_map.cost_map

    def fused_task(self):
        """Model plug for the fused Pallas solver (core/fused_solver.py)."""
        return unicycle.make_navigation_fused_task(
            self._obstacle_map.row_interval_table,
            goal=tuple(float(v) for v in self._goal_pos.tolist()),
            x_lim=tuple(self._obstacle_map.x_lim),
            y_lim=tuple(self._obstacle_map.y_lim),
        )

    def reset(self) -> jnp.ndarray:
        """Reset robot pose and (lazily) the rendering figure."""
        self._robot_state = self._initial_state()
        self._rendered_frames = []
        if self._fig is not None:  # avoid leaking figures in pyplot's registry
            from matplotlib import pyplot as plt

            plt.close(self._fig)
        self._fig = None
        return self._robot_state

    def step(self, u: jnp.ndarray) -> Tuple[jnp.ndarray, bool]:
        """Single simulation step + goal check (navigation_2d.py:97-117)."""
        u = jnp.clip(u, self.u_min, self.u_max)
        self._robot_state = self._step_fn(self._robot_state, u)
        is_goal_reached = bool(
            jnp.linalg.norm(self._robot_state[:2] - self._goal_pos)
            < self.GOAL_THRESHOLD
        )
        return self._robot_state, is_goal_reached

    def collision_check(self, state: jnp.ndarray) -> jnp.ndarray:
        """Occupancy along trajectories ``[B, T+1, 3]`` (navigation_2d.py:281-291)."""
        return self._obstacle_map.compute_cost(state[:, :, :2])

    # ------------------------------------------------------------------
    def _ensure_figure(self):
        if self._fig is None:
            from matplotlib import pyplot as plt

            self._fig = plt.figure(layout="tight")
            self._ax = self._fig.add_subplot()
            self._ax.set_xlim(self._obstacle_map.x_lim)
            self._ax.set_ylim(self._obstacle_map.y_lim)
            self._ax.set_aspect("equal")

    def render(
        self,
        predicted_trajectory: Optional[jnp.ndarray] = None,
        is_collisions: Optional[jnp.ndarray] = None,
        top_samples: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        mode: str = "human",
    ) -> None:
        """Draw the scene (navigation_2d.py:119-202)."""
        from matplotlib import pyplot as plt

        self._ensure_figure()
        ax = self._ax
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        self._obstacle_map.render(ax, zorder=10)
        ax.scatter(*np.asarray(self._start_pos), marker="o", color="red", zorder=10)
        ax.scatter(*np.asarray(self._goal_pos), marker="o", color="orange", zorder=10)
        state = np.asarray(self._robot_state)
        ax.scatter(state[0], state[1], marker="o", color="green", zorder=100)

        if top_samples is not None:
            rendering.draw_top_samples(ax, top_samples[0], top_samples[1])
        if predicted_trajectory is not None:
            rendering.draw_predicted_trajectory(
                ax, predicted_trajectory[None] if predicted_trajectory.ndim == 2
                else predicted_trajectory,
                is_collisions,
            )

        if mode == "human":
            plt.pause(0.001)
            plt.cla()
        elif mode == "rgb_array":
            self._rendered_frames.append(rendering.fig_to_rgb(self._fig))
            plt.cla()

    def close(self, path: Optional[str] = None) -> None:
        """Save the captured frames as a gif (navigation_2d.py:204-216)."""
        if path is None:
            path = f"video/navigation_2d_{self._seed}.gif"
        rendering.save_gif(self._rendered_frames, path)
