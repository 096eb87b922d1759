"""Racing environment: kinematic bicycle on a circuit with obstacles.

Behavioral reference: ``RacingEnv``
(``/root/reference/src/envs/racing_env.py:25-384``): 80x80 m maps at 0.1 m
cells; a lane corridor of width ``6.5 * 0.8`` around the circuit centerline
(racing_env.py:59-70); 50 random circle obstacles with r in [0.9, 1.2]
inside +-35 (seed 42, racing_env.py:81-93); start/goal at the path ends;
kinematic-bicycle dynamics with L=1, V_MAX=8; quiver/telemetry rendering.

The reference loads its track from a bundled CSV; ours defaults to the
procedurally generated circuit (``maps/circuit.py``) and accepts any CSV in
the reference schema via ``csv_path=``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mppi_playground_tpu.envs import rendering
from mppi_playground_tpu.maps.circuit import (
    default_circuit_paths,
    make_csv_paths,
    make_side_lane,
)
from mppi_playground_tpu.maps.lane_map import LaneMap
from mppi_playground_tpu.maps.obstacle_map import ObstacleMap, generate_random_obstacles
from mppi_playground_tpu.models import bicycle
from mppi_playground_tpu.utils.angles import angle_normalize


class RacingEnv:
    GOAL_THRESHOLD = 1.0  # racing_env.py:158

    def __init__(
        self,
        dtype=jnp.float32,
        seed: int = 42,
        csv_path: Optional[str] = None,
        circuit_seed: int = 7,
    ) -> None:
        self._dtype = dtype
        self._seed = seed

        # u: [accel, steer] — racing_env.py:37-38
        self.u_min = jnp.asarray(bicycle.U_MIN, dtype)
        self.u_max = jnp.asarray(bicycle.U_MAX, dtype)
        self.L = bicycle.WHEELBASE
        self.V_MAX = bicycle.V_MAX

        # reference path (racing_env.py:44-57)
        self.dl = 0.1
        self.line_width = 6.5
        if csv_path is not None:
            center, _, _ = make_csv_paths(csv_path, DL=self.dl)
        else:
            center, _, _ = default_circuit_paths(DL=self.dl, seed=circuit_seed)
        self.right_lane, self.left_lane = make_side_lane(
            center, lane_width=self.line_width
        )
        self.racing_center_path = jnp.asarray(center, dtype)

        # cost maps (racing_env.py:59-93)
        self.map_size = (80, 80)
        self.cell_size = 0.1
        self._lane_map = LaneMap(
            lane=center,
            lane_width=self.line_width * 0.8,
            map_size=self.map_size,
            cell_size=self.cell_size,
            dtype=dtype,
        )
        self._obstacle_map = ObstacleMap(
            map_size=self.map_size, cell_size=self.cell_size, dtype=dtype
        )
        generate_random_obstacles(
            obstacle_map=self._obstacle_map,
            random_x_range=(-35, 35),
            random_y_range=(-35, 35),
            num_circle_obs=50,
            radius_range=(0.9, 1.2),
            num_rectangle_obs=0,
            width_range=(1.5, 2.0),
            height_range=(1.5, 2.0),
            max_iteration=1000,
            seed=seed,
        )

        self._start_pos = self.racing_center_path[0, :2]
        self._goal_pos = self.racing_center_path[-1, :2]

        self.dynamics = bicycle.make_dynamics(
            x_lim=tuple(self._obstacle_map.x_lim),
            y_lim=tuple(self._obstacle_map.y_lim),
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
        """Start at path[0] heading toward path[1], v=0 (racing_env.py:106-115)."""
        heading = angle_normalize(
            jnp.arctan2(
                self.racing_center_path[1, 1] - self._start_pos[1],
                self.racing_center_path[1, 0] - self._start_pos[0],
            )
        )
        return jnp.concatenate(
            [self._start_pos, heading[None], jnp.zeros(1, self._dtype)]
        )

    @property
    def obstacle_map(self) -> ObstacleMap:
        return self._obstacle_map

    @property
    def lane_map(self) -> LaneMap:
        return self._lane_map

    @property
    def obstacle_cost_map(self):
        """Fastest exact query map (see ObstacleMap.cost_map)."""
        return self._obstacle_map.cost_map

    @property
    def lane_cost_map(self):
        return self._lane_map.cost_map

    def reset(self) -> jnp.ndarray:
        self._robot_state = self._initial_state()
        self._rendered_frames = []
        if self._fig is not None:  # avoid leaking figures in pyplot's registry
            from matplotlib import pyplot as plt

            plt.close(self._fig)
        self._fig = None
        return self._robot_state

    def step(self, u: jnp.ndarray) -> Tuple[jnp.ndarray, bool]:
        """Single sim step + goal check (racing_env.py:142-163)."""
        u = jnp.clip(u, self.u_min, self.u_max)
        self._robot_state = self._step_fn(self._robot_state, u)
        is_goal_reached = bool(
            jnp.linalg.norm(self._robot_state[:2] - self._goal_pos)
            < self.GOAL_THRESHOLD
        )
        return self._robot_state, is_goal_reached

    def collision_check(self, state: jnp.ndarray) -> jnp.ndarray:
        """Occupancy along trajectories ``[B, T+1, 4]`` (racing_env.py:374-384)."""
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
        action: Optional[jnp.ndarray] = None,
        predicted_trajectory: Optional[jnp.ndarray] = None,
        is_collisions: Optional[jnp.ndarray] = None,
        top_samples: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        reference_trajectory: Optional[jnp.ndarray] = None,
        mode: str = "human",
    ) -> None:
        """Scene + telemetry rendering (racing_env.py:165-311)."""
        from matplotlib import pyplot as plt

        self._ensure_figure()
        ax = self._ax
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        self._obstacle_map.render(ax, zorder=10)

        center = np.asarray(self.racing_center_path)
        ax.plot(center[:, 0], center[:, 1], color="gray", linestyle="--", zorder=5)
        ax.plot(
            self.right_lane[:, 0], self.right_lane[:, 1],
            color="green", linestyle="--", zorder=5,
        )
        ax.plot(
            self.left_lane[:, 0], self.left_lane[:, 1],
            color="green", linestyle="--", zorder=5,
        )

        if reference_trajectory is not None:
            ref = np.asarray(reference_trajectory)
            ax.plot(ref[:, 0], ref[:, 1], color="red", linestyle="dotted", zorder=5)

        state = np.asarray(self._robot_state)
        robot_x, robot_y, robot_theta, robot_v = state
        ax.scatter(robot_x, robot_y, marker="o", color="green", zorder=100)
        ax.quiver(
            robot_x, robot_y,
            robot_v * np.cos(robot_theta), robot_v * np.sin(robot_theta),
            color="green", zorder=100,
        )
        if action is not None:
            accel, steer = float(action[0]), float(action[1])
            ax.quiver(
                robot_x, robot_y,
                self.L * np.cos(robot_theta + steer),
                self.L * np.sin(robot_theta + steer),
                color="blue", zorder=100,
            )
            ax.set_title(
                f"speed {robot_v:.2f} m/s | accel {accel:.2f} m/s^2 | "
                f"steer {steer:.2f} rad"
            )

        if top_samples is not None:
            rendering.draw_top_samples(ax, top_samples[0], top_samples[1])
        if predicted_trajectory is not None:
            rendering.draw_predicted_trajectory(
                ax, predicted_trajectory[None] if predicted_trajectory.ndim == 2
                else predicted_trajectory,
                is_collisions,
            )

        if mode == "human":
            plt.pause(0.0001)
            plt.cla()
        elif mode == "rgb_array":
            self._rendered_frames.append(rendering.fig_to_rgb(self._fig))
            plt.cla()

    def close(self, path: Optional[str] = None) -> None:
        if path is None:
            path = f"video/racing_{self._seed}.gif"
        rendering.save_gif(self._rendered_frames, path)
