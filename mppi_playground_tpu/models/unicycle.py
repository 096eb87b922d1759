"""Differential-drive (unicycle) dynamics + navigation cost factories.

Behavioral reference: ``Navigation2DEnv.dynamics`` / ``cost_function``
(``/root/reference/src/envs/navigation_2d.py:218-279``): Euler unicycle at
dt=0.1 with action clamps and map-boundary position clamps; cost =
``||pos - goal|| + 10000 * occupancy``.

Parameterized as factories returning pure closures so the environment (or a
user) can bind goal/limits/map once and hand the closures to the solver.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

from mppi_playground_tpu.maps.grid_cost import map_query
from mppi_playground_tpu.utils.angles import angle_normalize
from mppi_playground_tpu.utils.fastmath import sincos_npi

DIM_STATE = 3  # [x, y, theta]
DIM_CONTROL = 2  # [v, omega]
U_MIN = (0.0, -1.0)
U_MAX = (2.0, 1.0)
DELTA_T = 0.1
OBSTACLE_WEIGHT = 10000.0


def make_dynamics_soa(
    x_lim: Tuple[float, float],
    y_lim: Tuple[float, float],
    u_min: Tuple[float, float] = U_MIN,
    u_max: Tuple[float, float] = U_MAX,
    delta_t: float = DELTA_T,
):
    """Structure-of-arrays unicycle step (fused-kernel form)."""

    def dynamics_soa(xs, us):
        x, y, theta = xs
        theta = angle_normalize(theta)
        v = jnp.clip(us[0], u_min[0], u_max[0])
        omega = jnp.clip(us[1], u_min[1], u_max[1])

        # polynomial sin/cos on the just-normalized heading (see bicycle)
        sin_t, cos_t = sincos_npi(theta)
        new_x = jnp.clip(x + v * cos_t * delta_t, x_lim[0], x_lim[1])
        new_y = jnp.clip(y + v * sin_t * delta_t, y_lim[0], y_lim[1])
        new_theta = angle_normalize(theta + omega * delta_t)
        return (new_x, new_y, new_theta)

    return dynamics_soa


def make_dynamics(
    x_lim: Tuple[float, float],
    y_lim: Tuple[float, float],
    u_min: Tuple[float, float] = U_MIN,
    u_max: Tuple[float, float] = U_MAX,
    delta_t: float = DELTA_T,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Unicycle Euler step with boundary clamp (navigation_2d.py:218-255)."""
    soa = make_dynamics_soa(x_lim, y_lim, u_min, u_max, delta_t)

    def dynamics(state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        xs = soa(
            (state[:, 0], state[:, 1], state[:, 2]),
            (action[:, 0], action[:, 1]),
        )
        return jnp.stack(xs, axis=1)

    return dynamics


def make_navigation_cost(
    goal: jnp.ndarray,
    obstacle_map,
    obstacle_weight: float = OBSTACLE_WEIGHT,
) -> Callable[[jnp.ndarray, jnp.ndarray, dict], jnp.ndarray]:
    """Goal-distance + occupancy-penalty cost (navigation_2d.py:257-279)."""

    def cost(state: jnp.ndarray, action: jnp.ndarray, info: dict) -> jnp.ndarray:
        goal_cost = jnp.linalg.norm(state[:, :2] - goal, axis=1)
        obstacle_cost = map_query(obstacle_map, state[:, :2])
        return goal_cost + obstacle_weight * obstacle_cost

    return cost


def make_navigation_cost_soa(
    goal: Tuple[float, float],
    obstacle_weight: float = OBSTACLE_WEIGHT,
):
    """SoA navigation cost: occupancy via the in-kernel row-interval query.

    Expects ``ctx['vmem']['obstacle_table']`` (a ``RowIntervalTable``).
    """
    from mppi_playground_tpu.ops.row_intervals import interval_query

    gx, gy = float(goal[0]), float(goal[1])

    def cost_soa(xs, us, ctx):
        x, y, _theta = xs
        dx = x - gx
        dy = y - gy
        goal_cost = jnp.sqrt(dx * dx + dy * dy)
        obstacle_cost = interval_query(ctx["vmem"]["obstacle_table"], x, y)
        return goal_cost + obstacle_weight * obstacle_cost

    return cost_soa


def make_navigation_fused_task(
    obstacle_table,
    goal: Tuple[float, float],
    x_lim: Tuple[float, float],
    y_lim: Tuple[float, float],
    obstacle_weight: float = OBSTACLE_WEIGHT,
):
    """Bundle the navigation model for the fused Pallas solve."""
    from mppi_playground_tpu.ops.fused_solve import FusedTask

    return FusedTask(
        dynamics_soa=make_dynamics_soa(x_lim=x_lim, y_lim=y_lim),
        stage_cost_soa=make_navigation_cost_soa(goal, obstacle_weight),
        vmem_args={"obstacle_table": obstacle_table},
        smem_builder=lambda info: {},
    )
