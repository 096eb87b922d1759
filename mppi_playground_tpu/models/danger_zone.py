"""Danger-zone CMDP model: unicycle with goal/center observation features.

Behavioral reference: ``GoalInDangerZoneEnv.parallel_step`` /
``parallel_cost`` (``/root/reference/src/envs/goal_in_danger_zone.py:113-156``):
7-dim observation ``[x, y, theta, vec_to_goal(2), vec_to_center(2)]``;
dynamics integrate heading *before* position (unlike the navigation
unicycle); cost = distance-to-goal + 1000 * inside-danger-zone indicator.

TPU-first detail: the reference's ``parallel_step`` reads the episode's
goal/center from the env object at call time, which under jit would force a
retrace every reset.  The observation already encodes both
(``goal = pos + vec_to_goal``, ``center = pos + vec_to_center``), so our
dynamics recover them from the state itself — the jitted solve is reused
across episodes with zero recompiles.  The reconstruction adds one f32
rounding per rollout step (the recovered goal/center can drift by ~T ulps
over the horizon vs the reference's exact episode tensors) — negligible
for control, but boundary-ulp collision flips are possible.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

from mppi_playground_tpu.utils.angles import angle_normalize

DIM_STATE = 7
DIM_CONTROL = 2  # [v, omega]
U_MIN = (-1.0, -1.0)
U_MAX = (1.0, 1.0)
DELTA_T = 0.1
COLLISION_WEIGHT = 1000.0


def make_dynamics_soa(
    u_min: Tuple[float, float] = U_MIN,
    u_max: Tuple[float, float] = U_MAX,
    delta_t: float = DELTA_T,
):
    """Structure-of-arrays observation step (fused-kernel form)."""

    def dynamics_soa(xs, us):
        x, y, th, gdx, gdy, cdx, cdy = xs
        gx, gy = x + gdx, y + gdy
        cx, cy = x + cdx, y + cdy
        v = jnp.clip(us[0], u_min[0], u_max[0])
        omega = jnp.clip(us[1], u_min[1], u_max[1])

        # heading updates before position (reference order)
        theta = angle_normalize(th + omega * delta_t)
        new_x = x + v * jnp.cos(theta) * delta_t
        new_y = y + v * jnp.sin(theta) * delta_t
        return (new_x, new_y, theta, gx - new_x, gy - new_y,
                cx - new_x, cy - new_y)

    return dynamics_soa


def make_dynamics(
    u_min: Tuple[float, float] = U_MIN,
    u_max: Tuple[float, float] = U_MAX,
    delta_t: float = DELTA_T,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Batched observation step (goal_in_danger_zone.py:113-136)."""
    soa = make_dynamics_soa(u_min, u_max, delta_t)

    def dynamics(obs: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        xs = tuple(obs[:, c] for c in range(DIM_STATE))
        return jnp.stack(soa(xs, (action[:, 0], action[:, 1])), axis=1)

    return dynamics


def make_cost(
    radius: float, collision_weight: float = COLLISION_WEIGHT
) -> Callable[[jnp.ndarray, jnp.ndarray, dict], jnp.ndarray]:
    """CMDP-style cost (goal_in_danger_zone.py:138-156)."""

    soa = make_cost_soa(radius, collision_weight)

    def cost(obs: jnp.ndarray, action: jnp.ndarray, info: dict) -> jnp.ndarray:
        xs = tuple(obs[:, c] for c in range(DIM_STATE))
        return soa(xs, (action[:, 0], action[:, 1]), info)

    return cost


def make_cost_soa(radius: float, collision_weight: float = COLLISION_WEIGHT):
    """SoA CMDP cost (goal_in_danger_zone.py:138-156)."""

    def cost_soa(xs, us, ctx):
        _x, _y, _th, gdx, gdy, cdx, cdy = xs
        dist_to_goal = jnp.sqrt(gdx * gdx + gdy * gdy)
        # compare in distance (not distance^2) space: the reference tests
        # norm(vec) < radius and the f32 results differ at boundary ulps
        is_collided = jnp.sqrt(cdx * cdx + cdy * cdy) < radius
        return dist_to_goal + is_collided.astype(gdx.dtype) * collision_weight

    return cost_soa


def make_fused_task(
    radius: float,
    collision_weight: float = COLLISION_WEIGHT,
    u_min: Tuple[float, float] = U_MIN,
    u_max: Tuple[float, float] = U_MAX,
    delta_t: float = DELTA_T,
):
    """Plug for the fused Pallas solve (ops/fused_solve.py)."""
    from mppi_playground_tpu.ops.fused_solve import FusedTask

    return FusedTask(
        dynamics_soa=make_dynamics_soa(u_min, u_max, delta_t),
        stage_cost_soa=make_cost_soa(radius, collision_weight),
        vmem_args={},
        smem_builder=lambda info: {},
    )
