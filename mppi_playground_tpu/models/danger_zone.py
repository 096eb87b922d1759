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
across episodes with zero recompiles and identical numerics.
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


def make_dynamics(
    u_min: Tuple[float, float] = U_MIN,
    u_max: Tuple[float, float] = U_MAX,
    delta_t: float = DELTA_T,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Batched observation step (goal_in_danger_zone.py:113-136)."""

    def dynamics(obs: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        pos = obs[:, 0:2]
        goal = pos + obs[:, 3:5]
        center = pos + obs[:, 5:7]
        v = jnp.clip(action[:, 0], u_min[0], u_max[0])
        omega = jnp.clip(action[:, 1], u_min[1], u_max[1])

        # heading updates before position (reference order)
        theta = angle_normalize(obs[:, 2] + omega * delta_t)
        new_pos = pos + (
            v[:, None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1) * delta_t
        )

        return jnp.concatenate(
            [new_pos, theta[:, None], goal - new_pos, center - new_pos], axis=1
        )

    return dynamics


def make_cost(
    radius: float, collision_weight: float = COLLISION_WEIGHT
) -> Callable[[jnp.ndarray, jnp.ndarray, dict], jnp.ndarray]:
    """CMDP-style cost (goal_in_danger_zone.py:138-156)."""

    def cost(obs: jnp.ndarray, action: jnp.ndarray, info: dict) -> jnp.ndarray:
        vec_to_goal = obs[:, 3:5]
        vec_to_center = obs[:, 5:7]
        dist_to_goal = jnp.linalg.norm(vec_to_goal, axis=-1)
        is_collided = jnp.linalg.norm(vec_to_center, axis=-1) < radius
        return dist_to_goal + is_collided.astype(obs.dtype) * collision_weight

    return cost
