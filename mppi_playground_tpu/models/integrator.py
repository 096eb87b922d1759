"""Minimal integrator task from the reference README quick-start.

Behavioral reference: ``/root/reference/README.md:163-183`` — dynamics
``next = state + action``; cost = squared distance to goal ``(1, 1)``.
Used as the smallest smoke-test model.
"""

from __future__ import annotations

import jax.numpy as jnp

DIM_STATE = 2
DIM_CONTROL = 2
U_MIN = (-1.0, -1.0)
U_MAX = (1.0, 1.0)

GOAL = (1.0, 1.0)


def dynamics(state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    return state + action


def cost(state: jnp.ndarray, action: jnp.ndarray, info: dict) -> jnp.ndarray:
    goal = jnp.asarray(GOAL, state.dtype)
    return jnp.sum((state - goal) ** 2, axis=1)


def dynamics_soa(xs, us):
    """Structure-of-arrays form (fused-kernel plug)."""
    return tuple(x + u for x, u in zip(xs, us))


def cost_soa(xs, us, ctx):
    return (xs[0] - GOAL[0]) ** 2 + (xs[1] - GOAL[1]) ** 2


def fused_task():
    """Plug for the fused Pallas solve (ops/fused_solve.py)."""
    from mppi_playground_tpu.ops.fused_solve import FusedTask

    return FusedTask(
        dynamics_soa=dynamics_soa,
        stage_cost_soa=cost_soa,
        vmem_args={},
        smem_builder=lambda info: {},
    )
