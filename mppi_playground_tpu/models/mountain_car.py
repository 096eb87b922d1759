"""Continuous mountain-car dynamics and cost.

Behavioral reference: the inline jit-scripted model in
``/root/reference/example/mountaincar.py:17-55`` (gymnasium
MountainCarContinuous-v0 physics): power=0.0015, gravity term
``0.0025*cos(3x)``, velocity clamp +-0.07, position clamp [-1.2, 0.6];
cost ``(0.45 - position)^2``.

State ``[position, velocity]``, control ``[force]`` in +-1.
"""

from __future__ import annotations

import jax.numpy as jnp

DIM_STATE = 2
DIM_CONTROL = 1
U_MIN = (-1.0,)
U_MAX = (1.0,)

_POWER = 0.0015
_MIN_POSITION = -1.2
_MAX_POSITION = 0.6
_MAX_SPEED = 0.07
_GOAL_POSITION = 0.45


def dynamics_soa(xs, us):
    """Structure-of-arrays step (shape-polymorphic; fused-kernel form)."""
    position, velocity = xs
    force = jnp.clip(us[0], -1.0, 1.0)

    velocity = velocity + force * _POWER - 0.0025 * jnp.cos(3 * position)
    velocity = jnp.clip(velocity, -_MAX_SPEED, _MAX_SPEED)
    position = jnp.clip(position + velocity, _MIN_POSITION, _MAX_POSITION)
    return (position, velocity)


def cost_soa(xs, us, ctx):
    """Distance-to-goal cost on component tuples (mountaincar.py:45-55)."""
    return (_GOAL_POSITION - xs[0]) ** 2


def dynamics(state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    """Mountain-car step over a ``[K, 2]`` batch (mountaincar.py:17-43)."""
    return jnp.stack(
        dynamics_soa((state[:, 0], state[:, 1]), (action[:, 0],)), axis=1
    )


def cost(state: jnp.ndarray, action: jnp.ndarray, info: dict) -> jnp.ndarray:
    """Distance-to-goal cost (mountaincar.py:45-55)."""
    return cost_soa((state[:, 0], state[:, 1]), (action[:, 0],), info)


def fused_task():
    """Plug for the fused Pallas solve (ops/fused_solve.py)."""
    from mppi_playground_tpu.ops.fused_solve import FusedTask

    return FusedTask(
        dynamics_soa=dynamics_soa,
        stage_cost_soa=cost_soa,
        vmem_args={},
        smem_builder=lambda info: {},
    )
