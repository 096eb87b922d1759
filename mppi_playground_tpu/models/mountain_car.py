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


def dynamics(state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    """Mountain-car step over a ``[K, 2]`` batch (mountaincar.py:17-43)."""
    position = state[:, 0]
    velocity = state[:, 1]
    force = jnp.clip(action[:, 0], -1.0, 1.0)

    velocity = velocity + force * _POWER - 0.0025 * jnp.cos(3 * position)
    velocity = jnp.clip(velocity, -_MAX_SPEED, _MAX_SPEED)
    position = jnp.clip(position + velocity, _MIN_POSITION, _MAX_POSITION)
    return jnp.stack([position, velocity], axis=1)


def cost(state: jnp.ndarray, action: jnp.ndarray, info: dict) -> jnp.ndarray:
    """Distance-to-goal cost (mountaincar.py:45-55)."""
    return (_GOAL_POSITION - state[:, 0]) ** 2
