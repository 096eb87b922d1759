"""Pendulum swing-up dynamics and cost.

Behavioral reference: the inline jit-scripted dynamics/cost in
``/root/reference/example/pendulum.py:17-47`` (which themselves replicate
gymnasium Pendulum-v1): g=10, m=1, l=1, dt=0.05, torque clamp +-2,
velocity clamp +-8; stage cost ``angle_normalize(theta)^2 + 0.1*thetadot^2``.

State ``[theta, theta_dot]``, control ``[torque]``.
"""

from __future__ import annotations

import jax.numpy as jnp

from mppi_playground_tpu.utils.angles import angle_normalize

DIM_STATE = 2
DIM_CONTROL = 1
U_MIN = (-2.0,)
U_MAX = (2.0,)

_GRAVITY = 10.0
_MASS = 1.0
_LENGTH = 1.0
_DT = 0.05


def dynamics_soa(xs, us):
    """Structure-of-arrays Euler step (shape-polymorphic; fused-kernel form)."""
    th, thdot = xs
    u = jnp.clip(us[0], -2.0, 2.0)
    newthdot = thdot + (
        -3.0 * _GRAVITY / (2.0 * _LENGTH) * jnp.sin(th + jnp.pi)
        + 3.0 / (_MASS * _LENGTH**2) * u
    ) * _DT
    newth = th + newthdot * _DT
    newthdot = jnp.clip(newthdot, -8.0, 8.0)
    return (newth, newthdot)


def cost_soa(xs, us, ctx):
    """Swing-up stage cost on component tuples (pendulum.py:42-47)."""
    theta, theta_dt = xs
    return angle_normalize(theta) ** 2 + 0.1 * theta_dt**2


def dynamics(state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    """Euler pendulum step over a ``[K, 2]`` batch (pendulum.py:17-40)."""
    return jnp.stack(
        dynamics_soa((state[:, 0], state[:, 1]), (action[:, 0],)), axis=1
    )


def cost(state: jnp.ndarray, action: jnp.ndarray, info: dict) -> jnp.ndarray:
    """Swing-up stage cost (pendulum.py:42-47)."""
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
