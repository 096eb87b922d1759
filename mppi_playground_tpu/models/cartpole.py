"""Cartpole swing-up dynamics and cost (gymnasium CartPole-v1 physics).

Behavioral reference: the inline jit-scripted model in
``/root/reference/example/cartpole.py:17-81``: gymnasium cartpole dynamics
with tau=0.02, the **bang-bang mapping** of the continuous MPPI action to
+-force_mag (cartpole.py:39-44, MPPI can only sample continuous actions),
position/angle clamps (cartpole.py:60-65), and stage cost
``angle_normalize(theta)^2 + 0.1*theta_dot^2 + 0.1*x^2``.

State ``[x, x_dot, theta, theta_dot]``, control ``[u]`` with the
reference's solver bounds +-3.
"""

from __future__ import annotations

import jax.numpy as jnp

from mppi_playground_tpu.utils.angles import angle_normalize

DIM_STATE = 4
DIM_CONTROL = 1
U_MIN = (-3.0,)
U_MAX = (3.0,)

_GRAVITY = 9.8
_MASSCART = 1.0
_MASSPOLE = 0.1
_TOTAL_MASS = _MASSPOLE + _MASSCART
_LENGTH = 0.5  # actually half the pole's length
_POLEMASS_LENGTH = _MASSPOLE * _LENGTH
_FORCE_MAG = 10.0
_TAU = 0.02
_X_THRESHOLD = 2.4
_THETA_THRESHOLD = 12 * 2 * jnp.pi / 360


def dynamics_soa(xs, us):
    """Structure-of-arrays Euler step (shape-polymorphic; fused-kernel form)."""
    x, x_dt, theta, theta_dt = xs

    # bang-bang: continuous sample -> +-force_mag (cartpole.py:39-44)
    force = jnp.where(us[0] >= 0, _FORCE_MAG, -_FORCE_MAG)

    costheta = jnp.cos(theta)
    sintheta = jnp.sin(theta)
    temp = (force + _POLEMASS_LENGTH * theta_dt**2 * sintheta) / _TOTAL_MASS
    thetaacc = (_GRAVITY * sintheta - costheta * temp) / (
        _LENGTH * (4.0 / 3.0 - _MASSPOLE * costheta**2 / _TOTAL_MASS)
    )
    xacc = temp - _POLEMASS_LENGTH * thetaacc * costheta / _TOTAL_MASS

    new_x = jnp.clip(x + _TAU * x_dt, -_X_THRESHOLD, _X_THRESHOLD)
    new_x_dt = x_dt + _TAU * xacc
    new_theta = jnp.clip(theta + _TAU * theta_dt, -_THETA_THRESHOLD, _THETA_THRESHOLD)
    new_theta_dt = theta_dt + _TAU * thetaacc
    return (new_x, new_x_dt, new_theta, new_theta_dt)


def cost_soa(xs, us, ctx):
    """Stage cost on component tuples (cartpole.py:71-81)."""
    x, _x_dt, theta, theta_dt = xs
    return angle_normalize(theta) ** 2 + 0.1 * theta_dt**2 + 0.1 * x**2


def dynamics(state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    """Euler cartpole step over a ``[K, 4]`` batch (cartpole.py:17-69)."""
    xs = (state[:, 0], state[:, 1], state[:, 2], state[:, 3])
    return jnp.stack(dynamics_soa(xs, (action[:, 0],)), axis=1)


def cost(state: jnp.ndarray, action: jnp.ndarray, info: dict) -> jnp.ndarray:
    """Stage cost (cartpole.py:71-81)."""
    xs = (state[:, 0], state[:, 1], state[:, 2], state[:, 3])
    return cost_soa(xs, (action[:, 0],), info)


def fused_task():
    """Plug for the fused Pallas solve (ops/fused_solve.py)."""
    from mppi_playground_tpu.ops.fused_solve import FusedTask

    return FusedTask(
        dynamics_soa=dynamics_soa,
        stage_cost_soa=cost_soa,
        vmem_args={},
        smem_builder=lambda info: {},
    )
