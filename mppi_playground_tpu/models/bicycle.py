"""Kinematic-bicycle dynamics (racing vehicle model).

Behavioral reference: ``RacingEnv.dynamics``
(``/root/reference/src/envs/racing_env.py:327-372``): state
``[x, y, theta, v]``, control ``[accel, steer]``; Euler integration at
dt=0.1 of ``xdot = v cos(theta)``, ``ydot = v sin(theta)``,
``thetadot = v tan(steer) / L``, ``vdot = accel``; position clamped to the
map, speed clamped to +-V_MAX; parameters L=1 m, V_MAX=8 m/s and control
bounds accel in +-2, steer in +-0.25 (racing_env.py:37-42).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

from mppi_playground_tpu.utils.angles import angle_normalize
from mppi_playground_tpu.utils.fastmath import sincos_npi

DIM_STATE = 4  # [x, y, theta, v]
DIM_CONTROL = 2  # [accel, steer]
U_MIN = (-2.0, -0.25)
U_MAX = (2.0, 0.25)
WHEELBASE = 1.0
V_MAX = 8.0
DELTA_T = 0.1


def _tan_small(x: jnp.ndarray) -> jnp.ndarray:
    """Odd-polynomial tan for the clamped steering range.

    ``tan`` lowers to sin + cos + divide on the VPU — the single most
    expensive op in the bicycle step (measured ~0.1 ms of the flagship
    kernel).  Steering is clamped to |delta| <= 0.25 rad *before* this is
    applied, where the degree-7 Taylor polynomial
    ``x + x^3/3 + 2 x^5/15 + 17 x^7/315`` has truncation error < 1e-7 —
    below one f32 ulp of tan(0.25) ~= 0.2553.  Both solver paths (XLA scan
    and fused Pallas) trace this same function, so they remain exactly
    comparable; parity vs the reference's true ``torch.tan``
    (racing_env.py:350) is bounded by the same 1e-7.
    """
    x2 = x * x
    return x * (
        1.0 + x2 * (1.0 / 3.0 + x2 * (2.0 / 15.0 + x2 * (17.0 / 315.0)))
    )


def make_dynamics_soa(
    x_lim: Tuple[float, float],
    y_lim: Tuple[float, float],
    u_min: Tuple[float, float] = U_MIN,
    u_max: Tuple[float, float] = U_MAX,
    wheelbase: float = WHEELBASE,
    v_max: float = V_MAX,
    delta_t: float = DELTA_T,
) -> Callable[[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]], Tuple[jnp.ndarray, ...]]:
    """Structure-of-arrays bicycle step: tuples of same-shape arrays.

    The SoA form is the TPU-native layout — each state component fills
    whole vector registers instead of 4 of 128 lanes in a ``[K, 4]``
    array — and is what the fused Pallas solve kernel traces.  The
    array-of-structs wrapper below keeps the reference call signature.
    """

    # the degree-7 polynomial's <1e-7 accuracy holds only on the small
    # steering range the reference clamps to; custom wider bounds (legal
    # through the public make_dynamics API) keep the true tan (a
    # build-time choice — both solver paths still trace one function)
    steer_bound = max(abs(float(u_min[1])), abs(float(u_max[1])))
    # 0.25 is the documented accuracy contract (reference clamp); the
    # epsilon only absorbs float representation of the bound itself
    tan_fn = _tan_small if steer_bound <= 0.25 + 1e-6 else jnp.tan

    def dynamics_soa(xs, us):
        x, y, theta, v = xs
        theta = angle_normalize(theta)
        accel = jnp.clip(us[0], u_min[0], u_max[0])
        steer = jnp.clip(us[1], u_min[1], u_max[1])

        # polynomial sin/cos: theta was just normalized to [-pi, pi], the
        # valid range; < 3e-7 of libm, two special-pipe ops saved per step
        sin_t, cos_t = sincos_npi(theta)
        new_x = jnp.clip(x + v * cos_t * delta_t, x_lim[0], x_lim[1])
        new_y = jnp.clip(y + v * sin_t * delta_t, y_lim[0], y_lim[1])
        new_theta = angle_normalize(
            theta + v * tan_fn(steer) / wheelbase * delta_t
        )
        new_v = jnp.clip(v + accel * delta_t, -v_max, v_max)
        return (new_x, new_y, new_theta, new_v)

    return dynamics_soa


def make_dynamics(
    x_lim: Tuple[float, float],
    y_lim: Tuple[float, float],
    u_min: Tuple[float, float] = U_MIN,
    u_max: Tuple[float, float] = U_MAX,
    wheelbase: float = WHEELBASE,
    v_max: float = V_MAX,
    delta_t: float = DELTA_T,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Kinematic bicycle Euler step (racing_env.py:327-372)."""
    soa = make_dynamics_soa(x_lim, y_lim, u_min, u_max, wheelbase, v_max, delta_t)

    def dynamics(state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        xs = soa(
            (state[:, 0], state[:, 1], state[:, 2], state[:, 3]),
            (action[:, 0], action[:, 1]),
        )
        return jnp.stack(xs, axis=1)

    return dynamics
