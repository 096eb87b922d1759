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

DIM_STATE = 4  # [x, y, theta, v]
DIM_CONTROL = 2  # [accel, steer]
U_MIN = (-2.0, -0.25)
U_MAX = (2.0, 0.25)
WHEELBASE = 1.0
V_MAX = 8.0
DELTA_T = 0.1


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

    def dynamics(state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        x = state[:, 0]
        y = state[:, 1]
        theta = angle_normalize(state[:, 2])
        v = state[:, 3]
        accel = jnp.clip(action[:, 0], u_min[0], u_max[0])
        steer = jnp.clip(action[:, 1], u_min[1], u_max[1])

        new_x = jnp.clip(x + v * jnp.cos(theta) * delta_t, x_lim[0], x_lim[1])
        new_y = jnp.clip(y + v * jnp.sin(theta) * delta_t, y_lim[0], y_lim[1])
        new_theta = angle_normalize(theta + v * jnp.tan(steer) / wheelbase * delta_t)
        new_v = jnp.clip(v + accel * delta_t, -v_max, v_max)
        return jnp.stack([new_x, new_y, new_theta, new_v], axis=1)

    return dynamics
