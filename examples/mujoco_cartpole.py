"""Mujoco inverted-pendulum example (approximate dynamics).

Behavioral reference: ``/root/reference/example/mujoco_cartpole.py`` —
InvertedPendulum-v4 driven by *approximate* cartpole dynamics with
masspole=1.0, x clamp +-1 (mujoco_cartpole.py:21-67); the header there
notes the model mismatch makes it a demo, not a solved task.  Requires
``gymnasium[mujoco]``.
"""

import argparse
import time

import jax.numpy as jnp

import os
import sys

# allow running directly from a source checkout without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mppi_playground_tpu import MPPI
from mppi_playground_tpu.utils.angles import angle_normalize

# approximate dynamics with the mujoco example's constants
_GRAVITY = 9.8
_MASSCART = 1.0
_MASSPOLE = 1.0
_TOTAL_MASS = _MASSPOLE + _MASSCART
_LENGTH = 0.5
_POLEMASS_LENGTH = _MASSPOLE * _LENGTH
_TAU = 0.02
_X_THRESHOLD = 1.0
_THETA_THRESHOLD = 12 * 2 * jnp.pi / 360


def dynamics(state, action):
    x, x_dt, theta, theta_dt = (state[:, i] for i in range(4))
    force = action[:, 0]
    costheta = jnp.cos(theta)
    sintheta = jnp.sin(theta)
    temp = (force + _POLEMASS_LENGTH * theta_dt**2 * sintheta) / _TOTAL_MASS
    thetaacc = (_GRAVITY * sintheta - costheta * temp) / (
        _LENGTH * (4.0 / 3.0 - _MASSPOLE * costheta**2 / _TOTAL_MASS)
    )
    xacc = temp - _POLEMASS_LENGTH * thetaacc * costheta / _TOTAL_MASS
    new_x = jnp.clip(x + _TAU * x_dt, -_X_THRESHOLD, _X_THRESHOLD)
    new_theta = jnp.clip(theta + _TAU * theta_dt, -_THETA_THRESHOLD, _THETA_THRESHOLD)
    return jnp.stack(
        [new_x, x_dt + _TAU * xacc, new_theta, theta_dt + _TAU * thetaacc], axis=1
    )


def cost_func(state, action, info):
    return (
        angle_normalize(state[:, 2]) ** 2
        + 0.1 * state[:, 3] ** 2
        + 0.1 * state[:, 0] ** 2
    )


def main(save_mode: bool = False, steps: int = 500, render: bool = True):
    import gymnasium as gym

    if save_mode:
        env = gym.make("InvertedPendulum-v4", render_mode="rgb_array")
        env = gym.wrappers.RecordVideo(env=env, video_folder="video")
    elif render:
        try:
            env = gym.make("InvertedPendulum-v4", render_mode="human")
        except Exception as exc:  # headless hosts: no GLFW display
            print(f"human rendering unavailable ({exc}); running headless")
            env = gym.make("InvertedPendulum-v4")
    else:
        env = gym.make("InvertedPendulum-v4")
    observation, _ = env.reset(seed=42)

    solver = MPPI(
        horizon=50,
        num_samples=1000,
        dim_state=4,
        dim_control=1,
        dynamics=dynamics,
        cost_func=cost_func,
        u_min=jnp.asarray([-3.0]),
        u_max=jnp.asarray([3.0]),
        sigmas=jnp.asarray([1.0]),
        lambda_=1.0,
    )

    average_time = 0.0
    for i in range(steps):
        start = time.time()
        action_seq, _ = solver.forward(state=jnp.asarray(observation, jnp.float32))
        elapsed = time.time() - start
        average_time = i / (i + 1) * average_time + elapsed / (i + 1)
        observation, *_ = env.step(jnp.asarray(action_seq)[0])
        if env.render_mode is not None:
            env.render()

    print(f"average solve time: {average_time * 1000}  [ms]")
    env.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--save-mode", action="store_true")
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--no-render", action="store_true")
    args = parser.parse_args()
    main(save_mode=args.save_mode, steps=args.steps, render=not args.no_render)
