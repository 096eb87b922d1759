"""Cartpole balancing example.

Behavioral reference: ``/root/reference/example/cartpole.py`` — gymnasium
CartPole-v1 with MPPI at horizon 10, 100 samples, sigma 1.0, lambda=0.001;
the solver plans in a continuous action whose sign selects the discrete
env action (cartpole.py:120-121).
"""

import argparse
import time

import jax.numpy as jnp
import numpy as np

import os
import sys

# allow running directly from a source checkout without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mppi_playground_tpu import MPPI
from mppi_playground_tpu.models import cartpole


def main(save_mode: bool = False, steps: int = 500, use_gym: bool = True,
         episode: bool = False):
    env = None
    if use_gym and not episode:
        try:
            import gymnasium

            if save_mode:
                env = gymnasium.make("CartPole-v1", render_mode="rgb_array")
                env = gymnasium.wrappers.RecordVideo(env=env, video_folder="video")
            else:
                env = gymnasium.make("CartPole-v1", render_mode="human")
            observation, _ = env.reset(seed=42)
        except Exception as exc:  # pragma: no cover
            print(f"gymnasium unavailable ({exc}); using internal simulator")
            env = None
    if env is None:
        observation = np.array([0.0, 0.0, 0.05, 0.0], np.float32)

    solver = MPPI(
        horizon=10,
        num_samples=100,
        dim_state=4,
        dim_control=1,
        dynamics=cartpole.dynamics,
        cost_func=cartpole.cost,
        u_min=jnp.asarray([-3.0]),
        u_max=jnp.asarray([3.0]),
        sigmas=jnp.asarray([1.0]),
        lambda_=0.001,
    )

    if episode:
        # --episode: all ticks in ONE dispatched program on the internal
        # bang-bang dynamics (gymnasium cannot live inside jit)
        if save_mode:
            print("episode mode: gymnasium rendering/video export "
                  "unavailable (states stay on device)")

        def plant_fn(x, u):
            return cartpole.dynamics(x[None], u[None])[0]

        start = time.time()
        xs, _us = solver.run_episode(
            plant_fn, jnp.asarray(observation, jnp.float32), steps
        )
        elapsed = time.time() - start
        print(f"episode: {steps} ticks in {elapsed:.2f} s "
              f"({elapsed / steps * 1000:.2f} ms/tick incl. compile)")
        print(f"final pole angle: {float(xs[-1, 2]):.4f}")
        return

    average_time = 0.0
    for i in range(steps):
        start = time.time()
        action_seq, state_seq = solver.forward(
            state=jnp.asarray(observation, jnp.float32)
        )
        elapsed = time.time() - start
        average_time = i / (i + 1) * average_time + elapsed / (i + 1)

        # continuous plan -> discrete env action (cartpole.py:120-121)
        discrete_action = 0 if float(action_seq[0, 0]) < 0 else 1
        if env is not None:
            observation, *_ = env.step(discrete_action)
            env.render()
        else:
            observation = np.asarray(
                cartpole.dynamics(
                    jnp.asarray(observation, jnp.float32)[None],
                    action_seq[None, 0],
                )
            )[0]

    print(f"average solve time: {average_time * 1000}  [ms]")
    if env is not None:
        env.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--save-mode", action="store_true")
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--no-gym", action="store_true")
    parser.add_argument("--episode", action="store_true")
    args = parser.parse_args()
    main(save_mode=args.save_mode, steps=args.steps, use_gym=not args.no_gym,
         episode=args.episode)
