"""Continuous mountain-car example.

Behavioral reference: ``/root/reference/example/mountaincar.py`` —
MountainCarContinuous-v0 with MPPI at horizon 100, 1000 samples, sigma 1.0,
lambda=0.1, reading ``env.unwrapped.state``.
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
from mppi_playground_tpu.models import mountain_car


def main(save_mode: bool = False, steps: int = 300, use_gym: bool = True,
         episode: bool = False):
    env = None
    if use_gym and not episode:
        try:
            import gymnasium

            if save_mode:
                env = gymnasium.make(
                    "MountainCarContinuous-v0", render_mode="rgb_array"
                )
                env = gymnasium.wrappers.RecordVideo(env=env, video_folder="video")
            else:
                env = gymnasium.make("MountainCarContinuous-v0", render_mode="human")
            env.reset(seed=42)
        except Exception as exc:  # pragma: no cover
            print(f"gymnasium unavailable ({exc}); using internal simulator")
            env = None

    solver = MPPI(
        horizon=100,
        num_samples=1000,
        dim_state=2,
        dim_control=1,
        dynamics=mountain_car.dynamics,
        cost_func=mountain_car.cost,
        u_min=jnp.asarray([-1.0]),
        u_max=jnp.asarray([1.0]),
        sigmas=jnp.asarray([1.0]),
        lambda_=0.1,
    )

    state = np.array([-0.5, 0.0]) if env is None else env.unwrapped.state.copy()

    if episode:
        # --episode: all ticks in ONE dispatched program on the internal
        # simulator, terminating on the on-device hilltop test
        if save_mode:
            print("episode mode: gymnasium rendering/video export "
                  "unavailable (states stay on device)")

        def plant_fn(x, u):
            return mountain_car.dynamics(x[None], u[None])[0]

        def done_fn(x):
            return x[0] >= 0.45

        start = time.time()
        xs, _us, ep = solver.run_episode(
            plant_fn, jnp.asarray(state, jnp.float32), steps, done_fn=done_fn
        )
        elapsed = time.time() - start
        if bool(ep["done"]):
            print("Goal Reached!")
        # the scan always executes the full budget (done episodes freeze),
        # so per-tick time divides by steps, not the executed ticks
        print(f"episode: {int(ep['ticks'])} ticks (budget {steps}) in "
              f"{elapsed:.2f} s ({elapsed / steps * 1000:.2f} ms per "
              f"budget tick incl. compile)")
        print(f"final position: {float(xs[-1, 0]):.3f} (goal 0.45)")
        return

    average_time = 0.0
    for i in range(steps):
        start = time.time()
        action_seq, state_seq = solver.forward(state=jnp.asarray(state, jnp.float32))
        elapsed = time.time() - start
        average_time = i / (i + 1) * average_time + elapsed / (i + 1)

        action = np.asarray(action_seq)[0]
        if env is not None:
            env.step(action)
            env.render()
            state = env.unwrapped.state.copy()
        else:
            state = np.asarray(
                mountain_car.dynamics(
                    jnp.asarray(state, jnp.float32)[None], jnp.asarray(action)[None]
                )
            )[0]

    print(f"average solve time: {average_time * 1000}  [ms]")
    print(f"final position: {state[0]:.3f} (goal 0.45)")
    if env is not None:
        env.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--save-mode", action="store_true")
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--no-gym", action="store_true")
    parser.add_argument("--episode", action="store_true")
    args = parser.parse_args()
    main(save_mode=args.save_mode, steps=args.steps, use_gym=not args.no_gym,
         episode=args.episode)
