"""Pendulum swing-up example.

Behavioral reference: ``/root/reference/example/pendulum.py`` — gymnasium
Pendulum-v1 driven by MPPI at horizon 15, 1000 samples, sigma 1.0,
lambda = ESSPS; reads the true ``env.unwrapped.state``; prints the average
solve time.  Falls back to the internal dynamics as simulator when
gymnasium is unavailable.
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
from mppi_playground_tpu.models import pendulum
from mppi_playground_tpu.utils.angles import angle_normalize


def main(save_mode: bool = False, steps: int = 200, use_gym: bool = True,
         fused: bool = False, episode: bool = False):
    from mppi_playground_tpu.ops.fused_solve import resolve_fused_request

    fused = resolve_fused_request(fused)
    env = None
    if use_gym and not episode:
        try:
            import gymnasium

            if save_mode:
                env = gymnasium.make("Pendulum-v1", render_mode="rgb_array")
                env = gymnasium.wrappers.RecordVideo(env=env, video_folder="video")
            else:
                env = gymnasium.make("Pendulum-v1", render_mode="human")
            env.reset(seed=42)
        except Exception as exc:  # pragma: no cover - display/env issues
            print(f"gymnasium unavailable ({exc}); using internal simulator")
            env = None

    solver = MPPI(
        horizon=15,
        num_samples=1000,
        dim_state=2,
        dim_control=1,
        dynamics=pendulum.dynamics,
        cost_func=pendulum.cost,
        u_min=jnp.asarray([-2.0]),
        u_max=jnp.asarray([2.0]),
        sigmas=jnp.asarray([1.0]),
        lambda_="ESSPS",
        # --fused: one Pallas kernel per tick (TPU only; falls back to XLA)
        store_rollouts=not fused,
        fused_task=pendulum.fused_task() if fused else None,
    )

    state = np.array([np.pi, 0.0]) if env is None else env.unwrapped.state.copy()

    if episode:
        # --episode: all ticks in ONE dispatched program on the internal
        # simulator (gymnasium cannot live inside jit)
        if save_mode:
            print("episode mode: gymnasium rendering/video export "
                  "unavailable (states stay on device)")

        def plant_fn(x, u):
            return pendulum.dynamics(x[None], u[None])[0]

        start = time.time()
        xs, _us = solver.run_episode(
            plant_fn, jnp.asarray(state, jnp.float32), steps
        )
        elapsed = time.time() - start
        print(f"episode: {steps} ticks in {elapsed:.2f} s "
              f"({elapsed / steps * 1000:.2f} ms/tick incl. compile)")
        print(f"final theta: {float(angle_normalize(xs[-1, 0])):.4f}")
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
                pendulum.dynamics(jnp.asarray(state, jnp.float32)[None],
                                  jnp.asarray(action)[None])
            )[0]

    print(f"average solve time: {average_time * 1000}  [ms]")
    print(f"final theta: {float(angle_normalize(jnp.asarray(state[0]))):.4f}")
    if env is not None:
        env.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--save-mode", action="store_true")
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--no-gym", action="store_true")
    parser.add_argument("--fused", action="store_true")
    parser.add_argument("--episode", action="store_true")
    args = parser.parse_args()
    main(save_mode=args.save_mode, steps=args.steps, use_gym=not args.no_gym,
         fused=args.fused, episode=args.episode)
