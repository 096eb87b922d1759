"""Render the demo gifs embedded in the README (docs/media/*.gif).

The reference ships demo gifs for every workload
(``/root/reference/media/*.gif``); navigation and racing are produced by
their envs' gif export, and this script covers the three
gymnasium-simulated workloads (pendulum, cartpole, mountain car) by
driving each example's solver against the gymnasium plant with
``render_mode="rgb_array"`` and writing the captured frames through the
same ``save_gif`` helper the envs use.

Run:  python examples/make_media.py [--out docs/media] [--max-steps N]
CPU-friendly (small workloads); pass --fast for a quick smoke render.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from mppi_playground_tpu import MPPI
from mppi_playground_tpu.envs.rendering import save_gif
from mppi_playground_tpu.models import cartpole, mountain_car, pendulum


def _record(name, env_id, solver, get_state, to_env_action, out_dir,
            max_steps, every=2, seed=42, done_on=None):
    import gymnasium

    env = gymnasium.make(env_id, render_mode="rgb_array")
    env.reset(seed=seed)
    state = get_state(env)
    frames = []
    for step in range(max_steps):
        action_seq, _ = solver.forward(state=jnp.asarray(state, jnp.float32))
        action = np.asarray(action_seq)[0]
        _, _, terminated, truncated, _ = env.step(to_env_action(action))
        if step % every == 0:
            frames.append(env.render())
        state = get_state(env)
        if done_on is not None and done_on(state):
            frames.append(env.render())
            break
        if terminated or truncated:
            break
    env.close()
    path = os.path.join(out_dir, f"{name}.gif")
    save_gif(frames, path, fps=15)
    print(f"{name}: {len(frames)} frames -> {path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join("docs", "media"))
    ap.add_argument("--max-steps", type=int, default=200)
    ap.add_argument("--fast", action="store_true", help="short smoke render")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    max_steps = 20 if args.fast else args.max_steps

    # pendulum swing-up (example/pendulum.py workload: T=15 K=1000 ESSPS)
    solver = MPPI(
        horizon=15, num_samples=1000, dim_state=2, dim_control=1,
        dynamics=pendulum.dynamics, cost_func=pendulum.cost,
        u_min=jnp.asarray([-2.0]), u_max=jnp.asarray([2.0]),
        sigmas=jnp.asarray([1.0]), lambda_="ESSPS",
    )
    _record(
        "pendulum", "Pendulum-v1", solver,
        get_state=lambda e: e.unwrapped.state.copy(),
        to_env_action=lambda a: a, out_dir=args.out, max_steps=max_steps,
    )

    # cartpole (T=10 K=100 lambda=0.001, bang-bang env action)
    solver = MPPI(
        horizon=10, num_samples=100, dim_state=4, dim_control=1,
        dynamics=cartpole.dynamics, cost_func=cartpole.cost,
        u_min=jnp.asarray(list(cartpole.U_MIN)),
        u_max=jnp.asarray(list(cartpole.U_MAX)),
        sigmas=jnp.asarray([1.0]), lambda_=0.001,
    )
    _record(
        "cartpole", "CartPole-v1", solver,
        get_state=lambda e: np.asarray(e.unwrapped.state, np.float32),
        to_env_action=lambda a: int(a[0] > 0.0),  # example/cartpole.py:121
        out_dir=args.out, max_steps=max_steps,
    )

    # mountain car (T=100 K=1000 lambda=0.1)
    solver = MPPI(
        horizon=100, num_samples=1000, dim_state=2, dim_control=1,
        dynamics=mountain_car.dynamics, cost_func=mountain_car.cost,
        u_min=jnp.asarray([-1.0]), u_max=jnp.asarray([1.0]),
        sigmas=jnp.asarray([1.0]), lambda_=0.1,
    )
    _record(
        "mountaincar", "MountainCarContinuous-v0", solver,
        get_state=lambda e: np.asarray(e.unwrapped.state, np.float32),
        to_env_action=lambda a: a, out_dir=args.out,
        max_steps=max_steps, done_on=lambda s: s[0] >= 0.45,
    )


if __name__ == "__main__":
    main()
