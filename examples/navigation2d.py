"""2D navigation example: obstacle field, top-sample visualization, gif.

Behavioral reference: ``/root/reference/example/navigation2d.py`` — MPPI at
horizon 30, 3000 samples, sigma [0.5, 0.5], lambda=ESSPS; loop: solve ->
step -> collision check -> top-300 samples -> render; prints the average
solve time and "Goal Reached!".
"""

import argparse
import time

import jax.numpy as jnp

import os
import sys

# allow running directly from a source checkout without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mppi_playground_tpu import MPPI
from mppi_playground_tpu.envs import Navigation2DEnv


def main(
    save_mode: bool = False,
    max_steps: int = 500,
    render: bool = True,
    fused: bool = False,
    episode: bool = False,
):
    env = Navigation2DEnv()

    from mppi_playground_tpu.ops.fused_solve import resolve_fused_request

    fused = resolve_fused_request(fused)
    # --fused: one Pallas kernel per tick; the top-300 overlay is
    # regenerated from the solve's PRNG seeds instead of stored rollouts
    extra = dict(store_rollouts=False, fused_task=env.fused_task()) if fused else {}
    solver = MPPI(
        horizon=30,
        num_samples=3000,
        dim_state=3,
        dim_control=2,
        dynamics=env.dynamics,
        cost_func=env.cost_function,
        u_min=env.u_min,
        u_max=env.u_max,
        sigmas=jnp.asarray([0.5, 0.5]),
        lambda_="ESSPS",
        **extra,
    )

    state = env.reset()

    if episode:
        # --episode: the whole loop in ONE dispatched program, terminating
        # on the same goal test env.step uses (states never visit the host
        # until the episode ends)
        if render or save_mode:
            print("episode mode: rendering/gif export unavailable "
                  "(states stay on device)")
        goal, thr = env.goal_pos, env.GOAL_THRESHOLD

        def done_fn(x):
            return jnp.linalg.norm(x[:2] - goal) < thr

        def plant_fn(x, u):
            return env.dynamics(x[None], u[None])[0]

        start = time.time()
        xs, us, ep = solver.run_episode(
            plant_fn, state, max_steps, done_fn=done_fn
        )
        elapsed = time.time() - start
        if bool(ep["done"]):
            print("Goal Reached!")
        # the scan always executes the full budget (done episodes freeze),
        # so per-tick time divides by max_steps, not the executed ticks
        print(
            f"episode: {int(ep['ticks'])} ticks (budget {max_steps}) in "
            f"{elapsed:.2f} s ({elapsed / max_steps * 1000:.2f} ms per "
            f"budget tick incl. compile)"
        )
        env.close()
        return
    total_time = 0.0
    step_count = 0
    for i in range(max_steps):
        start = time.time()
        action_seq, state_seq = solver.forward(state=state)
        total_time += time.time() - start
        step_count += 1

        state, is_goal_reached = env.step(action_seq[0])
        is_collisions = env.collision_check(state=state_seq[None])
        top_samples, top_weights = solver.get_top_samples(num_samples=300)

        if render:
            env.render(
                predicted_trajectory=state_seq,
                is_collisions=is_collisions,
                top_samples=(top_samples, top_weights),
                mode="rgb_array" if save_mode else "human",
            )
        if is_goal_reached:
            print("Goal Reached!")
            break

    print(f"average solve time: {total_time / step_count * 1000:.3f} ms")
    env.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--save-mode", action="store_true")
    parser.add_argument("--max-steps", type=int, default=500)
    parser.add_argument("--no-render", action="store_true")
    parser.add_argument("--fused", action="store_true")
    parser.add_argument("--episode", action="store_true")
    args = parser.parse_args()
    main(
        save_mode=args.save_mode,
        max_steps=args.max_steps,
        render=not args.no_render,
        fused=args.fused,
        episode=args.episode,
    )
