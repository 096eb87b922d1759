"""Goal-in-danger-zone CMDP example.

Behavioral reference: ``/root/reference/example/goal_in_danger_zone.py`` —
global seeding, MPPI at horizon 30, 3000 samples over the env's batched
``parallel_step`` / ``parallel_cost``, CMDP bookkeeping of episodic
reward and cost.
"""

import argparse
import random

import jax.numpy as jnp
import numpy as np

import os
import sys

# allow running directly from a source checkout without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mppi_playground_tpu import MPPI
from mppi_playground_tpu.envs import GoalInDangerZoneEnv


def main(save_mode: bool = False, render: bool = True, max_steps: int = None,
         episode: bool = False):
    seed = 42
    random.seed(seed)
    np.random.seed(seed)

    render_mode = "rgb_array" if save_mode else ("human" if render else None)
    env = GoalInDangerZoneEnv(render_mode=render_mode, seed=seed)

    solver = MPPI(
        horizon=30,
        num_samples=3000,
        dim_state=7,
        dim_control=2,
        dynamics=env.parallel_step,
        cost_func=env.parallel_cost,
        u_min=jnp.asarray([-1.0, -1.0]),
        u_max=jnp.asarray([1.0, 1.0]),
        sigmas=jnp.asarray([0.5, 0.5]),
        lambda_=1.0,
    )

    obs, info = env.reset(seed=seed)
    episodic_reward = 0.0
    episodic_cost = 0.0
    steps = env.max_episode_steps if max_steps is None else max_steps

    if episode:
        # --episode: all ticks in ONE dispatched program over the batched
        # model dynamics; the CMDP bookkeeping is recovered vectorized from
        # the visited states (the per-step progress reward telescopes to
        # dist(start) - dist(final), goal_in_danger_zone.py:152-157)
        if render_mode is not None:
            print("episode mode: rendering/gif export unavailable "
                  "(states stay on device)")
        import time

        start_t = time.time()
        xs, _us = solver.run_episode(
            lambda x, u: env.parallel_step(x[None], u[None])[0],
            jnp.asarray(obs, jnp.float32),
            steps,
        )
        elapsed = time.time() - start_t
        xs = np.asarray(xs)
        goal = obs[:2] + obs[3:5]
        zone = env.danger_zone
        episodic_reward = float(
            np.linalg.norm(obs[:2] - goal)
            - np.linalg.norm(xs[-1, :2] - goal)
        )
        # collisions over the post-step states x_1..x_T, like the host loop
        episodic_cost = float(
            (np.linalg.norm(xs[1:, :2] - zone.center, axis=1) < zone.radius).sum()
        )
        print(f"episode: {steps} ticks in {elapsed:.2f} s "
              f"({elapsed / steps * 1000:.2f} ms/tick incl. compile)")
        print("episodic reward: ", episodic_reward)
        print("episodic cost: ", episodic_cost)
        env.close()
        return

    for i in range(steps):
        action_seq, predicted_traj = solver.forward(
            state=jnp.asarray(obs, jnp.float32)
        )
        action = np.asarray(action_seq)[0]

        obs, reward, terminated, truncated, info = env.step(action)
        episodic_reward += reward
        episodic_cost += info["cost"]

        if render_mode is not None:
            top_samples, top_weights = solver.get_top_samples(num_samples=100)
            env.set_render_info(
                is_colllision=info["cost"] > 0.0,
                predicted_trajectory=np.asarray(predicted_traj)[:, :2],
                top_samples=(np.asarray(top_samples), np.asarray(top_weights)),
            )
            env.render()

        if truncated or terminated:
            obs, info = env.reset()

    print("episodic reward: ", episodic_reward)
    print("episodic cost: ", episodic_cost)
    # save_mode: write the captured frames as a gif, like the other envs
    env.close(path=f"video/goal_in_danger_zone_{seed}.gif" if save_mode else None)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--save-mode", action="store_true")
    parser.add_argument("--no-render", action="store_true")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--episode", action="store_true")
    args = parser.parse_args()
    main(save_mode=args.save_mode, render=not args.no_render,
         max_steps=args.max_steps, episode=args.episode)
