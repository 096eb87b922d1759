"""Racing example: MPCC contouring control on the circuit.

Behavioral reference: ``/root/reference/example/racing.py`` — the
``racing_controller`` (horizon 25, 4000 samples, sigma [0.5, 0.1],
lambda=1.0, MPCC cost) in a closed loop against ``RacingEnv`` with
reference-trajectory, top-sample and collision rendering.

Unlike the reference, the entire control tick (nearest-index search +
reference generation + solve) is one jitted program on device — see
``mppi_playground_tpu/envs/racing_controller.py``.
"""

import argparse
import time

import os
import sys

# allow running directly from a source checkout without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from mppi_playground_tpu.envs import RacingController, RacingEnv


def main(
    save_mode: bool = False,
    max_steps: int = 500,
    render: bool = True,
    debug: bool = False,
    fused: bool = False,
    episode: bool = False,
    pipelined: int = 0,
    no_compensate: bool = False,
):
    env = RacingEnv()
    from mppi_playground_tpu.ops.fused_solve import resolve_fused_request

    fused = resolve_fused_request(fused)

    if pipelined:
        # --pipelined N: drive the real-time serving mode
        # (core.closed_loop.PipelinedRunner): every tick dispatches a
        # solve from the current state, but the applied action comes from
        # the solve N ticks ago (row N of that plan unless
        # --no-compensate).  Keeps N solves in flight so the device/tunnel
        # round trip overlaps compute — bench.py measures ~5x the
        # strict-sync rate at depth 4 through a ~24 ms tunnel.  The
        # control-quality cost of the staleness is measured in
        # benchmarks/pipelined_quality.py (docs/ARCHITECTURE.md table).
        run_pipelined(
            env, depth=pipelined, compensate=not no_compensate,
            max_steps=max_steps, render=render, fused=fused,
            save_mode=save_mode,
        )
        return
    # --fused: one Pallas kernel per tick; rollouts stay implicit and the
    # top-sample overlay is regenerated from the solve's PRNG seeds
    controller = RacingController(
        env,
        store_rollouts=not fused,
        solver_backend="fused" if fused else "auto",
    )

    state = env.reset()

    if episode:
        # --episode: the whole loop in ONE dispatched program, terminating
        # on the same goal test the host loop uses (states never visit the
        # host until the episode ends)
        if render or save_mode:
            print("episode mode: rendering/gif export unavailable "
                  "(states stay on device)")
        goal, thr = env.racing_center_path[-1, :2], env.GOAL_THRESHOLD

        def done_fn(x):
            return jnp.linalg.norm(x[:2] - goal) < thr

        start = time.time()
        xs, us, ep = controller.run_episode(state, max_steps, done_fn=done_fn)
        elapsed = time.time() - start
        ticks = int(ep["ticks"])
        if bool(ep["done"]):
            print("Goal Reached!")
        # the scan always executes the full budget (done episodes freeze),
        # so per-tick time divides by max_steps, not the executed ticks
        print(
            f"episode: {ticks} ticks (budget {max_steps}) in {elapsed:.2f} s "
            f"({elapsed / max_steps * 1000:.2f} ms per budget tick incl. "
            f"compile)"
        )
        env.close()
        return
    solve_times = []
    for i in range(max_steps):
        start = time.time()
        action_seq, state_seq = controller.update(state)
        solve_times.append(time.time() - start)
        if debug:
            print(f"solve time: {round(solve_times[-1] * 1000, 2)}  [ms]")

        state, is_goal_reached = env.step(action_seq[0])
        is_collisions = env.collision_check(state=state_seq[None])
        top = controller.get_top_samples(num_samples=300)

        if render:
            env.render(
                action=action_seq[0],
                predicted_trajectory=state_seq,
                is_collisions=is_collisions,
                top_samples=top,
                reference_trajectory=controller.reference_path,
                mode="rgb_array" if save_mode else "human",
            )
        if is_goal_reached:
            print("Goal Reached!")
            break

    if solve_times:
        avg = sum(solve_times[1:]) / max(len(solve_times) - 1, 1)
        print(f"average solve time: {avg * 1000:.3f} ms")
    env.close()


def run_pipelined(env, depth, compensate, max_steps, render, fused,
                  save_mode=False):
    """Closed racing loop through :class:`PipelinedRunner` (product API)."""
    import jax
    import numpy as np

    from mppi_playground_tpu.core.closed_loop import PipelinedRunner
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.fused_solver import make_fused_solver
    from mppi_playground_tpu.core.solver import make_solver
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_mpcc_cost,
        make_racing_fused_task_from_env,
    )

    config = MPPIConfig(
        horizon=25, num_samples=4000, dim_state=4, dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.1), lambda_=1.0, store_rollouts=False,
    )
    if fused:
        solver = make_fused_solver(
            config, make_racing_fused_task_from_env(env), env.dynamics
        )
    else:
        solver = make_solver(
            config,
            env.dynamics,
            make_mpcc_cost(env.obstacle_cost_map, env.lane_cost_map),
        )
    runner = PipelinedRunner(solver, depth=depth, compensate=compensate)

    path = env.racing_center_path
    calc_ref = jax.jit(
        lambda x, cind: calc_ref_trajectory(x, path, cind, config.horizon)
    )
    state = env.reset()
    cind = jnp.asarray(0, jnp.int32)
    tick_times = []
    for i in range(max_steps):
        xref, cind = calc_ref(jnp.asarray(state), cind)
        start = time.time()
        u = runner.step(
            jnp.asarray(state), info={"reference_path": xref}
        )
        tick_times.append(time.time() - start)
        state, is_goal_reached = env.step(jnp.asarray(u))
        if render:
            env.render(
                action=jnp.asarray(u),
                reference_trajectory=np.asarray(xref),
                mode="rgb_array" if save_mode else "human",
            )
        if is_goal_reached:
            print("Goal Reached!")
            break
    if len(tick_times) > depth:
        steady = tick_times[depth + 1:] or tick_times
        avg = sum(steady) / len(steady)
        print(
            f"pipelined depth={depth} compensate={compensate}: "
            f"{len(tick_times)} ticks, avg step {avg * 1000:.3f} ms "
            f"(dispatch + stale-action read; excludes env/render)"
        )
    env.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--save-mode", action="store_true")
    parser.add_argument("--max-steps", type=int, default=500)
    parser.add_argument("--no-render", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--fused", action="store_true")
    parser.add_argument("--episode", action="store_true")
    parser.add_argument(
        "--pipelined", type=int, default=0, metavar="DEPTH",
        help="real-time serving demo: keep DEPTH solves in flight "
        "(PipelinedRunner); 0 = classic strict loop",
    )
    parser.add_argument(
        "--no-compensate", action="store_true",
        help="with --pipelined: apply the stale plan's row 0 instead of "
        "its row DEPTH (no receding-horizon delay compensation)",
    )
    args = parser.parse_args()
    main(
        save_mode=args.save_mode,
        max_steps=args.max_steps,
        render=not args.no_render,
        debug=args.debug,
        fused=args.fused,
        episode=args.episode,
        pipelined=args.pipelined,
        no_compensate=args.no_compensate,
    )
