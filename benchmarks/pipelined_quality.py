"""Control-quality cost of pipelined (stale-action) serving.

``bench.py`` measures the pipelined mode's THROUGHPUT (5x the strict-sync
rate through a ~24 ms tunnel); this harness measures what that throughput
costs in CONTROL QUALITY: closed-loop episodes through the exact
:class:`PipelinedRunner` staleness semantics
(``core.closed_loop.make_pipelined_closed_loop`` — bit-equality with the
host runner asserted in tests/test_pipelined_quality.py) at depth 0
(strict sync) / 1 / 2 / 4, with and without receding-horizon delay
compensation.

Workloads (reference closed loops, `/root/reference/example/racing.py:221-266`
and `navigation2d.py:26-64`):

* racing — MPCC at T=25, K=4000 (fused on TPU): progress (final path
  index), goal ticks, collision/off-lane tick counts, mean speed.
* navigation2d — T=30, K=3000: goal-reached tick, cumulative stage cost,
  collision ticks.

Run:  python benchmarks/pipelined_quality.py [--ticks 400]
Appends one JSON line per (workload, depth, compensate) to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mppi_playground_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

DEPTHS = ((0, True), (1, True), (1, False), (2, True), (2, False),
          (4, True), (4, False))
SEEDS = (42, 7, 1234)


def _report(workload, depth, compensate, **metrics):
    print(json.dumps({
        "metric": f"pipelined_quality_{workload}",
        "value": metrics.get("progress", metrics.get("cost")),
        "unit": "progress" if "progress" in metrics else "episode cost",
        "vs_baseline": None,
        "extra": {
            "depth": depth, "compensate": compensate,
            "device": str(jax.devices()[0]), **metrics,
        },
    }), flush=True)


def run_racing(ticks: int) -> None:
    from mppi_playground_tpu.core.closed_loop import (
        make_pipelined_closed_loop,
    )
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.fused_solver import make_fused_solver
    from mppi_playground_tpu.core.solver import make_solver
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_mpcc_cost,
        make_racing_fused_task_from_env,
    )
    from mppi_playground_tpu.ops.fused_solve import (
        fused_envelope,
        fused_supported,
    )

    env = RacingEnv()
    config = MPPIConfig(
        horizon=25, num_samples=4000, dim_state=4, dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.1), lambda_=1.0, store_rollouts=False,
    )
    if fused_supported() and fused_envelope(config):
        task = make_racing_fused_task_from_env(env)
        solver = make_fused_solver(config, task, env.dynamics, jit=False)
    else:
        cost_fn = make_mpcc_cost(env.obstacle_cost_map, env.lane_cost_map)
        solver = make_solver(config, env.dynamics, cost_fn, jit=False)

    path = env.racing_center_path
    goal = path[-1, :2]

    def info_fn(cind, x):
        xref, new_cind = calc_ref_trajectory(
            x, path, cind, config.horizon, DL=float(env.dl),
            v_max=float(env.V_MAX),
        )
        return {"reference_path": xref}, new_cind

    def plant(x, u):
        return env.dynamics(x[None], u[None])[0]

    x0 = env.reset()
    obstacle = env.obstacle_cost_map
    lane = env.lane_cost_map
    from mppi_playground_tpu.maps.grid_cost import map_query

    @jax.jit
    def episode_metrics(xs, cind):
        pos = xs[:, :2]
        collisions = jnp.sum(map_query(obstacle, pos) > 0.5)
        off_lane = jnp.sum(map_query(lane, pos) > 0.5)
        dist_goal = jnp.linalg.norm(pos - goal, axis=1)
        reached = dist_goal < env.GOAL_THRESHOLD
        goal_tick = jnp.where(
            jnp.any(reached), jnp.argmax(reached), jnp.int32(-1)
        )
        return (
            cind, collisions, off_lane, jnp.mean(xs[:, 3]), goal_tick
        )

    for depth, comp in DEPTHS:
        if depth == 0 and not comp:
            continue
        run = make_pipelined_closed_loop(
            solver, plant, ticks, depth, compensate=comp, info_fn=info_fn
        )
        # the compiled runner is seed-independent: episodes across seeds
        # cost one run each, so the reported metrics are seed-averaged
        per_seed = []
        for seed in SEEDS:
            st = solver.init(seed=seed)
            _, xf, xs, us, cind = run(st, x0, jnp.asarray(0, jnp.int32))
            per_seed.append([float(v) for v in jax.device_get(
                episode_metrics(xs, cind))])
        mean = [sum(col) / len(col) for col in zip(*per_seed)]
        goal_ticks = [row[4] for row in per_seed]
        _report(
            "racing", depth, comp,
            progress=round(mean[0], 1), collision_ticks=round(mean[1], 1),
            off_lane_ticks=round(mean[2], 1),
            mean_speed=round(mean[3], 3),
            goal_ticks_per_seed=[int(g) for g in goal_ticks],
            seeds=list(SEEDS), ticks=ticks,
            workload_detail="racing MPCC T=25 K=4000",
        )


def run_navigation(ticks: int) -> None:
    from mppi_playground_tpu.core.closed_loop import (
        make_pipelined_closed_loop,
    )
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.fused_solver import make_fused_solver
    from mppi_playground_tpu.core.solver import make_solver
    from mppi_playground_tpu.envs.navigation_2d import Navigation2DEnv
    from mppi_playground_tpu.maps.grid_cost import map_query
    from mppi_playground_tpu.ops.fused_solve import (
        fused_envelope,
        fused_supported,
    )

    env = Navigation2DEnv()
    config = MPPIConfig(
        horizon=30, num_samples=3000, dim_state=3, dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.5), lambda_=1.0, store_rollouts=False,
    )
    if fused_supported() and fused_envelope(config):
        solver = make_fused_solver(
            config, env.fused_task(), env.dynamics, jit=False
        )
    else:
        solver = make_solver(
            config, env.dynamics, env.cost_function, jit=False
        )

    def plant(x, u):
        return env.dynamics(x[None], u[None])[0]

    x0 = env.reset()
    goal = env.goal_pos
    obstacle = env.obstacle_cost_map

    @jax.jit
    def episode_metrics(xs):
        pos = xs[:, :2]
        collisions = jnp.sum(map_query(obstacle, pos) > 0.5)
        dist = jnp.linalg.norm(pos - goal, axis=1)
        reached = dist < env.GOAL_THRESHOLD
        goal_tick = jnp.where(
            jnp.any(reached), jnp.argmax(reached), jnp.int32(-1)
        )
        cost = jnp.sum(dist**2)
        return collisions, goal_tick, cost, jnp.min(dist)

    for depth, comp in DEPTHS:
        if depth == 0 and not comp:
            continue
        run = make_pipelined_closed_loop(
            solver, plant, ticks, depth, compensate=comp
        )
        per_seed = []
        for seed in SEEDS:
            st = solver.init(seed=seed)
            _, xf, xs, us, _ = run(st, x0)
            per_seed.append([float(v) for v in jax.device_get(
                episode_metrics(xs))])
        mean = [sum(col) / len(col) for col in zip(*per_seed)]
        goal_ticks = [int(row[1]) for row in per_seed]
        _report(
            "navigation2d", depth, comp,
            cost=round(mean[2], 1), collision_ticks=round(mean[0], 1),
            goal_ticks_per_seed=goal_ticks,
            min_goal_dist=round(mean[3], 3),
            seeds=list(SEEDS), ticks=ticks,
            workload_detail="navigation2d T=30 K=3000",
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=400)
    ap.add_argument("--nav-ticks", type=int, default=200)
    args = ap.parse_args()
    run_racing(args.ticks)
    run_navigation(args.nav_ticks)


if __name__ == "__main__":
    main()
