"""Flagship benchmark: racing MPCC solve at horizon 50, 100k samples.

Measures end-to-end solves/s of the full control tick (on-device
reference-trajectory generation + sampling + fused rollout/cost over the
obstacle+lane maps + softmin weighted update + warm-start state update) on
the available accelerator, the workload named by BASELINE.json's
north-star ("racing at horizon 50, 100k samples, >=100 solves/s on a v5p
slice").

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
reports against the 100 solves/s north-star target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

HORIZON = 50
NUM_SAMPLES = 100_000
TARGET_SOLVES_PER_S = 100.0  # BASELINE.json north star
WARMUP = 3
ITERS = 30


def build():
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.fused_solver import make_fused_solver
    from mppi_playground_tpu.core.solver import make_solver
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_mpcc_cost,
        make_racing_fused_task,
    )
    from mppi_playground_tpu.ops.fused_solve import fused_supported

    env = RacingEnv()
    config = MPPIConfig(
        horizon=HORIZON,
        num_samples=NUM_SAMPLES,
        dim_state=4,
        dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.1),
        lambda_=1.0,
        store_rollouts=False,  # production serving config: rollouts implicit
    )
    if fused_supported():
        # one Pallas kernel per tick (ops/fused_solve.py)
        task = make_racing_fused_task(
            env.obstacle_map.row_interval_table,
            env.lane_map.row_interval_table,
            x_lim=tuple(env.obstacle_map.x_lim),
            y_lim=tuple(env.obstacle_map.y_lim),
        )
        solver = make_fused_solver(config, task, env.dynamics, jit=False)
    else:
        cost_fn = make_mpcc_cost(env.obstacle_cost_map, env.lane_cost_map)
        solver = make_solver(config, env.dynamics, cost_fn, jit=False)
    path = env.racing_center_path

    def tick(solver_state, cind, x):
        xref, new_cind = calc_ref_trajectory(x, path, cind, HORIZON)
        result = solver.solve(solver_state, x, info={"reference_path": xref})
        return result.action_seq, result.state, new_cind

    tick = jax.jit(tick, donate_argnums=(0,))
    return env, solver, tick


def main() -> None:
    env, solver, tick = build()
    x = env.reset()
    state = solver.init()
    cind = jnp.asarray(0, jnp.int32)

    # warmup (compile + steady state)
    for _ in range(WARMUP):
        action_seq, state, cind = tick(state, cind, x)
    jax.block_until_ready(action_seq)

    start = time.perf_counter()
    for _ in range(ITERS):
        action_seq, state, cind = tick(state, cind, x)
    jax.block_until_ready(action_seq)
    elapsed = time.perf_counter() - start

    solves_per_s = ITERS / elapsed
    rollouts_per_s = solves_per_s * NUM_SAMPLES
    result = {
        "metric": f"racing_mppi_solves_per_s_h{HORIZON}_k{NUM_SAMPLES}",
        "value": round(solves_per_s, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / TARGET_SOLVES_PER_S, 4),
        "extra": {
            "rollouts_per_s": round(rollouts_per_s),
            "solve_ms": round(1000.0 * elapsed / ITERS, 3),
            "device": str(jax.devices()[0]),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
