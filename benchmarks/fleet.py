"""Fleet-episode throughput: B racing episodes x N ticks in ONE program.

The simulation-farm serving mode (``core.closed_loop.make_fleet_closed_loop``
over ``parallel.make_batched_fused_solver``): policy evaluation / data
generation for fleets of independent control problems, paying the dispatch
cost once per fleet-episode instead of once per tick per problem.  The
workload is the reference racing task (T=25, K=4000, sigma [0.5, 0.1],
lambda 1.0 — example/racing.py:24-35) with per-scenario on-device
reference-trajectory generation threaded through ``batched_info``.

Run: python benchmarks/fleet.py [--batch 8] [--ticks 50]
Prints one JSON line with total solves/s across the fleet.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

from mppi_playground_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ticks", type=int, default=50)
    ap.add_argument("--samples", type=int, default=4096)
    ap.add_argument("--horizon", type=int, default=25)
    args = ap.parse_args()

    from mppi_playground_tpu.core.closed_loop import make_fleet_closed_loop
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_racing_fused_task_from_env,
    )
    from mppi_playground_tpu.parallel import make_mesh
    from mppi_playground_tpu.parallel.sharded import make_batched_fused_solver

    B, ticks = args.batch, args.ticks
    env = RacingEnv()
    path = env.racing_center_path
    if B > len(path):
        raise SystemExit(
            f"--batch {B} exceeds the circuit path length ({len(path)}): "
            f"the per-episode staggering below needs one start point per "
            f"episode"
        )
    config = MPPIConfig(
        horizon=args.horizon, num_samples=args.samples, dim_state=4,
        dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.1), lambda_=1.0, store_rollouts=False,
    )
    task = make_racing_fused_task_from_env(env)
    mesh = make_mesh(mesh_shape=(1, 1), devices=jax.devices()[:1])
    batched = make_batched_fused_solver(
        config, task, env.dynamics, mesh, batch_size=B,
        jit=False, donate_state=False,
    )

    ref_one = lambda x, c: calc_ref_trajectory(x, path, c, args.horizon)

    def info_fn(cinds, xs):
        xrefs, new_cinds = jax.vmap(ref_one)(xs, cinds)
        return {"reference_path": xrefs}, new_cinds

    run = make_fleet_closed_loop(batched, env.dynamics, ticks, info_fn=info_fn)

    x0 = env.reset()
    # stagger the fleet along the first path points so episodes differ
    starts = jnp.asarray(path[:: max(1, len(path) // B)][:B, :])
    x0s = jnp.stack(
        [x0.at[0].set(starts[b, 0]).at[1].set(starts[b, 1]).at[2].set(starts[b, 2])
         for b in range(B)]
    )
    states = batched.init_batch()
    cinds = (jnp.arange(B, dtype=jnp.int32) * (len(path) // B)).astype(jnp.int32)

    out = run(states, x0s, cinds)  # compile
    jax.block_until_ready(out[1])

    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            out = run(states, x0s, cinds)
        jax.block_until_ready(out[1])
        rates.append(3 * B * ticks / (time.perf_counter() - t0))
    rate = sorted(rates)[1]
    print(
        json.dumps(
            {
                "metric": f"fleet_racing_solves_per_s_b{B}_h{args.horizon}_k{args.samples}",
                "value": round(rate, 1),
                "unit": "solves/s (total across fleet)",
                "extra": {
                    "batch": B,
                    "ticks_per_episode": ticks,
                    "rollouts_per_s": round(rate * args.samples),
                    "per_problem_solve_us": round(1e6 / rate * B, 1),
                    "device": str(jax.devices()[0]),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
