"""Flagship auto-lambda benchmark: fixed vs MPO vs LBPS vs ESSPS.

Measures the full racing MPCC control tick (T=50, K=100k, fused) under
every temperature mode as N-iteration ``lax.scan``s inside one dispatched
program — pure device time, drift-proof through the tunnel (isolated
dispatches are host-marshaling bound; docs/ARCHITECTURE.md).  Reports the
overhead of each auto-lambda mode over fixed lambda, plus a phase
breakdown of the two-phase LBPS/ESSPS split:

* phase 1  — ``costs_only`` kernel + clamped-perturbation dump
* search   — the VMEM-resident lambda kernel (``ops/lambda_search.py``)
* phase 2  — ``weighted_only`` kernel reading the 40 MB dump back

The phase-2 read-back is HBM-bound: T*m*K*4 = 40 MB at ~819 GB/s is
~49 us — the structural floor of any exact two-phase schedule that
materializes the perturbations once.

Run:  python benchmarks/autolambda_flagship.py   (TPU; one JSON line/row)
"""

from __future__ import annotations

import dataclasses
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from mppi_playground_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

HORIZON = 50
SAMPLES = 100_000
SCAN_N = 50
REPS = 3
WINDOWS = 5


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        jax.block_until_ready(out)
        rates.append((time.perf_counter() - t0) / (REPS * SCAN_N))
    return statistics.median(rates) * 1e3


def _report(name, ms, **extra):
    print(json.dumps({
        "metric": name, "value": round(ms, 4), "unit": "ms",
        "vs_baseline": None, "extra": extra,
    }))


def main() -> None:
    from mppi_playground_tpu.core.closed_loop import make_closed_loop
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.fused_solver import make_fused_solver
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_racing_fused_task_from_env,
    )
    from mppi_playground_tpu.ops.fused_solve import make_fused_solve
    from mppi_playground_tpu.ops.lambda_search import essps_lambda_fused

    env = RacingEnv()
    config = MPPIConfig(
        horizon=HORIZON, num_samples=SAMPLES, dim_state=4, dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.1), lambda_=1.0, store_rollouts=False,
    )
    task = make_racing_fused_task_from_env(env)
    x0 = env.reset()
    path = env.racing_center_path

    def info_fn(cind, x):
        ref, new_cind = calc_ref_trajectory(x, path, cind, HORIZON)
        return {"reference_path": ref}, new_cind

    # --- full-tick scans per lambda mode (closed loop: calc_ref + solve +
    # epilogue + plant).  All four modes compile first, then their timing
    # windows INTERLEAVE round-robin: even scanned dispatches drift a few
    # percent across minutes on this backend, and the mode overheads are
    # differences of that order — interleaving puts every mode in every
    # drift regime so the medians compare cleanly.
    def make_tick(lambda_):
        cfg = dataclasses.replace(config, lambda_=lambda_)
        solver = make_fused_solver(cfg, task, env.dynamics, jit=False)
        run = make_closed_loop(
            solver, lambda x, u: env.dynamics(x[None], u[None])[0],
            SCAN_N, info_fn=info_fn,
        )
        st = solver.init()
        cind = jnp.asarray(0, jnp.int32)
        fn = jax.jit(lambda s, x, c: run(s, x, c)[1])
        jax.block_until_ready(fn(st, x0, cind))  # compile + warm
        return lambda: fn(st, x0, cind)

    modes = ["fixed", "MPO", "LBPS", "ESSPS"]
    ticks = {m: make_tick(1.0 if m == "fixed" else m) for m in modes}
    samples = {m: [] for m in modes}
    for _ in range(WINDOWS):
        for m in modes:  # round-robin: one window per mode per sweep
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = ticks[m]()
            jax.block_until_ready(out)
            samples[m].append(
                (time.perf_counter() - t0) / (REPS * SCAN_N) * 1e3
            )
    t_fixed = statistics.median(samples["fixed"])
    _report("flagship_tick_fixed_ms", t_fixed, scan_n=SCAN_N,
            windows=[round(s, 4) for s in samples["fixed"]])
    rows = {}
    for mode in ("MPO", "LBPS", "ESSPS"):
        t = statistics.median(samples[mode])
        pct = 100.0 * (t - t_fixed) / t_fixed
        rows[mode] = (t, pct)
        _report(
            f"flagship_tick_{mode.lower()}_ms", t,
            overhead_vs_fixed_pct=round(pct, 2),
            overhead_abs_ms=round(t - t_fixed, 4),
            windows=[round(s, 4) for s in samples[mode]],
        )

    # --- ESSPS phase breakdown: scan each phase alone ---
    core = make_fused_solve(config, task)
    xref, _ = jax.jit(
        lambda x: calc_ref_trajectory(x, path, jnp.asarray(0, jnp.int32),
                                      HORIZON)
    )(x0)
    smem = task.smem_builder({"reference_path": xref})
    lam = jnp.asarray(1.0, jnp.float32)
    prev = jnp.zeros((HORIZON, 2), jnp.float32)

    def phase1_scan(x, p, seed0):
        def body(carry, _):
            sd, acc = carry
            costs, pert = core.run_kernel(
                x, p, lam, sd, smem, dump_pert=True, costs_only=True
            )
            return (sd + 1 + (costs[0] > 1e30).astype(jnp.int32),
                    acc + costs[0] + pert[0, 0, 0]), None
        (sd, acc), _ = lax.scan(body, (seed0, 0.0), None, length=SCAN_N)
        return acc

    def full_scan(x, p, seed0):
        def body(carry, _):
            sd, acc = carry
            costs, stats, numer = core.run_kernel(x, p, lam, sd, smem)
            return (sd + 1 + (costs[0] > 1e30).astype(jnp.int32),
                    acc + stats[0, 0]), None
        (sd, acc), _ = lax.scan(body, (seed0, 0.0), None, length=SCAN_N)
        return acc

    # phase 1 + search + phase 2 chained, like the real two-phase solve
    def two_phase_scan(x, p, seed0):
        def body(carry, _):
            sd, acc = carry
            costs, pert = core.run_kernel(
                x, p, lam, sd, smem, dump_pert=True, costs_only=True
            )
            lam_star = essps_lambda_fused(
                costs, config.target_ess, config.lambda_min,
                config.lambda_max, iters=config.essps_iters,
            )
            stats, numer = core.run_weighted(p, lam_star, sd, costs,
                                             pert=pert)
            return (sd + 1 + (costs[0] > 1e30).astype(jnp.int32),
                    acc + stats[0, 0] + lam_star), None
        (sd, acc), _ = lax.scan(body, (seed0, 0.0), None, length=SCAN_N)
        return acc

    # search-only: same costs each iteration (VMEM-resident kernel)
    def search_scan(costs, n0):
        def body(carry, _):
            acc, = carry
            lam_star = essps_lambda_fused(
                costs + acc * 0.0, config.target_ess, config.lambda_min,
                config.lambda_max, iters=config.essps_iters,
            )
            return (acc + lam_star,), None
        (acc,), _ = lax.scan(body, (n0,), None, length=SCAN_N)
        return acc

    seed = jnp.asarray(7, jnp.int32)
    t_full = _time(jax.jit(full_scan), x0, prev, seed)
    t_p1 = _time(jax.jit(phase1_scan), x0, prev, seed)
    t_2ph = _time(jax.jit(two_phase_scan), x0, prev, seed)
    costs0, = jax.jit(
        lambda x, p, sd: core.run_kernel(x, p, lam, sd, smem, costs_only=True)
    )(x0, prev, seed)
    t_search = _time(jax.jit(search_scan), costs0, jnp.asarray(0.0))

    print(json.dumps({
        "metric": "flagship_essps_phase_breakdown",
        "value": round(t_2ph - t_full, 4),
        "unit": "ms (two-phase kernel overhead vs single-pass fixed)",
        "vs_baseline": None,
        "extra": {
            "full_single_pass_ms": round(t_full, 4),
            "phase1_costs_dump_ms": round(t_p1, 4),
            # standalone upper bound: the harness's per-iteration [K]
            # cost perturbation + re-pad rides HBM, so this OVERSTATES
            # the in-flow search (two_phase - phase1 bounds search+phase2
            # together and is much smaller)
            "lambda_search_standalone_upper_ms": round(t_search, 4),
            "two_phase_total_ms": round(t_2ph, 4),
            "search_plus_phase2_ms": round(t_2ph - t_p1, 4),
            "hbm_floor_phase2_ms": round(
                HORIZON * 2 * SAMPLES * 4 / 819e9 * 1e3, 4
            ),
            "tick_fixed_ms": round(t_fixed, 4),
            "tick_overheads_pct": {
                m: round(p, 2) for m, (_, p) in rows.items()
            },
            "device": str(jax.devices()[0]),
            "method": f"N={SCAN_N} lax.scan inside one dispatch",
        },
    }))


if __name__ == "__main__":
    main()
