"""Device-side kernel fraction of the flagship tick, measured by scans.

Isolated single-dispatch timings through the device tunnel are dominated
by per-dispatch host marshaling (measured: a 50-tick amortized episode
runs at ~1.1 ms/tick while a lone kernel dispatch 'measures' ~1.7 ms), so
this harness times every component as an N-iteration ``lax.scan`` inside
ONE dispatched program — pure device time, host cost amortized to zero:

* kernel-only scan      -> t_kernel
* full-tick scan        -> t_tick   (calc_ref + solve + warm start + plant)
* ESSPS full-tick scan  -> t_tick_essps

and reports kernel fraction, the serial tail, and the ESSPS overhead.

Run:  python benchmarks/kernel_fraction.py  (prints one JSON line per row)
"""

from __future__ import annotations

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
        "metric": f"kernel_fraction_{name}_ms", "value": round(ms, 4),
        "unit": "ms", "vs_baseline": None, "extra": extra,
    }))


def main() -> None:
    import dataclasses

    from mppi_playground_tpu.core.closed_loop import make_closed_loop
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.fused_solver import make_fused_solver
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_racing_fused_task_from_env,
    )
    from mppi_playground_tpu.ops.fused_solve import make_fused_solve
    from mppi_playground_tpu.workloads import build_flagship

    env = RacingEnv()
    config = MPPIConfig(
        horizon=HORIZON, num_samples=SAMPLES, dim_state=4, dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.1), lambda_=1.0, store_rollouts=False,
    )
    task = make_racing_fused_task_from_env(env)
    core = make_fused_solve(config, task)

    x0 = env.reset()
    path = env.racing_center_path
    xref, _ = jax.jit(
        lambda x: calc_ref_trajectory(x, path, jnp.asarray(0, jnp.int32), HORIZON)
    )(x0)
    smem = task.smem_builder({"reference_path": xref})
    lam = jnp.asarray(1.0, jnp.float32)
    prev = jnp.zeros((HORIZON, 2), jnp.float32)

    # --- kernel-only scan: SCAN_N kernel launches in one program, each
    # consuming the previous costs so nothing is DCE'd or reordered ---
    def kernel_scan(x, p, seed0):
        def body(carry, _):
            seed, acc = carry
            costs, stats, numer = core.run_kernel(x, p, lam, seed, smem)
            return (seed + 1 + (costs[0] > 1e30).astype(jnp.int32),
                    acc + stats[0, 0]), None

        (seed, acc), _ = lax.scan(body, (seed0, 0.0), None, length=SCAN_N)
        return acc

    t_kernel = _time(jax.jit(kernel_scan), x0, prev, jnp.asarray(7, jnp.int32))
    _report("kernel_scan", t_kernel, scan_n=SCAN_N)

    # --- full-tick scans (closed loop: calc_ref + solve + epilogue + plant)
    def episode_ms(lambda_):
        cfg = dataclasses.replace(config, lambda_=lambda_)
        solver = make_fused_solver(cfg, task, env.dynamics, jit=False)

        def info_fn(cind, x):
            ref, new_cind = calc_ref_trajectory(x, path, cind, HORIZON)
            return {"reference_path": ref}, new_cind

        run = make_closed_loop(
            solver, lambda x, u: env.dynamics(x[None], u[None])[0],
            SCAN_N, info_fn=info_fn,
        )
        st = solver.init()
        cind = jnp.asarray(0, jnp.int32)
        return _time(lambda s, x, c: run(s, x, c)[1], st, x0, cind)

    t_tick = episode_ms(1.0)
    _report("tick_scan_fixed", t_tick)
    t_essps = episode_ms("ESSPS")
    _report("tick_scan_essps", t_essps,
            overhead_vs_fixed_pct=round(100 * (t_essps - t_tick) / t_tick, 2))

    fraction = t_kernel / t_tick
    print(json.dumps({
        "metric": "flagship_kernel_fraction",
        "value": round(fraction, 4),
        "unit": "fraction",
        "vs_baseline": None,
        "extra": {
            "kernel_ms": round(t_kernel, 4),
            "tick_ms": round(t_tick, 4),
            "essps_tick_ms": round(t_essps, 4),
            "serial_tail_ms": round(t_tick - t_kernel, 4),
            "device": str(jax.devices()[0]),
            "workload": f"racing MPCC, T={HORIZON}, K={SAMPLES}, fused",
            "method": "N=50 lax.scan per component inside one dispatch — "
            "device time only (isolated dispatches are host-marshaling "
            "bound through the tunnel)",
        },
    }))


if __name__ == "__main__":
    main()
