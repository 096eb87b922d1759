"""Tile-height sweep for the fused flagship kernel.

The rollout inside each grid step is a serial dependency chain (50
dependent dynamics steps); with a single [8, 128] vreg per state
component the VPU pipeline latency is exposed.  This sweeps
``tile_sublanes`` (8 -> one vreg, 16/32/64 -> 2/4/8 interleavable chains)
on the real flagship workload and reports full-kernel time per height.

Run:  python benchmarks/tile_height.py
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

from mppi_playground_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

WINDOWS = 5
ITERS = 30
HORIZON = 50
SAMPLES = 100_000


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        rates.append((time.perf_counter() - t0) / ITERS)
    return statistics.median(rates) * 1e3


def main() -> None:
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_racing_fused_task_from_env,
    )
    from mppi_playground_tpu.ops.fused_solve import make_fused_solve

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
    cind = jnp.asarray(0, jnp.int32)
    xref, _ = jax.jit(lambda x, c: calc_ref_trajectory(x, path, c, HORIZON))(
        x0, cind
    )
    smem = task.smem_builder({"reference_path": xref})
    lam = jnp.asarray(1.0, jnp.float32)
    seed = jnp.asarray(1234, jnp.int32)
    prev = jnp.zeros((HORIZON, 2), jnp.float32)

    results = {}
    for s in (8, 16, 32):
        try:
            core = make_fused_solve(config, task, tile_sublanes=s)
            fn = jax.jit(
                lambda x, p, sd, core=core: core.run_kernel(x, p, lam, sd, smem)
            )
            ms = _time(fn, x0, prev, seed)
        except Exception as exc:  # noqa: BLE001 — sweep survives OOM etc.
            results[f"s{s}"] = f"failed: {type(exc).__name__}"
            continue
        results[f"s{s}"] = round(ms, 4)
        print(json.dumps({"metric": f"tile_height_s{s}_ms", "value": results[f's{s}'],
                          "unit": "ms", "vs_baseline": None, "extra": {}}))

    print(json.dumps({
        "metric": "tile_height_summary", "value": results.get("s8"),
        "unit": "ms", "vs_baseline": None,
        "extra": {"device": str(jax.devices()[0]), **results},
    }))


if __name__ == "__main__":
    main()
