"""Per-iteration cost of the VMEM-resident lambda-search kernels.

Differencing harness for round-5 verdict item 4 (LBPS costs 7.8% of the
flagship tick vs ESSPS 5.1%): times ``essps_lambda_fused`` /
``lbps_lambda_fused`` at K=100k with N and 2N iterations inside a
serialized scan (one dispatch), so

    per_iteration_ms = (t_2N - t_N) / N

isolates the search loop body from launch/pad/readback overhead.  The
audit's issue-count model (benchmarks/cycle_audit.py, ~600-800 vreg-ops
per iteration) prices an iteration at ~0.2 us if issue-bound; a measured
per-iteration cost several times that means the loop is bound by block
streaming / reduction latency instead, which is what a body restructure
can attack.

Run:  python benchmarks/lambda_iter_cost.py
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
import numpy as np
from jax import lax

from mppi_playground_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

K = 100_000
SCAN_N = 50


def _time(fn, *args) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / (3 * SCAN_N))
    return statistics.median(ts) * 1e3


def _scanned(search_fn):
    # serialize: each iteration's costs are perturbed by the previous
    # lambda so the search cannot be hoisted out of the scan
    def run(costs):
        def body(carry, _):
            lam_prev, acc = carry
            lam = search_fn(costs + lam_prev * 1e-12)
            return (lam, acc + lam), None

        (lam, acc), _ = lax.scan(
            body, (jnp.float32(1.0), jnp.float32(0.0)), None, length=SCAN_N
        )
        return acc

    return jax.jit(run)


def main() -> None:
    from mppi_playground_tpu.ops.lambda_search import (
        essps_lambda_fused,
        lbps_lambda_fused,
    )

    rng = np.random.default_rng(7)
    costs = jnp.asarray(rng.uniform(0.0, 50.0, (K,)), jnp.float32)

    rows = {}
    for name, fn, iters in (
        ("essps", lambda c, it: essps_lambda_fused(
            c, 5000.0, 0.01, 100.0, iters=it), 40),
        ("lbps", lambda c, it: lbps_lambda_fused(
            c, 0.01, 0.01, 100.0, iters=it), 32),
    ):
        t1 = _time(_scanned(lambda c, f=fn, it=iters: f(c, it)), costs)
        t2 = _time(_scanned(lambda c, f=fn, it=iters: f(c, 2 * it)), costs)
        per_iter = (t2 - t1) / iters
        rows[name] = {
            "kernel_ms_at_iters": round(t1, 4),
            "kernel_ms_at_2x_iters": round(t2, 4),
            "iters": iters,
            "per_iteration_us": round(per_iter * 1e3, 3),
            "launch_overhead_ms": round(t1 - per_iter * iters, 4),
        }
        print(json.dumps({
            "metric": f"lambda_iter_cost_{name}",
            "value": rows[name]["per_iteration_us"],
            "unit": "us/iteration",
            "vs_baseline": None,
            "extra": {**rows[name], "K": K,
                      "device": str(jax.devices()[0])},
        }), flush=True)


if __name__ == "__main__":
    main()
