"""Per-iteration cost of the VMEM-resident lambda-search kernels.

Differencing harness for the auto-lambda floor accounting
(docs/ARCHITECTURE.md): times ``essps_lambda_fused`` /
``lbps_lambda_fused`` at K=100k with N and 2N iterations as chained
dispatches (each search's input is perturbed by the previous lambda so
XLA cannot hoist or CSE the calls), so

    per_iteration_us = (t_2N - t_N) / N

isolates the search loop body from launch/pad/readback overhead.  The
round-5 measurement: after the chunked-reduction + simplified-objective
work the per-iteration cost is below the per-dispatch noise floor
(<~0.1 us/iter — the 32-iteration LBPS search is <1% of the flagship
tick); before it, the whole-block bodies measured ~1.2 us/iter through
the flagship epilogue (32-vs-64-iteration tick differencing).

Run:  python benchmarks/lambda_iter_cost.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mppi_playground_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

K = 100_000
N_DISPATCH = 100


def _time_chained(fn) -> float:
    """ms per dispatch over N_DISPATCH serially-dependent dispatches."""
    lam = jnp.float32(1.0)
    lam = fn(lam)
    lam.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(N_DISPATCH):
        lam = fn(lam)
    lam.block_until_ready()
    return (time.perf_counter() - t0) / N_DISPATCH * 1e3


def main() -> None:
    from mppi_playground_tpu.ops.lambda_search import (
        essps_lambda_fused,
        lbps_lambda_fused,
    )

    rng = np.random.default_rng(7)
    costs = jnp.asarray(rng.uniform(0.0, 50.0, (K,)), jnp.float32)

    for name, make, iters in (
        ("essps",
         lambda it: jax.jit(lambda lam: essps_lambda_fused(
             costs + lam * 1e-12, 5000.0, 0.01, 100.0, iters=it)), 40),
        ("lbps",
         lambda it: jax.jit(lambda lam: lbps_lambda_fused(
             costs + lam * 1e-12, 0.01, 0.01, 100.0, iters=it)), 32),
    ):
        t1 = _time_chained(make(iters))
        t2 = _time_chained(make(2 * iters))
        per_iter_us = (t2 - t1) / iters * 1e3
        print(json.dumps({
            "metric": f"lambda_iter_cost_{name}",
            "value": round(per_iter_us, 4),
            "unit": "us/iteration",
            "vs_baseline": None,
            "extra": {
                "ms_per_dispatch_at_iters": round(t1, 4),
                "ms_per_dispatch_at_2x_iters": round(t2, 4),
                "iters": iters, "K": K,
                "note": "dispatch-pipelined chained calls; differencing "
                "isolates the loop body, but values below ~0.1 us/iter "
                "are within the per-dispatch noise floor",
                "device": str(jax.devices()[0]),
            },
        }), flush=True)


if __name__ == "__main__":
    main()
