"""Device sanity check: accelerator present and numerically sane.

The reference ships ``tests/test_torch.py`` (a CPU-vs-GPU matmul timing
and allclose check) as its environment smoke test; this is the JAX/TPU
equivalent.  Prints one JSON line with the measured speedup.

Run:  python benchmarks/device_sanity.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n: int = 4096):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = rng.normal(size=(n, n)).astype(np.float32)
    b = rng.normal(size=(n, n)).astype(np.float32)

    expected = a @ b  # warmup: BLAS thread-pool spin-up / page-in
    t0 = time.perf_counter()
    for _ in range(3):  # averaged like the device side, for a fair ratio
        expected = a @ b
    cpu_s = (time.perf_counter() - t0) / 3

    # TPUs default f32 matmuls to bfloat16 passes; the numerics check
    # needs true f32 (the timing reflects the same HIGHEST-precision path)
    f = jax.jit(lambda x, y: jnp.matmul(x, y, precision=jax.lax.Precision.HIGHEST))
    # transfer once outside the timed loop — otherwise the window measures
    # ~128 MB of H2D copies per iteration, not the matmul
    da, db = jnp.asarray(a), jnp.asarray(b)
    got = f(da, db)
    jax.block_until_ready(got)
    t0 = time.perf_counter()
    for _ in range(5):
        got = f(da, db)
    jax.block_until_ready(got)
    dev_s = (time.perf_counter() - t0) / 5

    # corner-block agreement, like the reference's allclose check
    corner = np.asarray(got[:64, :64])
    ok = np.allclose(corner, expected[:64, :64], rtol=1e-3, atol=1e-2)

    print(
        json.dumps(
            {
                "metric": f"matmul_{n}_speedup_vs_numpy",
                "value": round(cpu_s / dev_s, 2),
                "unit": "x",
                "extra": {
                    "device": str(jax.devices()[0]),
                    "device_ms": round(dev_s * 1e3, 3),
                    "numpy_ms": round(cpu_s * 1e3, 3),
                    "allclose": bool(ok),
                },
            }
        )
    )
    if not ok:
        raise SystemExit("device result mismatch vs numpy")


if __name__ == "__main__":
    main()
