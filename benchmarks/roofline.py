"""Roofline / utilization accounting for the flagship fused kernel.

Substantiates the "speed-of-light" discussion in docs/ARCHITECTURE.md
with numbers: counts the per-tick work of the racing MPCC fused solve
(T=50, K=100k) from the kernel's op structure, measures the kernel on
hardware, and reports utilization against the bounding resource.

Key claims this quantifies:

* The workload is **VPU-issue bound**, not HBM bound: arithmetic
  intensity is ~10^3 element-ops per HBM byte (the fused design writes
  only [K] costs + [tiles, 128] partials).
* **MXU MFU is the wrong metric**: the solve contains zero matmul-shaped
  contractions (the only inner products are 128-lane reductions); MXU
  utilization is 0 by design and peak-TFLOPs comparisons are meaningless.
* The bounding budget is VPU instruction issue, of which roughly half is
  the map interval query's gather/broadcast/select chain.

Run:  python benchmarks/roofline.py            (TPU: measures + counts)
      python benchmarks/roofline.py --count    (counts only, any backend)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HORIZON = 50
K = 100_000
DIM_CONTROL = 2
D_FLAT = HORIZON * DIM_CONTROL

# v5e single-core peaks (public spec: 394 bf16 MXU TFLOP/s is irrelevant
# here — see module docstring).  VPU: 8 sublanes x 128 lanes x 4 ALUs at
# ~0.94 GHz.
VPU_ELEMENT_OPS_PER_S = 8 * 128 * 4 * 0.94e9
HBM_BYTES_PER_S = 819e9  # v5e HBM bandwidth (public spec ~819 GB/s)


def count_per_sample() -> dict:
    """Element-op counts per sample per tick, from the kernel structure.

    "cheap" = one VPU ALU op per element (add/mul/cmp/select/convert);
    "transcendental" = log/sqrt/sin/cos/exp (dedicated pipe, lower
    throughput); "gather" = dynamic lane-gather (crossbar) — counted
    separately because its cost model differs from ALU ops.
    """
    # --- noise generation: d_flat normals via Box-Muller pairs ---
    pairs = (D_FLAT + 1) // 2
    prng_draws = 2 * pairs
    # masks, int->float scale, theta mul, 2 muls + polynomial sincos (~28)
    bm_cheap = pairs * (9 + 28)
    bm_transc = pairs * 2     # log, sqrt per pair (sin/cos are polynomial)
    pert_cheap = D_FLAT * 4   # sigma mul, mean add, 2-sided clip

    # --- bicycle dynamics per step (models/bicycle.py SoA) ---
    # 2x angle_normalize, tan poly, polynomial sincos (~28), x, y, th, v
    dyn_cheap = 12 + 5 + 28 + 5 + 5 + 3 + 3
    dyn_transc = 0            # heading sin/cos are polynomial (fastmath)

    # --- MPCC stage cost per step (models/racing_mpcc.py SoA) ---
    mpcc_terms = 26          # contouring/lag/velocity/input terms
    # two interval-table queries sharing nothing (same-geometry index math
    # twice): round/clip/oob/group/lane per query
    query_index = 18 * 2
    slots = 6 + 3            # obstacle + lane interval slots
    slot_unpack_test = slots * 8
    # Build-time slot-plan trimming (ops/row_intervals.py) prunes the
    # 9-slot x 7-group broadcast-and-try walk on the seed-42 racing maps:
    # obstacle gathers 23 of 42 cells, lane 16 gathers + 1 uniform scalar
    # broadcast of 21; skipped cells contribute a static empty constant.
    gathers = 23 + 16
    uniform_bcasts = 1
    skip_inits = 7           # slots with >=1 skipped group: full-const init
    gather_support = gathers * 2 + uniform_bcasts * 2 + skip_inits
    cost_cheap = mpcc_terms + query_index + slot_unpack_test + gather_support + 5

    steps = HORIZON + 1      # stage costs + terminal; dynamics runs HORIZON
    rollout_cheap = HORIZON * dyn_cheap + steps * cost_cheap
    rollout_transc = HORIZON * dyn_transc
    rollout_gathers = steps * gathers

    # --- tile-local softmin + numer partials (amortized per sample) ---
    softmin_transc = 1       # exp
    softmin_cheap = 6 + D_FLAT * 3 / 1024  # numer reduce+select per tile

    return {
        "cheap": bm_cheap + pert_cheap + rollout_cheap + softmin_cheap,
        "transcendental": bm_transc + rollout_transc + softmin_transc,
        "gather": rollout_gathers,
        "prng_draws": prng_draws,
        "gather_fraction_of_cheap": round(
            rollout_gathers / (bm_cheap + pert_cheap + rollout_cheap), 3
        ),
    }


def hbm_bytes_per_tick() -> dict:
    tiles = -(-K // 1024)
    return {
        "write_costs": K * 4,
        "write_partials": tiles * 2 * 8 * 128 * 4,
        "read_tables": (6 + 3) * 7 * 128 * 4,
        "read_smem": (HORIZON + 1) * 5 * 4,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", action="store_true", help="skip measurement")
    args = ap.parse_args()

    per_sample = count_per_sample()
    total_cheap = per_sample["cheap"] * K
    total_transc = per_sample["transcendental"] * K
    total_gather = per_sample["gather"] * K
    hbm = hbm_bytes_per_tick()
    hbm_total = sum(hbm.values())

    # issue-bound floor: every element op (cheap + gather at >= 1 op) must
    # issue; transcendentals assumed 1/cycle/lane on the special pipe
    floor_s = (total_cheap + total_gather) / VPU_ELEMENT_OPS_PER_S
    hbm_s = hbm_total / HBM_BYTES_PER_S

    extra = {
        "workload": f"racing MPCC fused, T={HORIZON}, K={K}",
        "per_sample": per_sample,
        "element_ops_per_tick": int(total_cheap + total_gather),
        "transcendentals_per_tick": int(total_transc),
        "hbm_bytes_per_tick": hbm,
        "hbm_bytes_total": hbm_total,
        "arithmetic_intensity_ops_per_byte": round(
            (total_cheap + total_gather) / hbm_total, 1
        ),
        "vpu_issue_floor_ms": round(floor_s * 1e3, 3),
        "hbm_floor_ms": round(hbm_s * 1e3, 4),
        "mxu_flops_per_tick": 0,
        "bounding_resource": "VPU instruction issue (map-query gathers ~"
        f"{int(100 * total_gather / (total_cheap + total_gather))}% of it)",
        "why_not_mfu": "zero matmul-shaped contractions; MXU idle by design",
    }

    measured_ms = None
    if not args.count:
        import jax
        import jax.numpy as jnp

        from mppi_playground_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        if jax.default_backend() == "tpu":
            from mppi_playground_tpu.core.config import MPPIConfig
            from mppi_playground_tpu.envs.racing_env import RacingEnv
            from mppi_playground_tpu.models.racing_mpcc import (
                calc_ref_trajectory,
                make_racing_fused_task_from_env,
            )
            from mppi_playground_tpu.ops.fused_solve import make_fused_solve

            env = RacingEnv()
            config = MPPIConfig(
                horizon=HORIZON, num_samples=K, dim_state=4, dim_control=2,
                u_min=tuple(float(v) for v in env.u_min.tolist()),
                u_max=tuple(float(v) for v in env.u_max.tolist()),
                sigmas=(0.5, 0.1), lambda_=1.0, store_rollouts=False,
            )
            task = make_racing_fused_task_from_env(env)
            core = make_fused_solve(config, task)
            x0 = env.reset()
            xref, _ = jax.jit(
                lambda x: calc_ref_trajectory(
                    x, env.racing_center_path, jnp.asarray(0, jnp.int32),
                    HORIZON,
                )
            )(x0)
            smem = task.smem_builder({"reference_path": xref})
            lam = jnp.asarray(1.0, jnp.float32)
            seed = jnp.asarray(7, jnp.int32)
            prev = jnp.zeros((HORIZON, 2), jnp.float32)
            # device time via an N-iteration scan in ONE dispatch —
            # isolated dispatches are host-marshaling bound through the
            # tunnel (see benchmarks/kernel_fraction.py)
            scan_n = 50

            def kernel_scan(x, p, seed0):
                def body(carry, _):
                    sd, acc = carry
                    costs, stats, numer = core.run_kernel(x, p, lam, sd, smem)
                    return (sd + 1 + (costs[0] > 1e30).astype(jnp.int32),
                            acc + stats[0, 0]), None

                (sd, acc), _ = jax.lax.scan(
                    body, (seed0, 0.0), None, length=scan_n
                )
                return acc

            fn = jax.jit(kernel_scan)
            out = fn(x0, prev, seed)
            jax.block_until_ready(out)
            rates = []
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(3):
                    out = fn(x0, prev, seed)
                jax.block_until_ready(out)
                rates.append((time.perf_counter() - t0) / (3 * scan_n))
            measured_ms = statistics.median(rates) * 1e3
            extra["measured_kernel_ms"] = round(measured_ms, 4)
            extra["vpu_issue_utilization"] = round(
                floor_s * 1e3 / measured_ms, 3
            )
            extra["device"] = str(jax.devices()[0])

    print(json.dumps({
        "metric": "roofline_vpu_issue_floor_ms",
        "value": round(floor_s * 1e3, 3),
        "unit": "ms",
        "vs_baseline": None,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
