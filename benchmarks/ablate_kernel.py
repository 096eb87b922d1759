"""Ablation timing of the fused racing kernel's stage-cost components.

Times ``costs_only`` kernel variants with parts of the MPCC stage cost /
bicycle dynamics stubbed out, isolating where the ~2 ms flagship kernel
actually spends its time (map interval queries vs path/velocity/input
terms vs dynamics transcendentals vs PRNG).  Measurement tool only — the
variants are NOT numerically meaningful solves.

Run:  python benchmarks/ablate_kernel.py
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
REPS = 3
SCAN_N = 50
HORIZON = 50
SAMPLES = 100_000


def _time_scan(make_kernel_call, seed0):
    """Device ms/call via a SCAN_N-iteration lax.scan in one dispatch.

    Isolated dispatches are host-marshaling bound through the tunnel
    (see benchmarks/kernel_fraction.py), so each variant is timed as a
    chained scan — the per-iteration carry consumes an output so nothing
    is DCE'd.
    """
    from jax import lax

    def scan(seed):
        def body(carry, _):
            sd, acc = carry
            costs = make_kernel_call(sd)
            return (sd + 1 + (costs[0] > 1e30).astype(jnp.int32),
                    acc + costs[0]), None

        (sd, acc), _ = lax.scan(body, (seed, 0.0), None, length=SCAN_N)
        return acc

    fn = jax.jit(scan)
    out = fn(seed0)
    jax.block_until_ready(out)
    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(seed0)
        jax.block_until_ready(out)
        rates.append((time.perf_counter() - t0) / (REPS * SCAN_N))
    return statistics.median(rates) * 1e3


def build_variants(env, base_task):
    """Ablated (dynamics, stage_cost, vmem_args) triples of the flagship
    kernel — shared by this harness and the cycle audit's in-context
    per-class cost fit (benchmarks/cycle_audit.py --fit)."""
    from mppi_playground_tpu.models.bicycle import make_dynamics_soa
    from mppi_playground_tpu.models.racing_mpcc import make_mpcc_cost_soa
    from mppi_playground_tpu.ops.row_intervals import interval_query

    x_lim = tuple(env.obstacle_map.x_lim)
    y_lim = tuple(env.obstacle_map.y_lim)
    full_cost = make_mpcc_cost_soa()

    def no_maps_cost(xs, us, ctx):
        x, y, _theta, v = xs
        t = ctx["t"]
        xref = ctx["smem"]["xref"]
        dx = x - xref[t, 0]
        dy = y - xref[t, 1]
        ec = xref[t, 2] * dx - xref[t, 3] * dy
        el = -xref[t, 3] * dx - xref[t, 2] * dy
        c = 2.0 * ec * ec + 3.0 * el * el + 2.0 * (v - xref[t, 4]) ** 2
        c = c + sum(0.01 * u * u for u in us)
        c = c + sum(0.5 * (u - pu) ** 2 for u, pu in zip(us, ctx["prev_us"]))
        return c

    def obstacle_only_cost(xs, us, ctx):
        x, y, _theta, _v = xs
        return 1e4 * interval_query(ctx["vmem"]["obstacle_table"], x, y)

    def lane_only_cost(xs, us, ctx):
        x, y, _theta, _v = xs
        return 1e4 * interval_query(ctx["vmem"]["lane_table"], x, y)

    def zero_cost(xs, us, ctx):
        return xs[0] * 0.0

    dyn = make_dynamics_soa(x_lim=x_lim, y_lim=y_lim)

    def dyn_no_tan(xs, us):
        # tan/cos/sin replaced by polynomials — bounds transcendental cost
        x, y, theta, v = xs
        a, steer = us
        nv = jnp.clip(v + 0.1 * a, -8.0, 8.0)
        nx = jnp.clip(x + 0.1 * nv * (1.0 - theta * theta * 0.5), *x_lim)
        ny = jnp.clip(y + 0.1 * nv * theta, *y_lim)
        ntheta = theta + 0.1 * nv * steer
        return (nx, ny, ntheta, nv)

    return {
        "full": (dyn, full_cost, base_task.vmem_args),
        "no_maps": (dyn, no_maps_cost, {}),
        "obstacle_only": (dyn, obstacle_only_cost,
                          {"obstacle_table": base_task.vmem_args["obstacle_table"]}),
        "lane_only": (dyn, lane_only_cost,
                      {"lane_table": base_task.vmem_args["lane_table"]}),
        "zero_cost": (dyn, zero_cost, {}),
        "full_no_tan_dyn": (dyn_no_tan, full_cost, base_task.vmem_args),
        "zero_cost_no_tan": (dyn_no_tan, zero_cost, {}),
    }


def main() -> None:
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_racing_fused_task_from_env,
    )
    from mppi_playground_tpu.ops.fused_solve import FusedTask, make_fused_solve

    env = RacingEnv()
    config = MPPIConfig(
        horizon=HORIZON, num_samples=SAMPLES, dim_state=4, dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.1), lambda_=1.0, store_rollouts=False,
    )
    base_task = make_racing_fused_task_from_env(env)

    x0 = env.reset()
    path = env.racing_center_path
    cind = jnp.asarray(0, jnp.int32)
    xref, _ = jax.jit(lambda x, c: calc_ref_trajectory(x, path, c, HORIZON))(
        x0, cind
    )
    info = {"reference_path": xref}
    lam = jnp.asarray(1.0, jnp.float32)
    seed = jnp.asarray(1234, jnp.int32)
    prev = jnp.zeros((HORIZON, 2), jnp.float32)

    variants = build_variants(env, base_task)

    results = {}
    for name, (d, c, vmem) in variants.items():
        task = FusedTask(
            dynamics_soa=d, stage_cost_soa=c, vmem_args=vmem,
            smem_builder=base_task.smem_builder,
        )
        core = make_fused_solve(config, task)
        smem = task.smem_builder(info)

        def call(sd, core=core, smem=smem):
            (costs,) = core.run_kernel(
                x0, prev, lam, sd, smem, costs_only=True
            )
            return costs

        ms = _time_scan(call, seed)
        results[name] = round(ms, 4)
        print(json.dumps({"metric": f"ablate_{name}_ms", "value": results[name],
                          "unit": "ms", "vs_baseline": None, "extra": {}}))

    print(json.dumps({
        "metric": "ablate_summary", "value": results.get("full"),
        "unit": "ms", "vs_baseline": None,
        "extra": {"device": str(jax.devices()[0]), **results},
    }))


if __name__ == "__main__":
    main()
