"""Per-component timing breakdown of the flagship racing tick.

Times each piece of the fused ESSPS/fixed-lambda tick in isolation
(pipelined dispatch, median of windows) so optimization targets the
measured bottleneck instead of speculation:

* full fused kernel (costs + softmin partials + numer)
* costs-only kernel (phase 1 without partials)
* costs-only + perturbation dump (auto-lambda phase 1)
* weighted-only kernel from the dump (auto-lambda phase 2)
* on-device ESSPS bisection over the [K] costs (XLA fori_loop)
* partials combine (XLA epilogue)
* calc_ref_trajectory (on-device reference generation)
* solve epilogue (SG + fused nominal re-roll + history shift)
* whole ticks: fixed-lambda and ESSPS

Run:  python benchmarks/profile_tick.py [--horizon 50] [--samples 100000]
Prints one JSON line per component.
"""

from __future__ import annotations

import argparse
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


def _time(fn, *args):
    """Median seconds/call over WINDOWS windows of ITERS pipelined calls."""
    out = fn(*args)
    jax.block_until_ready(out)
    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        rates.append((time.perf_counter() - t0) / ITERS)
    return statistics.median(rates)


def _report(name, seconds, **extra):
    print(
        json.dumps(
            {
                "metric": f"profile_{name}_ms",
                "value": round(seconds * 1e3, 4),
                "unit": "ms",
                "vs_baseline": None,
                "extra": extra,
            }
        )
    )
    return seconds * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--samples", type=int, default=100_000)
    args = ap.parse_args()

    from mppi_playground_tpu.core import autolambda
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.sg_filter import config_sg_coeffs
    from mppi_playground_tpu.core.solver import make_init, smooth_predict_advance
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_racing_fused_task_from_env,
    )
    from mppi_playground_tpu.ops.fused_solve import (
        make_fused_reroll,
        make_fused_solve,
    )

    env = RacingEnv()
    config = MPPIConfig(
        horizon=args.horizon, num_samples=args.samples, dim_state=4,
        dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.1), lambda_=1.0, store_rollouts=False,
    )
    task = make_racing_fused_task_from_env(env)
    core = make_fused_solve(config, task)
    reroll = make_fused_reroll(config, task)
    init = make_init(config)
    sg_coeffs = config_sg_coeffs(config, config.dtype)

    x0 = env.reset()
    st = init()
    path = env.racing_center_path
    cind = jnp.asarray(0, jnp.int32)
    xref, _ = jax.jit(
        lambda x, c: calc_ref_trajectory(x, path, c, args.horizon)
    )(x0, cind)
    smem = task.smem_builder({"reference_path": xref})
    lam = jnp.asarray(1.0, jnp.float32)
    seed = jnp.asarray(1234, jnp.int32)
    prev = st.previous_action_seq

    # --- kernels ---
    full = jax.jit(
        lambda x, p, s: core.run_kernel(x, p, lam, s, smem)
    )
    t_full = _time(full, x0, prev, seed)
    _report("kernel_full", t_full)

    costs_only = jax.jit(
        lambda x, p, s: core.run_kernel(x, p, lam, s, smem, costs_only=True)
    )
    t_costs = _time(costs_only, x0, prev, seed)
    _report("kernel_costs_only", t_costs, partials_epilogue_ms=round((t_full - t_costs) * 1e3, 4))

    dump = jax.jit(
        lambda x, p, s: core.run_kernel(
            x, p, lam, s, smem, dump_pert=True, costs_only=True
        )
    )
    t_dump = _time(dump, x0, prev, seed)
    _report("kernel_costs_dump", t_dump, dump_overhead_ms=round((t_dump - t_costs) * 1e3, 4))

    costs, pert_raw = dump(x0, prev, seed)

    weighted = jax.jit(
        lambda p, c, pr: core.run_weighted(p, lam, seed, c, pert=pr)
    )
    t_weighted = _time(weighted, prev, costs, pert_raw)
    _report("kernel_weighted_readback", t_weighted)

    regen_weighted = jax.jit(
        lambda p, c, s: core.run_weighted(p, lam, s, c)
    )
    t_regen_w = _time(regen_weighted, prev, costs, seed)
    _report("kernel_weighted_regen", t_regen_w)

    # --- lambda search over [K] costs ---
    essps = jax.jit(
        lambda c: autolambda.essps_lambda(
            c, config.target_ess, config.lambda_min, config.lambda_max,
            iters=config.essps_iters,
        )
    )
    t_essps = _time(essps, costs)
    _report("essps_bisection_xla", t_essps, iters=config.essps_iters)

    lbps = jax.jit(
        lambda c: autolambda.lbps_lambda(
            c, config.lbps_delta, config.lambda_min, config.lambda_max,
            iters=config.lbps_iters,
        )
    )
    t_lbps = _time(lbps, costs)
    _report("lbps_golden_xla", t_lbps, iters=config.lbps_iters)

    # --- epilogue pieces ---
    _, stats, numer = full(x0, prev, seed)
    combine = jax.jit(
        lambda c, s, n: core.combine_partials(c, s, n, lam)
    )
    t_combine = _time(combine, costs, stats, numer)
    _report("combine_partials", t_combine)

    # combine without the [K] weights materialization (benchmark ticks
    # drop aux.weights, so XLA DCEs it — this is what the tick pays)
    combine_now = jax.jit(
        lambda c, s, n: core.combine_partials(c, s, n, lam)[0]
    )
    t_combine_now = _time(combine_now, costs, stats, numer)
    _report("combine_partials_no_weights", t_combine_now)

    calc_ref = jax.jit(lambda x, c: calc_ref_trajectory(x, path, c, args.horizon))
    t_ref = _time(calc_ref, x0, cind)
    _report("calc_ref_trajectory", t_ref)

    update, _, _ = combine(costs, stats, numer)

    def epilogue(x, u):
        return smooth_predict_advance(
            config, sg_coeffs, lambda x0, seqs: reroll(x0, seqs[0])[None],
            st, x, u,
        )

    t_epi = _time(jax.jit(epilogue), x0, update)
    _report("solve_epilogue_reroll", t_epi)

    # --- whole ticks (same construction as bench.py) ---
    from mppi_playground_tpu.workloads import build_flagship

    _, solver, tick4 = build_flagship(args.horizon, args.samples, env=env)

    def _tick3(s, c, x):
        action_seq, _, new_state, new_cind = tick4(s, c, x)
        return action_seq, new_state, new_cind  # same outputs as bench.py

    tick = jax.jit(_tick3)
    t_tick = _time(tick, st, cind, x0)
    _report("tick_fixed_lambda", t_tick,
            accounted_ms=round((t_full + t_combine_now + t_ref + t_epi) * 1e3, 4))

    from mppi_playground_tpu.core.fused_solver import make_fused_solver

    import dataclasses

    essps_cfg = dataclasses.replace(config, lambda_="ESSPS")
    essps_solver = make_fused_solver(essps_cfg, task, env.dynamics, jit=False)

    def essps_tick(s, c, x):
        xr, nc = calc_ref_trajectory(x, path, c, args.horizon)
        r = essps_solver.solve(s, x, info={"reference_path": xr})
        return r.action_seq, r.state, nc

    t_etick = _time(jax.jit(essps_tick), st, cind, x0)
    _report("tick_essps", t_etick,
            overhead_vs_fixed_ms=round((t_etick - t_tick) * 1e3, 4))

    print(json.dumps({
        "metric": "profile_summary",
        "value": round(t_tick * 1e3, 4),
        "unit": "ms",
        "vs_baseline": None,
        "extra": {
            "device": str(jax.devices()[0]),
            "horizon": args.horizon,
            "samples": args.samples,
            "fixed_tick_ms": round(t_tick * 1e3, 4),
            "essps_tick_ms": round(t_etick * 1e3, 4),
            "kernel_full_ms": round(t_full * 1e3, 4),
            "serial_tail_ms": round((t_tick - t_full) * 1e3, 4),
        },
    }))


if __name__ == "__main__":
    main()
