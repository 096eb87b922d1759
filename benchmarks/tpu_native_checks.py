"""On-TPU checks of the fused kernel's hardware-PRNG paths.

The pytest suite runs on a virtual CPU mesh where ``pltpu.prng_random_bits``
has no interpreter implementation, so every CI equivalence test injects
noise.  This script exercises the native paths that only exist on real
TPU hardware:

1. **prng_stats** — Box-Muller normals from the in-kernel hardware PRNG
   (ops/fused_solve.py:_normal_pair) have the right mean/variance/tails.
2. **regen_costs_match** — ``run_regen`` replays the exact per-tile PRNG
   streams of a prior solve: re-rolling the regenerated perturbations
   through the XLA rollout reproduces the fused solve's costs.  This is
   the foundation of ``get_top_samples`` on the fused path.
3. **tile_offset_invariance** — two half-``K`` kernel launches with tile
   offsets produce the same costs/update as one full-``K`` launch: the
   PRNG stream is a function of the *global* tile id, so sample-sharded
   solves equal unsharded solves without injected noise.
4. **fused_top_samples** — the controller-level ``get_top_samples`` on
   the PRNG path returns finite, weight-descending, bound-respecting
   trajectories.

Run:  python benchmarks/tpu_native_checks.py
Prints one JSON line per check; exits non-zero on any failure.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(name, ok, **extra):
    print(json.dumps({"check": name, "ok": bool(ok), **extra}), flush=True)
    return bool(ok)


def check_prng_stats():
    """Statistics of the in-kernel Box-Muller normals (ADVICE r1 #4)."""
    import jax.numpy as jnp

    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.models import pendulum
    from mppi_playground_tpu.ops.fused_solve import make_fused_solve

    # wide bounds so the clip never binds and sigma=1: the regenerated
    # perturbations around a zero warm start ARE the raw normals
    k = 65536
    horizon = 64
    cfg = MPPIConfig(
        horizon=horizon, num_samples=k, dim_state=2, dim_control=1,
        u_min=(-100.0,), u_max=(100.0,), sigmas=(1.0,), lambda_=1.0,
        store_rollouts=False,
    )
    core = make_fused_solve(cfg, pendulum.fused_task())
    z = np.asarray(
        core.run_regen(jnp.zeros((horizon, 1), jnp.float32), jnp.asarray(1234))
    ).reshape(-1)
    n = z.size
    mean, var = float(z.mean()), float(z.var())
    tail2 = float((np.abs(z) > 2.0).mean())
    tail3 = float((np.abs(z) > 3.0).mean())
    # N(0,1): P(|z|>2)=4.55e-2, P(|z|>3)=2.70e-3; tolerances ~10 sigma of
    # the binomial sampling error at n=4.2M
    ok = (
        np.isfinite(z).all()
        and abs(mean) < 5e-3
        and abs(var - 1.0) < 5e-3
        and abs(tail2 - 0.0455) < 1.5e-3
        and abs(tail3 - 0.0027) < 4e-4
    )
    return _emit(
        "prng_stats", ok, n=n, mean=round(mean, 5), var=round(var, 5),
        tail2=round(tail2, 5), tail3=round(tail3, 5),
    )


def check_regen_costs_match():
    """run_regen replays the solve's exact PRNG streams (top-k foundation)."""
    import jax.numpy as jnp

    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.fused_solver import make_fused_solver
    from mppi_playground_tpu.core.solver import _rollout_and_costs
    from mppi_playground_tpu.models import pendulum

    k, horizon = 4096, 15
    cfg = MPPIConfig(
        horizon=horizon, num_samples=k, dim_state=2, dim_control=1,
        u_min=pendulum.U_MIN, u_max=pendulum.U_MAX, sigmas=(1.0,),
        lambda_=1.0, store_rollouts=False,
    )
    solver = make_fused_solver(
        cfg, pendulum.fused_task(), pendulum.dynamics, donate_state=False
    )
    st = solver.init()
    x0 = jnp.asarray([np.pi, 0.0], jnp.float32)
    r = solver.solve(st, x0)

    # regenerate ALL perturbations from the solve's seed and re-cost them
    # through the independent XLA rollout
    from mppi_playground_tpu.ops.fused_solve import make_fused_solve

    core = make_fused_solve(cfg, pendulum.fused_task())
    pert = core.run_regen(r.aux.prev_action_seq, r.aux.seed)
    x0_batch = jnp.broadcast_to(x0, (k, 2))
    costs_xla, _ = _rollout_and_costs(
        pendulum.dynamics, pendulum.cost, x0_batch, pert, {}, False
    )
    a, b = np.asarray(costs_xla), np.asarray(r.aux.costs)
    err = float(np.max(np.abs(a - b) / (np.abs(b) + 1e-6)))
    ok = err < 1e-4
    return _emit("regen_costs_match", ok, max_rel_err=err)


def check_dump_pert_matches_regen():
    """Phase-1 dump_pert output == run_regen's replay, bit-exact.

    The auto-lambda fast path reads the dumped perturbations back in
    phase 2 instead of regenerating them; both must come from the same
    native PRNG streams or the two-phase solve silently diverges.
    """
    import jax
    import jax.numpy as jnp

    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.models import pendulum
    from mppi_playground_tpu.ops.fused_solve import LANES, make_fused_solve

    k, horizon = 4096, 15
    cfg = MPPIConfig(
        horizon=horizon, num_samples=k, dim_state=2, dim_control=1,
        u_min=pendulum.U_MIN, u_max=pendulum.U_MAX, sigmas=(1.0,),
        lambda_="ESSPS", store_rollouts=False,
    )
    core = make_fused_solve(cfg, pendulum.fused_task())
    prev = jnp.zeros((horizon, 1), jnp.float32)
    seed = jnp.asarray(11, jnp.int32)
    x0 = jnp.asarray([np.pi, 0.0], jnp.float32)

    # dump_pert pairs with costs_only (the auto-lambda phase-1 shape)
    costs, pert = core.run_kernel(x0, prev, jnp.asarray(1.0), seed, {},
                                  dump_pert=True, costs_only=True)
    regen = core.run_regen(prev, seed)
    d_flat = horizon * 1
    k_pad = pert.shape[1] * LANES
    pert_ktm = (
        np.asarray(pert).reshape(d_flat, k_pad).T[:k].reshape(k, horizon, 1)
    )
    bit_equal = bool(np.array_equal(pert_ktm, np.asarray(regen)))

    # and phase 2 via read-back == phase 2 via regen, bit-exact
    s1, n1 = core.run_weighted(prev, jnp.asarray(0.5), seed, costs)
    s2, n2 = core.run_weighted(prev, jnp.asarray(0.5), seed, costs, pert=pert)
    jax.block_until_ready(n2)
    weighted_equal = bool(
        np.array_equal(np.asarray(s1), np.asarray(s2))
        and np.array_equal(np.asarray(n1), np.asarray(n2))
    )
    ok = bit_equal and weighted_equal
    return _emit("dump_pert_matches_regen", ok, pert_bit_equal=bit_equal,
                 weighted_bit_equal=weighted_equal)


def check_tile_offset_invariance():
    """Sharded-vs-single PRNG-stream invariance, natively on one chip.

    The per-tile seed is a hash of the *global* tile id (tile_offset +
    program_id), so two half-K launches at offsets 0 and K/2048 must
    reproduce the single full-K launch exactly — the property that makes
    sample-sharded fused solves equal unsharded ones without injected
    noise (parallel/sharded.py).
    """
    import jax.numpy as jnp

    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.models import pendulum
    from mppi_playground_tpu.ops.fused_solve import TILE, make_fused_solve

    k, horizon = 4096, 15
    cfg = MPPIConfig(
        horizon=horizon, num_samples=k, dim_state=2, dim_control=1,
        u_min=pendulum.U_MIN, u_max=pendulum.U_MAX, sigmas=(1.0,),
        lambda_=1.0, store_rollouts=False,
    )
    task = pendulum.fused_task()
    full = make_fused_solve(cfg, task)
    half = make_fused_solve(cfg, task, local_num_samples=k // 2)

    x0 = jnp.asarray([np.pi, 0.0], jnp.float32)
    prev = jnp.zeros((horizon, 1), jnp.float32)
    lam = jnp.asarray(1.0)
    seed = jnp.asarray(987654)

    costs_f, stats_f, numer_f = full.run_kernel(x0, prev, lam, seed, {})
    c0, s0, n0 = half.run_kernel(x0, prev, lam, seed, {}, tile_offset=0)
    c1, s1, n1 = half.run_kernel(
        x0, prev, lam, seed, {}, tile_offset=(k // 2) // TILE
    )
    costs_h = jnp.concatenate([c0, c1])
    upd_f, _, ess_f = full.combine_partials(costs_f, stats_f, numer_f, lam)
    upd_h, _, ess_h = full.combine_partials(
        costs_h,
        jnp.concatenate([s0, s1], axis=0),
        jnp.concatenate([n0, n1], axis=0),
        lam,
    )
    cost_eq = bool(jnp.array_equal(costs_f, costs_h))
    upd_err = float(jnp.max(jnp.abs(upd_f - upd_h)))
    ess_err = abs(float(ess_f) - float(ess_h)) / float(ess_f)
    ok = cost_eq and upd_err < 1e-6 and ess_err < 1e-5
    return _emit(
        "tile_offset_invariance", ok, costs_bitwise_equal=cost_eq,
        update_max_abs_err=upd_err, ess_rel_err=ess_err,
    )


def check_fused_top_samples():
    """Controller get_top_samples on the PRNG fused path (mppi.py:462-487)."""
    import jax.numpy as jnp

    from mppi_playground_tpu import MPPI
    from mppi_playground_tpu.models import pendulum

    c = MPPI(
        horizon=15, num_samples=4096, dim_state=2, dim_control=1,
        dynamics=pendulum.dynamics, cost_func=pendulum.cost,
        u_min=jnp.asarray([-2.0]), u_max=jnp.asarray([2.0]),
        sigmas=jnp.asarray([1.0]), lambda_=1.0, store_rollouts=False,
        fused_task=pendulum.fused_task(),
    )
    x = jnp.asarray([np.pi, 0.0])
    c(x)
    seqs, weights = c.get_top_samples(32)
    seqs, weights = np.asarray(seqs), np.asarray(weights)
    ok = (
        seqs.shape == (32, 16, 2)
        and weights.shape == (32,)
        and np.isfinite(seqs).all()
        and (weights[:-1] >= weights[1:]).all()
        and weights.min() > 0.0
    )
    return _emit(
        "fused_top_samples", ok, w_max=float(weights.max()),
        w_min=float(weights.min()),
    )


def check_lambda_epilogue_bitwise():
    """In-kernel lambda epilogue == standalone search kernel on the PRNG
    path (the CPU suite's bitwise test injects noise; this covers the
    native hardware-PRNG stream at flagship scale)."""
    import jax.numpy as jnp

    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.fused_solver import make_fused_solver
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_racing_fused_task_from_env,
    )

    env = RacingEnv()
    task = make_racing_fused_task_from_env(env)
    x0 = env.reset()
    ref, _ = calc_ref_trajectory(
        x0, env.racing_center_path, jnp.asarray(0, jnp.int32), 50
    )
    info = {"reference_path": ref}
    ok = True
    lams = {}
    for mode in ("ESSPS", "LBPS"):
        cfg = MPPIConfig(
            horizon=50, num_samples=100_000, dim_state=4, dim_control=2,
            u_min=tuple(float(v) for v in env.u_min.tolist()),
            u_max=tuple(float(v) for v in env.u_max.tolist()),
            sigmas=(0.5, 0.1), lambda_=mode, store_rollouts=False,
        )
        out = {}
        for epi in (True, False):
            s = make_fused_solver(
                cfg, task, env.dynamics, donate_state=False,
                lambda_epilogue=epi,
            )
            r = s.solve(s.init(), x0, info=info)
            out[epi] = (
                float(r.aux.lam),
                np.asarray(r.action_seq),
                np.asarray(r.aux.costs),
            )
        lams[mode] = out[True][0]
        ok = ok and (
            out[True][0] == out[False][0]
            and (out[True][1] == out[False][1]).all()
            and (out[True][2] == out[False][2]).all()
        )
    return _emit(
        "lambda_epilogue_bitwise", ok,
        essps_lambda=lams["ESSPS"], lbps_lambda=lams["LBPS"],
    )


def main():
    import jax

    if jax.default_backend() != "tpu":
        print(json.dumps({"check": "backend", "ok": False,
                          "error": "requires a TPU backend"}))
        return 1
    results = [
        check_prng_stats(),
        check_regen_costs_match(),
        check_dump_pert_matches_regen(),
        check_tile_offset_invariance(),
        check_fused_top_samples(),
        check_lambda_epilogue_bitwise(),
    ]
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
