"""All-workload benchmark harness.

Measures end-to-end solves/s for every reference workload (SURVEY.md §6
table: pendulum, cartpole, mountain car, navigation-2d, goal-in-danger-
zone, racing) plus the flagship racing configuration, on whatever
accelerator JAX selects.  On TPU each workload is measured on three
serving paths:

* ``<name>``           — XLA scan solver, one dispatch per tick
* ``<name>_fused``     — single fused Pallas kernel per tick
* ``<name>_episode_amortized`` — EPISODE_TICKS ticks scanned inside ONE
  dispatched program (``core/closed_loop.py``), the simulation /
  data-generation serving mode

Prints one JSON line per row (same schema as bench.py).

Run:  python benchmarks/run_all.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mppi_playground_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

WARMUP = 3
ITERS = 30
EPISODE_TICKS = 50
EPISODE_REPS = 3


def _time_tick(tick, *args):
    out = None
    state = args
    for _ in range(WARMUP):  # stateless timing: same inputs every call
        out = tick(*state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = tick(*state)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def _report(name, horizon, k, seconds, **extra_fields):
    print(
        json.dumps(
            {
                "metric": f"{name}_solves_per_s_h{horizon}_k{k}",
                "value": round(1.0 / seconds, 3),
                "unit": "solves/s",
                # the per-workload targets are unpublished (BASELINE.md);
                # the field exists to keep the bench.py schema
                "vs_baseline": None,
                "extra": {
                    "solve_ms": round(seconds * 1e3, 3),
                    "device": str(jax.devices()[0]),
                    **extra_fields,
                },
            }
        )
    )


def _fused_on():
    from mppi_playground_tpu.ops.fused_solve import fused_supported

    return fused_supported()


def bench_workload(name, horizon, k, dim_state, dim_control, dynamics, cost,
                   fused_task, u_min, u_max, sigmas, lambda_, x0=None,
                   episode=True):
    """XLA row always; fused + amortized-episode rows on TPU backends."""
    from mppi_playground_tpu.core.closed_loop import make_closed_loop
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.fused_solver import make_fused_solver
    from mppi_playground_tpu.core.solver import make_solver

    config = MPPIConfig(
        horizon=horizon, num_samples=k, dim_state=dim_state,
        dim_control=dim_control, u_min=u_min, u_max=u_max, sigmas=sigmas,
        lambda_=lambda_, store_rollouts=False,
    )
    if x0 is None:
        x0 = jnp.zeros(dim_state)

    solver = make_solver(config, dynamics, cost, jit=False)
    # the XLA row returns the FULL SolveResult (incl. [K] aux outputs),
    # matching the round-2 methodology so rows compare across rounds;
    # the fused row below returns the serving outputs (aux DCE'd)
    tick = jax.jit(lambda s, x: solver.solve(s, x))
    dt = _time_tick(tick, solver.init(), x0)
    _report(name, horizon, k, dt, path="xla", outputs="full SolveResult")

    if fused_task is None or not _fused_on():
        return

    fused = make_fused_solver(config, fused_task, dynamics, jit=False)
    ftick = jax.jit(lambda s, x: (lambda r: (r.action_seq, r.state))(
        fused.solve(s, x)))
    dt = _time_tick(ftick, fused.init(), x0)
    _report(f"{name}_fused", horizon, k, dt, path="fused",
            outputs="action_seq,state (aux DCE'd — serving outputs)")

    if not episode:
        return

    def plant(x, u):
        return dynamics(x[None], u[None])[0]

    run = make_closed_loop(fused, plant, EPISODE_TICKS)
    st = fused.init()
    out = run(st, x0, None)
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    for _ in range(EPISODE_REPS):
        out = run(st, x0, None)
    jax.block_until_ready(out[1])
    dt = (time.perf_counter() - t0) / (EPISODE_REPS * EPISODE_TICKS)
    _report(f"{name}_episode_amortized", horizon, k, dt,
            path="fused_episode", episode_ticks=EPISODE_TICKS)


def main():
    from mppi_playground_tpu.models import (
        cartpole,
        danger_zone,
        mountain_car,
        pendulum,
    )

    # reference workloads (SURVEY.md §6 / BASELINE.md): exact solver configs
    bench_workload("pendulum", 15, 1000, 2, 1, pendulum.dynamics,
                   pendulum.cost, pendulum.fused_task(), (-2.0,), (2.0,),
                   (1.0,), "ESSPS")
    bench_workload("cartpole", 10, 100, 4, 1, cartpole.dynamics,
                   cartpole.cost, cartpole.fused_task(), cartpole.U_MIN,
                   cartpole.U_MAX, (1.0,), 0.001)
    bench_workload("mountaincar", 100, 1000, 2, 1, mountain_car.dynamics,
                   mountain_car.cost, mountain_car.fused_task(), (-1.0,),
                   (1.0,), (1.0,), 0.1)

    # goal-in-danger-zone (T=30, K=3000, 7-dim CMDP obs; BASELINE.md table)
    dz_radius = 10.0
    dz_dyn = danger_zone.make_dynamics()
    bench_workload("danger_zone", 30, 3000, 7, 2, dz_dyn,
                   danger_zone.make_cost(radius=dz_radius),
                   danger_zone.make_fused_task(radius=dz_radius),
                   danger_zone.U_MIN, danger_zone.U_MAX, (0.5, 0.5), 1.0,
                   x0=jnp.asarray([-15.0, 0.0, 0.0, 15.0, 0.0, 15.0, 0.0]))

    # navigation-2d (T=30, K=3000, ESSPS) on the real obstacle map
    from mppi_playground_tpu.envs.navigation_2d import Navigation2DEnv

    env = Navigation2DEnv()
    bench_workload("navigation2d", 30, 3000, 3, 2, env.dynamics,
                   env.cost_function, env.fused_task(), (0.0, -1.0),
                   (2.0, 1.0), (0.5, 0.5), "ESSPS", x0=env.reset())

    # racing (reference workload T=25 K=4000, fused backend when on TPU)
    from mppi_playground_tpu.envs.racing_controller import RacingController
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.workloads import (
        FLAGSHIP_HORIZON,
        FLAGSHIP_NUM_SAMPLES,
    )

    renv = RacingEnv()
    racing_rows = [
        (25, 4000, "racing", 1.0),
        (FLAGSHIP_HORIZON, FLAGSHIP_NUM_SAMPLES, "racing_flagship", 1.0),
        # auto-lambda at flagship scale, all three modes (ESSPS/LBPS run
        # the two-phase pert dump + VMEM-resident lambda kernel + phase-2
        # read-back; MPO is single-pass + an optax step).  These rows ride
        # the host-driven tunnel channel — the drift-proof per-mode device
        # times and overhead percentages are benchmarks/
        # autolambda_flagship.py's scanned rows.
        (FLAGSHIP_HORIZON, FLAGSHIP_NUM_SAMPLES, "racing_flagship_essps",
         "ESSPS"),
        (FLAGSHIP_HORIZON, FLAGSHIP_NUM_SAMPLES, "racing_flagship_lbps",
         "LBPS"),
        (FLAGSHIP_HORIZON, FLAGSHIP_NUM_SAMPLES, "racing_flagship_mpo",
         "MPO"),
    ]
    if _fused_on():
        # single-chip weak-scaling proof point: 10x the north-star K
        # (the fused path's HBM footprint is K-linear only in [K] costs
        # + the auto-lambda pert dump)
        racing_rows.append((FLAGSHIP_HORIZON, 1_048_576, "racing_1m", 1.0))
        # K = 1,048,576 sits past the lambda epilogue's 2 MiB default
        # gate (ops/fused_solve.py supports_lambda_epilogue; boundary
        # pinned in tests/test_fused_solve.py), so both auto-lambda modes
        # exercise the standalone two-phase path with the whole-block
        # VMEM search kernel at its 4 MiB block edge
        racing_rows.append(
            (FLAGSHIP_HORIZON, 1_048_576, "racing_1m_essps", "ESSPS")
        )
        racing_rows.append(
            (FLAGSHIP_HORIZON, 1_048_576, "racing_1m_lbps", "LBPS")
        )
    for horizon, k, tag, lam in racing_rows:
        ctrl = RacingController(
            renv, horizon=horizon, num_samples=k, store_rollouts=False,
            lambda_=lam,
        )
        x0 = renv.reset()

        # thread the state through the loop for timing realism (every
        # tick advances the warm start, as in a real control loop)
        st = ctrl.solver_state
        cind = ctrl.current_path_index
        result = None
        for _ in range(WARMUP):
            result, cind, _ = ctrl._tick(st, cind, x0)
            st = result.state
        jax.block_until_ready(result.action_seq)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            result, cind, _ = ctrl._tick(st, cind, x0)
            st = result.state
        jax.block_until_ready(result.action_seq)
        dt = (time.perf_counter() - t0) / ITERS
        _report(tag + "_" + ctrl.solver_backend, horizon, k, dt,
                rollouts_per_s=round(k / dt))

    # flagship, single-dispatch episodes: N ticks per program amortize the
    # per-dispatch overhead (core/closed_loop.py)
    from mppi_playground_tpu.core.closed_loop import make_closed_loop
    from mppi_playground_tpu.models.racing_mpcc import calc_ref_trajectory
    from mppi_playground_tpu.workloads import build_flagship

    if _fused_on():
        horizon, k = FLAGSHIP_HORIZON, FLAGSHIP_NUM_SAMPLES
        # same construction as bench.py / the compile-check entry
        _, solver, _ = build_flagship(horizon, k, env=renv)
        path = renv.racing_center_path

        def info_fn(cind, x):
            xref, new_cind = calc_ref_trajectory(x, path, cind, horizon)
            return {"reference_path": xref}, new_cind

        run = make_closed_loop(
            solver, lambda x, u: renv.dynamics(x[None], u[None])[0],
            EPISODE_TICKS, info_fn=info_fn,
        )
        x0 = renv.reset()
        st = solver.init()
        cind = jnp.asarray(0, jnp.int32)
        out = run(st, x0, cind)
        jax.block_until_ready(out[1])
        t0 = time.perf_counter()
        for _ in range(5):
            out = run(st, x0, cind)
        jax.block_until_ready(out[1])
        dt = (time.perf_counter() - t0) / (5 * EPISODE_TICKS)
        _report("racing_flagship_episode_amortized", horizon, k, dt,
                path="fused_episode", episode_ticks=EPISODE_TICKS)


if __name__ == "__main__":
    main()
