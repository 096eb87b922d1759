"""All-workload benchmark harness.

Measures end-to-end solves/s for every reference workload (SURVEY.md §6
table: pendulum, cartpole, mountain car, navigation-2d, racing) plus the
flagship racing configuration, on whatever accelerator JAX selects.
Prints one JSON line per workload (same schema as bench.py).

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

WARMUP = 3
ITERS = 30


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


def _report(name, horizon, k, seconds):
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
                },
            }
        )
    )


def bench_simple(name, horizon, k, dim_state, dim_control, dynamics, cost,
                 u_min, u_max, sigmas, lambda_):
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.solver import make_solver

    config = MPPIConfig(
        horizon=horizon, num_samples=k, dim_state=dim_state,
        dim_control=dim_control, u_min=u_min, u_max=u_max, sigmas=sigmas,
        lambda_=lambda_, store_rollouts=False,
    )
    solver = make_solver(config, dynamics, cost, jit=False)
    tick = jax.jit(lambda s, x: solver.solve(s, x))
    st = solver.init()
    x0 = jnp.zeros(dim_state)
    dt = _time_tick(tick, st, x0)
    _report(name, horizon, k, dt)


def main():
    from mppi_playground_tpu.models import cartpole, mountain_car, pendulum

    # reference workloads (SURVEY.md §6): exact solver configs
    bench_simple("pendulum", 15, 1000, 2, 1, pendulum.dynamics, pendulum.cost,
                 (-2.0,), (2.0,), (1.0,), "ESSPS")
    bench_simple("cartpole", 10, 100, 4, 1, cartpole.dynamics, cartpole.cost,
                 cartpole.U_MIN, cartpole.U_MAX, (1.0,), 0.001)
    bench_simple("mountaincar", 100, 1000, 2, 1, mountain_car.dynamics,
                 mountain_car.cost, (-1.0,), (1.0,), (1.0,), 0.1)

    # navigation-2d (T=30, K=3000, ESSPS) on the real obstacle map
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.solver import make_solver
    from mppi_playground_tpu.envs.navigation_2d import Navigation2DEnv

    env = Navigation2DEnv()
    config = MPPIConfig(
        horizon=30, num_samples=3000, dim_state=3, dim_control=2,
        u_min=(0.0, -1.0), u_max=(2.0, 1.0), sigmas=(0.5, 0.5),
        lambda_="ESSPS", store_rollouts=False,
    )
    solver = make_solver(config, env.dynamics, env.cost_function, jit=False)
    tick = jax.jit(lambda s, x: solver.solve(s, x))
    dt = _time_tick(tick, solver.init(), env.reset())
    _report("navigation2d", 30, 3000, dt)

    # racing (reference workload T=25 K=4000, fused backend when on TPU)
    from mppi_playground_tpu.envs.racing_controller import RacingController
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.workloads import (
        FLAGSHIP_HORIZON,
        FLAGSHIP_NUM_SAMPLES,
    )

    renv = RacingEnv()
    for horizon, k, tag, lam in [
        (25, 4000, "racing", 1.0),
        (FLAGSHIP_HORIZON, FLAGSHIP_NUM_SAMPLES, "racing_flagship", 1.0),
        # two-phase auto-lambda at flagship scale (phase-1 pert dump +
        # phase-2 read-back; tracks the auto-lambda overhead over fixed)
        (FLAGSHIP_HORIZON, FLAGSHIP_NUM_SAMPLES, "racing_flagship_essps",
         "ESSPS"),
    ]:
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
        _report(tag + "_" + ctrl.solver_backend, horizon, k, dt)

    # flagship, single-dispatch episodes: N ticks per program amortize the
    # per-dispatch overhead (core/closed_loop.py)
    from mppi_playground_tpu.core.closed_loop import make_closed_loop
    from mppi_playground_tpu.models.racing_mpcc import calc_ref_trajectory
    from mppi_playground_tpu.ops.fused_solve import fused_supported
    from mppi_playground_tpu.workloads import build_flagship

    if fused_supported():
        horizon, k, ticks = FLAGSHIP_HORIZON, FLAGSHIP_NUM_SAMPLES, 50
        # same construction as bench.py / the compile-check entry
        _, solver, _ = build_flagship(horizon, k, env=renv)
        path = renv.racing_center_path

        def info_fn(cind, x):
            xref, new_cind = calc_ref_trajectory(x, path, cind, horizon)
            return {"reference_path": xref}, new_cind

        run = make_closed_loop(
            solver, lambda x, u: renv.dynamics(x[None], u[None])[0],
            ticks, info_fn=info_fn,
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
        dt = (time.perf_counter() - t0) / (5 * ticks)
        _report("racing_flagship_episode_amortized", horizon, k, dt)


if __name__ == "__main__":
    main()
