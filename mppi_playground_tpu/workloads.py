"""Shared benchmark-workload construction.

The BASELINE north-star workload (racing MPCC at T=50, K=100k — the
reference's racing example scaled up, /root/reference/example/racing.py:24-35)
is built in three driver-facing places: ``bench.py`` (the recorded
benchmark), ``__graft_entry__.entry()`` (the single-chip compile check)
and ``benchmarks/run_all.py`` (the per-workload snapshot).  All of them
call :func:`build_flagship` so the benchmarked program, the
compile-checked program and the snapshot cannot drift.

This lives inside the package (not under ``benchmarks/``) so consumers
that import it in-process — the driver calls ``entry()`` from an
arbitrary interpreter — do not depend on a generically-named top-level
``benchmarks`` module that another tool may already occupy.
"""

from __future__ import annotations

FLAGSHIP_HORIZON = 50
FLAGSHIP_NUM_SAMPLES = 100_000


def build_flagship(horizon: int = FLAGSHIP_HORIZON,
                   num_samples: int = FLAGSHIP_NUM_SAMPLES,
                   env=None):
    """Build the flagship racing tick -> ``(env, solver, tick)``.

    ``tick(solver_state, cind, x) -> (action_seq, state_seq, new_state,
    new_cind)`` is unjitted — callers choose jit/donation.  The solver is
    the fused Pallas kernel on TPU, the numerically equivalent XLA scan
    path elsewhere.  Pass ``env`` to reuse an already-built
    :class:`~mppi_playground_tpu.envs.racing_env.RacingEnv` (map
    rasterization is host-side and takes ~1 s).
    """
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.fused_solver import make_fused_solver
    from mppi_playground_tpu.core.solver import make_solver
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_mpcc_cost,
        make_racing_fused_task_from_env,
    )
    from mppi_playground_tpu.ops.fused_solve import fused_supported

    if env is None:
        env = RacingEnv()
    config = MPPIConfig(
        horizon=horizon,
        num_samples=num_samples,
        dim_state=4,
        dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.1),
        lambda_=1.0,
        store_rollouts=False,  # production serving config: rollouts implicit
    )
    if fused_supported():
        # one Pallas kernel per tick (ops/fused_solve.py)
        task = make_racing_fused_task_from_env(env)
        solver = make_fused_solver(config, task, env.dynamics, jit=False)
    else:
        cost_fn = make_mpcc_cost(env.obstacle_cost_map, env.lane_cost_map)
        solver = make_solver(config, env.dynamics, cost_fn, jit=False)
    path = env.racing_center_path

    def tick(solver_state, cind, x):
        xref, new_cind = calc_ref_trajectory(x, path, cind, horizon)
        result = solver.solve(solver_state, x, info={"reference_path": xref})
        return result.action_seq, result.state_seq, result.state, new_cind

    return env, solver, tick
