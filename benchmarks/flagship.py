"""Shared flagship-workload construction (racing MPCC @ T=50, K=100k).

The BASELINE north-star workload is built in two driver-facing places:
``bench.py`` (the recorded benchmark) and ``__graft_entry__.entry()`` (the
single-chip compile check).  Both call :func:`build_flagship` so the
benchmarked program and the compile-checked program cannot drift.
"""

from __future__ import annotations


def build_flagship(horizon: int, num_samples: int):
    """Build the flagship racing tick -> ``(env, solver, tick)``.

    ``tick(solver_state, cind, x) -> (action_seq, state_seq, new_state,
    new_cind)`` is unjitted — callers choose jit/donation.  The solver is
    the fused Pallas kernel on TPU, the numerically equivalent XLA scan
    path elsewhere.
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
