"""Numerical guards raise on non-finite solves."""

import jax.numpy as jnp
import pytest
from jax.experimental import checkify

from mppi_playground_tpu.core.config import MPPIConfig
from mppi_playground_tpu.core.solver import make_solver
from mppi_playground_tpu.utils.guards import checked_solve


def _solver(cost_scale):
    cfg = MPPIConfig(
        horizon=4, num_samples=64, dim_state=1, dim_control=1,
        u_min=(-1.0,), u_max=(1.0,), sigmas=(1.0,), lambda_=1.0,
        store_rollouts=False,
    )

    def dynamics(state, action):
        return state + cost_scale * action

    def cost(state, action, info):
        return jnp.sum(state**2, axis=1)

    return make_solver(cfg, dynamics, cost, jit=False)


def test_checked_solve_passes_finite():
    solver = _solver(0.1)
    solve = checked_solve(solver)
    r = solve(solver.init(), jnp.zeros(1))
    assert jnp.isfinite(r.action_seq).all()


def test_checked_solve_raises_on_nan():
    solver = _solver(jnp.inf)  # inf * 0-noise -> nan states -> nan costs
    solve = checked_solve(solver)
    with pytest.raises(checkify.JaxRuntimeError, match="non-finite"):
        solve(solver.init(), jnp.zeros(1))


def test_checked_solve_wraps_sharded_solver():
    """The guard must work on solve surfaces without a noise parameter
    (the sharded solver generates its own sharded noise internally)."""
    from mppi_playground_tpu.parallel import make_mesh, make_sharded_solver

    cfg = MPPIConfig(
        horizon=4,
        num_samples=64,
        dim_state=1,
        dim_control=1,
        u_min=(-1.0,),
        u_max=(1.0,),
        sigmas=(0.5,),
        lambda_=1.0,
    )

    def dynamics(state, action):
        return state + 0.1 * action

    def cost(state, action, info):
        return jnp.sum(state**2, axis=1)

    mesh = make_mesh(mesh_shape=(1, 8))
    solver = make_sharded_solver(cfg, dynamics, cost, mesh, jit=False)
    solve = checked_solve(solver)
    r = solve(solver.init(), jnp.zeros(1))
    assert jnp.isfinite(r.action_seq).all()
