"""Every model family solves identically on the fused and XLA paths.

Injected noise makes the two paths consume the same perturbations; this
sweeps pendulum / cartpole / mountain car / integrator / navigation-2d /
racing through both solvers and asserts matching costs and actions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_playground_tpu.core.config import MPPIConfig
from mppi_playground_tpu.core.fused_solver import make_fused_solver
from mppi_playground_tpu.core.solver import make_solver

K = 1024
HORIZON = 6


def _pendulum():
    from mppi_playground_tpu.models import pendulum

    return (
        pendulum.fused_task(), pendulum.dynamics, pendulum.cost,
        dict(dim_state=2, dim_control=1, u_min=(-2.0,), u_max=(2.0,),
             sigmas=(1.0,)),
        jnp.asarray([np.pi, 0.0]), {},
    )


def _cartpole():
    from mppi_playground_tpu.models import cartpole

    return (
        cartpole.fused_task(), cartpole.dynamics, cartpole.cost,
        dict(dim_state=4, dim_control=1, u_min=(-1.0,), u_max=(1.0,),
             sigmas=(1.0,)),
        jnp.asarray([0.0, 0.0, 0.1, 0.0]), {},
    )


def _mountain_car():
    from mppi_playground_tpu.models import mountain_car

    return (
        mountain_car.fused_task(), mountain_car.dynamics, mountain_car.cost,
        dict(dim_state=2, dim_control=1, u_min=(-1.0,), u_max=(1.0,),
             sigmas=(1.0,)),
        jnp.asarray([-0.5, 0.0]), {},
    )


def _integrator():
    from mppi_playground_tpu.models import integrator

    return (
        integrator.fused_task(), integrator.dynamics, integrator.cost,
        dict(dim_state=2, dim_control=2, u_min=(-1.0, -1.0),
             u_max=(1.0, 1.0), sigmas=(0.5, 0.5)),
        jnp.zeros(2), {},
    )


def _danger_zone():
    from mppi_playground_tpu.models import danger_zone

    dyn = danger_zone.make_dynamics()
    cost = danger_zone.make_cost(radius=1.5)
    return (
        danger_zone.make_fused_task(radius=1.5), dyn, cost,
        dict(dim_state=7, dim_control=2, u_min=(-1.0, -1.0),
             u_max=(1.0, 1.0), sigmas=(0.5, 0.5)),
        jnp.asarray([0.0, 0.0, 0.3, 3.0, 2.0, 1.5, 1.0]), {},
    )


def _navigation(nav_env):
    return (
        nav_env.fused_task(), nav_env.dynamics, nav_env.cost_function,
        dict(dim_state=3, dim_control=2, u_min=(0.0, -1.0), u_max=(2.0, 1.0),
             sigmas=(0.5, 0.5)),
        nav_env.reset(), {},
    )


def _racing(racing_env):
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_mpcc_cost,
        make_racing_fused_task_from_env,
    )

    env = racing_env
    task = make_racing_fused_task_from_env(env)
    x0 = env.reset()
    xref, _ = calc_ref_trajectory(
        x0, env.racing_center_path, jnp.asarray(0, jnp.int32), HORIZON
    )
    return (
        task, env.dynamics,
        make_mpcc_cost(env.obstacle_cost_map, env.lane_cost_map),
        dict(dim_state=4, dim_control=2, u_min=(-2.0, -0.25),
             u_max=(2.0, 0.25), sigmas=(0.5, 0.1)),
        x0, {"reference_path": xref},
    )


@pytest.fixture(scope="module")
def nav_env():
    from mppi_playground_tpu.envs.navigation_2d import Navigation2DEnv

    return Navigation2DEnv()


@pytest.fixture(scope="module")
def racing_env():
    from mppi_playground_tpu.envs.racing_env import RacingEnv

    return RacingEnv()


@pytest.mark.parametrize(
    "name", ["pendulum", "cartpole", "mountain_car", "integrator",
             "danger_zone", "navigation", "racing"]
)
def test_fused_model_matches_xla(name, nav_env, racing_env):
    if name == "navigation":
        task, dyn, cost, dims, x0, info = _navigation(nav_env)
    elif name == "racing":
        task, dyn, cost, dims, x0, info = _racing(racing_env)
    else:
        task, dyn, cost, dims, x0, info = globals()[f"_{name}"]()

    cfg = MPPIConfig(
        horizon=HORIZON, num_samples=K, lambda_=1.0, store_rollouts=False,
        **dims,
    )
    fused = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)
    xla = make_solver(cfg, dyn, cost, jit=True, donate_state=False)
    noise = jax.random.normal(
        jax.random.PRNGKey(0), (K, HORIZON, dims["dim_control"]), jnp.float32
    ) * jnp.asarray(dims["sigmas"])

    rf = fused.solve(fused.init(), x0, info=info, noise=noise)
    rx = xla.solve(xla.init(), x0, info=info, noise=noise)

    np.testing.assert_allclose(
        np.asarray(rf.aux.costs), np.asarray(rx.aux.costs), rtol=2e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rf.action_seq), np.asarray(rx.action_seq), atol=5e-3
    )


def test_bicycle_wide_steering_keeps_true_tan():
    """The degree-7 tan polynomial is only valid on the reference's small
    steering clamp; custom wide bounds (legal via the public API) must
    fall back to the true tan instead of silently diverging."""
    import numpy as np

    from mppi_playground_tpu.models.bicycle import make_dynamics

    wide = make_dynamics(
        x_lim=(-100.0, 100.0), y_lim=(-100.0, 100.0),
        u_min=(-2.0, -1.2), u_max=(2.0, 1.2),
    )
    x = jnp.asarray([[0.0, 0.0, 0.0, 4.0]], jnp.float32)
    u = jnp.asarray([[0.0, 1.2]], jnp.float32)
    got = float(wide(x, u)[0, 2])  # new theta
    expected = 4.0 * float(np.tan(1.2)) * 0.1  # v * tan(steer) / L * dt
    np.testing.assert_allclose(got, expected, rtol=1e-6)

    # the default clamp still takes the polynomial (same value to 1e-7)
    narrow = make_dynamics(x_lim=(-100.0, 100.0), y_lim=(-100.0, 100.0))
    u = jnp.asarray([[0.0, 0.25]], jnp.float32)
    got = float(narrow(x, u)[0, 2])
    np.testing.assert_allclose(got, 4.0 * float(np.tan(0.25)) * 0.1, rtol=1e-6)
