"""Shared-noise parity: TPU solver vs the float64 torch oracle.

This is the BASELINE.json "control-seq max-err within tolerance at matched
horizon/num_samples/seed" gate: both implementations receive identical
noise tensors, so every remaining computation (rollout, costs, softmin
weighting, auto-lambda, SG filter, warm start) must agree to float32
accuracy across multiple closed-loop ticks.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mppi_playground_tpu import MPPIConfig, make_solver
from mppi_playground_tpu.models import integrator, pendulum
from tests.reference_oracle import TorchOracleMPPI


# --- torch twins of the task models (float64) ---------------------------

def torch_integrator_dynamics(state, action):
    return state + action


def torch_integrator_cost(state, action, info):
    goal = torch.tensor([1.0, 1.0], dtype=torch.float64)
    return torch.sum((state - goal) ** 2, dim=1)


def torch_pendulum_dynamics(state, action):
    th = state[:, 0]
    thdot = state[:, 1]
    u = torch.clamp(action[:, 0], -2.0, 2.0)
    newthdot = thdot + (
        -3.0 * 10.0 / 2.0 * torch.sin(th + torch.pi) + 3.0 * u
    ) * 0.05
    newth = th + newthdot * 0.05
    newthdot = torch.clamp(newthdot, -8.0, 8.0)
    return torch.stack([newth, newthdot], dim=1)


def torch_pendulum_cost(state, action, info):
    theta = state[:, 0]
    theta_dt = state[:, 1]
    wrapped = ((theta + torch.pi) % (2 * torch.pi)) - torch.pi
    return wrapped**2 + 0.1 * theta_dt**2


CASES = {
    "integrator": dict(
        dim_state=2,
        dim_control=2,
        u_min=(-1.0, -1.0),
        u_max=(1.0, 1.0),
        sigmas=(0.5, 0.5),
        jax_model=(integrator.dynamics, integrator.cost),
        torch_model=(torch_integrator_dynamics, torch_integrator_cost),
        x0=np.array([0.0, 0.0]),
    ),
    "pendulum": dict(
        dim_state=2,
        dim_control=1,
        u_min=(-2.0,),
        u_max=(2.0,),
        sigmas=(1.0,),
        jax_model=(pendulum.dynamics, pendulum.cost),
        torch_model=(torch_pendulum_dynamics, torch_pendulum_cost),
        x0=np.array([np.pi, 0.0]),
    ),
}


def _run_parity(
    case_name,
    lambda_,
    horizon=8,
    num_samples=200,
    ticks=5,
    exploration=0.0,
    use_sg_filter=False,
    atol=2e-5,
):
    case = CASES[case_name]
    jd, jc = case["jax_model"]
    td, tc = case["torch_model"]

    config = MPPIConfig(
        horizon=horizon,
        num_samples=num_samples,
        dim_state=case["dim_state"],
        dim_control=case["dim_control"],
        u_min=case["u_min"],
        u_max=case["u_max"],
        sigmas=case["sigmas"],
        lambda_=lambda_,
        exploration=exploration,
        use_sg_filter=use_sg_filter,
    )
    solver = make_solver(config, jd, jc, donate_state=False)
    state = solver.init()

    oracle = TorchOracleMPPI(
        horizon=horizon,
        num_samples=num_samples,
        dim_state=case["dim_state"],
        dim_control=case["dim_control"],
        dynamics=td,
        cost_func=tc,
        u_min=case["u_min"],
        u_max=case["u_max"],
        sigmas=case["sigmas"],
        lambda_=lambda_,
        exploration=exploration,
        use_sg_filter=use_sg_filter,
    )

    rng = np.random.default_rng(7)
    x = case["x0"].astype(np.float64)
    max_err = 0.0
    for _ in range(ticks):
        noise = rng.normal(size=(num_samples, horizon, case["dim_control"])) * np.asarray(
            case["sigmas"]
        )
        result = solver.solve(state, jnp.asarray(x), noise=jnp.asarray(noise, jnp.float32))
        state = result.state
        actions_jax = np.asarray(result.action_seq, np.float64)
        states_jax = np.asarray(result.state_seq, np.float64)

        actions_oracle, states_oracle, _, lam_oracle = oracle.solve(
            x, noise.astype(np.float32).astype(np.float64)
        )

        err = np.max(np.abs(actions_jax - actions_oracle))
        max_err = max(max_err, err)
        np.testing.assert_allclose(actions_jax, actions_oracle, atol=atol)
        np.testing.assert_allclose(states_jax, states_oracle, atol=atol * 20)

        # drive both with the oracle's first action (closed loop)
        x = oracle.dynamics(
            torch.as_tensor(x).unsqueeze(0),
            torch.as_tensor(actions_oracle[0]).unsqueeze(0),
        )[0].numpy()
    return max_err


@pytest.mark.parametrize("case", ["integrator", "pendulum"])
def test_parity_fixed_lambda(case):
    _run_parity(case, lambda_=1.0)


@pytest.mark.parametrize("case", ["integrator", "pendulum"])
def test_parity_low_lambda(case):
    # low temperature exponentiates float32 cost differences into the
    # weights, so the tolerance is looser than the fixed-lambda case
    _run_parity(case, lambda_=0.05, atol=3e-4)


def test_parity_exploration():
    _run_parity("integrator", lambda_=1.0, exploration=0.3)


def test_parity_sg_filter():
    _run_parity("integrator", lambda_=1.0, use_sg_filter=True, atol=5e-5)


def test_parity_essps():
    # auto-lambda runs in float32 on device vs float64 scipy: the root agrees
    # to ~1e-3 relative, which propagates into the weighted average.
    _run_parity("pendulum", lambda_="ESSPS", atol=5e-3)


def test_parity_lbps():
    _run_parity("pendulum", lambda_="LBPS", atol=5e-3)


def test_parity_mpo():
    _run_parity("pendulum", lambda_="MPO", atol=1e-4)


def test_parity_random_config_sweep():
    """Seeded fuzz over the config space: random horizon/K/exploration/SG/λ
    combinations must all track the float64 oracle — catches interactions
    the fixed-point tests above don't reach."""
    rng = np.random.default_rng(2024)
    for i in range(6):
        case = ("integrator", "pendulum")[i % 2]
        lambda_ = [1.0, 0.05, "ESSPS", "LBPS", "MPO", 10.0][i]
        loose = isinstance(lambda_, str)  # f32 auto-λ vs f64 scipy root
        _run_parity(
            case,
            lambda_=lambda_,
            horizon=int(rng.integers(3, 16)),
            num_samples=int(rng.integers(64, 400)),
            ticks=3,
            exploration=float(rng.choice([0.0, 0.25, 0.9])),
            use_sg_filter=bool(rng.integers(0, 2)),
            atol=5e-3 if loose else 1e-4,
        )
