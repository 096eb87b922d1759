"""Head-to-head parity against the ACTUAL reference implementation.

Unlike tests/reference_oracle.py (a float64 re-derivation of the
algorithm), this runs the real upstream PyTorch solver from the read-only
mount at /root/reference on CPU, feeds both implementations the *same*
noise through their respective injection seams (ours: the ``noise=``
argument; the reference's: replacing its frozen ``_noise_distribution``
with a fixed-sample stub), and asserts the control sequences match.

Skipped automatically when the reference mount or torch is unavailable
(e.g. public CI).
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

_REF = "/root/reference/src"
torch = pytest.importorskip("torch")
if not os.path.exists(os.path.join(_REF, "pi_mpc", "mppi.py")):
    pytest.skip("reference mount unavailable", allow_module_level=True)
sys.path.insert(0, _REF)

from pi_mpc import MPPI as TorchMPPI  # noqa: E402

from mppi_playground_tpu.core.config import MPPIConfig  # noqa: E402
from mppi_playground_tpu.core.solver import make_solver  # noqa: E402
from mppi_playground_tpu.models import pendulum  # noqa: E402

HORIZON = 15
K = 256


class _FixedNoise:
    """Stands in for the reference's frozen MultivariateNormal."""

    def __init__(self, noise_np):
        self._noise = torch.as_tensor(noise_np, dtype=torch.float32)

    def rsample(self, sample_shape):
        assert tuple(sample_shape)[0] == self._noise.shape[0]
        return self._noise.clone()


def _torch_pendulum_dynamics(state, action):
    th = state[:, 0]
    thdot = state[:, 1]
    u = torch.clamp(action[:, 0], -2.0, 2.0)
    newthdot = thdot + (
        -3.0 * 10.0 / (2.0 * 1.0) * torch.sin(th + torch.pi) + 3.0 * u
    ) * 0.05
    newth = th + newthdot * 0.05
    newthdot = torch.clamp(newthdot, -8.0, 8.0)
    return torch.stack([newth, newthdot], dim=1)


def _torch_pendulum_cost(state, action, info):
    th = ((state[:, 0] + torch.pi) % (2 * torch.pi)) - torch.pi
    return th**2 + 0.1 * state[:, 1] ** 2


def _build(lambda_, **kw):
    ref = TorchMPPI(
        horizon=HORIZON,
        num_samples=K,
        dim_state=2,
        dim_control=1,
        dynamics=_torch_pendulum_dynamics,
        cost_func=_torch_pendulum_cost,
        u_min=torch.tensor([-2.0]),
        u_max=torch.tensor([2.0]),
        sigmas=torch.tensor([1.0]),
        lambda_=lambda_,
        device=torch.device("cpu"),
        dtype=torch.float32,
        **kw,
    )
    cfg = MPPIConfig(
        horizon=HORIZON, num_samples=K, dim_state=2, dim_control=1,
        u_min=(-2.0,), u_max=(2.0,), sigmas=(1.0,), lambda_=lambda_,
        store_rollouts=False, **kw,
    )
    ours = make_solver(cfg, pendulum.dynamics, pendulum.cost, jit=True,
                       donate_state=False)
    return ref, ours


@pytest.mark.parametrize(
    "lambda_,kw",
    [
        (1.0, {}),
        (0.05, {}),
        (1.0, {"exploration": 0.25}),
        (1.0, {"use_sg_filter": True, "sg_window_size": 5, "sg_poly_order": 3}),
        ("ESSPS", {}),
        ("LBPS", {}),
        ("MPO", {}),
    ],
    ids=["fixed", "low-lambda", "exploration", "sg-filter", "essps", "lbps",
         "mpo"],
)
def test_matches_upstream_reference(lambda_, kw):
    ref, ours = _build(lambda_, **kw)
    st = ours.init()
    rng = np.random.default_rng(0)
    x = np.array([np.pi, 0.0], np.float32)

    for tick in range(3):  # chained ticks exercise the warm start
        noise = rng.normal(size=(K, HORIZON, 1)).astype(np.float32)  # sigma=1

        ref._noise_distribution = _FixedNoise(noise)
        ref_actions, ref_states = ref.forward(torch.as_tensor(x))

        res = ours.solve(st, jnp.asarray(x), noise=jnp.asarray(noise))
        st = res.state

        np.testing.assert_allclose(
            np.asarray(res.action_seq),
            ref_actions.detach().numpy(),
            atol=2e-3,
            err_msg=f"action_seq diverged at tick {tick}",
        )
        # the reference returns state_seq with a leading batch-1 dim
        np.testing.assert_allclose(
            np.asarray(res.state_seq),
            ref_states.detach().numpy()[0],
            atol=5e-3,
            err_msg=f"state_seq diverged at tick {tick}",
        )
        if isinstance(lambda_, str):
            np.testing.assert_allclose(
                float(st.lam), float(ref._lambda), rtol=2e-2,
                err_msg=f"lambda diverged at tick {tick}",
            )
        # advance the plant with the agreed first action
        x = np.asarray(
            pendulum.dynamics(jnp.asarray(x)[None], res.action_seq[None, 0])
        )[0]
