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
import types

import jax.numpy as jnp
import numpy as np
import pytest

_REF = "/root/reference/src"
_REF_EXAMPLES = "/root/reference/example"
torch = pytest.importorskip("torch")
if not os.path.exists(os.path.join(_REF, "pi_mpc", "mppi.py")):
    pytest.skip("reference mount unavailable", allow_module_level=True)
sys.path.insert(0, _REF)

from pi_mpc import MPPI as TorchMPPI  # noqa: E402

from mppi_playground_tpu.core.config import MPPIConfig  # noqa: E402
from mppi_playground_tpu.core.solver import make_solver  # noqa: E402
from mppi_playground_tpu.models import cartpole  # noqa: E402
from mppi_playground_tpu.models import danger_zone as dz_model  # noqa: E402
from mppi_playground_tpu.models import mountain_car  # noqa: E402
from mppi_playground_tpu.models import pendulum  # noqa: E402

HORIZON = 15
K = 256


def _stub_optional_modules():
    """Make the upstream example/env modules importable headless.

    ``example/racing.py`` imports ``fire`` (CLI plumbing) and
    ``envs/racing_env.py`` imports moviepy (gif export) at module level;
    neither is installed in this image and neither participates in the
    numerics under test, so empty stand-ins are registered.
    """
    if "fire" not in sys.modules:
        fire_mod = types.ModuleType("fire")
        fire_mod.Fire = lambda *a, **k: None
        sys.modules["fire"] = fire_mod
    if "moviepy" not in sys.modules:
        clip_mod = types.ModuleType("moviepy.video.io.ImageSequenceClip")
        clip_mod.ImageSequenceClip = object
        for name in ("moviepy", "moviepy.video", "moviepy.video.io"):
            sys.modules[name] = types.ModuleType(name)
        sys.modules["moviepy.video.io.ImageSequenceClip"] = clip_mod


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


# ---------------------------------------------------------------------------
# Generic harness for the remaining model families: upstream MPPI driven by
# torch re-statements of the example models (the upstream dynamics live
# inline in example main() functions and cannot be imported), our solver
# driven by the packaged models, identical injected noise, 3 warm-started
# ticks.  Tolerances: actions atol 2e-3, states atol 5e-3 (float32
# reduction-order drift compounding over chained ticks, same as pendulum).
# ---------------------------------------------------------------------------


def _run_family(
    ref_dyn, ref_cost, our_dyn, our_cost, horizon, dim_state, dim_control,
    u_min, u_max, sigmas, lambda_, x0, ticks=3, action_atol=2e-3,
    state_atol=5e-3,
):
    ref = TorchMPPI(
        horizon=horizon,
        num_samples=K,
        dim_state=dim_state,
        dim_control=dim_control,
        dynamics=ref_dyn,
        cost_func=ref_cost,
        u_min=torch.tensor(list(u_min)),
        u_max=torch.tensor(list(u_max)),
        sigmas=torch.tensor(list(sigmas)),
        lambda_=lambda_,
        device=torch.device("cpu"),
        dtype=torch.float32,
    )
    cfg = MPPIConfig(
        horizon=horizon, num_samples=K, dim_state=dim_state,
        dim_control=dim_control, u_min=tuple(u_min), u_max=tuple(u_max),
        sigmas=tuple(sigmas), lambda_=lambda_, store_rollouts=False,
    )
    ours = make_solver(cfg, our_dyn, our_cost, jit=True, donate_state=False)
    st = ours.init()
    rng = np.random.default_rng(7)
    x = np.asarray(x0, np.float32)
    sig = np.asarray(sigmas, np.float32)

    for tick in range(ticks):
        noise = (
            rng.normal(size=(K, horizon, dim_control)).astype(np.float32) * sig
        )
        ref._noise_distribution = _FixedNoise(noise)
        ref_actions, ref_states = ref.forward(torch.as_tensor(x))
        res = ours.solve(st, jnp.asarray(x), noise=jnp.asarray(noise))
        st = res.state

        np.testing.assert_allclose(
            np.asarray(res.action_seq), ref_actions.detach().numpy(),
            atol=action_atol, err_msg=f"action_seq diverged at tick {tick}",
        )
        np.testing.assert_allclose(
            np.asarray(res.state_seq), ref_states.detach().numpy()[0],
            atol=state_atol, err_msg=f"state_seq diverged at tick {tick}",
        )
        x = np.asarray(
            our_dyn(jnp.asarray(x)[None], res.action_seq[None, 0])
        )[0]


def test_cartpole_matches_upstream():
    """Cartpole incl. the bang-bang force mapping (example/cartpole.py:17-107)."""

    def ref_dyn(state, action):
        x = state[:, 0].view(-1, 1)
        x_dt = state[:, 1].view(-1, 1)
        theta = state[:, 2].view(-1, 1)
        theta_dt = state[:, 3].view(-1, 1)
        total_mass = 1.1
        polemass_length = 0.1 * 0.5
        continuous_action = action[:, 0].view(-1, 1)
        force = torch.where(continuous_action >= 0, 10.0, -10.0)
        costheta = torch.cos(theta)
        sintheta = torch.sin(theta)
        temp = (force + polemass_length * theta_dt**2 * sintheta) / total_mass
        thetaacc = (9.8 * sintheta - costheta * temp) / (
            0.5 * (4.0 / 3.0 - 0.1 * costheta**2 / total_mass)
        )
        xacc = temp - polemass_length * thetaacc * costheta / total_mass
        newx = torch.clamp(x + 0.02 * x_dt, -2.4, 2.4)
        newx_dt = x_dt + 0.02 * xacc
        th_lim = 12 * 2 * torch.pi / 360
        newtheta = torch.clamp(theta + 0.02 * theta_dt, -th_lim, th_lim)
        newtheta_dt = theta_dt + 0.02 * thetaacc
        return torch.cat((newx, newx_dt, newtheta, newtheta_dt), dim=1)

    def ref_cost(state, action, info):
        th = ((state[:, 2] + torch.pi) % (2 * torch.pi)) - torch.pi
        return th**2 + 0.1 * state[:, 3] ** 2 + 0.1 * state[:, 0] ** 2

    _run_family(
        ref_dyn, ref_cost, cartpole.dynamics, cartpole.cost,
        horizon=10, dim_state=4, dim_control=1,
        u_min=(-3.0,), u_max=(3.0,), sigmas=(1.0,), lambda_=0.001,
        x0=[0.0, 0.0, 0.15, 0.0],
    )


def test_mountain_car_matches_upstream():
    """Mountain car (example/mountaincar.py:17-77; horizon cut for test time)."""

    def ref_dyn(state, action):
        position = state[:, 0].view(-1, 1)
        velocity = state[:, 1].view(-1, 1)
        force = torch.clamp(action[:, 0].view(-1, 1), -1.0, 1.0)
        velocity = velocity + force * 0.0015 - 0.0025 * torch.cos(3 * position)
        velocity = torch.clamp(velocity, -0.07, 0.07)
        position = torch.clamp(position + velocity, -1.2, 0.6)
        return torch.cat((position, velocity), dim=1)

    def ref_cost(state, action, info):
        return (0.45 - state[:, 0]) ** 2

    _run_family(
        ref_dyn, ref_cost, mountain_car.dynamics, mountain_car.cost,
        horizon=30, dim_state=2, dim_control=1,
        u_min=(-1.0,), u_max=(1.0,), sigmas=(1.0,), lambda_=0.1,
        x0=[-0.5, 0.0],
    )


def test_danger_zone_matches_upstream():
    """CMDP model driven by the ACTUAL upstream env's parallel_step/cost.

    The upstream ``GoalInDangerZoneEnv`` (src/envs/goal_in_danger_zone.py)
    is importable, so both batched callables come straight from it — no
    re-statement.  Our dynamics recover goal/center from the observation
    itself (models/danger_zone.py docstring) vs the env's exact episode
    tensors; the only divergence is ~ulp drift on those features.
    """
    _stub_optional_modules()
    import matplotlib

    matplotlib.use("Agg")
    from envs.goal_in_danger_zone import GoalInDangerZoneEnv

    np.random.seed(3)
    env = GoalInDangerZoneEnv(render_mode="rgb_array")
    obs, _ = env.reset()
    plt_mod = sys.modules["matplotlib.pyplot"]
    plt_mod.close(env._fig)

    _run_family(
        env.parallel_step, env.parallel_cost,
        dz_model.make_dynamics(), dz_model.make_cost(radius=10.0),
        horizon=30, dim_state=7, dim_control=2,
        u_min=(-1.0, -1.0), u_max=(1.0, 1.0), sigmas=(0.5, 0.5),
        lambda_=1.0, x0=obs,
    )


def test_racing_full_stack_matches_upstream():
    """Full upstream racing stack: env + racing_controller + MPCC cost +
    calc_ref_trajectory (example/racing.py:16-218) vs our RacingController.

    Both sides build their own maps (byte-identical by
    tests/test_reference_map_parity.py), generate the reference trajectory
    from their own monotone path index, and solve with identical injected
    noise over 3 warm-started ticks.
    """
    _stub_optional_modules()
    import matplotlib

    matplotlib.use("Agg")
    sys.path.insert(0, _REF_EXAMPLES)
    try:
        from racing import racing_controller as RefRacingController
        from envs.racing_env import RacingEnv as RefRacingEnv
    finally:
        sys.path.remove(_REF_EXAMPLES)

    from mppi_playground_tpu.envs.racing_controller import RacingController
    from mppi_playground_tpu.envs.racing_env import RacingEnv

    # the upstream env reads its circuit CSV relative to the repo root
    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        ref_env = RefRacingEnv(device=torch.device("cpu"))
    finally:
        os.chdir(cwd)
    ref_ctrl = RefRacingController(ref_env, device=torch.device("cpu"))
    ref_ctrl.set_cost_map(ref_env._obstacle_map, ref_env._lane_map)

    # same track as upstream: our default circuit is procedural (the
    # bundled CSV was deliberately not copied), so load the reference CSV
    # from the read-only mount for the head-to-head run
    our_env = RacingEnv(
        csv_path="/root/reference/src/envs/circuit_generator/circuit.csv"
    )
    ours = RacingController(our_env, solver_backend="xla",
                            store_rollouts=False)

    horizon, k, m = 25, 4000, 2
    x_ref = ref_env.reset()
    x = np.asarray(our_env.reset(), np.float32)
    np.testing.assert_allclose(x_ref.cpu().numpy(), x, atol=1e-6)

    rng = np.random.default_rng(11)
    sig = np.asarray([0.5, 0.1], np.float32)
    for tick in range(3):
        noise = rng.normal(size=(k, horizon, m)).astype(np.float32) * sig
        ref_ctrl.solver._noise_distribution = _FixedNoise(noise)
        ref_actions, ref_states = ref_ctrl.update(
            torch.as_tensor(x), ref_env.racing_center_path
        )
        a, s = ours.update(x, noise=jnp.asarray(noise))

        np.testing.assert_allclose(
            np.asarray(ours.reference_path),
            ref_ctrl.reference_path.cpu().numpy(),
            atol=1e-5,
            err_msg=f"reference trajectory diverged at tick {tick}",
        )
        assert int(ours.current_path_index) == int(ref_ctrl.current_path_index)
        np.testing.assert_allclose(
            np.asarray(a), ref_actions.detach().numpy(), atol=2e-3,
            err_msg=f"action_seq diverged at tick {tick}",
        )
        np.testing.assert_allclose(
            np.asarray(s), ref_states.detach().numpy()[0], atol=5e-3,
            err_msg=f"state_seq diverged at tick {tick}",
        )
        x = np.asarray(
            our_env.dynamics(jnp.asarray(x)[None], a[None, 0])
        )[0]


def test_posterior_sampling_matches_upstream(monkeypatch):
    """get_samples_from_posterior head-to-head (mppi.py:489-506).

    The posterior is a Gaussian centered on the optimal sequence with the
    solver's noise covariance; torch's MVN stream cannot be reproduced in
    JAX, so the upstream draw is stubbed with fixed noise and ours is
    formed with the same noise through the same ``loc + noise * sigma``
    arithmetic (diagonal covariance).  The deterministic remainder — the
    predictive-state re-roll through the dynamics — must then match.
    """
    import pi_mpc.mppi as ref_mppi

    from mppi_playground_tpu.core.diagnostics import posterior_samples

    ref, ours = _build(1.0)
    st = ours.init()
    rng = np.random.default_rng(3)
    x = np.array([np.pi, 0.0], np.float32)
    noise = rng.normal(size=(K, HORIZON, 1)).astype(np.float32)

    ref._noise_distribution = _FixedNoise(noise)
    ref_actions, _ = ref.forward(torch.as_tensor(x))
    res = ours.solve(st, jnp.asarray(x), noise=jnp.asarray(noise))
    np.testing.assert_allclose(
        np.asarray(res.action_seq), ref_actions.detach().numpy(), atol=2e-3
    )

    n = 32
    post_noise = rng.normal(size=(n, HORIZON, 1)).astype(np.float32)

    class _FixedMVN:
        """MVN stub: loc + fixed standard noise * sigma (diag covariance)."""

        def __init__(self, loc, covariance_matrix):
            self._loc = loc
            self._scale = torch.sqrt(torch.diagonal(covariance_matrix, dim1=-2, dim2=-1))

        def sample(self, sample_shape):
            z = torch.as_tensor(post_noise)
            return self._loc.unsqueeze(0) + z * self._scale.unsqueeze(0)

    monkeypatch.setattr(ref_mppi, "MultivariateNormal", _FixedMVN)
    ref_samples, ref_pred = ref.get_samples_from_posterior(
        ref_actions, torch.as_tensor(x), n
    )

    # ours: same arithmetic as diagnostics.posterior_samples with the
    # injected standard-normal draw instead of the internal key
    sigmas = jnp.asarray([1.0], jnp.float32)
    our_samples = res.action_seq[None] + jnp.asarray(post_noise) * sigmas
    # the key-driven public API has the same shape/statistics contract
    api_samples = posterior_samples(
        __import__("jax").random.PRNGKey(0), res.action_seq, sigmas, n
    )
    assert api_samples.shape == our_samples.shape
    our_pred = ours.states_prediction(jnp.asarray(x), our_samples)

    np.testing.assert_allclose(
        np.asarray(our_samples), ref_samples.detach().numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(our_pred), ref_pred.detach().numpy(), atol=5e-3
    )
