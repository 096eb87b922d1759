"""Fused Pallas solve kernel: equivalence with the XLA solver.

Runs the kernel in interpret mode on CPU (tests/conftest.py pins the CPU
backend); the same code path compiles natively on TPU.  Equivalence is
checked through the noise-injection seam so both solvers consume identical
perturbations — the remaining differences are float32 reduction-order
effects, which the weighting exponentially amplifies on near-tied samples,
hence the modest action tolerance (costs themselves are tight).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_playground_tpu.core.config import MPPIConfig
from mppi_playground_tpu.core.fused_solver import make_fused_solver
from mppi_playground_tpu.core.solver import make_solver
from mppi_playground_tpu.maps.grid_cost import GridMapData, grid_cost
from mppi_playground_tpu.ops.fused_solve import FusedTask
from mppi_playground_tpu.ops.row_intervals import (
    build_row_interval_table,
    interval_query,
)

K = 2048
HORIZON = 8


def _toy_task():
    """Point-mass-with-drag model exercising the SoA contract, no maps."""

    def dynamics_soa(xs, us):
        px, v = xs
        (a,) = us
        new_v = 0.9 * v + 0.1 * jnp.clip(a, -1.0, 1.0)
        return (px + 0.1 * new_v, new_v)

    def cost_soa(xs, us, ctx):
        px, v = xs
        target = ctx["smem"]["target"][ctx["t"], 0]
        prev_a = ctx["prev_us"][0]
        return (px - target) ** 2 + 0.1 * v * v + 0.01 * (us[0] - prev_a) ** 2

    def smem_builder(info):
        return {"target": info["target"]}

    return FusedTask(
        dynamics_soa=dynamics_soa,
        stage_cost_soa=cost_soa,
        vmem_args={},
        smem_builder=smem_builder,
    )


def _toy_aos():
    def dynamics(state, action):
        new_v = 0.9 * state[:, 1] + 0.1 * jnp.clip(action[:, 0], -1.0, 1.0)
        return jnp.stack([state[:, 0] + 0.1 * new_v, new_v], axis=1)

    def cost(state, action, info):
        target = jnp.take(info["target"], info["t"], axis=0)[0]
        prev_a = info["prev_action"][:, 0]
        return (
            (state[:, 0] - target) ** 2
            + 0.1 * state[:, 1] ** 2
            + 0.01 * (action[:, 0] - prev_a) ** 2
        )

    return dynamics, cost


def _config(**kw):
    defaults = dict(
        horizon=HORIZON,
        num_samples=K,
        dim_state=2,
        dim_control=1,
        u_min=(-1.0,),
        u_max=(1.0,),
        sigmas=(0.7,),
        lambda_=0.5,
        store_rollouts=False,
    )
    defaults.update(kw)
    return MPPIConfig(**defaults)


@pytest.fixture(scope="module")
def solvers():
    cfg = _config()
    task = _toy_task()
    dyn, cost = _toy_aos()
    fused = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)
    xla = make_solver(cfg, dyn, cost, jit=True, donate_state=False)
    return cfg, fused, xla


def _info():
    return {"target": jnp.ones((HORIZON, 1), jnp.float32) * 2.0}


def test_fused_matches_xla_with_injected_noise(solvers):
    cfg, fused, xla = solvers
    x0 = jnp.asarray([0.0, 0.0], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(7), (K, HORIZON, 1), jnp.float32) * 0.7
    )
    rf = fused.solve(fused.init(), x0, info=_info(), noise=noise)
    rx = xla.solve(xla.init(), x0, info=_info(), noise=noise)

    np.testing.assert_allclose(
        np.asarray(rf.aux.costs), np.asarray(rx.aux.costs), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rf.action_seq), np.asarray(rx.action_seq), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(rf.aux.weights), np.asarray(rx.aux.weights), atol=1e-5
    )
    np.testing.assert_allclose(
        float(rf.aux.ess), float(rx.aux.ess), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(rf.state_seq), np.asarray(rx.state_seq), atol=5e-3
    )


def test_fused_padding_and_exploration():
    """K not a multiple of 1024 (padding) + exploration split."""
    cfg = _config(num_samples=1500, exploration=0.3)
    task = _toy_task()
    dyn, cost = _toy_aos()
    fused = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)
    xla = make_solver(cfg, dyn, cost, jit=True, donate_state=False)
    x0 = jnp.asarray([0.5, -0.2], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(11), (1500, HORIZON, 1), jnp.float32)
        * 0.7
    )
    st_f = fused.init()
    st_x = xla.init()
    # warm start matters for the exploration split: run two chained solves
    for _ in range(2):
        rf = fused.solve(st_f, x0, info=_info(), noise=noise)
        rx = xla.solve(st_x, x0, info=_info(), noise=noise)
        st_f, st_x = rf.state, rx.state
    np.testing.assert_allclose(
        np.asarray(rf.aux.costs), np.asarray(rx.aux.costs), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rf.action_seq), np.asarray(rx.action_seq), atol=5e-3
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu.prng_random_bits has no interpreter implementation",
)
def test_fused_kernel_rng_statistics():
    """In-kernel Box-Muller normals: bounded actions, sane spread."""
    cfg = _config(lambda_=100.0)  # high temperature -> update ~ sample mean
    task = _toy_task()
    dyn, _ = _toy_aos()
    fused = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)
    r = fused.solve(fused.init(), jnp.zeros(2, jnp.float32), info=_info())
    a = np.asarray(r.action_seq)
    assert np.isfinite(a).all()
    assert (a >= -1.0).all() and (a <= 1.0).all()
    # at lambda=100 weights are near-uniform: the weighted mean of clipped
    # N(0, 0.7) noise stays near 0 and the ESS near K
    assert abs(float(a.mean())) < 0.1
    assert float(r.aux.ess) > 0.5 * K


@pytest.mark.parametrize("mode", ["ESSPS", "LBPS", "MPO"])
def test_fused_auto_lambda_matches_xla(mode):
    """Two-phase fused auto-lambda == XLA auto-lambda at the same noise."""
    cfg = _config(lambda_=mode)
    task = _toy_task()
    dyn, cost = _toy_aos()
    fused = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)
    xla = make_solver(cfg, dyn, cost, jit=True, donate_state=False)
    x0 = jnp.asarray([0.2, 0.1], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(13), (K, HORIZON, 1), jnp.float32)
        * 0.7
    )
    st_f, st_x = fused.init(), xla.init()
    for _ in range(2):  # exercise the lambda carried across ticks
        rf = fused.solve(st_f, x0, info=_info(), noise=noise)
        rx = xla.solve(st_x, x0, info=_info(), noise=noise)
        st_f, st_x = rf.state, rx.state
    # second-tick costs inherit the first tick's ~1e-3 action drift
    # (f32 reduction order), hence the looser tolerance than one-shot tests
    np.testing.assert_allclose(
        np.asarray(rf.aux.costs), np.asarray(rx.aux.costs), rtol=1e-3
    )
    # LBPS's golden-section objective is flat near the optimum, so the
    # inherited ~1e-5 cost drift can move lambda by ~0.3% with negligible
    # effect on the weights
    np.testing.assert_allclose(
        float(rf.aux.lam), float(rx.aux.lam), rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(rf.action_seq), np.asarray(rx.action_seq), atol=5e-3
    )
    np.testing.assert_allclose(
        float(st_f.lam), float(st_x.lam), rtol=1e-2
    )


@pytest.mark.parametrize("mode", ["ESSPS", "LBPS"])
def test_lambda_epilogue_bitwise_equals_standalone_search(mode):
    """In-kernel lambda epilogue == standalone search kernel, bitwise.

    The epilogue (ops/fused_solve.py, lambda_mode=...) and the standalone
    VMEM kernels (ops/lambda_search.py) share the same search bodies
    (essps_bisect / lbps_golden) over the same padded block layout, so
    lambda*, the weights, and the update must agree exactly — not just
    within tolerance.  K is chosen to leave a padded last tile so the
    epilogue's masked min/max accumulation (LBPS range term) is covered.
    """
    cfg = _config(lambda_=mode, num_samples=K - 100)
    task = _toy_task()
    dyn, _ = _toy_aos()
    epi = make_fused_solver(
        cfg, task, dyn, jit=True, donate_state=False, lambda_epilogue=True
    )
    std = make_fused_solver(
        cfg, task, dyn, jit=True, donate_state=False, lambda_epilogue=False
    )
    x0 = jnp.asarray([0.2, 0.1], jnp.float32)
    noise = (
        jax.random.normal(
            jax.random.PRNGKey(13), (K - 100, HORIZON, 1), jnp.float32
        )
        * 0.7
    )
    st_e, st_s = epi.init(), std.init()
    for _ in range(2):
        re_ = epi.solve(st_e, x0, info=_info(), noise=noise)
        rs = std.solve(st_s, x0, info=_info(), noise=noise)
        st_e, st_s = re_.state, rs.state
        assert float(re_.aux.lam) == float(rs.aux.lam)
        np.testing.assert_array_equal(
            np.asarray(re_.aux.costs), np.asarray(rs.aux.costs)
        )
        np.testing.assert_array_equal(
            np.asarray(re_.aux.weights), np.asarray(rs.aux.weights)
        )
        np.testing.assert_array_equal(
            np.asarray(re_.action_seq), np.asarray(rs.action_seq)
        )


def test_fused_multi_vreg_long_horizon_matches_xla():
    """d_flat = 160 > 128: action slots span two sublanes of the packed
    numerator tile (the round-2 one-vreg envelope).  Must equal the XLA
    solver under injected noise exactly like the d_flat <= 128 case."""
    horizon = 160
    cfg = _config(horizon=horizon, num_samples=1024)
    task = _toy_task()
    dyn, cost = _toy_aos()
    fused = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)
    xla = make_solver(cfg, dyn, cost, jit=True, donate_state=False)
    x0 = jnp.asarray([0.0, 0.0], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(31), (1024, horizon, 1), jnp.float32)
        * 0.7
    )
    info = {"target": jnp.ones((horizon, 1), jnp.float32) * 2.0}
    rf = fused.solve(fused.init(), x0, info=info, noise=noise)
    rx = xla.solve(xla.init(), x0, info=info, noise=noise)
    np.testing.assert_allclose(
        np.asarray(rf.aux.costs), np.asarray(rx.aux.costs), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rf.action_seq), np.asarray(rx.action_seq), atol=5e-3
    )
    # 160 accumulated stage costs amplify f32 reduction-order drift through
    # the softmin exponential; costs above are tight, weights get headroom
    np.testing.assert_allclose(
        np.asarray(rf.aux.weights), np.asarray(rx.aux.weights), atol=1e-4
    )


def _quad_task():
    """4-control 3-state model: d_flat = 4*horizon exercises wide controls."""

    def dynamics_soa(xs, us):
        px, py, v = xs
        ax, ay, brake, steer = us
        new_v = 0.95 * v + 0.05 * (ax - brake)
        return (px + 0.1 * (new_v + ay), py + 0.1 * (new_v + steer), new_v)

    def cost_soa(xs, us, ctx):
        px, py, v = xs
        return (px - 1.0) ** 2 + (py + 0.5) ** 2 + 0.1 * v * v + 0.01 * (
            us[0] ** 2 + us[1] ** 2 + us[2] ** 2 + us[3] ** 2
        )

    def smem_builder(info):
        return {}

    return FusedTask(
        dynamics_soa=dynamics_soa,
        stage_cost_soa=cost_soa,
        vmem_args={},
        smem_builder=smem_builder,
    )


def _quad_aos():
    def dynamics(state, action):
        new_v = 0.95 * state[:, 2] + 0.05 * (action[:, 0] - action[:, 2])
        return jnp.stack(
            [
                state[:, 0] + 0.1 * (new_v + action[:, 1]),
                state[:, 1] + 0.1 * (new_v + action[:, 3]),
                new_v,
            ],
            axis=1,
        )

    def cost(state, action, info):
        return (
            (state[:, 0] - 1.0) ** 2
            + (state[:, 1] + 0.5) ** 2
            + 0.1 * state[:, 2] ** 2
            + 0.01 * jnp.sum(action**2, axis=1)
        )

    return dynamics, cost


@pytest.mark.parametrize("horizon", [33, 64])
def test_fused_multi_vreg_wide_control_matches_xla(horizon):
    """dim_control = 4 at T >= 33 (d_flat 132/256, beyond one vreg)."""
    cfg = _config(
        horizon=horizon, num_samples=1024, dim_state=3, dim_control=4,
        u_min=(-1.0,) * 4, u_max=(1.0,) * 4, sigmas=(0.5, 0.5, 0.3, 0.3),
    )
    task = _quad_task()
    dyn, cost = _quad_aos()
    fused = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)
    xla = make_solver(cfg, dyn, cost, jit=True, donate_state=False)
    x0 = jnp.zeros(3, jnp.float32)
    noise = jax.random.normal(
        jax.random.PRNGKey(37), (1024, horizon, 4), jnp.float32
    ) * jnp.asarray(cfg.sigmas, jnp.float32)
    rf = fused.solve(fused.init(), x0, noise=noise)
    rx = xla.solve(xla.init(), x0, noise=noise)
    np.testing.assert_allclose(
        np.asarray(rf.aux.costs), np.asarray(rx.aux.costs), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rf.action_seq), np.asarray(rx.action_seq), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(rf.aux.weights), np.asarray(rx.aux.weights), atol=1e-5
    )


def test_fused_tile_height_invariant_under_injected_noise():
    """tile_sublanes=16 (two interleaved vreg chains per grid step) must
    produce the same solve as the default 8 when the noise is injected
    (the seeded PRNG stream legitimately differs across tile heights)."""
    from mppi_playground_tpu.ops.fused_solve import make_fused_solve

    horizon = 5
    k = 2048 + 512  # padding exercises the masked tail at both heights
    cfg = _config(horizon=horizon, num_samples=k)
    task = _toy_task()
    noise = (
        jax.random.normal(jax.random.PRNGKey(17), (k, horizon, 1), jnp.float32)
        * 0.7
    )
    x0 = jnp.asarray([0.1, -0.3], jnp.float32)
    prev = jnp.zeros((horizon, 1), jnp.float32)
    lam = jnp.asarray(0.5, jnp.float32)
    seed = jnp.asarray(0, jnp.int32)
    smem = {"target": jnp.ones((horizon, 1), jnp.float32) * 2.0}

    outs = []
    for s in (8, 16):
        core = make_fused_solve(cfg, task, tile_sublanes=s)
        outs.append(jax.jit(
            lambda core=core: core(x0, prev, lam, seed, smem, noise)
        )())
    (c8, u8, w8, e8), (c16, u16, w16, e16) = outs
    np.testing.assert_allclose(np.asarray(c8), np.asarray(c16), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u8), np.asarray(u16), atol=2e-5)
    np.testing.assert_allclose(np.asarray(w8), np.asarray(w16), atol=1e-5)
    np.testing.assert_allclose(float(e8), float(e16), rtol=1e-4)


def test_fused_sg_filter_matches():
    cfg = _config(use_sg_filter=True, sg_window_size=5, sg_poly_order=3)
    task = _toy_task()
    dyn, cost = _toy_aos()
    fused = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)
    xla = make_solver(cfg, dyn, cost, jit=True, donate_state=False)
    x0 = jnp.zeros(2, jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(3), (K, HORIZON, 1), jnp.float32) * 0.7
    )
    rf = fused.solve(fused.init(), x0, info=_info(), noise=noise)
    rx = xla.solve(xla.init(), x0, info=_info(), noise=noise)
    np.testing.assert_allclose(
        np.asarray(rf.action_seq), np.asarray(rx.action_seq), atol=5e-3
    )


def test_fused_top_samples_matches_xla():
    """get_top_samples on the fused path == XLA stored-rollout top-k.

    The fused solve never materializes rollouts; top_samples regenerates
    the winning perturbations (here: re-reads the injected noise) and
    re-rolls only those.  Must equal the XLA path's topk over the stored
    [K, T+1, n] batch (mppi.py:462-487).
    """
    from mppi_playground_tpu.core import diagnostics

    cfg_f = _config()
    cfg_x = _config(store_rollouts=True)
    task = _toy_task()
    dyn, cost = _toy_aos()
    fused = make_fused_solver(cfg_f, task, dyn, jit=True, donate_state=False)
    xla = make_solver(cfg_x, dyn, cost, jit=True, donate_state=False)
    x0 = jnp.asarray([0.3, -0.1], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(21), (K, HORIZON, 1), jnp.float32)
        * 0.7
    )
    rf = fused.solve(fused.init(), x0, info=_info(), noise=noise)
    rx = xla.solve(xla.init(), x0, info=_info(), noise=noise)

    assert fused.top_samples is not None
    n = 50
    seqs_f, w_f = fused.top_samples(rf.aux, n, noise=noise)
    seqs_x, w_x = diagnostics.top_samples(rx.aux.state_seq_batch, rx.aux.weights, n)

    assert seqs_f.shape == (n, HORIZON + 1, 2)
    assert w_f.shape == (n,)
    np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_x), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(seqs_f), np.asarray(seqs_x), atol=5e-4
    )
    # descending weights
    wf = np.asarray(w_f)
    assert (wf[:-1] >= wf[1:]).all()


def test_fused_top_samples_two_phase_auto_lambda():
    """Top-k replay works after the ESSPS two-phase solve (same seeds)."""
    from mppi_playground_tpu.core import diagnostics

    cfg_f = _config(lambda_="ESSPS")
    cfg_x = _config(lambda_="ESSPS", store_rollouts=True)
    task = _toy_task()
    dyn, cost = _toy_aos()
    fused = make_fused_solver(cfg_f, task, dyn, jit=True, donate_state=False)
    xla = make_solver(cfg_x, dyn, cost, jit=True, donate_state=False)
    x0 = jnp.asarray([0.0, 0.0], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(23), (K, HORIZON, 1), jnp.float32)
        * 0.7
    )
    rf = fused.solve(fused.init(), x0, info=_info(), noise=noise)
    rx = xla.solve(xla.init(), x0, info=_info(), noise=noise)
    seqs_f, w_f = fused.top_samples(rf.aux, 20, noise=noise)
    seqs_x, w_x = diagnostics.top_samples(rx.aux.state_seq_batch, rx.aux.weights, 20)
    np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seqs_f), np.asarray(seqs_x), atol=5e-4)


def test_fused_top_samples_requires_matching_noise(solvers):
    """A noise-injected solve records that fact in aux; top_samples
    without the noise must raise instead of silently regenerating a
    seed stream unrelated to the solve's perturbations."""
    cfg, fused, xla = solvers
    x0 = jnp.asarray([0.0, 0.0], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(5), (K, HORIZON, 1), jnp.float32) * 0.7
    )
    rf = fused.solve(fused.init(), x0, info=_info(), noise=noise)
    with pytest.raises(ValueError, match="injected noise"):
        fused.top_samples(rf.aux, 5)
    seqs, w = fused.top_samples(rf.aux, 5, noise=noise)  # correct usage
    assert seqs.shape == (5, HORIZON + 1, 2)


def test_fused_solve_records_noise_flag_as_host_bool(solvers):
    """The jitted facade rewrites aux.noise_injected with the (static)
    host bool, so per-tick get_top_samples never pays a device->host
    sync just to learn which stream the solve used (a full tunnel round
    trip — observed up to ~26 ms — per call otherwise)."""
    cfg, fused, xla = solvers
    x0 = jnp.asarray([0.0, 0.0], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(6), (K, HORIZON, 1), jnp.float32) * 0.7
    )
    rf = fused.solve(fused.init(), x0, info=_info(), noise=noise)
    assert isinstance(rf.aux.noise_injected, bool) and rf.aux.noise_injected


@pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="on a native backend the seeded path runs for real",
)
def test_fused_seeded_path_rejected_in_interpret_mode(solvers):
    """Off-TPU the seeded in-kernel PRNG cannot run (no interpreter
    implementation); solving without noise= must fail at trace time with
    an actionable message, not deep inside Mosaic."""
    cfg, fused, xla = solvers
    with pytest.raises(NotImplementedError, match="interpret mode"):
        fused.solve(fused.init(), jnp.zeros(2, jnp.float32), info=_info())


def test_run_kernel_dump_requires_costs_only():
    """The full-solve+dump kernel mode has no consumer and is rejected."""
    from mppi_playground_tpu.ops.fused_solve import make_fused_solve

    cfg = _config()
    core = make_fused_solve(cfg, _toy_task())
    noise = jnp.zeros((K, HORIZON, 1), jnp.float32)
    with pytest.raises(AssertionError, match="costs_only"):
        core.run_kernel(
            jnp.zeros(2, jnp.float32),
            jnp.zeros((HORIZON, 1), jnp.float32),
            jnp.asarray(0.5), jnp.asarray(0, jnp.int32),
            {"target": jnp.ones((HORIZON, 1), jnp.float32)},
            noise, dump_pert=True,
        )


def test_fused_auto_lambda_fallback_core_matches_dump_path():
    """A solve_core without pert-dump support takes the phase-2 re-read
    fallback (phase 1 costs_only, phase 2 from noise); results must be
    bit-identical to the dump path given the same injected noise."""
    from mppi_playground_tpu.ops.fused_solve import make_fused_solve

    cfg = _config(lambda_="ESSPS")
    task = _toy_task()
    dyn, _ = _toy_aos()
    core = make_fused_solve(cfg, task)

    def nodump(*args, **kwargs):
        return core(*args, **kwargs)

    nodump.run_kernel = core.run_kernel
    nodump.run_weighted = core.run_weighted
    nodump.run_regen = core.run_regen
    nodump.combine_partials = core.combine_partials
    # no supports_pert_dump attribute -> the facade's fallback branch

    fused_dump = make_fused_solver(cfg, task, dyn, jit=False, donate_state=False)
    fused_fb = make_fused_solver(
        cfg, task, dyn, jit=False, donate_state=False, solve_core=nodump
    )
    x0 = jnp.asarray([0.1, -0.2], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(29), (K, HORIZON, 1), jnp.float32)
        * 0.7
    )
    rd = fused_dump.solve(fused_dump.init(), x0, info=_info(), noise=noise)
    rf = fused_fb.solve(fused_fb.init(), x0, info=_info(), noise=noise)
    np.testing.assert_array_equal(np.asarray(rd.aux.costs), np.asarray(rf.aux.costs))
    np.testing.assert_array_equal(float(rd.aux.lam), float(rf.aux.lam))
    np.testing.assert_array_equal(
        np.asarray(rd.action_seq), np.asarray(rf.action_seq)
    )


def test_row_interval_query_matches_grid():
    rng = np.random.default_rng(0)
    grid = (rng.random((200, 160)) < 0.2).astype(float)
    origin = np.array([100, 80])
    gm = GridMapData(
        grid=jnp.asarray(grid, jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        cell_size=0.1,
    )
    table = build_row_interval_table(grid, origin, 0.1)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4096, 2), jnp.float32, -12, 12)
    # cell-boundary points: f32 x/cell vs x*(1/cell) round to DIFFERENT
    # cells for some of these (e.g. -4.95 at cell 0.1) — the query must use
    # the same division as grid_cost to stay bit-exact
    half_cells = jnp.linspace(-10.05, 10.05, 202, dtype=jnp.float32)
    boundary = jnp.stack(
        jnp.meshgrid(half_cells[:64], half_cells[:64]), axis=-1
    ).reshape(-1, 2)
    pts = jnp.concatenate([pts, boundary], axis=0)
    a = np.asarray(jax.jit(lambda p: grid_cost(gm, p))(pts))
    b = np.asarray(
        jax.jit(lambda p: interval_query(table, p[:, 0], p[:, 1]))(pts)
    )
    np.testing.assert_array_equal(a, b)


def test_row_interval_table_invalidated_on_obstacle_add():
    """Map mutation must rebuild the interval table (stale-cache bug)."""
    from mppi_playground_tpu.maps.obstacle_map import ObstacleMap

    om = ObstacleMap(map_size=(20, 20), cell_size=0.1)
    t0 = om.row_interval_table
    assert float(interval_query(t0, jnp.asarray([5.0]), jnp.asarray([5.0]))[0]) == 0.0
    om.add_circle_obstacle(np.array([5.0, 5.0]), 1.0)
    t1 = om.row_interval_table
    assert t1 is not t0
    assert float(interval_query(t1, jnp.asarray([5.0]), jnp.asarray([5.0]))[0]) == 1.0


def test_closed_loop_matches_host_loop():
    """lax.scan'd closed loop == host-driven tick loop (same noise path
    is impossible per tick, so compare with the deterministic plant and
    kernel-free config via injected... instead: use the XLA solver whose
    RNG is the state key — identical stream in both drivers)."""
    from mppi_playground_tpu.core.closed_loop import make_closed_loop

    cfg = _config()
    dyn, cost = _toy_aos()
    solver = make_solver(cfg, dyn, cost, jit=False, donate_state=False)

    def plant(x, u):
        return dyn(x[None], u[None])[0]

    def info_fn(carry, x):
        return {"target": jnp.ones((HORIZON, 1), jnp.float32) * 2.0}, carry

    run = make_closed_loop(solver, plant, num_ticks=5, info_fn=info_fn)
    x0 = jnp.asarray([0.0, 0.0], jnp.float32)
    st_final, xf, xs, us, _ = run(solver.init(), x0, None)

    # host-driven loop with the same solver/state stream
    st = solver.init()
    x = x0
    for t in range(5):
        r = solver.solve(st, x, info={"target": jnp.ones((HORIZON, 1)) * 2.0})
        st = r.state
        np.testing.assert_allclose(
            np.asarray(us[t]), np.asarray(r.action_seq[0]), atol=1e-6
        )
        x = plant(x, r.action_seq[0])
    np.testing.assert_allclose(np.asarray(xf), np.asarray(x), atol=1e-6)


def test_closed_loop_done_fn_freezes_episode():
    """done_fn gives the single-dispatch episode the reference loops'
    break-on-termination semantics (example/navigation2d.py:39-46):
    identical prefix vs the no-done run, then frozen state, zero
    recorded actions, and an exact executed-tick count."""
    from mppi_playground_tpu.core.closed_loop import make_closed_loop

    cfg = _config()
    dyn, cost = _toy_aos()
    solver = make_solver(cfg, dyn, cost, jit=False, donate_state=False)

    def plant(x, u):
        return dyn(x[None], u[None])[0]

    def info_fn(carry, x):
        return {"target": jnp.ones((HORIZON, 1), jnp.float32) * 2.0}, carry

    num_ticks = 8
    # point mass from [0.9, 1.0] driven toward 2.0 crosses 1.1 at tick
    # 2-4 under ANY admissible action sequence (|a| <= 1, v decays 0.9)
    x0 = jnp.asarray([0.9, 1.0], jnp.float32)
    done_fn = lambda x: x[0] > 1.1  # noqa: E731

    base = make_closed_loop(solver, plant, num_ticks, info_fn=info_fn)
    _, _, xs_b, us_b, _ = base(solver.init(), x0, None)

    run = make_closed_loop(
        solver, plant, num_ticks, info_fn=info_fn, done_fn=done_fn
    )
    _, xf, xs, us, _, ep = run(solver.init(), x0, None)

    assert bool(ep["done"])
    t0 = int(ep["ticks"])
    assert 1 <= t0 < num_ticks
    # executed prefix identical to the unterminated run
    np.testing.assert_allclose(
        np.asarray(us[:t0]), np.asarray(us_b[:t0]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(xs[:t0]), np.asarray(xs_b[:t0]), atol=1e-6
    )
    # the first post-termination recorded state is the terminal state,
    # done_fn fired on it, and everything after is frozen
    assert bool(done_fn(xs[t0]))
    np.testing.assert_array_equal(np.asarray(us[t0:]), 0.0)
    for t in range(t0, num_ticks):
        np.testing.assert_array_equal(np.asarray(xs[t]), np.asarray(xf))


def test_mix_seed_uses_full_word():
    """The per-tile seed hash must use logical (not arithmetic) right
    shifts: with arithmetic shifts every xor-shift stage maps h and ~h to
    the same value and pins bit 31, collapsing the seed space ~8x."""
    from mppi_playground_tpu.ops.fused_solve import _mix_seed

    seeds = jnp.arange(-4096, 4096, dtype=jnp.int32)
    tile = jnp.int32(3)
    hashed = np.asarray(_mix_seed(seeds, tile))
    # bijective per tile: no collisions over the sample range
    assert len(np.unique(hashed)) == len(hashed)
    # bit 31 is exercised (arithmetic shifts can never produce it)
    assert (hashed < 0).any()
    # h and ~h must NOT collide (the arithmetic-shift failure mode)
    h = jnp.int32(0x1234567)
    assert int(_mix_seed(h, tile)) != int(_mix_seed(~h, tile))



def test_interval_table_pads_to_lane_multiples():
    """Tables pad rows to ceil(w/128)*128 — the broadcast-try group count
    (and thus query cost) tracks the grid height instead of always 8."""
    rng = np.random.default_rng(0)
    origin = np.asarray([10.0, 10.0])
    for w, expected_groups in [(80, 1), (200, 2), (800, 7), (1024, 8)]:
        grid = (rng.random((w, 64)) < 0.2).astype(np.float32)
        t = build_row_interval_table(grid, origin, 0.1)
        assert t.packed.shape[1] == expected_groups, (w, t.packed.shape)
        # spot-check correctness at the padding boundary row (the query
        # maps px -> ix = round(px / cell + origin[0]))
        px = jnp.asarray([((w - 1) - 10.0) * 0.1], jnp.float32)
        for iy in (0, 33, 63):
            py = jnp.asarray([(iy - 10.0) * 0.1], jnp.float32)
            got = float(interval_query(t, px, py)[0])
            assert got == float(grid[w - 1, iy]), (w, iy)


def test_fused_envelope_gates_unsupported_configs():
    """fused_envelope is the single source of truth for kernel fit: every
    build-time constraint the kernels assert must be reflected here so
    solver_backend='auto' falls back to XLA instead of crashing (ADVICE r1:
    dim_state was once asserted only inside make_fused_reroll)."""
    from mppi_playground_tpu.ops.fused_solve import (
        LANES,
        SUBLANES,
        fused_envelope,
    )

    assert fused_envelope(_config())
    # action slots pack across sublanes: one vreg tile holds 8*128 = 1024
    assert fused_envelope(_config(horizon=LANES + 1))
    assert fused_envelope(_config(horizon=SUBLANES * LANES))
    assert not fused_envelope(_config(horizon=SUBLANES * LANES + 1))
    # state packs into vreg lanes inside make_fused_reroll
    assert not fused_envelope(_config(dim_state=LANES + 1))
    # kernels are f32-only
    assert not fused_envelope(_config(dtype=jnp.float64))
    # rollouts stay implicit in the fused kernel
    assert not fused_envelope(_config(store_rollouts=True))


def test_resolve_fused_request_falls_back_loudly_off_tpu(capsys):
    from mppi_playground_tpu.ops.fused_solve import (
        fused_supported,
        resolve_fused_request,
    )

    assert not fused_supported()  # conftest forces the CPU backend
    assert resolve_fused_request(False) is False
    assert capsys.readouterr().out == ""
    assert resolve_fused_request(True) is False
    assert "requires a TPU backend" in capsys.readouterr().out


def test_interval_query_pair_bit_equals_separate():
    """The shared-index dual query must be bit-equal to two separate
    queries (same-geometry tables share round/clip/oob/group/lane)."""
    from mppi_playground_tpu.ops.row_intervals import (
        interval_query_pair,
        same_geometry,
    )

    rng = np.random.default_rng(5)
    origin = np.array([100, 80])
    ga = (rng.random((200, 160)) < 0.15).astype(float)
    gb = (rng.random((200, 160)) < 0.3).astype(float)
    ta = build_row_interval_table(ga, origin, 0.1)
    tb = build_row_interval_table(gb, origin, 0.1)
    assert same_geometry(ta, tb)
    pts = jax.random.uniform(jax.random.PRNGKey(9), (4096, 2), jnp.float32, -12, 12)
    sep = jax.jit(
        lambda p: interval_query(ta, p[:, 0], p[:, 1])
        + interval_query(tb, p[:, 0], p[:, 1])
    )(pts)
    pair = jax.jit(lambda p: interval_query_pair(ta, tb, p[:, 0], p[:, 1]))(pts)
    np.testing.assert_array_equal(np.asarray(sep), np.asarray(pair))

    # mismatched geometry is rejected
    tc = build_row_interval_table(gb, origin, 0.2)
    with pytest.raises(AssertionError, match="same-geometry"):
        interval_query_pair(ta, tc, pts[:, 0], pts[:, 1])


def test_fused_multi_vreg_two_phase_and_top_samples():
    """d_flat > 128 through the FULL auxiliary surface: two-phase ESSPS
    (pert dump/read-back at the multi-vreg layout) and top_samples
    (regen layout inversion) must match the XLA path."""
    from mppi_playground_tpu.core import diagnostics

    horizon = 72  # d_flat = 144: spans two sublanes of the numer tile
    cfg_f = _config(horizon=horizon, num_samples=1024, lambda_="ESSPS")
    cfg_x = _config(
        horizon=horizon, num_samples=1024, lambda_="ESSPS",
        store_rollouts=True,
    )
    task = _toy_task()
    dyn, cost = _toy_aos()
    fused = make_fused_solver(cfg_f, task, dyn, jit=True, donate_state=False)
    xla = make_solver(cfg_x, dyn, cost, jit=True, donate_state=False)
    x0 = jnp.asarray([0.1, 0.2], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(41), (1024, horizon, 1), jnp.float32)
        * 0.7
    )
    info = {"target": jnp.ones((horizon, 1), jnp.float32) * 2.0}
    rf = fused.solve(fused.init(), x0, info=info, noise=noise)
    rx = xla.solve(xla.init(), x0, info=info, noise=noise)
    np.testing.assert_allclose(
        np.asarray(rf.aux.costs), np.asarray(rx.aux.costs), rtol=1e-5
    )
    np.testing.assert_allclose(float(rf.aux.lam), float(rx.aux.lam), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(rf.action_seq), np.asarray(rx.action_seq), atol=5e-3
    )
    seqs_f, w_f = fused.top_samples(rf.aux, 16, noise=noise)
    seqs_x, w_x = diagnostics.top_samples(rx.aux.state_seq_batch, rx.aux.weights, 16)
    np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(seqs_f), np.asarray(seqs_x), atol=5e-3)


def test_lambda_epilogue_device_gate_policy():
    """Pin the per-device-class default for the in-kernel lambda epilogue.

    Single-TensorCore chips (v5e / v6e / v6 lite) default to the epilogue
    (their phase-1 grid never splits, so its sequential-grid requirement
    is free); megacore chips (v4 / v5p, 2 TensorCores) default to the
    standalone two-phase search so phase 1 keeps the 2-core grid split.
    The expected auto-lambda overheads per path are tabled in
    docs/ARCHITECTURE.md ("auto-lambda expectation by device class").
    """
    from mppi_playground_tpu.core.fused_solver import default_lambda_epilogue

    # single-core device kinds (epilogue ON) — exact strings as reported
    # by jax.devices()[0].device_kind on those platforms
    for kind in ("TPU v5 lite", "TPU v5e", "TPU v6 lite", "TPU v6e"):
        assert default_lambda_epilogue(kind), kind
    # megacore device kinds (epilogue OFF -> standalone two-phase search)
    for kind in ("TPU v4", "TPU v5p", "TPU v5"):
        assert not default_lambda_epilogue(kind), kind


def test_lambda_epilogue_vmem_gate_at_2mb_boundary():
    """The in-kernel epilogue's DEFAULT gate flips exactly at the 2 MiB
    cost block (k_pad * 4 bytes, K = 524,288): beyond it the standalone
    two-phase path is measured faster (its whole-block search's only
    VMEM tenant is the costs block — at K=1M standalone 7.60-7.63
    ms/solve vs epilogue 7.66-7.79 on the v5e), so the facade falls back
    there; forcing lambda_epilogue=True past the bound remains valid
    (the shared search bodies group above 2 MiB).  Also pins the
    sharded/padded exclusions.
    """
    from mppi_playground_tpu.ops.fused_solve import TILE, make_fused_solve

    task = _toy_task()
    at_edge = make_fused_solve(
        _config(num_samples=512 * 1024), task, interpret=True
    )
    assert at_edge.supports_lambda_epilogue

    over = make_fused_solve(
        _config(num_samples=512 * 1024 + 1), task, interpret=True
    )
    assert not over.supports_lambda_epilogue

    # sample-sharded cores never run the epilogue (the search needs the
    # global cost vector)
    sharded = make_fused_solve(
        _config(num_samples=4 * TILE), task, interpret=True,
        local_num_samples=2 * TILE,
    )
    assert not sharded.supports_lambda_epilogue
    padded = make_fused_solve(
        _config(num_samples=4 * TILE), task, interpret=True,
        local_num_samples=2 * TILE, global_padded=True,
    )
    assert not padded.supports_lambda_epilogue


def test_block_min_max_valid_masks_padding():
    """_block_min_max_valid == (min, max) over the UNPADDED costs for
    both block strategies (whole-block and >2 MiB grouped ref loads),
    including a partially-valid last row."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mppi_playground_tpu.ops.fused_solve import (
        LANES,
        TILE,
        _block_min_max_valid,
    )

    rng = np.random.default_rng(5)
    for k in (3 * TILE - 100, 600 * 1024 + 37):  # whole-block; grouped
        k_pad = -(-k // TILE) * TILE
        costs = rng.uniform(-7.0, 90.0, (k,)).astype(np.float32)
        block = np.full((k_pad,), 1e30, np.float32)
        block[:k] = costs
        block = jnp.asarray(block.reshape(k_pad // LANES, LANES))

        def kernel(costs_ref, out_ref, k_pad=k_pad, k=k):
            cmin, cmax = _block_min_max_valid(costs_ref, k_pad, k)
            out_ref[0] = cmin
            out_ref[1] = cmax

        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((2,), jnp.float32),
            interpret=True,
        )(block)
        assert float(out[0]) == float(costs.min()), k
        assert float(out[1]) == float(costs.max()), k
