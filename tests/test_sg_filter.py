"""Savitzky-Golay filter vs scipy and a direct numpy re-derivation."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import savgol_coeffs

from mppi_playground_tpu.core.sg_filter import apply_sg_filter, savitzky_golay_coeffs


@pytest.mark.parametrize("window,poly", [(5, 3), (7, 3), (9, 5), (11, 2)])
def test_coeffs_match_scipy(window, poly):
    ours = savitzky_golay_coeffs(window, poly)
    # scipy returns coefficients for convolution (reversed); SG smoothing
    # coefficients are symmetric, so they match directly.
    theirs = savgol_coeffs(window, poly)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_coeffs_validation():
    with pytest.raises(ValueError):
        savitzky_golay_coeffs(4, 3)
    with pytest.raises(ValueError):
        savitzky_golay_coeffs(3, 3)


def _np_reference_filter(action_seq, history, coeffs):
    """Direct numpy re-derivation of mppi.py:423-443, 598-620."""
    prolonged = np.concatenate([history, action_seq], axis=0)
    pad = len(coeffs) // 2
    out = np.zeros_like(prolonged)
    for dim in range(prolonged.shape[1]):
        y = prolonged[:, dim]
        y_padded = np.concatenate([y[:pad][::-1], y, y[-pad:][::-1]])
        # torch.conv1d is cross-correlation (no kernel flip)
        out[:, dim] = np.correlate(y_padded, coeffs, mode="valid")
    return out[-action_seq.shape[0]:]


@pytest.mark.parametrize("window,poly", [(5, 3), (9, 5)])
def test_filter_matches_reference_semantics(window, poly):
    rng = np.random.default_rng(0)
    horizon, m = 20, 3
    action_seq = rng.normal(size=(horizon, m))
    history = rng.normal(size=(horizon - 1, m))
    coeffs = savitzky_golay_coeffs(window, poly)

    expected = _np_reference_filter(action_seq, history, coeffs)
    ours = apply_sg_filter(
        jnp.asarray(action_seq), jnp.asarray(history), jnp.asarray(coeffs)
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-6)


def test_filter_smooths_noise():
    rng = np.random.default_rng(1)
    t = np.linspace(0, 4 * np.pi, 30)
    clean = np.sin(t)[:, None]
    noisy = clean + rng.normal(scale=0.3, size=(30, 1))
    coeffs = savitzky_golay_coeffs(7, 3)
    filtered = np.asarray(
        apply_sg_filter(
            jnp.asarray(noisy, jnp.float32),
            jnp.zeros((0, 1), jnp.float32),
            jnp.asarray(coeffs, jnp.float32),
        )
    )
    assert np.mean((filtered - clean) ** 2) < np.mean((noisy - clean) ** 2)


def test_solver_with_sg_filter_runs():
    from mppi_playground_tpu import MPPIConfig, make_solver
    from mppi_playground_tpu.models import integrator

    config = MPPIConfig(
        horizon=8,
        num_samples=128,
        dim_state=2,
        dim_control=2,
        u_min=integrator.U_MIN,
        u_max=integrator.U_MAX,
        sigmas=(0.5, 0.5),
        lambda_=1.0,
        use_sg_filter=True,
        sg_window_size=5,
        sg_poly_order=3,
    )
    solver = make_solver(config, integrator.dynamics, integrator.cost)
    state = solver.init()
    for _ in range(3):
        result = solver.solve(state, jnp.zeros(2))
        state = result.state
    assert result.action_seq.shape == (8, 2)
    assert np.all(np.isfinite(np.asarray(result.action_seq)))


def test_sg_filter_window_one_is_identity():
    """window 1 / order 0 is a valid config; the zero-pad edge must not
    mirror the whole signal (the `[-0:]` slice hazard) — the filter is
    exactly the identity."""
    import jax.numpy as jnp

    from mppi_playground_tpu.core.sg_filter import (
        apply_sg_filter,
        savitzky_golay_coeffs,
    )

    coeffs = jnp.asarray(savitzky_golay_coeffs(1, 0), jnp.float32)
    np.testing.assert_allclose(np.asarray(coeffs), [1.0])
    seq = jnp.arange(12.0).reshape(6, 2)
    hist = -jnp.ones((5, 2))
    out = apply_sg_filter(seq, hist, coeffs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq))
