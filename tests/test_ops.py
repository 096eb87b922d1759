"""Equivalence tests for the fused Pallas kernels vs their XLA shadows."""

import jax.numpy as jnp
import numpy as np
import pytest

from mppi_playground_tpu.ops import pallas_kernels
from mppi_playground_tpu.ops.weighted_update import _xla_weighted_update


@pytest.mark.parametrize("k,t,m", [(1024, 10, 2), (2048, 25, 2), (1024, 7, 1)])
@pytest.mark.parametrize("lam", [0.01, 1.0, 10.0])
def test_pallas_weighted_update_matches_xla(k, t, m, lam):
    rng = np.random.default_rng(0)
    costs = jnp.asarray(rng.uniform(0, 100, size=k), jnp.float32)
    samples = jnp.asarray(rng.normal(size=(k, t, m)), jnp.float32)
    lam = jnp.asarray(lam, jnp.float32)

    assert pallas_kernels.supports_weighted_update(costs, samples)

    upd_x, w_x, ess_x = _xla_weighted_update(costs, samples, lam)
    upd_p, w_p, ess_p = pallas_kernels.weighted_update(
        costs, samples, lam, interpret=True
    )

    np.testing.assert_allclose(np.asarray(upd_p), np.asarray(upd_x), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_x), rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(float(ess_p), float(ess_x), rtol=2e-4)


def test_pallas_weighted_update_extreme_costs():
    """Online-softmax stability when costs span a huge dynamic range."""
    k = 1024
    rng = np.random.default_rng(1)
    costs = rng.uniform(0, 10, size=k).astype(np.float32)
    costs[::7] += 1e6  # obstacle-style penalty spikes
    samples = rng.normal(size=(k, 5, 2)).astype(np.float32)
    lam = jnp.asarray(0.5, jnp.float32)

    upd_x, w_x, ess_x = _xla_weighted_update(
        jnp.asarray(costs), jnp.asarray(samples), lam
    )
    upd_p, w_p, ess_p = pallas_kernels.weighted_update(
        jnp.asarray(costs), jnp.asarray(samples), lam, interpret=True
    )
    np.testing.assert_allclose(np.asarray(upd_p), np.asarray(upd_x), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_x), rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(float(ess_p), float(ess_x), rtol=1e-3)


def test_supports_gate():
    # non-tile-multiple K is padded internally, so it is supported now
    costs = jnp.zeros(1000, jnp.float32)
    samples = jnp.zeros((1000, 5, 2), jnp.float32)
    assert pallas_kernels.supports_weighted_update(costs, samples)
    # but non-f32 costs are not
    assert not pallas_kernels.supports_weighted_update(
        costs.astype(jnp.bfloat16), samples
    )


@pytest.mark.parametrize("k", [1000, 3000, 4000])
def test_pallas_weighted_update_padded_k(k):
    """Reference workload sample counts (not multiples of the K tile)."""
    rng = np.random.default_rng(2)
    costs = jnp.asarray(rng.uniform(0, 100, size=k), jnp.float32)
    samples = jnp.asarray(rng.normal(size=(k, 10, 2)), jnp.float32)
    lam = jnp.asarray(1.0, jnp.float32)

    upd_x, w_x, ess_x = _xla_weighted_update(costs, samples, lam)
    upd_p, w_p, ess_p = pallas_kernels.weighted_update(
        costs, samples, lam, interpret=True
    )
    np.testing.assert_allclose(np.asarray(upd_p), np.asarray(upd_x), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_x), rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(float(ess_p), float(ess_x), rtol=2e-4)
