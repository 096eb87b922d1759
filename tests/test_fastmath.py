"""Polynomial sin/cos vs numpy float64 over the full valid ranges."""

import jax
import jax.numpy as jnp
import numpy as np

from mppi_playground_tpu.utils.fastmath import sincos_2pi, sincos_npi

TOL = 5e-7  # a few f32 ulps of the result — same order as libm f32


def test_sincos_npi_accuracy():
    x64 = np.linspace(-np.pi, np.pi, 200_001)
    x = jnp.asarray(x64, jnp.float32)
    s, c = jax.jit(sincos_npi)(x)
    np.testing.assert_allclose(np.asarray(s), np.sin(x64), atol=TOL)
    np.testing.assert_allclose(np.asarray(c), np.cos(x64), atol=TOL)


def test_sincos_npi_identities():
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-np.pi, np.pi, 4096), jnp.float32
    )
    s, c = sincos_npi(x)
    # unit circle to f32 rounding
    np.testing.assert_allclose(
        np.asarray(s * s + c * c), 1.0, atol=1e-6
    )
    # exact special points
    s0, c0 = sincos_npi(jnp.asarray([0.0, np.pi, -np.pi], jnp.float32))
    np.testing.assert_allclose(np.asarray(s0), [0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c0), [1.0, -1.0, -1.0], atol=1e-6)
    # odd / even symmetry is exact (built from |x|)
    sn, cn = sincos_npi(-x)
    np.testing.assert_array_equal(np.asarray(sn), -np.asarray(s))
    np.testing.assert_array_equal(np.asarray(cn), np.asarray(c))


def test_sincos_2pi_accuracy():
    x64 = np.linspace(0.0, 2 * np.pi, 200_001)[:-1]
    x = jnp.asarray(x64, jnp.float32)
    s, c = jax.jit(sincos_2pi)(x)
    np.testing.assert_allclose(np.asarray(s), np.sin(x64), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), np.cos(x64), atol=1e-6)
