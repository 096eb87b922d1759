"""Fused softmin-weighting + weighted-average update (the solve's hot tail).

Behavioral reference: steps 5-6 of the reference solve
(``/root/reference/src/pi_mpc/mppi.py:374-385``):

    weights = softmax(-costs / lambda)                    # [K]
    update  = sum_k weights[k] * perturbed_action_seqs[k] # [T, m]

plus the effective sample size ``1 / sum(w^2)`` (mppi.py:526-532) that the
diagnostics and auto-lambda paths share.

This is the only *global* reduction over the sample axis in the whole
algorithm — everything upstream is embarrassingly parallel per sample — so
it is the op that defines the collective pattern under sharding and the
HBM-traffic floor per solve.  Two backends:

* ``xla``:   plain jnp (softmax + einsum).  XLA fuses the exponentials into
  the reduction; the einsum is an MXU-shaped ``[K] x [K, T*m]`` contraction.
* ``pallas``: a single-pass streaming kernel (``ops/pallas_kernels.py``)
  that reads costs and actions from HBM exactly once, computing the online
  softmax normalizer, the weighted numerator and the ESS accumulator in one
  sweep.

Both produce identical results (tests/test_ops.py asserts equivalence).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _xla_weighted_update(
    costs: jnp.ndarray, samples: jnp.ndarray, lam: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    weights = jax.nn.softmax(-costs / lam)
    update = jnp.einsum(
        "k,ktm->tm", weights, samples, preferred_element_type=samples.dtype
    )
    ess = 1.0 / jnp.sum(weights * weights)
    return update, weights, ess


def _pallas_available() -> bool:
    # single backend gate for the whole package (kept as a module-local
    # name so tests can monkeypatch the dispatcher in isolation)
    from mppi_playground_tpu.ops.fused_solve import fused_supported

    return fused_supported()


def weighted_update(
    costs: jnp.ndarray,
    samples: jnp.ndarray,
    lam: jnp.ndarray,
    backend: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute ``(update [T, m], weights [K], ess)`` from trajectory costs.

    Args:
        costs: ``[K]`` total trajectory costs.
        samples: ``[K, T, m]`` perturbed action sequences.
        lam: scalar temperature.
        backend: ``'xla'``, ``'pallas'`` or ``'auto'`` (pallas on TPU).
    """
    if backend == "auto":
        backend = "pallas" if _pallas_available() else "xla"
    if backend == "pallas":
        from mppi_playground_tpu.ops import pallas_kernels

        if pallas_kernels.supports_weighted_update(costs, samples):
            return pallas_kernels.weighted_update(costs, samples, lam)
        backend = "xla"
    return _xla_weighted_update(costs, samples, lam)
