"""Pallas TPU kernels for the MPPI hot path.

The reference accelerates via batched torch CUDA ops
(``/root/reference/src/pi_mpc/mppi.py`` — no custom kernels).  Our TPU
equivalent fuses the softmin weighting + weighted-average + ESS reduction
into one streaming pass over HBM (see ``ops/weighted_update.py`` for the
math).  Implemented with a flash-attention-style *online softmax*: a single
sweep over K-tiles maintains a running max, rescaled normalizer, rescaled
weighted numerator and rescaled sum of squared exponentials, so the
``[K, T*m]`` action tensor is read exactly once and no ``[K]`` weight vector
round-trips through HBM inside the reduction.

Each kernel is shadowed by the pure-XLA implementation and covered by an
equivalence test (tests/test_ops.py) that runs in interpret mode on CPU CI.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile over the sample axis. 1024 f32 rows x (T*m <= 4096) cols stays well
# under the ~16 MB/core VMEM budget together with the scratch accumulators.
_K_TILE = 1024


def supports_weighted_update(costs: jnp.ndarray, samples: jnp.ndarray) -> bool:
    """Shape gate for the fused kernel (fallback to XLA otherwise)."""
    k = costs.shape[0]
    d = samples.shape[1] * samples.shape[2]
    return k % _K_TILE == 0 and d <= 4096 and costs.dtype == jnp.float32


def _weighted_update_kernel(
    lam_ref,  # SMEM (1, 1)
    costs_ref,  # VMEM (K_TILE, 1)
    samples_ref,  # VMEM (K_TILE, D)
    out_ref,  # VMEM (1, D) running rescaled numerator
    stats_ref,  # VMEM (1, 128): [0]=running max, [1]=Z, [2]=sum exp^2
):
    i = pl.program_id(0)
    lam = lam_ref[0, 0]

    s = -costs_ref[:, 0] / lam  # [K_TILE]
    tile_max = jnp.max(s)

    @pl.when(i == 0)
    def _first_tile():
        e = jnp.exp(s - tile_max)
        stats_ref[0, :] = jnp.zeros_like(stats_ref[0, :])
        stats_ref[0, 0] = tile_max
        stats_ref[0, 1] = jnp.sum(e)
        stats_ref[0, 2] = jnp.sum(e * e)
        # Numerator: [1, K_TILE] @ [K_TILE, D] on the MXU.
        out_ref[:, :] = jnp.dot(
            e[None, :], samples_ref[:, :], preferred_element_type=jnp.float32
        )

    @pl.when(i > 0)
    def _accumulate():
        m_prev = stats_ref[0, 0]
        m_new = jnp.maximum(m_prev, tile_max)
        # Rescale previous accumulators to the new running max.
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(s - m_new)
        stats_ref[0, 0] = m_new
        stats_ref[0, 1] = stats_ref[0, 1] * alpha + jnp.sum(e)
        stats_ref[0, 2] = stats_ref[0, 2] * (alpha * alpha) + jnp.sum(e * e)
        contrib = jnp.dot(
            e[None, :], samples_ref[:, :], preferred_element_type=jnp.float32
        )
        out_ref[:, :] = out_ref[:, :] * alpha + contrib


def weighted_update(
    costs: jnp.ndarray,
    samples: jnp.ndarray,
    lam: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused ``(update [T, m], weights [K], ess)`` — one pass over samples.

    The TPU grid is sequential, so VMEM accumulator blocks (index-mapped to
    the same block every step) implement the online-softmax recurrence.  The
    explicit ``weights`` vector (needed by diagnostics, mppi.py:462-487) is
    reconstructed in an O(K) fused epilogue from the final max/normalizer.
    """
    k = costs.shape[0]
    horizon, dim_control = samples.shape[1], samples.shape[2]
    d = horizon * dim_control
    num_tiles = k // _K_TILE
    samples2d = samples.reshape(k, d)
    lam32 = jnp.asarray(lam, jnp.float32)
    lam2d = lam32.reshape(1, 1)
    costs2d = costs.reshape(k, 1)

    numerator, stats = pl.pallas_call(
        _weighted_update_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_K_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_K_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        interpret=interpret,
    )(lam2d, costs2d, samples2d)

    m_final = stats[0, 0]
    z = stats[0, 1]
    sum_sq = stats[0, 2]

    update = (numerator[0] / z).reshape(horizon, dim_control)
    ess = (z * z) / sum_sq
    weights = jnp.exp(-costs / lam32 - m_final) / z

    return update.astype(samples.dtype), weights.astype(costs.dtype), ess
