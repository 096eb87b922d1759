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

# Tile over the sample axis.
_K_TILE = 1024

# The (K_TILE, d) f32 samples block is double-buffered across the
# sequential grid, so VMEM holds ~2 * K_TILE * d * 4 bytes of it plus the
# out/stats/costs tiles; d <= 1536 keeps that at ~12.6 MB, inside the
# ~16 MB/core budget with headroom (an 18.7 MB allocation was measured to
# OOM on v5e — ops/fused_solve.py).  Larger d falls back to XLA.
_MAX_D = 1536


def supports_weighted_update(costs: jnp.ndarray, samples: jnp.ndarray) -> bool:
    """Shape gate for the fused kernel (fallback to XLA otherwise)."""
    d = samples.shape[1] * samples.shape[2]
    return d <= _MAX_D and costs.dtype == jnp.float32


def _weighted_update_kernel(
    lam_ref,  # SMEM (1, 1)
    costs_ref,  # VMEM (8, 128) — cost tile, sample k at (k // 128, k % 128)
    samples_ref,  # VMEM (K_TILE, D)
    out_ref,  # VMEM (8, D) running rescaled numerator (row 0 meaningful)
    stats_ref,  # VMEM (8, 128): lane 0=running max, 1=Z, 2=sum exp^2
):
    # Mosaic wants native (8, 128) tiles and forbids scalar stores into
    # VMEM: costs are consumed as a 2D vreg, the three running scalars live
    # in lanes 0..2 of a full vreg (lane-iota select), and the numerator is
    # accumulated via 8 sublane-sliced [1, 128] x [128, D] MXU matmuls.
    i = pl.program_id(0)
    lam = lam_ref[0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    s = -costs_ref[:, :] / lam  # [8, 128]
    tile_max = jnp.max(s)

    def numerator(e):
        acc = None
        for sub in range(8):
            part = jnp.dot(
                e[sub : sub + 1, :],
                samples_ref[sub * 128 : (sub + 1) * 128, :],
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        return acc  # [1, D]

    @pl.when(i == 0)
    def _first_tile():
        e = jnp.exp(s - tile_max)
        stats = jnp.where(
            lane == 0,
            tile_max,
            jnp.where(lane == 1, jnp.sum(e), jnp.where(lane == 2, jnp.sum(e * e), 0.0)),
        )
        stats_ref[:, :] = stats
        out_ref[:, :] = jnp.broadcast_to(numerator(e), out_ref.shape)

    @pl.when(i > 0)
    def _accumulate():
        m_prev = stats_ref[0, 0]
        z_prev = stats_ref[0, 1]
        sq_prev = stats_ref[0, 2]
        m_new = jnp.maximum(m_prev, tile_max)
        # Rescale previous accumulators to the new running max.
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(s - m_new)
        stats = jnp.where(
            lane == 0,
            m_new,
            jnp.where(
                lane == 1,
                z_prev * alpha + jnp.sum(e),
                jnp.where(lane == 2, sq_prev * (alpha * alpha) + jnp.sum(e * e), 0.0),
            ),
        )
        stats_ref[:, :] = stats
        out_ref[:, :] = out_ref[:, :] * alpha + jnp.broadcast_to(
            numerator(e), out_ref.shape
        )


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
    lam32 = jnp.asarray(lam, jnp.float32)
    lam2d = lam32.reshape(1, 1)

    # pad to whole tiles: padded costs take a huge value (their exp
    # underflows to exactly 0, leaving every accumulator untouched)
    k_pad = -(-k // _K_TILE) * _K_TILE
    num_tiles = k_pad // _K_TILE
    samples2d = samples.reshape(k, d)
    if k_pad > k:
        samples2d = jnp.concatenate(
            [samples2d, jnp.zeros((k_pad - k, d), samples2d.dtype)]
        )
        costs_padded = jnp.concatenate(
            [costs, jnp.full(k_pad - k, 1e30, costs.dtype)]
        )
    else:
        costs_padded = costs
    costs2d = costs_padded.reshape(k_pad // 128, 128)

    numerator, stats = pl.pallas_call(
        _weighted_update_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_K_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
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
