"""Savitzky-Golay action-sequence smoothing.

Behavioral reference: ``_savitzky_golay_coeffs`` / ``_apply_savitzky_golay``
(``/root/reference/src/pi_mpc/mppi.py:568-620``) and their use in the solve
(``mppi.py:423-443``): coefficients are the first row of the pseudo-inverse
of the window Vandermonde matrix, applied per control dimension as a
cross-correlation with mirror padding, after prepending the last
``horizon - 1`` applied actions.

TPU-first differences: coefficients are precomputed host-side once (they are
config constants) and the per-dimension filter is a single batched 'valid'
correlation expressed as a small matmul — no conv1d loop over control dims.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def savitzky_golay_coeffs(window_size: int, poly_order: int) -> np.ndarray:
    """Smoothing coefficients: first row of pinv(Vandermonde).

    Matches mppi.py:568-596 (validated against scipy.signal.savgol_coeffs in
    tests/test_sg_filter.py).  Computed in float64 on host at config time.
    """
    if window_size % 2 == 0 or window_size <= poly_order:
        raise ValueError("SG coefficients need an odd window_size larger than poly_order")
    half_window = (window_size - 1) // 2
    indices = np.arange(-half_window, half_window + 1, dtype=np.float64)
    vander = np.vander(indices, N=poly_order + 1, increasing=True)
    return np.linalg.pinv(vander)[0]


def apply_sg_filter(
    action_seq: jnp.ndarray, history: jnp.ndarray, coeffs: jnp.ndarray
) -> jnp.ndarray:
    """Filter ``action_seq [T, m]`` with ``history [T-1, m]`` prepended.

    Mirrors mppi.py:423-443: the prolonged signal is mirror-padded at both
    ends (mppi.py:611-613) and cross-correlated with the coefficients
    (torch.conv1d performs cross-correlation, mppi.py:616-618); the last T
    rows are returned.

    The whole filter is one ``[L, w] @ [w]`` contraction over a gathered
    window view — static shapes, no per-dimension Python loop.
    """
    horizon = action_seq.shape[0]
    prolonged = jnp.concatenate([history, action_seq], axis=0)  # [L, m]
    pad = coeffs.shape[0] // 2
    # length-based right slice: prolonged[-pad:] with pad == 0 (window 1)
    # would mirror the WHOLE signal instead of nothing
    padded = jnp.concatenate(
        [
            prolonged[:pad][::-1],
            prolonged,
            prolonged[len(prolonged) - pad:][::-1],
        ],
        axis=0,
    )  # [L + 2p, m]
    length = prolonged.shape[0]
    window = coeffs.shape[0]
    # Windowed view: out[i] = sum_j coeffs[j] * padded[i + j]
    idx = jnp.arange(length)[:, None] + jnp.arange(window)[None, :]  # [L, w]
    windows = padded[idx]  # [L, w, m]
    filtered = jnp.einsum("lwm,w->lm", windows, coeffs.astype(padded.dtype))
    return filtered[-horizon:]


def config_sg_coeffs(config, dtype):
    """SG coefficients for a solver config, or ``None`` when disabled.

    Shared by the XLA and fused solver facades: coefficients only exist
    (and SG params are only validated) when the filter is enabled —
    mirrors ``MPPIConfig.__post_init__``'s gating.
    """
    if not config.use_sg_filter:
        return None
    return jnp.asarray(
        savitzky_golay_coeffs(config.sg_window_size, config.sg_poly_order), dtype
    )
