"""Polynomial transcendentals for normalized-angle hot loops.

``jnp.sin``/``jnp.cos`` lower to multi-cycle special-pipe ops on the TPU
VPU; the fused rollout evaluates them for every sample at every horizon
step (plus twice per Box–Muller pair), making them a measured double-digit
share of the flagship kernel.  For arguments already reduced to
``[-pi, pi]`` — which the dynamics models guarantee by construction via
``angle_normalize`` — a branch-free quadrant+octant reduction plus short
Taylor polynomials computes both values in ~28 cheap VPU ops with max
absolute error < 3e-7 (a few ulps of the result, the same order as the
f32 libm kernels themselves).

Accuracy (asserted in tests/test_fastmath.py over a dense grid):
sin deg-9 on [0, pi/4] truncates at (pi/4)^11/11! ~ 1.8e-9, cos deg-8 at
(pi/4)^10/10! ~ 2.5e-8; accumulated f32 rounding brings the observed max
error to ~2e-7.

Used by the bicycle and unicycle SoA dynamics (both solver paths trace
the same function, so XLA and fused results stay exactly comparable) and
by the fused kernel's Box–Muller transform.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

_PI = float(np.pi)
_HALF_PI = float(np.pi / 2)
_QUARTER_PI = float(np.pi / 4)


def sincos_npi(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``(sin x, cos x)`` for ``x`` in ``[-pi, pi]`` (normalized angles).

    Out-of-range arguments are NOT reduced — callers must normalize
    first (``utils.angles.angle_normalize`` does).  Sharing the range
    reduction between sin and cos is the point: the pair costs barely
    more than either alone.
    """
    ax = jnp.abs(x)
    # quadrant: sin(pi - a) = sin(a), cos(pi - a) = -cos(a)
    flip = ax > _HALF_PI
    r = jnp.where(flip, _PI - ax, ax)  # [0, pi/2]
    # octant: sin(r) = cos(pi/2 - r) for r > pi/4
    swap = r > _QUARTER_PI
    t = jnp.where(swap, _HALF_PI - r, r)  # [0, pi/4]
    t2 = t * t
    sp = t * (
        1.0
        + t2
        * (
            -1.0 / 6.0
            + t2 * (1.0 / 120.0 + t2 * (-1.0 / 5040.0 + t2 * (1.0 / 362880.0)))
        )
    )
    cp = 1.0 + t2 * (
        -0.5 + t2 * (1.0 / 24.0 + t2 * (-1.0 / 720.0 + t2 * (1.0 / 40320.0)))
    )
    s_r = jnp.where(swap, cp, sp)
    c_r = jnp.where(swap, sp, cp)
    sin = jnp.where(x < 0, -s_r, s_r)
    cos = jnp.where(flip, -c_r, c_r)
    return sin, cos


def sincos_2pi(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``(sin x, cos x)`` for ``x`` in ``[0, 2*pi)`` (Box–Muller angles).

    One shift maps onto the ``[-pi, pi]`` kernel:
    ``sin(x) = -sin(x - pi)``, ``cos(x) = -cos(x - pi)``.
    """
    s, c = sincos_npi(x - _PI)
    return -s, -c
