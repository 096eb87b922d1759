"""Single-kernel on-device lambda search: costs resident in VMEM.

The XLA auto-lambda loops (``core/autolambda.py``) already avoid the
reference's host<->device ping-pong (``/root/reference/src/pi_mpc/
mppi.py:341-370, 526-566``), but each of their fixed iterations re-reads
the ``[K]`` cost vector from HBM: at the flagship scale (K=100k, 40
bisection iterations, ~3 vector passes per ESS evaluation) that is
~48 MB of HBM traffic per tick for a 400 KB operand.  These kernels load
the padded cost vector into VMEM **once** and run every iteration
on-chip — the HBM bill collapses to a single 400 KB read.

Same arithmetic as the XLA versions (ESS via the z^2 / sum(e^2) identity,
identical bracket clamps and golden-section recurrence), asserted
equivalent in tests/test_autolambda.py.  Interpret mode works (no PRNG),
so the CPU suite exercises the real kernel code path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile geometry shared with the fused solve kernel (single source)
from mppi_playground_tpu.ops.fused_solve import LANES, SUBLANES, TILE as _TILE

# The kernel holds the padded [rows, 128] costs plus two [K]-shaped f32
# temporaries per ESS evaluation (s and e) in VMEM: peak ~3 * 4 * K bytes
# of the ~16 MB/core budget.  K = 1M (12 MB peak) is hardware-verified on
# a v5e (RUNALL_r3.jsonl: racing_1m_essps runs through this kernel);
# beyond it the partitionable XLA loops take over.
_MAX_K = 1024 * 1024


def lambda_search_supported(num_samples: int) -> bool:
    """Whether the VMEM-resident kernel fits this sample count."""
    return num_samples <= _MAX_K


def _pad_costs(costs: jnp.ndarray) -> jnp.ndarray:
    """Pad [K] -> [rows, 128] with +1e30.

    The sentinel matches the fused solve kernel's cost padding
    (``ops/fused_solve.py``): ``exp(-1e30/lam - m)`` underflows to
    exactly 0, so padding never contributes to any softmin reduction.
    """
    k = costs.shape[0]
    k_pad = -(-k // _TILE) * _TILE
    if k_pad > k:
        costs = jnp.concatenate(
            [costs, jnp.full(k_pad - k, 1e30, costs.dtype)]
        )
    return costs.reshape(k_pad // LANES, LANES).astype(jnp.float32)


def _vreg_chunks(x):
    """[rows, 128] -> [rows/8, 8, 128] (whole [8,128] vreg chunks).

    The padded cost block always has rows % 8 == 0 (``_pad_costs`` pads K
    to whole 1024-sample tiles).  Search-loop reductions accumulate over
    the chunk axis into one [8,128] vreg FIRST and only then collapse to
    a scalar: a lane-parallel add per chunk instead of a full cross-lane
    reduction per chunk, which measured ~5x faster per search iteration
    at K=100k (ABLATE_r5.jsonl ``lambda_iter_cost_*``).  Reduction ORDER
    differs from a flat ``jnp.sum`` by f32 rounding only; the tests pin
    the search results against scipy/XLA at the same tolerances as
    before.
    """
    rows = x.shape[0]
    return x.reshape(rows // SUBLANES, SUBLANES, LANES)


# Above these block sizes the per-iteration elementwise intermediates are
# computed by a serial fori_loop over 512-row ref loads instead of
# whole-block: a whole-block LBPS objective materializes ~3-4 block-sized
# arrays, so the limit depends on who is calling —
# * the STANDALONE kernels' only VMEM tenant is the costs block: 3-4
#   blocks fit up to the 4 MiB block of K=1M (12 MB peak,
#   hardware-verified since r3), and whole-block is markedly faster
#   (grouped ESSPS at 1M measured ~3x slower per search);
# * the fused solve's LAMBDA EPILOGUE shares VMEM with the phase-1
#   kernel's working set: whole-block intermediates at K=1M measured
#   17.6-17.8M against the 16M scope, so it groups beyond 2 MiB.
_WHOLE_BLOCK_STANDALONE = 4 * 1024 * 1024
_WHOLE_BLOCK_EPILOGUE = 2 * 1024 * 1024
_GROUP_CHUNKS = 64


def _is_grouped(rows: int, whole_block_limit: int) -> bool:
    return rows * LANES * 4 > whole_block_limit


def _group_rows():
    return _GROUP_CHUNKS * SUBLANES


def _grouped_min(c_ref, rows: int):
    """min over the [rows, 128] block by serial group loads (exact in
    any order)."""
    gh = _group_rows()
    n_full = rows // gh
    tail = rows - n_full * gh

    def body(g, m):
        return jnp.minimum(m, jnp.min(c_ref[pl.ds(g * gh, gh), :]))

    m = lax.fori_loop(0, n_full, body, jnp.float32(jnp.inf))
    if tail:
        m = jnp.minimum(m, jnp.min(c_ref[pl.ds(n_full * gh, tail), :]))
    return m


def _ess_terms_from_exp(e3):
    """(z, sum e^2) softmin partials from pre-shifted exponentials
    (``e3`` in [chunks, 8, 128] layout — see ``_vreg_chunks``)."""
    return jnp.sum(e3.sum(axis=0)), jnp.sum((e3 * e3).sum(axis=0))


def essps_bisect(c_ref, lam_min, lam_max, target, iters: int,
                 whole_block_limit: int = _WHOLE_BLOCK_STANDALONE):
    """ESSPS bisection over a VMEM-resident padded [rows, 128] cost block.

    ``c_ref`` is the block's Pallas REF (both callers — the standalone
    kernel below and the fused solve's in-kernel lambda epilogue
    (``ops/fused_solve.py``) — hold one), so the two paths can never
    diverge arithmetically.  All scalar operands must already be f32.

    The softmax shift is lambda-independent: max(-c/lam) = -min(c)/lam
    for lam > 0 (scaling by a positive constant is monotone, so the
    rounded max commutes).  Hoisting d = min(c) - c out of the loop
    drops the per-iteration [K] max-reduce and subtract — each of the
    bisection steps is then one mul + exp + two sum-reduces over the
    VMEM-resident vector.  exp(d/lam) differs from exp(-c/lam - m) only
    in rounding order (one fma vs mul-then-sub), within 1 ulp; the
    bisection root moves < f32 resolution (asserted vs scipy in
    tests/test_autolambda.py).
    """
    rows = c_ref.shape[0]

    if _is_grouped(rows, whole_block_limit):
        # Large-K strategy: a lax.fori_loop over 512-row groups loaded
        # straight from the ref (pl.ds) — strictly serial, so the VMEM
        # peak is the resident costs block + ONE group's intermediates.
        # Whole-block intermediates at K=1M measured 17.6-17.8M against
        # the 16M scope (the hoisted d3 plus scheduler-interleaved group
        # blocks); per-group shift folding ((cmin - cg) * a) is
        # elementwise-identical arithmetic to the hoisted d3 form.
        cmin = _grouped_min(c_ref, rows)
        gh = _group_rows()
        n_full = rows // gh
        tail = rows - n_full * gh

        def ess(lam):
            a = 1.0 / lam

            def accum(cg_rows, zp, sqp):
                cg = cg_rows.reshape(-1, SUBLANES, LANES)
                e = jnp.exp((cmin - cg) * a)
                return zp + e.sum(axis=0), sqp + (e * e).sum(axis=0)

            def body(g, carry):
                zp, sqp = carry
                return accum(c_ref[pl.ds(g * gh, gh), :], zp, sqp)

            zp = jnp.zeros((SUBLANES, LANES), jnp.float32)
            sqp = jnp.zeros((SUBLANES, LANES), jnp.float32)
            zp, sqp = lax.fori_loop(0, n_full, body, (zp, sqp))
            if tail:
                zp, sqp = accum(
                    c_ref[pl.ds(n_full * gh, tail), :], zp, sqp
                )
            z = jnp.sum(zp)
            sq = jnp.sum(sqp)
            return z * z / sq
    else:
        c = c_ref[:, :]
        d3 = _vreg_chunks(jnp.min(c) - c)

        def ess(lam):
            e3 = jnp.exp(d3 * (1.0 / lam))
            z, sq = _ess_terms_from_exp(e3)
            return z * z / sq

    ess_at_min = ess(lam_min)
    ess_at_max = ess(lam_max)

    def body(_, ab):
        a, b = ab
        mid = 0.5 * (a + b)
        below = ess(mid) < target  # root above mid (ESS monotone in lam)
        return jnp.where(below, mid, a), jnp.where(below, b, mid)

    a, b = lax.fori_loop(0, iters, body, (lam_min, lam_max))
    root = 0.5 * (a + b)
    # bracket clamps match the reference (mppi.py:361-364)
    return jnp.where(
        target <= ess_at_min,
        lam_min,
        jnp.where(target >= ess_at_max, lam_max, root),
    )


def _essps_kernel(params_ref, costs_ref, out_ref, *, iters: int,
                  whole_block_limit: int):
    # params: [lam_min, lam_max, target]
    out_ref[0] = essps_bisect(
        costs_ref, params_ref[0], params_ref[1], params_ref[2], iters,
        whole_block_limit=whole_block_limit,
    )


def lbps_golden(c_ref, lam_min, lam_max, range_pen, iters: int,
                whole_block_limit: int = _WHOLE_BLOCK_STANDALONE):
    """LBPS golden-section over a VMEM-resident padded [rows, 128] block.

    Shared by the standalone kernel below and the fused solve's in-kernel
    lambda epilogue (``ops/fused_solve.py``).  ``range_pen`` is the
    cost-range penalty ``(max - min) * sqrt((1-delta)/delta)`` computed
    over the UNPADDED costs by the caller (the +1e30 padding sentinel
    would pollute a naive in-block max).  All scalars must be f32.

    The per-iteration [K] max-reduce is hoisted exactly: for lam > 0,
    max(round(c * (-1/lam))) == round(min(c) * (-1/lam)) because scaling
    by a positive constant is monotone and f32 rounding preserves order
    — so the scalar below reproduces the reduce BITWISE.  (A stronger
    hoist — folding the shift into exp((min(c)-c)/lam) — changes
    rounding by 1 ulp, and the LBPS objective is flat enough near its
    minimum that golden-section then converges to a different plateau
    point; measured 3.83 vs 3.33 on a uniform-cost vector.  Bisection on
    the monotone ESS is immune, hence the full hoist in essps_bisect.)
    """
    rows = c_ref.shape[0]

    # negated LBPS lower bound (mppi.py:534-557), same math as
    # core.autolambda.lbps_objective up to the softmax formulation.
    # Algebraic form: -(E[-c] - pen/sqrt(ess)) with ess = z^2/sq and
    # E[-c] = -sum(e*c)/z collapses to (sum(e*c) + pen*sqrt(sq)) / z
    # — one scalar divide and no ess intermediate.  The search loop
    # is serialized on these scalars (each golden iteration's
    # vector pass waits on the previous comparison), so trimming the
    # scalar tail cuts measured per-iteration cost; lambda* agrees
    # with the expanded form to f32 rounding (tests pin vs scipy/XLA
    # at the same tolerances as before).
    if _is_grouped(rows, whole_block_limit):
        # serial fori_loop over 512-row ref-loaded groups — see
        # essps_bisect's grouped branch for the VMEM-peak rationale
        cmin = _grouped_min(c_ref, rows)
        gh = _group_rows()
        n_full = rows // gh
        tail = rows - n_full * gh

        def objective(lam):
            a = -1.0 / lam
            shift = cmin * a

            def accum(cg_rows, zp, sqp, wcp):
                cg = cg_rows.reshape(-1, SUBLANES, LANES)
                e = jnp.exp(cg * a - shift)
                return (
                    zp + e.sum(axis=0),
                    sqp + (e * e).sum(axis=0),
                    wcp + (e * cg).sum(axis=0),
                )

            def body(g, carry):
                return accum(c_ref[pl.ds(g * gh, gh), :], *carry)

            zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
            zp, sqp, wcp = lax.fori_loop(
                0, n_full, body, (zero, zero, zero)
            )
            if tail:
                zp, sqp, wcp = accum(
                    c_ref[pl.ds(n_full * gh, tail), :], zp, sqp, wcp
                )
            z = jnp.sum(zp)
            sq = jnp.sum(sqp)
            wc = jnp.sum(wcp)
            return (wc + range_pen * jnp.sqrt(sq)) / z
    else:
        c = c_ref[:, :]
        cmin = jnp.min(c)
        c3 = _vreg_chunks(c)

        def objective(lam):
            s3 = c3 * (-1.0 / lam)
            e3 = jnp.exp(s3 - cmin * (-1.0 / lam))
            z, sq = _ess_terms_from_exp(e3)
            wc = jnp.sum((e3 * c3).sum(axis=0))
            return (wc + range_pen * jnp.sqrt(sq)) / z

    invphi = jnp.float32((5.0**0.5 - 1.0) / 2.0)
    a = lam_min
    b = lam_max
    cc = b - (b - a) * invphi
    d = a + (b - a) * invphi
    fc = objective(cc)
    fd = objective(d)

    def body(_, carry):
        a, b, cc, d, fc, fd = carry
        shrink_right = fc < fd
        new_a = jnp.where(shrink_right, a, cc)
        new_b = jnp.where(shrink_right, d, b)
        fresh_lo = new_b - (new_b - new_a) * invphi
        fresh_hi = new_a + (new_b - new_a) * invphi
        x = jnp.where(shrink_right, fresh_lo, fresh_hi)
        fx = objective(x)
        new_c = jnp.where(shrink_right, x, d)
        new_fc = jnp.where(shrink_right, fx, fd)
        new_d = jnp.where(shrink_right, cc, x)
        new_fd = jnp.where(shrink_right, fc, fx)
        return new_a, new_b, new_c, new_d, new_fc, new_fd

    a, b, cc, d, fc, fd = lax.fori_loop(
        0, iters, body, (a, b, cc, d, fc, fd)
    )
    return 0.5 * (a + b)


def _lbps_kernel(params_ref, costs_ref, out_ref, *, iters: int,
                 whole_block_limit: int):
    # params: [lam_min, lam_max, delta, range_pen] — the cost-range
    # penalty term is computed OUTSIDE the kernel (a single XLA max/min
    # over the unpadded [K] costs): the padding sentinel (+1e30) would
    # pollute an in-kernel max, and masking it needed two [K]-shaped
    # int32 iotas of pure VMEM overhead
    out_ref[0] = lbps_golden(
        costs_ref, params_ref[0], params_ref[1], params_ref[3], iters,
        whole_block_limit=whole_block_limit,
    )


def essps_lambda_fused(
    costs: jnp.ndarray,
    target_ess: float,
    lambda_min: float,
    lambda_max: float,
    iters: int = 40,
    interpret: Optional[bool] = None,
    whole_block_limit: int = _WHOLE_BLOCK_STANDALONE,
) -> jnp.ndarray:
    """VMEM-resident ESSPS bisection; same result as ``essps_lambda``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    params = jnp.asarray(
        [lambda_min, lambda_max, target_ess], jnp.float32
    )
    out = pl.pallas_call(
        functools.partial(_essps_kernel, iters=iters,
                          whole_block_limit=whole_block_limit),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        interpret=interpret,
    )(params, _pad_costs(costs))
    return out[0].astype(costs.dtype)


def lbps_lambda_fused(
    costs: jnp.ndarray,
    delta: float,
    lambda_min: float,
    lambda_max: float,
    iters: int = 32,
    interpret: Optional[bool] = None,
    whole_block_limit: int = _WHOLE_BLOCK_STANDALONE,
) -> jnp.ndarray:
    """VMEM-resident LBPS golden-section; same result as ``lbps_lambda``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c32 = costs.astype(jnp.float32)
    # cost-range term over the UNPADDED costs, outside the kernel (one
    # cheap XLA pass; see _lbps_kernel comment)
    range_pen = (jnp.max(c32) - jnp.min(c32)) * jnp.sqrt(
        jnp.asarray((1.0 - delta) / delta, jnp.float32)
    )
    params = jnp.stack(
        [
            jnp.asarray(lambda_min, jnp.float32),
            jnp.asarray(lambda_max, jnp.float32),
            jnp.asarray(delta, jnp.float32),
            range_pen,
        ]
    )
    out = pl.pallas_call(
        functools.partial(_lbps_kernel, iters=iters,
                          whole_block_limit=whole_block_limit),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        interpret=interpret,
    )(params, _pad_costs(costs))
    return out[0].astype(costs.dtype)
