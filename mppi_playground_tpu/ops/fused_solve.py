"""Fully fused MPPI solve: one Pallas kernel per control tick.

The reference solve (``/root/reference/src/pi_mpc/mppi.py:223-460``)
dispatches dozens of CUDA kernels per tick and round-trips every
intermediate ([K,T,m] noise, [K,T+1,n] states, [K,T] costs) through
device memory.  The XLA path in ``core/solver.py`` already fuses the tick
into one program; this module goes the rest of the way for serving-grade
latency — a **single Pallas TPU kernel** in which, per 1024-sample tile:

1. normals are generated in-register by the hardware PRNG (Box–Muller on
   ``pltpu.prng_random_bits``) — the [K,T,m] noise tensor never exists in
   HBM;
2. the perturbed action sequences are built, clamped, and kept in VMEM;
3. the horizon is rolled out step-by-step in structure-of-arrays layout
   (each state component a full [8,128] vreg — a ``[K,4]`` array would
   use 4 of 128 lanes) with the stage cost fused in, map penalties via
   the row-interval tables (``ops/row_intervals.py``);
4. a tile-local softmin (max, normalizer, sum of squared weights) and the
   weighted action numerator are reduced in-register.

Only ``[K]`` costs and ``[num_tiles, 128]`` partials ever reach HBM; a
tiny XLA epilogue merges the tile partials (flash-attention-style
rescaling) into the update, weights and ESS.  HBM traffic per solve drops
from ~200 MB to ~0.5 MB.

Constraints of the fused path (asserted at build): f32,
``horizon * dim_control <= 1024`` (action slots pack across the 8 sublanes
x 128 lanes of one vreg tile), no rollout storage.  Auto-lambda
(LBPS/ESSPS) uses a two-phase split: phase 1 produces the costs and dumps
the clamped perturbations to HBM (free — hidden under the rollout), lambda
is solved on device, and a ``weighted_only`` second pass reads the dump
back (``pert=``) to weight at the final lambda; regeneration from the
seeds remains as the fallback and diagnostics path.  A noise-injection
variant (``noise=...``) exists for equivalence tests against the XLA
solver.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mppi_playground_tpu.core.config import MPPIConfig
from mppi_playground_tpu.utils.fastmath import sincos_2pi

LANES = 128
SUBLANES = 8
# 1024 samples per grid step (one [8,128] vreg per state component).
# Measured on the flagship (benchmarks/tile_height.py, v5e): taller tiles
# do NOT pay — s16 is ~17% slower (VMEM pressure from the unrolled pert
# slots outweighs any latency hiding) and s32 fails to fit.  The height
# stays a build knob (``make_fused_solve(tile_sublanes=...)``) for future
# hardware where the trade-off may flip.
TILE = SUBLANES * LANES
_TWO_PI = 2.0 * np.pi
# int32-safe (< 2^31) odd constants for the per-tile seed hash below.
_HASH_MUL = 0x45D9F3B
_TILE_MUL = 0x632BE5AB


def _mix_seed(seed, tile):
    """Hash (per-tick seed, tile id) into a decorrelated PRNG seed.

    An additive offset (``seed + tile * C``) makes tile ``i`` of tick A
    collide with tile ``j`` of tick B whenever ``seedA - seedB == (j - i)
    * C`` — with ~98 tiles alive per solve at flagship scale, structured
    birthday collisions recur over long runs and replay identical
    1024-sample noise blocks.  Mixing both words through an
    integer hash (xor-shift / odd-multiply rounds, bijective mod 2^32)
    spreads collisions over the full 2^32 space instead.

    The xor-shift stages must use *logical* right shifts: with int32's
    arithmetic shift, ``h ^ (h >> 16)`` maps ``h`` and ``~h`` to the same
    value (and pins bit 31), collapsing each stage 2-to-1 and shrinking
    the effective seed space to ~2^29.
    """
    h = seed ^ (tile * jnp.int32(_TILE_MUL))
    h = h ^ lax.shift_right_logical(h, 16)
    h = h * jnp.int32(_HASH_MUL)
    h = h ^ lax.shift_right_logical(h, 16)
    h = h * jnp.int32(_HASH_MUL)
    return h ^ lax.shift_right_logical(h, 16)


@dataclasses.dataclass(frozen=True)
class FusedTask:
    """Model plug for the fused kernel (structure-of-arrays contract).

    Attributes:
        dynamics_soa: ``(xs: tuple[n], us: tuple[m]) -> tuple[n]`` on
            same-shape component arrays.
        stage_cost_soa: ``(xs, us, ctx) -> cost array``; ``ctx`` carries
            ``t`` (static int), ``prev_xs``/``prev_us`` (tuples), ``x0``
            (tuple of scalars), ``vmem`` (this task's ``vmem_args`` pytree
            with leaves materialized from VMEM) and ``smem`` (dict of SMEM
            refs for scalar reads, e.g. the reference trajectory).
        vmem_args: pytree of device arrays resident in VMEM for the whole
            kernel (e.g. row-interval map tables).
        smem_builder: ``info -> dict[str, [R, C] f32 array]`` of small
            per-solve scalar tables (built per tick outside the kernel).
    """

    dynamics_soa: Callable
    stage_cost_soa: Callable
    vmem_args: Any
    smem_builder: Callable[[Dict[str, Any]], Dict[str, jnp.ndarray]]


def _normal_pair_from_bits(b1, b2):
    """Two independent standard-normal vregs per Box–Muller transform.

    Using both the cos and sin branches halves the raw-bit consumption
    and the log/sqrt transcendentals per normal; the sin/cos themselves
    are the shared polynomial kernel (theta is uniform in [0, 2*pi) by
    construction — exactly ``sincos_2pi``'s domain), leaving log and
    sqrt as the pair's only special-pipe ops.
    """
    # raw bits are signed int32 vregs; mask to 24 uniform bits
    b1 = b1 & 0xFFFFFF
    b2 = b2 & 0xFFFFFF
    # -> uniform in [2^-25, 1): strictly positive for the log
    u1 = b1.astype(jnp.float32) * (2.0**-24) + (2.0**-25)
    u2 = b2.astype(jnp.float32) * (2.0**-24)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    sin_t, cos_t = sincos_2pi(_TWO_PI * u2)
    return r * cos_t, r * sin_t


def _block_min_max_valid(costs_ref, k_pad: int, num_valid: int):
    """(min, max) over the first ``num_valid`` entries of the padded
    [k_pad/128, 128] costs block, read from its Pallas ref.

    Exact in any evaluation order (min/max are associative-commutative
    and f32-exact), so the result is bitwise-equal to an XLA reduce over
    ``costs[:num_valid]``.  The +1e30 padding sentinel never lowers the
    min, so only the max needs the valid mask; blocks above 2 MiB are
    folded in serial 512-row ref loads so the VMEM peak stays at the
    resident block (same strategy as ``ops/lambda_search.py``).
    """
    rows = k_pad // LANES
    full_rows = num_valid // LANES
    rem = num_valid % LANES
    neg_inf = jnp.float32(-jnp.inf)
    if rows * LANES * 4 <= 2 * 1024 * 1024:
        c = costs_ref[:, :]
        cmin = jnp.min(c)
        cmax = jnp.max(c[:full_rows, :]) if full_rows else neg_inf
    else:
        gh = 512
        n_full = full_rows // gh

        def body(g, m):
            blk = costs_ref[pl.ds(g * gh, gh), :]
            return (
                jnp.minimum(m[0], jnp.min(blk)),
                jnp.maximum(m[1], jnp.max(blk)),
            )

        cmin, cmax = lax.fori_loop(
            0, n_full, body, (jnp.float32(jnp.inf), neg_inf)
        )
        tail_rows = full_rows - n_full * gh
        if tail_rows:
            blk = costs_ref[pl.ds(n_full * gh, tail_rows), :]
            cmin = jnp.minimum(cmin, jnp.min(blk))
            cmax = jnp.maximum(cmax, jnp.max(blk))
    if rem:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        rrow = costs_ref[pl.ds(full_rows, 1), :]
        cmax = jnp.maximum(
            cmax, jnp.max(jnp.where(lane < rem, rrow, neg_inf))
        )
        # the rem row's padding is +1e30: plain min is safe (and for the
        # small path the whole-block min above already covered this row)
        cmin = jnp.minimum(cmin, jnp.min(rrow))
    return cmin, cmax


def fused_envelope(config) -> bool:
    """Whether a config fits the fused kernel (single source of truth).

    The full range is hardware-verified, not just gated: the fused solve
    compiles and runs on a v5e at d_flat = horizon*dim_control of 256 /
    512 / 1024 on the fixed-lambda path AND the two-phase ESSPS path
    (whose pert dump adds a [d_flat, 8, 128] VMEM block), and the racing
    task with VMEM map tables at d_flat = 200 (RUNALL_r3.jsonl); VMEM
    headroom at 1024 is ~4 MB of pert slots + ~4 MB dump block, inside
    the ~16 MB/core budget.
    """
    return (
        config.horizon * config.dim_control <= SUBLANES * LANES
        # make_fused_reroll packs the state into vreg lanes (build-time
        # assert); the gate must cover it so wide states fall back to XLA
        and config.dim_state <= LANES
        and config.dtype == jnp.float32
        and not config.store_rollouts
    )


def fused_supported() -> bool:
    """Fused kernels compile natively only on TPU backends."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def resolve_fused_request(fused: bool) -> bool:
    """Gate a user-requested fused backend on actual hardware support.

    A forced ``fused`` backend off-TPU is unusable: the first tick hits
    the interpret-mode PRNG gate (``pltpu.prng_random_bits`` has no CPU
    interpreter), and with ``store_rollouts=False`` the stored-rollout
    diagnostics the examples overlay are unavailable too.  CLI entry
    points that expose a ``--fused`` flag route it through here so the
    fallback is loud and identical everywhere.
    """
    if fused and not fused_supported():
        print("--fused requires a TPU backend; using the XLA solver")
        return False
    return fused


def make_fused_reroll(
    config: MPPIConfig, task: FusedTask, interpret: Optional[bool] = None
):
    """Single-kernel nominal-trajectory re-roll (mppi.py:508-524, batch 1).

    The XLA scan version chains ``horizon`` dependent micro-ops (~0.3 ms of
    pure dispatch latency at horizon 50); this rolls the whole sequence
    inside one Pallas kernel on broadcast vregs.  Exact same arithmetic as
    the SoA dynamics.
    """
    if interpret is None:
        interpret = not fused_supported()
    horizon = config.horizon
    dim_state = config.dim_state
    dim_control = config.dim_control
    assert dim_state <= LANES

    def kernel(x0_ref, seq_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def pack(xs):
            row = jnp.zeros((1, LANES), jnp.float32)
            for c in range(dim_state):
                row = jnp.where(lane == c, xs[c], row)
            return row

        xs = tuple(
            jnp.full((1, LANES), x0_ref[c], jnp.float32) for c in range(dim_state)
        )
        out_ref[0:1, :] = pack(xs)
        for t in range(horizon):
            us = tuple(
                jnp.full((1, LANES), seq_ref[t, j], jnp.float32)
                for j in range(dim_control)
            )
            xs = task.dynamics_soa(xs, us)
            out_ref[t + 1 : t + 2, :] = pack(xs)

    def reroll(x0: jnp.ndarray, action_seq: jnp.ndarray) -> jnp.ndarray:
        """``(x0 [n], action_seq [T, m]) -> state_seq [T+1, n]``."""
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((horizon + 1, LANES), jnp.float32),
            interpret=interpret,
        )(jnp.asarray(x0, jnp.float32), jnp.asarray(action_seq, jnp.float32))
        return out[:, :dim_state]

    return reroll


def make_fused_solve(
    config: MPPIConfig,
    task: FusedTask,
    interpret: Optional[bool] = None,
    local_num_samples: Optional[int] = None,
    tile_sublanes: Optional[int] = None,
    global_padded: bool = False,
):
    """Build ``solve_core(x0, prev_seq, lam, seed, smem, noise) -> ...``.

    Returns a jit-ready callable producing
    ``(costs [K], update [T, m], weights [K], ess)`` with semantics
    matching ``core/solver.py`` steps 1-6 at fixed lambda.

    ``tile_sublanes`` sets the per-grid-step sample block height: the
    rollout is a serial dependency chain (50 dependent dynamics steps),
    so a single [8, 128] vreg per state component leaves the VPU pipeline
    latency exposed; taller blocks give Mosaic ``tile_sublanes / 8``
    independent vreg chains to interleave per step.  Changing it changes
    the per-tile PRNG stream (same distribution, different draws) — it is
    a build-time performance knob, not a runtime one.
    """
    if interpret is None:
        interpret = not fused_supported()
    if tile_sublanes is None:
        tile_sublanes = SUBLANES
    assert tile_sublanes >= SUBLANES and tile_sublanes % SUBLANES == 0, (
        "tile height must be a positive whole number of 8-sublane vregs"
    )
    S = tile_sublanes
    tile = S * LANES
    horizon = config.horizon
    dim_control = config.dim_control
    dim_state = config.dim_state
    num_samples = config.num_samples
    d_flat = horizon * dim_control
    # The weighted numerator packs one lane per (t, j) action slot across
    # the 8 sublanes of a [8, 128] vreg tile: slot f lives at sublane
    # f // 128, lane f % 128, lifting the old one-vreg (d_flat <= 128)
    # envelope to a full tile's 1024 slots at zero extra HBM traffic.
    assert d_flat <= S * LANES, (
        f"fused path requires horizon*dim_control <= {S * LANES}"
    )
    assert config.dtype == jnp.float32, "fused path is f32"

    # Under sample-axis sharding each device runs this kernel on its shard
    # with a global tile offset; shards must be whole tiles so the global
    # sample indexing (and the PRNG stream) is identical to the unsharded
    # solve.  Unsharded, the last tile may be padding; sharded, the global
    # tail may be padding too (``global_padded`` — the caller rounds K up
    # to whole tiles per shard and the global-index mask below forces the
    # padded samples' costs to 1e30 so they never win the softmin).
    num_local = num_samples if local_num_samples is None else local_num_samples
    if local_num_samples is not None:
        assert local_num_samples % tile == 0, (
            f"sharded fused solve needs whole {tile}-sample tiles per "
            f"shard (tile = tile_sublanes * 128)"
        )
    num_tiles = -(-num_local // tile)
    k_pad = num_tiles * tile
    threshold = config.inherited_samples
    sigmas = tuple(float(s) for s in config.sigmas)
    u_min = tuple(float(v) for v in config.u_min)
    u_max = tuple(float(v) for v in config.u_max)

    vmem_leaves, vmem_treedef = jax.tree_util.tree_flatten(task.vmem_args)

    # deferred import: ops/lambda_search imports LANES/TILE from this module
    from mppi_playground_tpu.ops.lambda_search import (  # noqa: E402
        essps_bisect,
        lbps_golden,
    )

    def _check_prng_available(noise_mode: bool) -> None:
        # pltpu.prng_random_bits has no interpreter implementation: in
        # interpret mode (the default on every non-TPU backend) the seeded
        # path dies deep inside Mosaic — fail at trace time with an
        # actionable message instead.
        if interpret and not noise_mode:
            raise NotImplementedError(
                "the fused kernel's seeded in-register PRNG "
                "(pltpu.prng_random_bits) does not run in interpret mode; "
                "off-TPU pass noise= explicitly or use the XLA solver "
                "(core.solver.make_solver)"
            )

    def kernel(x0_ref, prev_ref, lam_ref, seed_ref, offset_ref, *refs,
               noise_mode: bool, smem_keys: Tuple[str, ...],
               weighted_only: bool = False, regen_dump_only: bool = False,
               dump_pert: bool = False, pert_in: bool = False,
               costs_only: bool = False, lambda_mode: Optional[str] = None):
        # ``weighted_only`` is the auto-lambda second phase: costs are an
        # input (computed by the full kernel at a provisional lambda), the
        # rollout is skipped, and the perturbations come from the same
        # per-tile seeds — regenerated (recompute over materialize), or
        # read back directly when ``pert_in`` is set (the noise input then
        # holds the phase-1 ``dump_pert`` output: already mean-shifted and
        # clamped, so PRNG + Box-Muller + clamp are all skipped — at
        # flagship scale reading 40 MB beats regenerating ~10M normals).
        # ``regen_dump_only`` is the diagnostics mode (get_top_samples
        # on the fused path): regenerate the perturbed action sequences
        # from the same seeds and write them out, skipping rollout and
        # softmin.  ``dump_pert`` adds the same dump output to a
        # ``costs_only`` solve (phase 1 of the read-back auto-lambda
        # path; it always pairs with ``costs_only`` — see run_kernel).
        if weighted_only or regen_dump_only:
            vmem_refs = ()
            smem_refs = {}
            idx = 0
        else:
            n_vmem = len(vmem_leaves)
            vmem_refs = refs[:n_vmem]
            smem_refs = dict(zip(smem_keys, refs[n_vmem : n_vmem + len(smem_keys)]))
            idx = n_vmem + len(smem_keys)
        noise_ref = refs[idx] if noise_mode else None
        idx += 1 if noise_mode else 0
        # ``costs_only`` drops the softmin-partials outputs from the full
        # solve: the auto-lambda phase 1 discards them (they were computed
        # at the provisional lambda), so the per-tile exp/reduce/numer work
        # — ~T*m reductions — is skipped entirely.
        if regen_dump_only:
            pert_ref = refs[idx]
        elif weighted_only:
            costs_in_ref = refs[idx]
            stats_ref, numer_ref = refs[idx + 1 : idx + 3]
        elif costs_only:
            # output order: costs, [pert dump], [lambda]; an SMEM min/max
            # scratch ref (LBPS lambda epilogue only) trails the outputs
            costs_ref = refs[idx]
            nxt = idx + 1
            if dump_pert:
                pert_out_ref = refs[nxt]
                nxt += 1
            if lambda_mode is not None:
                lam_out_ref = refs[nxt]
                nxt += 1
        else:
            # dump_pert implies costs_only (asserted in run_kernel): the
            # only dump consumer is auto-lambda phase 1, which discards
            # the provisional-lambda partials anyway
            costs_ref, stats_ref, numer_ref = refs[idx : idx + 3]

        # Global tile id: offset_ref carries this shard's first tile under
        # sample-axis sharding, making the PRNG stream (and hence results)
        # invariant to the mesh shape (SURVEY.md §7 hard part #6).
        i = offset_ref[0] + pl.program_id(0)
        vmem_vals = (
            None if (weighted_only or regen_dump_only)
            else vmem_treedef.unflatten([r[:] for r in vmem_refs])
        )

        lane = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0)
        sidx = i * tile + sub * LANES + lane  # global sample index

        # --- noise + perturbed action sequences (mppi.py:255-274) ---
        if not noise_mode:
            pltpu.prng_seed(_mix_seed(seed_ref[0], i))
        use_prev = sidx < threshold
        if not noise_mode:
            # per-pair draws (sequential PRNG state advance).  A single
            # wide prng_random_bits block was measured perf-neutral on
            # the fixed-lambda kernel but cost ~0.013 ms on the
            # two-phase LBPS path (ABLATE_r5 runs c/d vs b), so the
            # original form stays; _draw_normals remains for reference.
            zs = []
            for _ in range((d_flat + 1) // 2):
                b1 = pltpu.prng_random_bits((S, LANES))
                b2 = pltpu.prng_random_bits((S, LANES))
                z1, z2 = _normal_pair_from_bits(b1, b2)
                zs.append(z1)
                zs.append(z2)
        pert = []  # [T][m] arrays of [S,128]
        for t in range(horizon):
            row = []
            for j in range(dim_control):
                if pert_in:
                    # input already holds the final clamped sequences
                    row.append(noise_ref[t * dim_control + j, :, :])
                    continue
                if noise_mode:
                    z = noise_ref[t * dim_control + j, :, :]
                else:
                    z = zs[t * dim_control + j] * sigmas[j]
                mean = prev_ref[t, j]
                if threshold >= num_samples:
                    v = mean + z
                elif threshold <= 0:
                    v = z
                else:
                    v = jnp.where(use_prev, mean + z, z)
                row.append(jnp.clip(v, u_min[j], u_max[j]))
            pert.append(row)

        def write_pert(ref):
            for t in range(horizon):
                for j in range(dim_control):
                    ref[t * dim_control + j, :, :] = pert[t][j]

        if regen_dump_only:
            write_pert(pert_ref)
            return
        if dump_pert:
            write_pert(pert_out_ref)

        if weighted_only:
            acc = costs_in_ref[:, :]
        else:
            # --- fused rollout + stage costs (mppi.py:280-336) ---
            x0 = tuple(
                jnp.full((S, LANES), x0_ref[c], jnp.float32)
                for c in range(dim_state)
            )
            xs = x0
            xs_prev = x0
            acc = jnp.zeros((S, LANES), jnp.float32)
            for t in range(horizon):
                ctx = dict(
                    t=t,
                    prev_xs=xs_prev,
                    prev_us=tuple(pert[max(t - 1, 0)]),
                    x0=x0,
                    vmem=vmem_vals,
                    smem=smem_refs,
                )
                acc = acc + task.stage_cost_soa(xs, tuple(pert[t]), ctx)
                xs_prev = xs
                xs = task.dynamics_soa(xs, tuple(pert[t]))

            # terminal cost: zero action, prev_state = second-to-last state,
            # t / prev_action keep their last stage values (mppi.py:318-328)
            zeros_u = tuple(
                jnp.zeros((S, LANES), jnp.float32)
                for _ in range(dim_control)
            )
            ctx = dict(
                t=horizon - 1,
                prev_xs=xs_prev,
                prev_us=tuple(pert[max(horizon - 2, 0)]),
                x0=x0,
                vmem=vmem_vals,
                smem=smem_refs,
            )
            acc = acc + task.stage_cost_soa(xs, zeros_u, ctx)

            # padding samples never win the softmin — locally padded last
            # tile (unsharded) or globally padded trailing tiles (sharded
            # with K not a multiple of tile * n_shards); sidx is global
            if k_pad > num_local or global_padded:
                acc = jnp.where(sidx < num_samples, acc, 1e30)
            if lambda_mode is None:
                costs_ref[:, :] = acc
            else:
                # the costs output is one revisited full-array VMEM block
                # (see run_kernel): each grid step stores its tile's rows,
                # and the last step reads the whole block for the lambda
                # epilogue — no HBM round trip, no second kernel launch
                il = pl.program_id(0)
                costs_ref[pl.ds(il * S, S), :] = acc

        if costs_only:
            if lambda_mode is not None:
                # In-kernel auto-lambda epilogue: once the final tile's
                # costs are stored, the full padded [k_pad/128, 128] block
                # is VMEM-resident, so the same search bodies the
                # standalone ops/lambda_search.py kernels use run here at
                # zero launch/HBM cost.  Bounds/target/iters are static
                # (from MPPIConfig), baked in as f32 constants — the same
                # values the standalone kernels receive via SMEM params.
                il = pl.program_id(0)

                @pl.when(il == num_tiles - 1)
                def _lambda_epilogue():
                    # the search bodies take the block REF: above their
                    # 2 MiB whole-block limit they stream 512-row groups
                    # from it so the epilogue's VMEM peak stays at the
                    # resident costs block (K=1M whole-block variants
                    # measured 17.6-17.8M > the 16M scope)
                    lam_min = jnp.float32(config.lambda_min)
                    lam_max = jnp.float32(config.lambda_max)
                    from mppi_playground_tpu.ops.lambda_search import (
                        _WHOLE_BLOCK_EPILOGUE,
                    )
                    if lambda_mode == "essps":
                        lam_out_ref[0] = essps_bisect(
                            costs_ref, lam_min, lam_max,
                            jnp.float32(config.target_ess),
                            config.essps_iters,
                            whole_block_limit=_WHOLE_BLOCK_EPILOGUE,
                        )
                    else:
                        # range_pen matches lbps_lambda_fused's caller-side
                        # computation: ratio rounded to f32 first, then an
                        # f32 sqrt and one f32 mul — bitwise identical.
                        # min/max come straight off the resident costs
                        # block (min/max are order-independent, so this
                        # equals the XLA reduce over costs[:K] bitwise):
                        # the padding sentinel +1e30 never lowers the min,
                        # and the max masks the padded tail of the last
                        # valid row.  Replaces the per-tile SMEM min/max
                        # folds phase 1 used to carry (a serialization
                        # point per grid step).
                        cmin, cmax = _block_min_max_valid(
                            costs_ref, k_pad, num_samples
                        )
                        sqrt_ratio = jnp.sqrt(
                            jnp.float32(
                                (1.0 - config.lbps_delta) / config.lbps_delta
                            )
                        )
                        range_pen = (cmax - cmin) * sqrt_ratio
                        lam_out_ref[0] = lbps_golden(
                            costs_ref, lam_min, lam_max, range_pen,
                            config.lbps_iters,
                            whole_block_limit=_WHOLE_BLOCK_EPILOGUE,
                        )
            return

        # --- tile-local softmin partials (mppi.py:374-385, 526-532) ---
        lam = lam_ref[0]
        s = -acc / lam
        mx = jnp.max(s)
        e = jnp.exp(s - mx)
        z_sum = jnp.sum(e)
        sq_sum = jnp.sum(e * e)
        stats = jnp.where(
            lane == 0,
            mx,
            jnp.where(lane == 1, z_sum, jnp.where(lane == 2, sq_sum, 0.0)),
        )
        stats_ref[0, :, :] = stats

        numer = jnp.zeros((S, LANES), jnp.float32)
        for t in range(horizon):
            for j in range(dim_control):
                f = t * dim_control + j
                w_sum = jnp.sum(e * pert[t][j])
                numer = jnp.where(
                    (sub == f // LANES) & (lane == f % LANES), w_sum, numer
                )
        numer_ref[0, :, :] = numer

    def _append_noise_input(in_specs, args, noise):
        """Inject external noise: [K_local, T, m] -> [T*m, K_pad/128, 128].

        Shared by the full and weighted-only launches so the phase-1/2
        noise layouts can never diverge; tile i reads sublane rows
        S*i..S*(i+1) (block height = tile_sublanes).
        """
        nz = jnp.asarray(noise, jnp.float32).reshape(num_local, d_flat)
        if k_pad > num_local:
            nz = jnp.concatenate(
                [nz, jnp.zeros((k_pad - num_local, d_flat), jnp.float32)]
            )
        nz = nz.T.reshape(d_flat, k_pad // LANES, LANES)
        in_specs.append(
            pl.BlockSpec(
                (d_flat, S, LANES),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(nz)

    # ------------------------------------------------------------------
    def run_kernel(
        x0: jnp.ndarray,
        prev_action_seq: jnp.ndarray,
        lam: jnp.ndarray,
        seed: jnp.ndarray,
        smem_arrays: Dict[str, jnp.ndarray],
        noise: Optional[jnp.ndarray] = None,
        tile_offset=0,
        dump_pert: bool = False,
        costs_only: bool = False,
        lambda_mode: Optional[str] = None,
    ):
        """Kernel launch -> (costs [num_local], stats, numer) tile partials.

        With ``dump_pert``, an extra output carries the clamped perturbed
        action sequences in raw kernel layout ``[T*m, K_pad/128, 128]`` —
        feed it back as ``run_weighted(..., pert=...)`` so the auto-lambda
        phase 2 reads them instead of regenerating.  With ``costs_only``
        the softmin-partials outputs (discarded by auto-lambda phase 1)
        are dropped and their per-tile reductions skipped; the return is
        then ``(costs,)`` or ``(costs, pert)``.

        With ``lambda_mode`` ('essps' | 'lbps', requires ``costs_only``
        and an unsharded core), the LBPS/ESSPS lambda search runs as an
        in-kernel epilogue on the last grid step and the return gains a
        trailing scalar lambda* — bitwise-equal to the standalone
        ``ops/lambda_search.py`` kernels (same shared search bodies, same
        padded block layout) with no second launch and no 400 KB HBM
        round trip.  The grid then runs under 'arbitrary' semantics (the
        revisited costs block + the epilogue are cross-tile recurrences),
        giving up the megacore grid split — see
        ``supports_lambda_epilogue`` for the policy gate.
        """
        # the only dump consumer is auto-lambda phase 1 (costs_only);
        # the full-solve+dump combination has no caller and stays out of
        # the kernel's positional ref-unpacking protocol
        assert not dump_pert or costs_only, "dump_pert requires costs_only"
        assert lambda_mode in (None, "essps", "lbps")
        if lambda_mode is not None:
            assert costs_only, "lambda_mode requires costs_only"
            assert local_num_samples is None and not global_padded, (
                "in-kernel lambda epilogue needs the global cost vector; "
                "sharded cores use the partitionable XLA search"
            )
        smem_keys = tuple(sorted(smem_arrays.keys()))
        noise_mode = noise is not None
        _check_prng_available(noise_mode)

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # x0 [n]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # prev [T, m]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lam [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile offset [1]
        ]
        args = [
            jnp.asarray(x0, jnp.float32),
            jnp.asarray(prev_action_seq, jnp.float32),
            jnp.asarray(lam, jnp.float32).reshape(1),
            jnp.asarray(seed, jnp.int32).reshape(1),
            jnp.asarray(tile_offset, jnp.int32).reshape(1),
        ]
        for leaf in vmem_leaves:
            in_specs.append(
                pl.BlockSpec(
                    leaf.shape,
                    lambda i, nd=leaf.ndim: (0,) * nd,
                    memory_space=pltpu.VMEM,
                )
            )
            args.append(leaf)
        for kname in smem_keys:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            args.append(jnp.asarray(smem_arrays[kname], jnp.float32))
        if noise_mode:
            _append_noise_input(in_specs, args, noise)

        out_shape = [
            jax.ShapeDtypeStruct((k_pad // LANES, LANES), jnp.float32),  # costs
        ]
        if lambda_mode is None:
            out_specs = [
                pl.BlockSpec(
                    (S, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ]
        else:
            # one revisited full-array block: all k_pad costs stay
            # VMEM-resident across the grid so the last step's lambda
            # epilogue can read them (k_pad * 4 bytes of VMEM; gated by
            # supports_lambda_epilogue)
            out_specs = [
                pl.BlockSpec(
                    (k_pad // LANES, LANES),
                    lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
        if not costs_only:
            for _ in range(2):  # stats, numer partials
                out_shape.append(
                    jax.ShapeDtypeStruct(
                        (num_tiles, S, LANES), jnp.float32
                    )
                )
                out_specs.append(
                    pl.BlockSpec(
                        (1, S, LANES),
                        lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
        if dump_pert:
            out_shape.append(
                jax.ShapeDtypeStruct((d_flat, k_pad // LANES, LANES), jnp.float32)
            )
            out_specs.append(
                pl.BlockSpec(
                    (d_flat, S, LANES),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        scratch_shapes = []
        if lambda_mode is not None:
            out_shape.append(jax.ShapeDtypeStruct((1,), jnp.float32))  # lam
            out_specs.append(
                pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)
            )


        outs = pl.pallas_call(
            functools.partial(
                kernel, noise_mode=noise_mode, smem_keys=smem_keys,
                dump_pert=dump_pert, costs_only=costs_only,
                lambda_mode=lambda_mode,
            ),
            grid=(num_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            # with no lambda epilogue every tile writes disjoint output
            # blocks (no cross-tile recurrence), so the grid splits across
            # TensorCores on megacore chips (v4/v5p have 2 cores; v5e has
            # 1); the epilogue's revisited costs block + SMEM folds are
            # cross-tile recurrences and need the sequential grid
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "arbitrary" if lambda_mode is not None else "parallel",
                )
            ),
            interpret=interpret,
        )(*args)
        costs = outs[0].reshape(k_pad)[:num_local]
        if costs_only:
            ret = [costs]
            if dump_pert:
                ret.append(outs[1])
            if lambda_mode is not None:
                ret.append(outs[-1][0])
            return tuple(ret)
        stats, numer = outs[1], outs[2]
        # numer packs action slot f at (sublane f // 128, lane f % 128);
        # flatten to [tiles, 1024] so combine_partials slices [:d_flat]
        return costs, stats[:, 0, :], numer.reshape(num_tiles, -1)

    def run_weighted(
        prev_action_seq: jnp.ndarray,
        lam: jnp.ndarray,
        seed: jnp.ndarray,
        costs: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
        tile_offset=0,
        pert: Optional[jnp.ndarray] = None,
    ):
        """Auto-lambda phase 2: (stats, numer) partials at the final lambda.

        The perturbations come from one of three sources: ``pert`` — the
        phase-1 ``dump_pert`` output in raw kernel layout, read straight
        back (cheapest at large K); ``noise`` — the same injected noise as
        phase 1; neither — regenerated from the same per-tile PRNG seeds
        in-register.
        """
        smem_keys: Tuple[str, ...] = ()
        assert noise is None or pert is None, "pass noise or pert, not both"
        pert_in = pert is not None
        noise_mode = noise is not None or pert_in
        _check_prng_available(noise_mode)

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # x0 placeholder [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # prev [T, m]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lam [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile offset [1]
        ]
        args = [
            jnp.zeros((1,), jnp.float32),
            jnp.asarray(prev_action_seq, jnp.float32),
            jnp.asarray(lam, jnp.float32).reshape(1),
            jnp.asarray(seed, jnp.int32).reshape(1),
            jnp.asarray(tile_offset, jnp.int32).reshape(1),
        ]
        if pert_in:
            # already in kernel layout [d_flat, k_pad/128, 128]
            in_specs.append(
                pl.BlockSpec(
                    (d_flat, S, LANES),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            args.append(pert)
        elif noise_mode:
            _append_noise_input(in_specs, args, noise)
        # padded cost entries must lose the softmin
        costs_pad = jnp.full(k_pad, 1e30, jnp.float32).at[:num_local].set(costs)
        in_specs.append(
            pl.BlockSpec((S, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        args.append(costs_pad.reshape(k_pad // LANES, LANES))

        out_shape = [
            jax.ShapeDtypeStruct((num_tiles, S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, S, LANES), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec(
                (1, S, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, S, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
        stats, numer = pl.pallas_call(
            functools.partial(
                kernel, noise_mode=noise_mode, smem_keys=smem_keys,
                weighted_only=True, pert_in=pert_in,
            ),
            grid=(num_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            interpret=interpret,
        )(*args)
        return stats[:, 0, :], numer.reshape(num_tiles, -1)

    def run_regen(
        prev_action_seq: jnp.ndarray,
        seed: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
        tile_offset=0,
    ) -> jnp.ndarray:
        """Regenerate the solve's perturbed action sequences -> [K, T, m].

        Diagnostics path for ``get_top_samples`` on the fused solver
        (mppi.py:462-487): the solve never materializes perturbations or
        rollouts, so this replays the exact per-tile PRNG streams (or the
        injected noise) of a prior ``run_kernel`` with the same
        ``(prev_action_seq, seed)`` and dumps the clamped sequences.  One
        HBM write pass of K*T*m floats, off the hot path.
        """
        noise_mode = noise is not None
        _check_prng_available(noise_mode)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # x0 placeholder [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # prev [T, m]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lam placeholder [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile offset [1]
        ]
        args = [
            jnp.zeros((1,), jnp.float32),
            jnp.asarray(prev_action_seq, jnp.float32),
            jnp.ones((1,), jnp.float32),
            jnp.asarray(seed, jnp.int32).reshape(1),
            jnp.asarray(tile_offset, jnp.int32).reshape(1),
        ]
        if noise_mode:
            _append_noise_input(in_specs, args, noise)

        pert = pl.pallas_call(
            functools.partial(
                kernel, noise_mode=noise_mode, smem_keys=(), regen_dump_only=True
            ),
            grid=(num_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (d_flat, S, LANES),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (d_flat, k_pad // LANES, LANES), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            interpret=interpret,
        )(*args)
        # invert the noise-input layout: [d_flat, rows, lanes] -> [K, T, m]
        return (
            pert.reshape(d_flat, k_pad)
            .T[:num_local]
            .reshape(num_local, horizon, dim_control)
        )

    def combine_partials(costs, stats, numer, lam, axis_name: Optional[str] = None):
        """Merge tile partials into (update, weights, ess).

        With ``axis_name`` set (inside ``shard_map``), the merge reduces
        across the mesh axis as well — the only cross-device traffic of
        the whole solve: one scalar pmax + O(T*m) psum per tick.
        """
        tile_max = stats[:, 0]
        mx = jnp.max(tile_max)
        if axis_name is not None:
            mx = jax.lax.pmax(mx, axis_name)
        alpha = jnp.exp(tile_max - mx)
        z = jnp.sum(alpha * stats[:, 1])
        sumsq = jnp.sum(alpha * alpha * stats[:, 2])
        numer_g = jnp.sum(alpha[:, None] * numer, axis=0)[:d_flat]
        if axis_name is not None:
            z = jax.lax.psum(z, axis_name)
            sumsq = jax.lax.psum(sumsq, axis_name)
            numer_g = jax.lax.psum(numer_g, axis_name)

        update = (numer_g / z).reshape(horizon, dim_control)
        weights = jnp.exp(-costs / lam - mx) / z
        ess = (z * z) / sumsq
        return update, weights, ess

    def solve_core(
        x0: jnp.ndarray,
        prev_action_seq: jnp.ndarray,
        lam: jnp.ndarray,
        seed: jnp.ndarray,
        smem_arrays: Dict[str, jnp.ndarray],
        noise: Optional[jnp.ndarray] = None,
    ):
        costs, stats, numer = run_kernel(
            x0, prev_action_seq, lam, seed, smem_arrays, noise
        )
        update, weights, ess = combine_partials(costs, stats, numer, lam)
        return costs, update, weights, ess

    solve_core.run_kernel = run_kernel
    solve_core.run_weighted = run_weighted
    solve_core.run_regen = run_regen
    solve_core.combine_partials = combine_partials
    # phase-1 pert dump + phase-2 read-back (auto-lambda fast path)
    solve_core.supports_pert_dump = True
    # In-kernel LBPS/ESSPS lambda epilogue: needs the global cost vector
    # (unsharded core) and the full padded block VMEM-resident on top of
    # the kernel's working set.  The 2 MiB bound (K <= 524,288) is where
    # the epilogue's whole-block search still fits next to the phase-1
    # state; beyond it the facade's standalone two-phase path wins anyway
    # (measured at K=1M: standalone 7.60-7.63 ms/solve vs epilogue
    # 7.66-7.79 — the epilogue there must group its search while the
    # standalone kernel, whose only VMEM tenant is the costs block, keeps
    # the faster whole-block form).  Forcing lambda_epilogue=True beyond
    # the bound still works: the epilogue bodies group above 2 MiB.
    solve_core.supports_lambda_epilogue = (
        local_num_samples is None
        and not global_padded
        and k_pad * 4 <= 2 * 1024 * 1024
    )
    return solve_core
