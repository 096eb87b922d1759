"""Sample-axis-sharded and scenario-batched MPPI solvers.

New TPU-native capability (the reference is single-device; SURVEY.md §2).
Two composable parallel axes:

* **samples** — the K perturbation rollouts of one solve are sharded over
  the mesh.  Everything per-sample (noise gen, rollout, costs) is
  embarrassingly parallel; the only cross-device traffic per tick is the
  softmin normalizer and the ``[T, m]`` weighted-average numerator (plus
  the scalar ESS/logsumexp terms of auto-lambda) — O(T*m) bytes over ICI
  (mppi.py:374-385 are the only global reductions in the algorithm).
* **scenario** — independent control problems (different initial states /
  tasks) vmapped and sharded data-parallel.

Implementation is GSPMD-first: noise is generated inside the jitted tick
with an explicit ``with_sharding_constraint`` on the sample axis, and XLA
propagates the sharding through the scan and inserts the psum-style
collectives at the reductions.  JAX's partitionable threefry RNG guarantees
the *same* noise values regardless of mesh shape, so a sharded solve equals
the single-device solve up to float reduction order — asserted in
tests/test_sharding.py (SURVEY.md §7 hard part #6).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mppi_playground_tpu.core.config import MPPIConfig, MPPIState
from mppi_playground_tpu.core.solver import (
    CostFn,
    Dynamics,
    MPPISolver,
    SolveResult,
    make_solver,
)
from mppi_playground_tpu.parallel.mesh import (
    SAMPLE_AXIS,
    SCENARIO_AXIS,
    sample_sharding,
)


@dataclasses.dataclass(frozen=True)
class ShardedMPPISolver:
    """Solver whose K sample rollouts are sharded across a device mesh."""

    config: MPPIConfig
    mesh: Mesh
    init: Callable[..., MPPIState]
    solve: Callable[..., SolveResult]


def make_sharded_solver(
    config: MPPIConfig,
    dynamics: Dynamics,
    cost_fn: CostFn,
    mesh: Mesh,
    sample_axis: str = SAMPLE_AXIS,
    jit: bool = True,
    donate_state: bool = True,
) -> ShardedMPPISolver:
    """Shard the sample axis of one MPPI solve over ``mesh``.

    The returned ``solve(state, x0, info=None)`` matches the single-device
    signature; results are replicated.
    """
    # the GSPMD program needs partitionable ops end-to-end: the Pallas
    # weighted-update kernel has no partitioning rule, so 'auto' resolving
    # to it on TPU would force XLA to replicate the full [K, T, m] operand
    # on every device — pin the sharded base to the XLA reduction path,
    # which partitions into the documented O(T*m) psum collectives
    base = make_solver(
        dataclasses.replace(config, kernel_backend="xla"),
        dynamics, cost_fn, jit=False,
    )
    dtype = config.dtype
    sigmas = jnp.asarray(config.sigmas, dtype)
    noise_sharding = sample_sharding(mesh, 3, axis=sample_axis)

    def solve(
        state: MPPIState,
        x0: jnp.ndarray,
        info: Optional[Dict[str, Any]] = None,
    ) -> SolveResult:
        # Same key-split discipline as the unsharded solve; the
        # partitionable threefry generator produces identical values for
        # any mesh, each device materializing only its shard.
        _, noise_key = jax.random.split(state.key)
        noise = (
            jax.random.normal(
                noise_key,
                (config.num_samples, config.horizon, config.dim_control),
                dtype,
            )
            * sigmas
        )
        noise = jax.lax.with_sharding_constraint(noise, noise_sharding)
        return base.solve(state, x0, info=info, noise=noise)

    if jit:
        solve = jax.jit(solve, donate_argnums=(0,) if donate_state else ())

    return ShardedMPPISolver(config=config, mesh=mesh, init=base.init, solve=solve)


def _make_init_batch(config: MPPIConfig, base_init, batch_size: int):
    """Per-scenario keys from the config seed (shared by both fleet solvers)."""

    def init_batch(seed: Optional[int] = None) -> MPPIState:
        key = jax.random.PRNGKey(config.seed if seed is None else seed)
        keys = jax.random.split(key, batch_size)
        return jax.vmap(lambda k: base_init(key=k))(keys)

    return init_batch


@dataclasses.dataclass(frozen=True)
class BatchedMPPISolver:
    """Scenario-batched (vmapped) solver, shardable over the scenario axis."""

    config: MPPIConfig
    mesh: Mesh
    init_batch: Callable[..., MPPIState]
    solve_batch: Callable[..., SolveResult]


def make_batched_solver(
    config: MPPIConfig,
    dynamics: Dynamics,
    cost_fn: CostFn,
    mesh: Mesh,
    batch_size: int,
    scenario_axis: str = SCENARIO_AXIS,
    sample_axis: str = SAMPLE_AXIS,
    jit: bool = True,
    donate_state: bool = True,
) -> BatchedMPPISolver:
    """Solve ``batch_size`` independent control problems per tick.

    The scenario axis is data-parallel over the mesh; within each scenario
    the K samples shard over the sample axis.  ``solve_batch(states, x0s)``
    takes a batched :class:`MPPIState` pytree and ``[B, dim_state]``.
    """
    # same kernel_backend pin as make_sharded_solver, doubly so here:
    # vmap-of-pallas_call does not compose (see BatchedFusedSolver below)
    base = make_solver(
        dataclasses.replace(config, kernel_backend="xla"),
        dynamics, cost_fn, jit=False,
    )
    dtype = config.dtype
    sigmas = jnp.asarray(config.sigmas, dtype)
    noise_sharding = NamedSharding(
        mesh, P(scenario_axis, sample_axis, None, None)
    )

    init_batch = _make_init_batch(config, base.init, batch_size)

    def solve_one(state, x0, noise, info, batched_info):
        if batched_info is not None:
            info = {**(info or {}), **batched_info}
        return base.solve(state, x0, info=info, noise=noise)

    def solve_batch(
        states: MPPIState,
        x0s: jnp.ndarray,
        *,
        info: Optional[Dict[str, Any]] = None,
        batched_info: Optional[Dict[str, Any]] = None,
    ) -> SolveResult:
        # second output of the per-scenario split == the noise key the
        # unsharded solve would draw (core/solver.py solve())
        noise_keys = jax.vmap(jax.random.split)(states.key)[:, 1]
        noise = jax.vmap(
            lambda k: jax.random.normal(
                k, (config.num_samples, config.horizon, config.dim_control), dtype
            )
            * sigmas
        )(noise_keys)
        noise = jax.lax.with_sharding_constraint(noise, noise_sharding)
        # `info` (e.g. a shared map) is replicated across the batch;
        # `batched_info` (e.g. per-scenario reference trajectories) has a
        # leading [B] axis and is split per scenario
        binfo_axis = None if batched_info is None else 0
        return jax.vmap(solve_one, in_axes=(0, 0, 0, None, binfo_axis))(
            states, x0s, noise, info, batched_info
        )

    if jit:
        solve_batch = jax.jit(
            solve_batch, donate_argnums=(0,) if donate_state else ()
        )

    return BatchedMPPISolver(
        config=config, mesh=mesh, init_batch=init_batch, solve_batch=solve_batch
    )


# ----------------------------------------------------------------------
# Sharded fused-kernel solver (one Pallas kernel per device per tick)
# ----------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ShardedFusedSolver:
    """Fused Pallas solve with the sample axis sharded over a mesh.

    Each device runs ``ops/fused_solve.py``'s kernel on its K/n shard with
    a global tile offset, so the PRNG stream — and hence the solution — is
    identical to the single-device fused solve for any mesh shape.  The
    only cross-device traffic per tick is one scalar pmax plus O(T*m)
    psums (the softmin normalizer, ESS term and weighted numerator).
    """

    config: MPPIConfig
    mesh: Mesh
    init: Callable[..., MPPIState]
    solve: Callable[..., SolveResult]
    # fused-path get_top_samples: regenerates the winning perturbations
    # from the per-shard PRNG streams (diagnostics.top_samples_from_last)
    top_samples: Optional[Callable] = None


def make_sharded_fused_solver(
    config: MPPIConfig,
    task,
    dynamics: Dynamics,
    mesh: Mesh,
    sample_axis: str = SAMPLE_AXIS,
    jit: bool = True,
    donate_state: bool = True,
    interpret: Optional[bool] = None,
) -> ShardedFusedSolver:
    """Shard the fused Pallas solve over ``mesh``'s sample axis.

    Any ``num_samples`` is supported: K is rounded up to whole 1024-sample
    kernel tiles per shard (e.g. the K=100,000 flagship on 8 shards runs
    13 tiles x 1024 per shard = 106,496 padded samples) and the kernel's
    global-index mask pins the padded tail's costs to 1e30, so results
    equal the unsharded solve exactly — the real samples' PRNG streams are
    keyed by global tile id either way.  The facade slices the padded
    costs/weights back to ``num_samples``.  ``task`` is the model's
    :class:`~mppi_playground_tpu.ops.fused_solve.FusedTask`.
    """
    from jax.sharding import PartitionSpec
    from mppi_playground_tpu.core.fused_solver import make_fused_solver
    from mppi_playground_tpu.ops.fused_solve import TILE, make_fused_solve

    n_shards = mesh.shape[sample_axis]
    total_tiles = -(-config.num_samples // TILE)
    local_tiles = -(-total_tiles // n_shards)
    local_k = local_tiles * TILE
    padded_k = local_k * n_shards
    core = make_fused_solve(
        config, task, interpret=interpret, local_num_samples=local_k,
        global_padded=padded_k > config.num_samples,
    )

    rep = PartitionSpec()
    shard = PartitionSpec(sample_axis)

    # Each shard_map launches the per-shard kernel and returns per-tile
    # partials sharded along the tile axis; the global softmin merge runs
    # OUTSIDE shard_map as plain XLA over the [total_tiles, 128] partials,
    # letting GSPMD insert the collectives.  This keeps the core's
    # run_kernel / run_weighted / combine_partials surface identical to the
    # single-device core, so the facade's auto-lambda two-phase path works
    # sharded without modification.

    # raw kernel-layout perturbations [d_flat, K_pad/128, 128]: the sample
    # axis is dim 1, so dumps/read-backs shard there and never move
    pert_spec = PartitionSpec(None, sample_axis, None)

    def _pad_samples(arr, fill=0.0):
        """Round a [K, ...] sample-axis operand up to the padded length.

        Injected noise (and externally supplied costs) must divide evenly
        over the shards; the padded rows correspond to the kernel's masked
        padding samples.  Costs pad with 1e30 (never win the softmin),
        noise with zeros (masked anyway).
        """
        if arr is None or arr.shape[0] == padded_k:
            return arr
        pad = padded_k - arr.shape[0]
        return jnp.concatenate(
            [arr, jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)]
        )

    def sharded_run_kernel(x0, prev_seq, lam, seed, smem_arrays, noise=None,
                           tile_offset=0, dump_pert=False, costs_only=False):
        del tile_offset  # computed per shard from the mesh position
        noise = _pad_samples(noise)
        smem_specs = jax.tree_util.tree_map(lambda _: rep, smem_arrays)
        noise_spec = shard if noise is not None else rep

        def shard_fn(x0, prev_seq, lam, seed, smem_arrays, noise):
            idx = jax.lax.axis_index(sample_axis)
            return core.run_kernel(
                x0, prev_seq, lam, seed, smem_arrays,
                noise=noise, tile_offset=idx * local_tiles,
                dump_pert=dump_pert, costs_only=costs_only,
            )

        if costs_only:
            # dump_pert implies costs_only (asserted in core.run_kernel)
            out_specs = (shard, pert_spec) if dump_pert else (shard,)
        else:
            out_specs = (shard, shard, shard)
        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(rep, rep, rep, rep, smem_specs, noise_spec),
            out_specs=out_specs,
            check_vma=False,
        )(x0, prev_seq, lam, seed, smem_arrays, noise)

    def sharded_run_weighted(prev_seq, lam, seed, costs, noise=None,
                             tile_offset=0, pert=None):
        del tile_offset
        noise = _pad_samples(noise)
        # padded cost entries (1e30, like the kernel mask) lose the softmin
        costs = _pad_samples(costs, fill=1e30)
        noise_spec = shard if noise is not None else rep
        p_spec = pert_spec if pert is not None else rep

        def shard_fn(prev_seq, lam, seed, costs, noise, pert):
            idx = jax.lax.axis_index(sample_axis)
            return core.run_weighted(
                prev_seq, lam, seed, costs,
                noise=noise, tile_offset=idx * local_tiles, pert=pert,
            )

        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(rep, rep, rep, shard, noise_spec, p_spec),
            out_specs=(shard, shard),
            check_vma=False,
        )(prev_seq, lam, seed, costs, noise, pert)

    def sharded_core(x0, prev_seq, lam, seed, smem_arrays, noise=None):
        costs, stats, numer = sharded_run_kernel(
            x0, prev_seq, lam, seed, smem_arrays, noise
        )
        update, weights, ess = core.combine_partials(costs, stats, numer, lam)
        return costs, update, weights, ess

    def sharded_run_regen(prev_seq, seed, noise=None, tile_offset=0):
        del tile_offset
        noise = _pad_samples(noise)
        noise_spec = shard if noise is not None else rep

        def shard_fn(prev_seq, seed, noise):
            idx = jax.lax.axis_index(sample_axis)
            return core.run_regen(
                prev_seq, seed, noise=noise, tile_offset=idx * local_tiles
            )

        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(rep, rep, noise_spec),
            out_specs=shard,
            check_vma=False,
        )(prev_seq, seed, noise)

    sharded_core.run_kernel = sharded_run_kernel
    sharded_core.run_weighted = sharded_run_weighted
    sharded_core.run_regen = sharded_run_regen
    sharded_core.combine_partials = core.combine_partials
    sharded_core.supports_pert_dump = True
    # the facade must NOT put a Pallas lambda-search kernel (no GSPMD
    # partitioning rule) on this core's sample-sharded costs — it would
    # all-gather [K] every tick; the XLA loops partition into psums
    sharded_core.is_sharded = True

    # the facade supplies init / SG filter / prediction / warm-start
    # semantics around the shard_map'd kernel core
    facade = make_fused_solver(
        config, task, dynamics, jit=jit, donate_state=donate_state,
        interpret=interpret, solve_core=sharded_core,
    )

    return ShardedFusedSolver(
        config=config, mesh=mesh, init=facade.init, solve=facade.solve,
        top_samples=facade.top_samples,
    )


@dataclasses.dataclass(frozen=True)
class BatchedFusedSolver:
    """Scenario-batched fused solve: a fleet of control problems per tick.

    Scenarios shard data-parallel over the mesh's scenario axis; within a
    shard they run sequentially under ``lax.map`` (Pallas kernels compose
    with scan-based control flow, not with ``vmap``).  One dispatched
    program solves the whole fleet.
    """

    config: MPPIConfig
    mesh: Mesh
    init_batch: Callable[..., MPPIState]
    solve_batch: Callable[..., SolveResult]


def make_batched_fused_solver(
    config: MPPIConfig,
    task,
    dynamics: Dynamics,
    mesh: Mesh,
    batch_size: int,
    scenario_axis: str = SCENARIO_AXIS,
    sample_axis: Optional[str] = None,
    jit: bool = True,
    interpret: Optional[bool] = None,
    donate_state: bool = True,
) -> BatchedFusedSolver:
    """Fused Pallas solve over ``batch_size`` independent control problems.

    ``solve_batch(states, x0s, *, info=None, noise=None,
    batched_info=None)`` takes a batched :class:`MPPIState` pytree (from
    ``init_batch``), ``[B, dim_state]`` initial states, optional shared
    ``info``, optional per-scenario noise ``[B, K, T, m]``, and optional
    ``batched_info`` — a dict of ``[B, ...]`` arrays merged into each
    scenario's ``info`` (e.g. per-episode reference trajectories).  The
    keyword-only arguments keep the surface positionally compatible with
    ``make_batched_solver`` (which has no ``noise``).  With
    ``donate_state=True`` (default) the input states buffers are consumed
    by the jit — pass False to reuse them after the call.

    Passing ``sample_axis`` composes BOTH fused parallel axes on a 2D
    mesh: scenarios shard over ``scenario_axis`` and, within each
    scenario, the K rollouts shard over ``sample_axis`` (whole 1024-tile
    shards, padded like ``make_sharded_fused_solver``).  Each solve's
    cross-device traffic is the softmin pmax/psum over the sample axis
    plus one ~4·K-byte cost all-gather for the lambda search / user-facing
    aux.  Results equal the per-scenario unsharded solves exactly (same
    global-tile PRNG streams; tests/test_sharded_fused.py).
    """
    from jax.sharding import PartitionSpec
    from mppi_playground_tpu.core.fused_solver import make_fused_solver
    from mppi_playground_tpu.ops.fused_solve import TILE, make_fused_solve

    n_shards = mesh.shape[scenario_axis]
    if batch_size % n_shards != 0:
        raise ValueError(
            f"batch_size ({batch_size}) must divide over "
            f"{n_shards} scenario shards"
        )

    two_d = sample_axis is not None and mesh.shape[sample_axis] > 1
    if two_d:
        n_sample_shards = mesh.shape[sample_axis]
        total_tiles = -(-config.num_samples // TILE)
        local_tiles = -(-total_tiles // n_sample_shards)
        local_k = local_tiles * TILE
        padded_k = local_k * n_sample_shards
        core = make_fused_solve(
            config, task, interpret=interpret, local_num_samples=local_k,
            global_padded=padded_k > config.num_samples,
        )

        # This core runs INSIDE shard_map (per scenario, via lax.map):
        # kernels work on the local sample shard with a global tile
        # offset; the softmin merge psums over the sample axis; the
        # facade all-gathers the costs once (gather_axis) so lambda
        # search / aux see the exact global vectors.
        def local_run_kernel(x0, prev_seq, lam, seed, smem_arrays,
                             noise=None, tile_offset=0, dump_pert=False,
                             costs_only=False):
            del tile_offset
            idx = jax.lax.axis_index(sample_axis)
            return core.run_kernel(
                x0, prev_seq, lam, seed, smem_arrays, noise=noise,
                tile_offset=idx * local_tiles,
                dump_pert=dump_pert, costs_only=costs_only,
            )

        def local_run_weighted(prev_seq, lam, seed, costs, noise=None,
                               tile_offset=0, pert=None):
            del tile_offset
            idx = jax.lax.axis_index(sample_axis)
            return core.run_weighted(
                prev_seq, lam, seed, costs, noise=noise,
                tile_offset=idx * local_tiles, pert=pert,
            )

        def local_combine(costs, stats, numer, lam, axis_name=None):
            del axis_name  # always the mesh's sample axis here
            return core.combine_partials(
                costs, stats, numer, lam, axis_name=sample_axis
            )

        def local_core(x0, prev_seq, lam, seed, smem_arrays, noise=None):
            costs, stats, numer = local_run_kernel(
                x0, prev_seq, lam, seed, smem_arrays, noise
            )
            costs_g = jax.lax.all_gather(costs, sample_axis, tiled=True)[
                : config.num_samples
            ]
            update, weights, ess = local_combine(costs_g, stats, numer, lam)
            return costs_g, update, weights, ess

        local_core.run_kernel = local_run_kernel
        local_core.run_weighted = local_run_weighted
        local_core.combine_partials = local_combine
        local_core.supports_pert_dump = True
        local_core.is_sharded = True
        local_core.gather_axis = sample_axis
        base = make_fused_solver(
            config, task, dynamics, jit=False, donate_state=False,
            interpret=interpret, solve_core=local_core,
        )
    else:
        base = make_fused_solver(
            config, task, dynamics, jit=False, donate_state=False,
            interpret=interpret,
        )

    rep = PartitionSpec()
    shard = PartitionSpec(scenario_axis)

    init_batch = _make_init_batch(config, base.init, batch_size)

    def solve_batch(
        states: MPPIState,
        x0s: jnp.ndarray,
        *,
        info: Optional[Dict[str, Any]] = None,
        noise: Optional[jnp.ndarray] = None,
        batched_info: Optional[Dict[str, Any]] = None,
    ) -> SolveResult:
        state_specs = jax.tree_util.tree_map(lambda _: shard, states)
        if two_d and noise is not None:
            if noise.shape[1] != padded_k:  # pad K up to whole shard tiles
                pad = padded_k - noise.shape[1]
                noise = jnp.concatenate(
                    [
                        noise,
                        jnp.zeros(
                            (noise.shape[0], pad) + noise.shape[2:],
                            noise.dtype,
                        ),
                    ],
                    axis=1,
                )
            noise_spec = PartitionSpec(scenario_axis, sample_axis)
        else:
            noise_spec = shard if noise is not None else rep
        binfo_specs = jax.tree_util.tree_map(
            lambda _: shard, batched_info
        )

        def shard_fn(states, x0s, noise, batched_info):
            def one(args):
                st, x0, nz, binfo = args
                # `info` is shared (closure); `binfo` carries the
                # per-scenario entries (leading [B] axis, split by lax.map)
                merged = dict(info or {})
                if binfo is not None:
                    merged.update(binfo)
                return base.solve(st, x0, info=merged or None, noise=nz)

            return jax.lax.map(one, (states, x0s, noise, batched_info))

        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(state_specs, shard, noise_spec, binfo_specs),
            out_specs=shard,  # every output leaf is scenario-batched
            check_vma=False,
        )(states, x0s, noise, batched_info)

    if jit:
        solve_batch = jax.jit(
            solve_batch, donate_argnums=(0,) if donate_state else ()
        )

    return BatchedFusedSolver(
        config=config, mesh=mesh, init_batch=init_batch, solve_batch=solve_batch
    )
