"""Solver facade over the fused Pallas kernel (``ops/fused_solve.py``).

Produces the same ``MPPISolver`` bundle as ``core/solver.make_solver`` —
identical ``MPPIState`` pytree, ``SolveResult``/``SolveAux`` outputs,
warm-start and Savitzky–Golay semantics (mppi.py:223-460) — with the
sample/rollout/cost/weighting body executed by the single fused TPU
kernel instead of the XLA scan pipeline.  Init, nominal re-roll, and the
smoothing/warm-start epilogue are the *same functions* as the XLA path
(``core/solver.py`` helpers), so the two facades cannot drift.

Auto-lambda runs fused too: MPO weights with the current lambda (single
kernel pass + an optax step on the costs); LBPS/ESSPS solve lambda from
the phase-1 costs on device, then a second ``weighted_only`` kernel pass
weights at the final lambda.  Phase 1 dumps the clamped perturbations to
HBM (free — hidden under the rollout) and phase 2 reads them back;
regenerating from the per-tile seeds remains the fallback for cores
without dump support.

Scope (asserted): f32, no rollout storage, ``horizon * dim_control <=
1024``.  ``get_top_samples`` works without stored rollouts: the winning
perturbations are regenerated from the solve's per-tile PRNG seeds (or
its injected noise) by a ``regen_dump_only`` kernel pass and re-rolled
(mppi.py:462-487).  The XLA and fused paths are numerically equivalent
given the same noise (tests/test_fused_solve.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from mppi_playground_tpu.core import autolambda
from mppi_playground_tpu.core.config import MPPIConfig, MPPIState
from mppi_playground_tpu.core.sg_filter import config_sg_coeffs
from mppi_playground_tpu.core.solver import (
    MPPISolver,
    SolveAux,
    SolveResult,
    make_init,
    make_states_prediction,
    smooth_predict_advance,
)
from mppi_playground_tpu.ops.fused_solve import (
    FusedTask,
    make_fused_reroll,
    make_fused_solve,
)
from mppi_playground_tpu.ops.lambda_search import (
    essps_lambda_fused,
    lambda_search_supported,
    lbps_lambda_fused,
)


def default_lambda_epilogue(device_kind: str) -> bool:
    """Whether the in-kernel LBPS/ESSPS lambda epilogue defaults ON for a
    TPU ``device_kind`` string.

    The epilogue (``ops/fused_solve.py`` ``lambda_mode``) makes the
    phase-1 grid sequential ('arbitrary' dimension semantics), which on
    megacore chips (v4/v5p: 2 TensorCores per chip) forfeits the 2-core
    grid split — so those default to the standalone two-phase search
    kernels (``ops/lambda_search.py``), whose phase-1 grid stays
    'parallel'.  Single-TensorCore chips (v5e/v6e "lite" cores) never
    split the grid, so the epilogue's constraint costs nothing there.
    Expected overheads per path are tabled in docs/ARCHITECTURE.md
    ("auto-lambda expectation by device class"); results are bitwise
    identical either way (shared search bodies).
    """
    kind = device_kind.lower()
    # "lite" covers the observed kinds ("TPU v5 lite", "TPU v6 lite");
    # "v5e"/"v6e"/"v6" cover alternative spellings across jax releases
    return "lite" in kind or "v5e" in kind or "v6" in kind


def make_fused_solver(
    config: MPPIConfig,
    task: FusedTask,
    dynamics: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    jit: bool = True,
    donate_state: bool = True,
    interpret: Optional[bool] = None,
    solve_core: Optional[Callable] = None,
    lambda_epilogue: Optional[bool] = None,
) -> MPPISolver:
    """Build the fused-kernel solver.

    Args:
        config: solver config; fixed lambda and all three auto modes are
            supported (MPO weights with the current lambda then adapts it,
            LBPS/ESSPS run the two-phase costs-then-weights kernel split).
        task: the model's structure-of-arrays plug for the kernel.
        dynamics: array-of-structs dynamics, used only for the nominal
            trajectory re-roll (mppi.py:508-524) outside the kernel.
        solve_core: override for the kernel launcher — used by
            ``parallel.make_sharded_fused_solver`` to substitute the
            shard_map'd core; same signature/returns as
            ``ops.fused_solve.make_fused_solve``'s result.
        lambda_epilogue: run the LBPS/ESSPS lambda search as an epilogue
            of the phase-1 kernel itself (no second launch, no 400 KB
            HBM round trip) instead of the standalone VMEM kernel.  The
            epilogue forces the phase-1 grid sequential, so the default
            (None) enables it only where the grid never split anyway:
            single-TensorCore chips (v5e/v6e "lite" cores) and interpret
            mode.  On megacore chips (v4/v5p) the standalone kernel
            preserves the 2-core grid split.  Results are bitwise
            identical either way (shared search bodies,
            tests/test_fused_solve.py).
    """
    assert not config.store_rollouts, "fused path does not store rollouts"
    auto = config.auto_lambda
    if solve_core is not None and auto in ("LBPS", "ESSPS"):
        # the two-phase auto-lambda path needs the core's kernel split
        assert hasattr(solve_core, "run_kernel") and hasattr(
            solve_core, "run_weighted"
        ), "auto-lambda needs a core exposing run_kernel/run_weighted"

    dtype = config.dtype
    mpo_optimizer = autolambda.make_mpo_optimizer() if auto == "MPO" else None

    if solve_core is None:
        solve_core = make_fused_solve(config, task, interpret=interpret)
    sg_coeffs = config_sg_coeffs(config, dtype)

    if lambda_epilogue is None:
        if jax.default_backend() == "tpu":
            # device-class policy: see default_lambda_epilogue
            lambda_epilogue = default_lambda_epilogue(
                jax.devices()[0].device_kind
            )
        else:
            # interpret mode (CPU tests): no grid split to lose
            lambda_epilogue = True
    use_lambda_epilogue = (
        auto in ("LBPS", "ESSPS")
        and lambda_epilogue
        and getattr(solve_core, "supports_lambda_epilogue", False)
        and getattr(solve_core, "supports_pert_dump", False)
    )

    # 2D-fleet cores (scenario x samples both sharded) run this facade
    # INSIDE shard_map, so their phase-1 costs are sample-axis-local; one
    # 4K-byte-per-1k-samples all-gather reconstructs the global vector so
    # the lambda search / MPO step see exactly what the unsharded solve
    # sees.  1D sample-sharded cores merge outside shard_map and pass
    # global costs already (gather_axis unset).
    gather_axis = getattr(solve_core, "gather_axis", None)

    def globalize(costs):
        if gather_axis is None:
            return costs
        return jax.lax.all_gather(costs, gather_axis, tiled=True)

    init = make_init(config, mpo_optimizer)
    states_prediction = make_states_prediction(config, dynamics)
    # single-kernel nominal re-roll for the solve epilogue (same arithmetic;
    # the general batched states_prediction stays XLA for diagnostics)
    fused_reroll = make_fused_reroll(config, task, interpret=interpret)

    def epilogue_prediction(x0, action_seqs):
        return fused_reroll(x0, action_seqs[0])[None]

    def solve(
        state: MPPIState,
        x0: jnp.ndarray,
        info: Optional[Dict[str, Any]] = None,
        noise: Optional[jnp.ndarray] = None,
    ) -> SolveResult:
        user_info = {} if info is None else dict(info)
        x0 = jnp.asarray(x0, dtype)

        key, noise_key = jax.random.split(state.key)
        seed = jax.random.randint(noise_key, (), 0, jnp.iinfo(jnp.int32).max)

        smem_arrays = task.smem_builder(user_info)

        def unpad(vec):
            # A sample-sharded core may round K up to whole kernel tiles
            # per shard (parallel/sharded.py); the padded tail carries 1e30
            # costs / 0 weights and sits past index num_samples, so slicing
            # restores the exact unsharded-length vectors for the lambda
            # search (LBPS's cost range must not see 1e30), the MPO step,
            # and the user-facing aux.
            if vec.shape[0] == config.num_samples:
                return vec
            return vec[: config.num_samples]

        if auto in ("LBPS", "ESSPS"):
            # Two-phase auto-lambda (mppi.py:341-370, on device): the full
            # kernel produces lambda-independent costs; lambda is solved
            # from them; a second pass re-weights the perturbations at the
            # final lambda.  When the core supports it, phase 1 dumps the
            # clamped perturbations to HBM and phase 2 reads them back —
            # at flagship scale that reads ~40 MB instead of regenerating
            # ~10M normals (Box-Muller), cutting phase 2 ~3x.
            dump = getattr(solve_core, "supports_pert_dump", False)
            if use_lambda_epilogue:
                # phase 1 computes costs AND lambda* in one launch: the
                # search runs as the kernel's last-grid-step epilogue on
                # the VMEM-resident cost block (ops/fused_solve.py),
                # bitwise-equal to the standalone search kernels below
                costs, pert_raw, lam = solve_core.run_kernel(
                    x0, state.previous_action_seq, state.lam, seed,
                    smem_arrays, noise, dump_pert=True, costs_only=True,
                    lambda_mode=auto.lower(),
                )
            elif dump:
                # costs_only also skips the phase-1 softmin partials,
                # which were computed at the provisional lambda and thrown
                # away (~T*m per-tile reductions saved)
                costs, pert_raw = solve_core.run_kernel(
                    x0, state.previous_action_seq, state.lam, seed,
                    smem_arrays, noise, dump_pert=True, costs_only=True,
                )
            else:
                # still costs_only: the softmin partials would be computed
                # at the provisional lambda and discarded
                costs, = solve_core.run_kernel(
                    x0, state.previous_action_seq, state.lam, seed,
                    smem_arrays, noise, costs_only=True,
                )
            # The lambda search runs as a single VMEM-resident kernel when
            # the cost vector fits (ops/lambda_search.py): one 400 KB HBM
            # read instead of ~75 MB of per-iteration re-reads at flagship
            # scale.  Same arithmetic; equivalence in tests/test_autolambda.py.
            # NOT on sharded cores: a Pallas call has no GSPMD partitioning
            # rule, so it would force an all-gather of the sample-sharded
            # [K] costs every tick — the partitionable XLA loops keep the
            # sharded path's O(T*m) collective budget.
            lambda_kernel_ok = not getattr(
                solve_core, "is_sharded", False
            ) and lambda_search_supported(config.num_samples)
            # the lambda search must see exactly num_samples costs: the
            # sharded core's padded 1e30 tail would blow up LBPS's
            # cost-range term (ESS terms are padding-exact, but slicing
            # both keeps the search identical to the unsharded solve)
            lam_costs = unpad(globalize(costs))
            if use_lambda_epilogue:
                pass  # lam already solved inside the phase-1 kernel
            elif auto == "LBPS":
                if lambda_kernel_ok:
                    lam = lbps_lambda_fused(
                        lam_costs, config.lbps_delta, config.lambda_min,
                        config.lambda_max, iters=config.lbps_iters,
                        interpret=interpret,
                    )
                else:
                    lam = autolambda.lbps_lambda(
                        lam_costs, config.lbps_delta, config.lambda_min,
                        config.lambda_max, iters=config.lbps_iters,
                    )
            else:
                if lambda_kernel_ok:
                    lam = essps_lambda_fused(
                        lam_costs, config.target_ess, config.lambda_min,
                        config.lambda_max, iters=config.essps_iters,
                        interpret=interpret,
                    )
                else:
                    lam = autolambda.essps_lambda(
                        lam_costs, config.target_ess, config.lambda_min,
                        config.lambda_max, iters=config.essps_iters,
                    )
            # phase 2 keeps the padded-length costs (they re-shard evenly)
            if dump:
                stats, numer = solve_core.run_weighted(
                    state.previous_action_seq, lam, seed, costs,
                    pert=pert_raw,
                )
            else:
                stats, numer = solve_core.run_weighted(
                    state.previous_action_seq, lam, seed, costs, noise
                )
            costs = lam_costs
            update, weights, ess = solve_core.combine_partials(
                costs, stats, numer, lam
            )
        else:
            # fixed lambda and MPO both weight with the current lambda
            # (mppi.py:374-385; MPO adapts it *after* the update)
            lam = state.lam
            costs, update, weights, ess = solve_core(
                x0, state.previous_action_seq, lam, seed, smem_arrays, noise
            )
            costs = unpad(costs)
            weights = unpad(weights)

        if auto == "MPO":
            new_lam, new_log_t, new_opt_state = autolambda.mpo_step(
                costs, state.mpo_log_temperature, state.mpo_opt_state,
                mpo_optimizer,
            )
        else:
            new_lam = lam
            new_log_t = state.mpo_log_temperature
            new_opt_state = state.mpo_opt_state

        optimal_action_seq, optimal_state_seq, new_sg_history = (
            smooth_predict_advance(
                config, sg_coeffs, epilogue_prediction, state, x0, update
            )
        )

        new_state = MPPIState(
            key=key,
            previous_action_seq=optimal_action_seq,
            sg_history=new_sg_history,
            lam=new_lam.astype(dtype) if auto else state.lam,
            mpo_log_temperature=new_log_t,
            mpo_opt_state=new_opt_state,
        )
        aux = SolveAux(
            costs=costs, weights=weights, lam=lam, ess=ess,
            state_seq_batch=None,
            # replay handles for get_top_samples (seed regeneration)
            seed=seed, x0=x0, prev_action_seq=state.previous_action_seq,
            # noise is None / not None is static per trace, so this scalar
            # faithfully records which stream the solve actually used
            noise_injected=jnp.asarray(noise is not None),
        )
        return SolveResult(optimal_action_seq, optimal_state_seq, new_state, aux)

    if jit:
        donate = (0,) if donate_state else ()
        _solve_jit = jax.jit(solve, donate_argnums=donate)

        def solve_fn(state, x0, info=None, noise=None):
            result = _solve_jit(state, x0, info=info, noise=noise)
            # `noise is None` is static per trace; rewriting the device
            # scalar with the host bool here lets top_samples check it
            # without a device->host sync per call (which costs a full
            # tunnel round trip — ~0.7-26 ms — on every get_top_samples).
            # This rewrite only happens in THIS eager wrapper: a caller
            # that wraps solver.solve in its own jax.jit gets the device
            # scalar back and top_samples falls into the per-call sync
            # fallback — such callers should rewrite aux.noise_injected
            # with their own host bool, as RacingController does.
            aux = result.aux._replace(noise_injected=noise is not None)
            return result._replace(aux=aux)

        states_prediction_jit = jax.jit(states_prediction)
    else:
        solve_fn = solve
        states_prediction_jit = states_prediction

    # ------------------------------------------------------------------
    # get_top_samples on the fused path (mppi.py:462-487): rollouts are
    # never stored, so regenerate the perturbed sequences from the solve's
    # per-tile PRNG seeds (or its injected noise), pick the top-n by
    # weight, and re-roll just those n through the dynamics.
    run_regen = getattr(solve_core, "run_regen", None)

    def _top(x0, prev_seq, seed, weights, noise, n: int):
        pert = run_regen(prev_seq, seed, noise)
        top_w, top_idx = jax.lax.top_k(weights, n)
        state_seqs = states_prediction(x0, pert[top_idx])
        return state_seqs, top_w

    _top_jit = jax.jit(_top, static_argnums=(5,)) if jit else _top

    def top_samples(aux: SolveAux, n: int, noise=None):
        """(state_seqs [n, T+1, dim_state], weights [n]), weight-descending."""
        if aux.seed is None:
            raise ValueError(
                "aux must come from a fused solve (aux.seed is unset)"
            )
        if n > config.num_samples:
            raise ValueError(
                f"requested top {n} samples, but the solver was built with "
                f"num_samples={config.num_samples}"
            )
        injected = aux.noise_injected
        if injected is not None and not isinstance(injected, bool):
            # aux from a non-wrapped (jit=False / manually jitted) solve
            # still carries the device scalar; syncing is the fallback
            injected = bool(jnp.any(injected))
        if noise is None and injected:
            # replaying the PRNG seeds would regenerate a stream unrelated
            # to the solve's injected noise — silently wrong trajectories
            raise ValueError(
                "this solve ran with injected noise; pass the same noise "
                "array to top_samples (seed regeneration cannot replay it)"
            )
        return _top_jit(
            aux.x0, aux.prev_action_seq, aux.seed, aux.weights, noise, int(n)
        )

    return MPPISolver(
        config=config,
        init=init,
        solve=solve_fn,
        states_prediction=states_prediction_jit,
        top_samples=top_samples if run_regen is not None else None,
    )
