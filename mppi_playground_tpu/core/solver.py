"""Functional MPPI solver core — one fused XLA program per control tick.

Behavioral reference: ``MPPI.forward`` in the upstream project
(``/root/reference/src/pi_mpc/mppi.py:223-460``).  The algorithm is the
same information-theoretic MPC solve (sample -> rollout -> cost -> softmin
weights -> weighted average -> warm start); the *architecture* is not:

* The reference is an ``nn.Module`` with mutable buffers and two Python
  for-loops over the horizon (mppi.py:282-286, 298-311) dispatching one CUDA
  kernel per step.  Here the rollout and stage costs are **fused into a
  single ``lax.scan``** carried over ``[K, n]`` state, so the whole tick is
  one traced, statically-shaped XLA program — no host round-trips, no
  per-step dispatch.
* Auto-lambda runs on device (see ``core/autolambda.py``) instead of
  host-side scipy (mppi.py:341-370).
* Cross-tick state is an explicit :class:`MPPIState` pytree (donated into
  the jit), not module buffers.
* The softmin weighted-average update can route through a fused Pallas
  kernel (``ops/weighted_update.py``) on TPU backends.

Reference quirks intentionally preserved for output parity (see the quirk
ledger in SURVEY.md):

* the quadratic action/KL cost is *excluded* from trajectory totals — the
  reference computes it and deliberately drops it (mppi.py:312-316,331-336),
  so we do not compute it at all (identical outputs, less work);
* ``info['prev_*']`` at t=0 aliases t=0 itself (mppi.py:299-301);
* the terminal cost uses a zero action, ``prev_state`` = second-to-last
  state, and leaves ``t``/``prev_action`` at their last stage-loop values
  (mppi.py:318-328);
* MPO reads lambda back as ``exp(log_temperature)`` although its loss uses
  ``softplus`` (mppi.py:393,398);
* the commented-out covariance adaptation (mppi.py:400-418) is dead code in
  the reference and is not implemented.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mppi_playground_tpu.core import autolambda
from mppi_playground_tpu.core.config import MPPIConfig, MPPIState
from mppi_playground_tpu.core.sg_filter import apply_sg_filter, config_sg_coeffs
from mppi_playground_tpu.ops.weighted_update import weighted_update

# Model interface (matches the reference callables, mppi.py:30-31):
#   dynamics(state [K, n], action [K, m]) -> next_state [K, n]
#   cost_fn(state [K, n], action [K, m], info: dict) -> cost [K]
# ``info`` carries prev_state/prev_action/initial_state/t exactly like the
# reference's in-place dict updates (mppi.py:298-311) plus any user entries.
Dynamics = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
CostFn = Callable[[jnp.ndarray, jnp.ndarray, Dict[str, Any]], jnp.ndarray]


class SolveAux(NamedTuple):
    """Diagnostics from one solve."""

    costs: jnp.ndarray  # [K] total trajectory costs
    weights: jnp.ndarray  # [K] softmin importance weights
    lam: jnp.ndarray  # temperature used for weighting this tick
    ess: jnp.ndarray  # effective sample size of the weights
    state_seq_batch: Optional[jnp.ndarray]  # [K, T+1, n] if store_rollouts
    # Fused-solver replay handles (None on the XLA path): the per-tick
    # kernel seed, initial state and warm start let get_top_samples
    # regenerate the winning perturbations instead of storing rollouts.
    seed: Optional[jnp.ndarray] = None
    x0: Optional[jnp.ndarray] = None
    prev_action_seq: Optional[jnp.ndarray] = None
    # True when the fused solve ran on injected noise instead of its
    # seeds — top_samples then requires the same noise to be passed back
    # (the seeds regenerate an unrelated stream).
    noise_injected: Optional[jnp.ndarray] = None


class SolveResult(NamedTuple):
    action_seq: jnp.ndarray  # [T, m]
    state_seq: jnp.ndarray  # [T+1, n]
    state: MPPIState
    aux: SolveAux


@dataclasses.dataclass(frozen=True)
class MPPISolver:
    """Bundle of pure solver functions specialized to one config + model."""

    config: MPPIConfig
    init: Callable[..., MPPIState]
    solve: Callable[..., SolveResult]
    states_prediction: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
    # Fused solvers only: ``top_samples(aux, n, noise=None) -> (state_seqs
    # [n, T+1, dim_state], weights [n])`` — regenerates the winning
    # perturbations from the solve's PRNG seeds (rollouts are never
    # stored on the fused path).  The XLA path reads aux.state_seq_batch
    # via ``core.diagnostics.top_samples`` instead.
    top_samples: Optional[Callable] = None


def warm_reset(solver: MPPISolver, state: MPPIState) -> MPPIState:
    """Zero the warm start, keeping the adapted temperature (mppi.py:212-221).

    Like the reference's ``reset``: only the previous action sequence and
    SG history are re-initialized — the adapted lambda and the MPO
    optimizer state persist across episodes.  Shared by the ``MPPI`` and
    ``RacingController`` facades.
    """
    fresh = solver.init(key=state.key)
    return dataclasses.replace(
        fresh,
        lam=state.lam,
        mpo_log_temperature=state.mpo_log_temperature,
        mpo_opt_state=state.mpo_opt_state,
    )


def _rollout_and_costs(
    dynamics: Dynamics,
    cost_fn: CostFn,
    x0_batch: jnp.ndarray,  # [K, n]
    action_seqs: jnp.ndarray,  # [K, T, m]
    user_info: Dict[str, Any],
    store_rollouts: bool,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fused rollout + stage/terminal cost accumulation.

    Equivalent to the two horizon loops at mppi.py:282-286 and 298-328 but
    as a single scan: per step t the carry holds (x_t, x_{t-1}) so stage
    costs see the same prev_state/prev_action aliasing as the reference.
    Returns (total_costs [K], states [K, T+1, n] or None).
    """
    horizon = action_seqs.shape[1]
    # prev_action at t is action at max(t-1, 0)  (mppi.py:299-301)
    prev_actions = jnp.concatenate(
        [action_seqs[:, :1], action_seqs[:, :-1]], axis=1
    )
    ts = jnp.arange(horizon)

    def step(carry, inp):
        x, x_prev, cost_acc = carry
        t, u, u_prev = inp
        info = dict(user_info)
        info.update(
            prev_state=x_prev,
            prev_action=u_prev,
            initial_state=x0_batch,
            t=t,
        )
        stage_cost = cost_fn(x, u, info)
        x_next = dynamics(x, u)
        out = x_next if store_rollouts else None
        return (x_next, x, cost_acc + stage_cost), out

    init_cost = jnp.zeros(x0_batch.shape[0], dtype=x0_batch.dtype)
    (x_final, x_second_last, stage_total), stacked = lax.scan(
        step,
        (x0_batch, x0_batch, init_cost),
        (ts, jnp.swapaxes(action_seqs, 0, 1), jnp.swapaxes(prev_actions, 0, 1)),
    )

    # Terminal cost (mppi.py:318-328): zero action; prev_state is the
    # second-to-last state; t and prev_action keep their last stage values.
    terminal_info = dict(user_info)
    terminal_info.update(
        prev_state=x_second_last,
        prev_action=action_seqs[:, max(horizon - 2, 0)],
        initial_state=x0_batch,
        t=jnp.asarray(horizon - 1),
    )
    zero_action = jnp.zeros_like(action_seqs[:, 0])
    terminal_cost = cost_fn(x_final, zero_action, terminal_info)

    total = stage_total + terminal_cost  # mppi.py:333-336 (action cost excluded)

    states = None
    if store_rollouts:
        states = jnp.concatenate([x0_batch[:, None], jnp.swapaxes(stacked, 0, 1)], axis=1)
    return total, states


def make_init(config: MPPIConfig, mpo_optimizer=None):
    """Fresh-state factory shared by the XLA and fused solver facades.

    Zero warm start, like mppi.py:157,163-165,212-221.
    """
    dtype = config.dtype

    def init(seed: Optional[int] = None, key: Optional[jax.Array] = None) -> MPPIState:
        if key is None:
            key = jax.random.PRNGKey(config.seed if seed is None else seed)
        if mpo_optimizer is not None:
            log_t = jnp.log(jnp.asarray([config.initial_lambda], dtype))[0]
            opt_state = mpo_optimizer.init(log_t)
        else:
            log_t = jnp.zeros((), dtype)
            opt_state = ()
        return MPPIState(
            key=key,
            previous_action_seq=jnp.zeros((config.horizon, config.dim_control), dtype),
            sg_history=jnp.zeros(
                (max(config.horizon - 1, 0), config.dim_control), dtype
            ),
            lam=jnp.asarray(config.initial_lambda, dtype),
            mpo_log_temperature=log_t,
            mpo_opt_state=opt_state,
        )

    return init


def make_states_prediction(config: MPPIConfig, dynamics: Dynamics):
    """Nominal-trajectory re-roll factory (mppi.py:508-524), shared."""
    dtype = config.dtype
    dim_state = config.dim_state

    def states_prediction(x0: jnp.ndarray, action_seqs: jnp.ndarray) -> jnp.ndarray:
        """Roll ``action_seqs [B, T, m]`` from ``x0 [n]``."""
        batch = action_seqs.shape[0]
        x0_b = jnp.broadcast_to(x0.astype(dtype), (batch, dim_state))

        def step(x, u):
            x_next = dynamics(x, u)
            return x_next, x_next

        _, stacked = lax.scan(step, x0_b, jnp.swapaxes(action_seqs, 0, 1))
        return jnp.concatenate([x0_b[:, None], jnp.swapaxes(stacked, 0, 1)], axis=1)

    return states_prediction


def smooth_predict_advance(
    config: MPPIConfig,
    sg_coeffs: jnp.ndarray,
    states_prediction,
    state: MPPIState,
    x0: jnp.ndarray,
    optimal_action_seq: jnp.ndarray,
):
    """Shared solve epilogue: SG filter, nominal re-roll, SG-history shift.

    Mirrors mppi.py:423-458; returns (action_seq, state_seq, new_sg_history).
    """
    if config.use_sg_filter:
        optimal_action_seq = apply_sg_filter(
            optimal_action_seq, state.sg_history, sg_coeffs
        )
    optimal_state_seq = states_prediction(x0, optimal_action_seq[None])[0]
    if config.horizon > 1:
        new_sg_history = jnp.concatenate(
            [state.sg_history[1:], optimal_action_seq[:1]], axis=0
        )
    else:
        new_sg_history = state.sg_history
    return optimal_action_seq, optimal_state_seq, new_sg_history


def make_solver(
    config: MPPIConfig,
    dynamics: Dynamics,
    cost_fn: CostFn,
    jit: bool = True,
    donate_state: bool = True,
) -> MPPISolver:
    """Build the pure solver functions for one (config, dynamics, cost)."""

    dtype = config.dtype
    horizon = config.horizon
    num_samples = config.num_samples
    dim_control = config.dim_control
    dim_state = config.dim_state

    u_min = jnp.asarray(config.u_min, dtype)
    u_max = jnp.asarray(config.u_max, dtype)
    sigmas = jnp.asarray(config.sigmas, dtype)
    sg_coeffs = config_sg_coeffs(config, dtype)
    threshold = config.inherited_samples
    auto = config.auto_lambda
    mpo_optimizer = autolambda.make_mpo_optimizer() if auto == "MPO" else None

    init = make_init(config, mpo_optimizer)
    states_prediction = make_states_prediction(config, dynamics)

    # ------------------------------------------------------------------
    def solve(
        state: MPPIState,
        x0: jnp.ndarray,
        info: Optional[Dict[str, Any]] = None,
        noise: Optional[jnp.ndarray] = None,
    ) -> SolveResult:
        """One MPPI solve (mppi.py:223-460), fully on device.

        Args:
            state: warm-start pytree from :func:`init` or a prior solve.
            x0: current state, shape ``[dim_state]``.
            info: optional user entries forwarded to the cost function
                (e.g. the racing reference trajectory).
            noise: optional externally supplied perturbations
                ``[K, T, m]`` — the noise-injection seam used by the
                reference-oracle parity harness (the reference's torch RNG
                stream cannot be reproduced in JAX; see SURVEY.md §7).
        """
        user_info = {} if info is None else dict(info)
        x0 = jnp.asarray(x0, dtype)

        key, noise_key = jax.random.split(state.key)
        if noise is None:
            noise = (
                jax.random.normal(noise_key, (num_samples, horizon, dim_control), dtype)
                * sigmas
            )
        else:
            noise = jnp.asarray(noise, dtype)

        # --- Step 1: sample around previous solution (mppi.py:255-274) ---
        mean_action_seq = state.previous_action_seq
        if threshold >= num_samples:
            perturbed = mean_action_seq[None] + noise
        elif threshold <= 0:
            perturbed = noise
        else:
            perturbed = jnp.concatenate(
                [mean_action_seq[None] + noise[:threshold], noise[threshold:]], axis=0
            )
        perturbed = jnp.clip(perturbed, u_min, u_max)

        # --- Steps 2+3: fused rollout + costs (mppi.py:280-336) ---
        x0_batch = jnp.broadcast_to(x0, (num_samples, dim_state))
        costs, state_seq_batch = _rollout_and_costs(
            dynamics, cost_fn, x0_batch, perturbed, user_info, config.store_rollouts
        )

        # --- Step 4: auto-lambda, pre-weighting modes (mppi.py:341-370) ---
        if auto == "LBPS":
            lam = autolambda.lbps_lambda(
                costs, config.lbps_delta, config.lambda_min, config.lambda_max,
                iters=config.lbps_iters,
            )
        elif auto == "ESSPS":
            lam = autolambda.essps_lambda(
                costs, config.target_ess, config.lambda_min, config.lambda_max,
                iters=config.essps_iters,
            )
        else:
            lam = state.lam

        # --- Steps 5+6: softmin weights + weighted average (mppi.py:374-385)
        optimal_action_seq, weights, ess = weighted_update(
            costs, perturbed, lam, backend=config.kernel_backend
        )

        # --- MPO post-update for the next tick (mppi.py:387-398) ---
        if auto == "MPO":
            new_lam, new_log_t, new_opt_state = autolambda.mpo_step(
                costs, state.mpo_log_temperature, state.mpo_opt_state, mpo_optimizer
            )
        else:
            new_lam = lam
            new_log_t = state.mpo_log_temperature
            new_opt_state = state.mpo_opt_state

        # --- Steps 7+8: SG smoothing, nominal re-roll, warm start
        # (mppi.py:423-458; shared with the fused facade) ---
        optimal_action_seq, optimal_state_seq, new_sg_history = (
            smooth_predict_advance(
                config, sg_coeffs, states_prediction, state, x0,
                optimal_action_seq,
            )
        )

        new_state = MPPIState(
            key=key,
            previous_action_seq=optimal_action_seq,
            sg_history=new_sg_history,
            lam=new_lam.astype(dtype),
            mpo_log_temperature=new_log_t,
            mpo_opt_state=new_opt_state,
        )

        aux = SolveAux(
            costs=costs,
            weights=weights,
            lam=lam,
            ess=ess,
            state_seq_batch=state_seq_batch,
        )
        return SolveResult(optimal_action_seq, optimal_state_seq, new_state, aux)

    if jit:
        donate = (0,) if donate_state else ()
        solve = jax.jit(solve, donate_argnums=donate)
        states_prediction_jit = jax.jit(states_prediction)
    else:
        states_prediction_jit = states_prediction

    return MPPISolver(
        config=config,
        init=init,
        solve=solve,
        states_prediction=states_prediction_jit,
    )
