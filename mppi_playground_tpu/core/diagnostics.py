"""Solver diagnostics: top-weighted samples and posterior sampling.

Behavioral reference: ``MPPI.get_top_samples`` and
``MPPI.get_samples_from_posterior``
(``/root/reference/src/pi_mpc/mppi.py:462-524``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def top_samples(
    state_seq_batch: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-``num_samples`` trajectories by importance weight, sorted desc.

    Matches mppi.py:462-487 (``torch.topk`` + redundant descending argsort —
    ``jax.lax.top_k`` already returns descending order).

    Args:
        state_seq_batch: ``[K, T+1, n]`` rollout batch from ``SolveAux``.
        weights: ``[K]`` softmin weights from ``SolveAux``.
    """
    if num_samples > weights.shape[0]:
        raise ValueError(
            f"requested top {num_samples} samples, but the solve drew "
            f"{weights.shape[0]}"
        )
    top_weights, top_indices = jax.lax.top_k(weights, num_samples)
    return state_seq_batch[top_indices], top_weights


def top_samples_from_last(solver, aux, num_samples, noise=None, what="forward()"):
    """Shared ``get_top_samples`` dispatch for the controller facades.

    XLA path with stored rollouts -> read them; fused path -> regenerate
    the winning perturbations from the solve's per-tile PRNG seeds via
    ``solver.top_samples``; otherwise the config cannot serve diagnostics.
    """
    if aux is None:
        raise RuntimeError(f"get_top_samples requires a prior {what}.")
    if aux.state_seq_batch is not None:
        return top_samples(aux.state_seq_batch, aux.weights, num_samples)
    if solver.top_samples is not None:
        return solver.top_samples(aux, num_samples, noise=noise)
    raise RuntimeError(
        "get_top_samples requires store_rollouts=True or the fused "
        "solver (which regenerates rollouts from seeds)."
    )


def posterior_samples(
    key: jax.Array,
    optimal_solution: jnp.ndarray,
    sigmas: jnp.ndarray,
    num_samples: int,
) -> jnp.ndarray:
    """Sample action sequences from the MPPI posterior (mppi.py:489-506).

    The posterior is a Gaussian centered on the optimal sequence with the
    (diagonal) noise covariance.  Roll the returned ``[N, T, m]`` samples
    through ``MPPISolver.states_prediction`` to get predictive states.
    """
    horizon, dim_control = optimal_solution.shape
    noise = jax.random.normal(
        key, (num_samples, horizon, dim_control), optimal_solution.dtype
    )
    return optimal_solution[None] + noise * sigmas
