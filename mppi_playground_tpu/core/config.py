"""Static solver configuration and the explicit warm-start state pytree.

The upstream reference (``/root/reference/src/pi_mpc/mppi.py:24-210``) stores
its configuration as ``nn.Module`` attributes and its cross-tick state as
mutable buffers.  TPU-first, we split those into:

* :class:`MPPIConfig` — a frozen, hashable dataclass.  Everything here is a
  *compile-time constant*: it selects the traced program, so one config ==
  one XLA executable (no per-tick recompiles, static shapes throughout).
* :class:`MPPIState` — an immutable pytree carrying exactly the warm-start
  items the reference keeps in mutable buffers (previous action sequence
  ``mppi.py:157,452``, SG history ``mppi.py:163-165,456-458``, the current
  temperature ``mppi.py:183-210,349,364-370,398``, the MPO optimizer state
  ``mppi.py:195-200``) plus the PRNG key.  Being a plain pytree makes it
  trivially donate-able, shard-able and serializable (checkpoint/resume for
  free — see ``utils/checkpoint.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


# Auto-lambda modes accepted for ``lambda_`` (mirrors mppi.py:191-210).
AUTO_LAMBDA_MODES = ("MPO", "LBPS", "ESSPS")


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    """Compile-time configuration of the MPPI solver.

    Parameter names, semantics and defaults follow the reference constructor
    (``/root/reference/src/pi_mpc/mppi.py:24-88`` and the README parameter
    tables) so a user of the reference can port configs 1:1.
    """

    horizon: int
    num_samples: int
    dim_state: int
    dim_control: int
    u_min: Tuple[float, ...]
    u_max: Tuple[float, ...]
    sigmas: Tuple[float, ...]
    lambda_: Union[float, str]
    # --- auto-lambda (mppi.py:36-39, 182-210) ---
    lbps_delta: float = 0.01
    essps_target_ess: Optional[float] = None
    lambda_min: float = 0.01
    lambda_max: float = 10.0
    # --- sampling (mppi.py:40, 265-270) ---
    exploration: float = 0.0
    # --- Savitzky-Golay smoothing (mppi.py:41-43, 160-165, 423-443) ---
    use_sg_filter: bool = False
    sg_window_size: int = 5
    sg_poly_order: int = 3
    # --- device / numerics ---
    dtype: jnp.dtype = jnp.float32
    seed: int = 42
    # --- TPU-native extensions (no reference equivalent) ---
    # Keep the full [K, T+1, n] rollout batch for diagnostics
    # (get_top_samples).  Disable on huge K to keep rollouts implicit.
    store_rollouts: bool = True
    # Number of fixed bisection iterations for the on-device ESSPS root
    # find (replaces scipy.optimize.brentq, mppi.py:366-370).  40 shrink
    # the default [0.01, 10] bracket to 1e-11 — past f32 resolution at any
    # root in the bracket (the midpoint stops moving once the endpoints
    # are 1 ulp apart, so further iterations are paid-for no-ops; measured
    # bitwise-identical lambda* at 34 vs 64 iterations on gamma-cost
    # vectors at K=100k).
    essps_iters: int = 40
    # Number of fixed golden-section iterations for the on-device LBPS
    # scalar minimization (replaces scipy minimize_scalar, mppi.py:344-349).
    # One O(K) objective evaluation per iteration.  The reference's own
    # convergence is scipy's bounded method at xatol=1e-5, which golden
    # section matches on the default [0.01, 10] bracket in
    # ceil(log(10/1e-5)/log(phi)) = 29 iterations; 32 shrinks the bracket
    # to phi^-32 * 10 = 2e-6 — still tighter than the upstream it mirrors
    # (equivalence vs scipy asserted in tests/test_autolambda.py).
    lbps_iters: int = 32
    # 'xla' uses pure-JAX ops; 'pallas' enables fused TPU kernels for the
    # softmin weighted-update hot path; 'auto' picks pallas on TPU backends.
    kernel_backend: str = "auto"

    def __post_init__(self):
        # the reference crashes obscurely on these (e.g. horizon=0 hits an
        # IndexError deep in the warm-start shift); fail with a clear message
        if self.horizon < 1:
            raise ValueError(f"horizon must be >= 1, got {self.horizon}")
        if self.num_samples < 1:
            raise ValueError(f"num_samples must be >= 1, got {self.num_samples}")
        for name in ("u_min", "u_max", "sigmas"):
            if len(getattr(self, name)) != self.dim_control:
                raise ValueError(
                    f"{name} must have length dim_control={self.dim_control}"
                )
        if isinstance(self.lambda_, str):
            if self.lambda_ not in AUTO_LAMBDA_MODES:
                raise ValueError(
                    "lambda_ takes a fixed float temperature or one of the "
                "auto-tuning modes 'MPO' / 'LBPS' / 'ESSPS'"
                )
        elif not isinstance(self.lambda_, (float, int)):
            raise ValueError(
                "lambda_ takes a fixed float temperature or one of the "
                "auto-tuning modes 'MPO' / 'LBPS' / 'ESSPS'"
            )
        if self.use_sg_filter:
            if self.sg_window_size % 2 == 0 or self.sg_window_size <= self.sg_poly_order:
                raise ValueError(
                    "the SG filter needs an odd sg_window_size larger than "
                    "sg_poly_order"
                )
            # mirror padding needs pad <= len(prolonged) - 1 rows to reflect
            # (prolonged = history + action_seq = 2*horizon - 1 rows);
            # beyond that the reference's conv errors and our gather would
            # silently clamp
            if self.sg_window_size // 2 > 2 * self.horizon - 2:
                raise ValueError(
                    "sg_window_size too large for this horizon: the mirror "
                    "pad exceeds the prolonged action signal."
                )
        if not 0.0 <= self.exploration <= 1.0:
            raise ValueError("exploration must be in [0, 1].")
        if self.kernel_backend not in ("auto", "xla", "pallas"):
            raise ValueError("kernel_backend must be 'auto', 'xla' or 'pallas'.")

    # ------------------------------------------------------------------
    @property
    def auto_lambda(self) -> Optional[str]:
        return self.lambda_ if isinstance(self.lambda_, str) else None

    @property
    def initial_lambda(self) -> float:
        """Initial temperature.

        Fixed-lambda configs start at the given value; auto modes start at
        1.0 (MPO initializes lambda = 1.0 at mppi.py:193; LBPS/ESSPS
        overwrite it on the first solve before it is ever used).
        """
        if isinstance(self.lambda_, str):
            return 1.0
        return float(self.lambda_)

    @property
    def target_ess(self) -> float:
        """ESSPS target effective sample size (mppi.py:185-187)."""
        if self.essps_target_ess is not None:
            return float(self.essps_target_ess)
        return self.num_samples / 10.0

    @property
    def inherited_samples(self) -> int:
        """Samples that inherit the previous solution (mppi.py:266)."""
        return int(self.num_samples * (1.0 - self.exploration))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MPPIState:
    """Cross-tick solver state (the reference's mutable buffers, made explicit).

    Attributes:
        key: PRNG key consumed/split every solve.
        previous_action_seq: ``[horizon, dim_control]`` warm start
            (mppi.py:157, 452).
        sg_history: ``[horizon-1, dim_control]`` previously applied actions
            prepended before SG filtering (mppi.py:163-165, 423-431).
        lam: current temperature (scalar).  Fixed configs keep it constant;
            auto modes update it every solve.
        mpo_log_temperature: scalar log-temperature parameter for MPO
            (mppi.py:195-199); zeros when MPO is off.
        mpo_opt_state: optax optimizer state for MPO; empty tuple otherwise.
    """

    key: jax.Array
    previous_action_seq: jax.Array
    sg_history: jax.Array
    lam: jax.Array
    mpo_log_temperature: jax.Array
    mpo_opt_state: tuple
