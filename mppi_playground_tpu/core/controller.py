"""Stateful ``MPPI`` controller — the reference-compatible front door.

Behavioral reference: the public class ``MPPI``
(``/root/reference/src/pi_mpc/mppi.py:16-524``).  A user of the reference
constructs ``MPPI(horizon=..., dynamics=..., cost_func=..., ...)`` and calls
``forward(state)`` / ``reset()`` / ``get_top_samples(n)`` /
``get_samples_from_posterior(...)``; this wrapper exposes the same surface
(same parameter names and defaults) over the pure functional core in
``core/solver.py``, holding the :class:`MPPIState` pytree across ticks.

The functional API (``make_solver``) remains the recommended interface for
jit-composition, sharding and checkpointing; this class exists for parity
and ergonomic migration.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from mppi_playground_tpu.core import diagnostics
from mppi_playground_tpu.core.closed_loop import RunnerCache, make_closed_loop
from mppi_playground_tpu.core.config import MPPIConfig
from mppi_playground_tpu.core.solver import (
    CostFn,
    Dynamics,
    SolveAux,
    make_solver,
    warm_reset,
)


class MPPI:
    """Drop-in style MPPI controller (constructor mirrors mppi.py:24-88)."""

    def __init__(
        self,
        horizon: int,
        num_samples: int,
        dim_state: int,
        dim_control: int,
        dynamics: Dynamics,
        cost_func: CostFn,
        u_min,
        u_max,
        sigmas,
        lambda_: Union[float, str],
        lbps_delta: float = 0.01,
        essps_target_ess: Optional[float] = None,
        lambda_min: float = 0.01,
        lambda_max: float = 10.0,
        exploration: float = 0.0,
        use_sg_filter: bool = False,
        sg_window_size: int = 5,
        sg_poly_order: int = 3,
        dtype=jnp.float32,
        seed: int = 42,
        store_rollouts: bool = True,
        kernel_backend: str = "auto",
        fused_task=None,
    ) -> None:
        """
        Args:
            fused_task: optional
                :class:`~mppi_playground_tpu.ops.fused_solve.FusedTask`
                (e.g. ``models.pendulum.fused_task()``); when provided and
                the backend is a TPU with ``store_rollouts=False``, the
                solve runs as one fused Pallas kernel per tick.  All other
                semantics are unchanged.
        """
        self.config = MPPIConfig(
            horizon=horizon,
            num_samples=num_samples,
            dim_state=dim_state,
            dim_control=dim_control,
            u_min=tuple(float(v) for v in jnp.asarray(u_min).tolist()),
            u_max=tuple(float(v) for v in jnp.asarray(u_max).tolist()),
            sigmas=tuple(float(v) for v in jnp.asarray(sigmas).tolist()),
            lambda_=lambda_,
            lbps_delta=lbps_delta,
            essps_target_ess=essps_target_ess,
            lambda_min=lambda_min,
            lambda_max=lambda_max,
            exploration=exploration,
            use_sg_filter=use_sg_filter,
            sg_window_size=sg_window_size,
            sg_poly_order=sg_poly_order,
            dtype=dtype,
            seed=seed,
            store_rollouts=store_rollouts,
            kernel_backend=kernel_backend,
        )
        def _build_xla_solver(jit: bool = True):
            # no donation: the facade promises solver_state can be
            # stashed/checkpointed freely (the pytree is tiny, so
            # donating buys nothing)
            return make_solver(
                self.config, dynamics, cost_func, jit=jit,
                donate_state=False,
            )

        if fused_task is not None:
            if store_rollouts:
                raise ValueError(
                    "fused_task requires store_rollouts=False (the fused "
                    "kernel keeps rollouts implicit; get_top_samples "
                    "regenerates them from the PRNG seeds on demand)"
                )
            from mppi_playground_tpu.core.fused_solver import make_fused_solver
            from mppi_playground_tpu.ops.fused_solve import (
                fused_envelope,
                fused_supported,
            )

            if fused_supported() and fused_envelope(self.config):
                def _build_solver(jit: bool = True):
                    return make_fused_solver(
                        self.config, fused_task, dynamics, jit=jit,
                        donate_state=False,
                    )
            else:
                # same fallback on TPU and CPU: out-of-envelope configs use
                # the (numerically equivalent) XLA path
                _build_solver = _build_xla_solver
        else:
            _build_solver = _build_xla_solver
        self._build_solver = _build_solver
        self._solver = _build_solver()
        # lazily-built unjitted twin for run_episode (the episode loop is
        # the jit unit there — closed_loop.py's solver contract)
        self._episode_solver = None
        self._state = self._solver.init()
        self._last_aux: Optional[SolveAux] = None
        self._last_noise: Optional[jnp.ndarray] = None
        self._diag_key = jax.random.PRNGKey(seed + 1)
        self._episode_runners = RunnerCache()

    # ------------------------------------------------------------------
    @property
    def solver_state(self):
        """The explicit warm-start pytree (checkpointable, shardable)."""
        return self._state

    @solver_state.setter
    def solver_state(self, value):
        self._state = value

    def reset(self) -> None:
        """Zero the warm start (mppi.py:212-221).

        Like the reference, only the previous action sequence and SG
        history are cleared — the adapted lambda and MPO optimizer state
        persist across episodes.
        """
        self._state = warm_reset(self._solver, self._state)
        # diagnostics refer to the previous episode; drop them so
        # get_top_samples after reset raises instead of replaying stale
        # trajectories
        self._last_aux = None
        self._last_noise = None

    def forward(
        self,
        state,
        info: Optional[Dict[str, Any]] = None,
        noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One solve (mppi.py:223-460) -> ``(action_seq, state_seq)``."""
        state = jnp.asarray(state, self.config.dtype)
        if state.shape != (self.config.dim_state,):
            raise ValueError(
                f"state must have shape ({self.config.dim_state},) "
                f"(= dim_state), got {state.shape}"
            )
        result = self._solver.solve(self._state, state, info=info, noise=noise)
        self._state = result.state
        self._last_aux = result.aux
        self._last_noise = noise  # fused top-k replay must reuse it
        return result.action_seq, result.state_seq

    __call__ = forward

    # ------------------------------------------------------------------
    def get_top_samples(self, num_samples: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-weighted rollouts from the last solve (mppi.py:462-487).

        On the XLA path these are read from the stored rollout batch; on
        the fused path the winning perturbations are regenerated from the
        solve's per-tile PRNG seeds and re-rolled (rollouts never hit HBM).
        """
        return diagnostics.top_samples_from_last(
            self._solver, self._last_aux, num_samples, noise=self._last_noise
        )

    def run_episode(
        self,
        plant_fn,
        state,
        num_ticks: int,
        info_fn=None,
        carry=None,
        done_fn=None,
    ):
        """``num_ticks`` [solve -> apply first action -> plant step] ticks
        in ONE dispatched program (``core.closed_loop``).

        The single-dispatch simulation mode — no reference equivalent.
        ``plant_fn (x [n], u [m]) -> x_next [n]`` may differ from the
        solver's internal model; ``info_fn (carry, x) -> (info, carry)``
        builds the per-tick cost context, seeded with ``carry``.  Pass
        STABLE callables: runners are cached per ``(plant_fn, num_ticks,
        info_fn, done_fn)`` identity, so a fresh lambda per call
        recompiles the episode program every time.  Updates the warm start like
        ``num_ticks`` calls to :meth:`forward` (per-solve diagnostics are
        unavailable afterwards — rollouts never reach the host).  Returns
        ``(xs [num_ticks+1, n], us [num_ticks, m])`` — ``xs[t]`` is the
        state ``us[t]`` was solved at and ``xs[-1]`` the final post-step
        state — plus the final carry
        when ``info_fn`` is given, plus an ``episode`` dict (``done``
        bool, ``ticks`` int32) when ``done_fn (x) -> bool`` is given —
        the on-device analogue of the reference loops' ``break`` on
        goal/collision (/root/reference/example/navigation2d.py:39-46);
        the episode freezes after ``done_fn`` fires.
        """
        def build():
            if self._episode_solver is None:
                self._episode_solver = self._build_solver(jit=False)
            return make_closed_loop(
                self._episode_solver, plant_fn, num_ticks, info_fn=info_fn,
                done_fn=done_fn,
            )

        key = (id(plant_fn), num_ticks, id(info_fn), id(done_fn))
        run = self._episode_runners.get_or_build(key, build)
        out = run(self._state, jnp.asarray(state, self.config.dtype), carry)
        st, xf, xs, us, final_carry = out[:5]
        self._state = st
        self._last_aux = None
        self._last_noise = None
        ret = (jnp.concatenate([xs, xf[None]]), us)
        if info_fn is not None:
            ret = ret + (final_carry,)
        if done_fn is not None:
            ret = ret + (out[5],)
        return ret

    def get_samples_from_posterior(
        self, optimal_solution: jnp.ndarray, state, num_samples: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Posterior action/state samples (mppi.py:489-506)."""
        if num_samples > self.config.num_samples:
            raise ValueError(
                f"requested {num_samples} posterior samples, but the solver "
                f"was built with num_samples={self.config.num_samples}"
            )
        self._diag_key, sub = jax.random.split(self._diag_key)
        sigmas = jnp.asarray(self.config.sigmas, self.config.dtype)
        samples = diagnostics.posterior_samples(
            sub, jnp.asarray(optimal_solution, self.config.dtype), sigmas, num_samples
        )
        predictive_states = self._solver.states_prediction(
            jnp.asarray(state, self.config.dtype), samples
        )
        return samples, predictive_states

    @property
    def lambda_(self) -> float:
        return float(self._state.lam)
