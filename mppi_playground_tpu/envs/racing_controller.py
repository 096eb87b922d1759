"""Racing contouring controller: reference generation + solve in ONE jit.

Behavioral reference: class ``racing_controller``
(``/root/reference/example/racing.py:16-218``): MPPI at horizon 25 with
4000 samples, sigma [0.5, 0.1], lambda 1.0 over the MPCC cost, preceded by
reference-trajectory generation each tick.

The reference's tick is host-bound: nearest-index search on CPU scalars,
an ``xref`` assembled row-by-row in Python, then the solve (racing.py:
161-218).  Here the whole control tick — argmin path search, reference
gather, sampling, fused rollout/cost, weighting, warm-start update — is a
single jitted XLA program with no host round-trips (SURVEY.md §7 hard
parts #4/#5).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mppi_playground_tpu.core import diagnostics
from mppi_playground_tpu.core.closed_loop import RunnerCache, make_closed_loop
from mppi_playground_tpu.core.config import MPPIConfig
from mppi_playground_tpu.core.fused_solver import make_fused_solver
from mppi_playground_tpu.core.solver import make_solver, warm_reset
from mppi_playground_tpu.models.racing_mpcc import (
    calc_ref_trajectory,
    make_mpcc_cost,
    make_racing_fused_task_from_env,
)
from mppi_playground_tpu.ops.fused_solve import fused_envelope, fused_supported


class RacingController:
    """One-jit-per-tick MPCC racing controller (racing.py:16-101)."""

    def __init__(
        self,
        env,
        horizon: int = 25,
        num_samples: int = 4000,
        sigmas: Tuple[float, float] = (0.5, 0.1),
        lambda_=1.0,
        lookahead_distance: float = 3.0,
        reference_path_interval: float = 0.85,
        dtype=jnp.float32,
        seed: int = 42,
        store_rollouts: bool = True,
        kernel_backend: str = "auto",
        solver_backend: str = "auto",
    ) -> None:
        """
        Args:
            solver_backend: ``'fused'`` (single Pallas kernel per tick,
                ops/fused_solve.py), ``'xla'`` (scan pipeline), or
                ``'auto'`` — fused on TPU when the config fits the kernel
                envelope (``fused_envelope``: f32, T*m and n within vreg
                lanes, no rollout storage; any lambda mode qualifies).
        """
        self.env = env
        self.config = MPPIConfig(
            horizon=horizon,
            num_samples=num_samples,
            dim_state=4,
            dim_control=2,
            u_min=tuple(float(v) for v in env.u_min.tolist()),
            u_max=tuple(float(v) for v in env.u_max.tolist()),
            sigmas=tuple(float(v) for v in sigmas),
            lambda_=lambda_,
            dtype=dtype,
            seed=seed,
            store_rollouts=store_rollouts,
            kernel_backend=kernel_backend,
        )
        if solver_backend == "auto":
            fused_ok = fused_supported() and fused_envelope(self.config)
            solver_backend = "fused" if fused_ok else "xla"
        self.solver_backend = solver_backend
        path = env.racing_center_path
        v_max = float(env.V_MAX)
        dl = float(env.dl)

        def calc_ref(x, cind):
            return calc_ref_trajectory(
                x,
                path,
                cind,
                horizon,
                DL=dl,
                lookahead_distance=lookahead_distance,
                reference_path_interval=reference_path_interval,
                v_max=v_max,
            )

        self._calc_ref = calc_ref
        self._build_solver()

        self.solver_state = self._solver.init()
        self.current_path_index = jnp.asarray(0, jnp.int32)
        self.reference_path: Optional[jnp.ndarray] = None
        self._last_aux = None
        self._last_noise = None

    # ------------------------------------------------------------------
    def _build_solver(self) -> None:
        """(Re)bake the env's maps into the jitted tick.

        The map tables are jit constants, so unlike the reference — whose
        eager controller reads the live map object every tick
        (racing.py:146-152) — a mutated map needs a rebuild.  Called at
        construction and again by :meth:`update`/:meth:`run_episode`
        whenever ``env.obstacle_map.version`` has moved.
        """
        env = self.env
        # inner solver stays unjitted; the full tick below is the jit unit
        if self.solver_backend == "fused":
            task = make_racing_fused_task_from_env(env)
            self._solver = make_fused_solver(
                self.config, task, env.dynamics, jit=False
            )
        else:
            cost_fn = make_mpcc_cost(env.obstacle_cost_map, env.lane_cost_map)
            self._solver = make_solver(self.config, env.dynamics, cost_fn, jit=False)
        calc_ref = self._calc_ref

        def tick(solver_state, cind, x, noise=None):
            xref, new_cind = calc_ref(x, cind)
            result = self._solver.solve(
                solver_state, x, info={"reference_path": xref}, noise=noise
            )
            return result, new_cind, xref

        # no donation: solver_state is a public stash-able attribute and
        # the pytree is tiny
        self._tick = jax.jit(tick)
        # cached episode runners close over the previous solver
        self._episode_runners = RunnerCache()
        self._map_version = env.obstacle_map.version

    def _refresh_if_maps_changed(self) -> None:
        if self.env.obstacle_map.version != self._map_version:
            self._build_solver()

    def reset(self) -> None:
        # keep the adapted lambda / MPO state across episodes (mppi.py:212-221)
        self.solver_state = warm_reset(self._solver, self.solver_state)
        self.current_path_index = jnp.asarray(0, jnp.int32)
        self.reference_path = None
        self._last_aux = None
        self._last_noise = None

    def update(
        self, state: jnp.ndarray, noise: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One control tick (racing.py:60-101) -> (action_seq, state_seq)."""
        self._refresh_if_maps_changed()
        result, self.current_path_index, self.reference_path = self._tick(
            self.solver_state, self.current_path_index,
            jnp.asarray(state, self.config.dtype), noise,
        )
        self.solver_state = result.state
        # `noise is None` was static in the tick's trace; rewriting the
        # device scalar with the host bool lets get_top_samples check it
        # without a device->host sync per call (the inner solver is
        # unjitted here, so the fused facade's own rewrite never ran)
        aux = result.aux
        if aux.noise_injected is not None:
            aux = aux._replace(noise_injected=noise is not None)
        self._last_aux = aux
        self._last_noise = noise
        return result.action_seq, result.state_seq

    def run_episode(
        self, state: jnp.ndarray, num_ticks: int, done_fn=None
    ) -> Tuple[jnp.ndarray, ...]:
        """``num_ticks`` control ticks in ONE dispatched program.

        The single-dispatch simulation mode (``core.closed_loop``): the
        whole [reference generation -> solve -> apply first action] loop
        is scanned on device, paying the dispatch cost once per episode
        (~1.4 ms/tick amortized at flagship scale vs ~1.7 host-driven).
        Updates the controller's warm start and path index like
        ``num_ticks`` calls to :meth:`update`.  Returns ``(xs
        [num_ticks+1, 4], us [num_ticks, 2])`` — ``xs[t]`` is the state
        ``us[t]`` was solved at and ``xs[-1]`` the final post-step
        state.  ``done_fn (x [4]) -> bool`` is the on-device
        analogue of the reference loop's goal break
        (racing.py:233,262-264); when given, the episode freezes after
        it fires and a third element ``episode`` (dict of ``done``,
        ``ticks``) is returned.  Pass a STABLE callable — runners are
        cached per ``(num_ticks, done_fn)`` identity.
        """
        self._refresh_if_maps_changed()

        def build():
            env = self.env

            def info_fn(cind, x):
                xref, new_cind = self._calc_ref(x, cind)
                return {"reference_path": xref}, new_cind

            return make_closed_loop(
                self._solver,
                lambda x, u: env.dynamics(x[None], u[None])[0],
                num_ticks,
                info_fn=info_fn,
                done_fn=done_fn,
            )

        key = (num_ticks, id(done_fn))
        run = self._episode_runners.get_or_build(key, build)

        out = run(
            self.solver_state,
            jnp.asarray(state, self.config.dtype),
            self.current_path_index,
        )
        st, xf, xs, us, cind = out[:5]
        self.solver_state = st
        self.current_path_index = cind
        # per-solve diagnostics/reference are stale after a scanned episode
        self.reference_path = None
        self._last_aux = None
        self._last_noise = None
        xs = jnp.concatenate([xs, xf[None]])
        if done_fn is not None:
            return xs, us, out[5]
        return xs, us

    def get_top_samples(
        self, num_samples: int = 300
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-weighted rollouts (mppi.py:462-487, navigation2d.py:47-52).

        The fused backend regenerates the winning perturbations from the
        solve's per-tile PRNG seeds instead of storing rollouts.
        """
        return diagnostics.top_samples_from_last(
            self._solver, self._last_aux, num_samples,
            noise=self._last_noise, what="update()",
        )
