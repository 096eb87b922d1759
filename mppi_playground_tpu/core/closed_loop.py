"""Single-dispatch closed-loop rollout: N control ticks in one program.

The reference's control loop is host-driven — per tick, one solve
dispatch, one plant step, host sync (``/root/reference/example/*.py``).
For simulation workloads (policy evaluation, data generation, batched
domain randomization) the host loop's per-dispatch overhead dominates
once the solve itself is fast: on this project's setup each dispatched
program costs ~0.7 ms of tunnel/runtime latency against a ~1.5 ms solve.

:func:`make_closed_loop` scans [solve -> apply first action -> plant
step] for a static number of ticks inside ONE jitted program (the fused
Pallas solve works under ``lax.scan``), so the per-dispatch cost is paid
once per episode instead of once per tick.  Real-time control loops that
need the action on the host every tick keep using ``solver.solve``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from mppi_playground_tpu.core.config import MPPIState


def make_closed_loop(
    solver,
    plant_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    num_ticks: int,
    info_fn: Optional[Callable[[Any, jnp.ndarray], Any]] = None,
    jit: bool = True,
):
    """Build ``run(state, x0, carry=None) -> (state, x_final, xs, us,
    final_carry)``.

    Args:
        solver: an ``MPPISolver`` (XLA or fused facade), built unjitted
            (``jit=False``) — the loop below is the jit unit.
        plant_fn: ``(x [n], u [m]) -> x_next [n]`` — the simulated plant
            (may differ from the solver's internal dynamics model).
        num_ticks: static episode length.
        info_fn: optional ``(carry, x) -> (info_dict, new_carry)``
            producing the per-tick cost context (e.g. the racing
            reference trajectory + monotone path index).

    Returns ``run`` with outputs: final solver state, final plant state,
    ``xs [num_ticks, n]`` visited states, ``us [num_ticks, m]`` applied
    actions, and the final ``info_fn`` carry (None without ``info_fn``).
    """

    def run(state: MPPIState, x0: jnp.ndarray, carry: Any = None):
        def tick(loop_carry, _):
            st, x, c = loop_carry
            if info_fn is not None:
                info, c = info_fn(c, x)
            else:
                info = None
            result = solver.solve(st, x, info=info)
            u = result.action_seq[0]
            x_next = plant_fn(x, u)
            return (result.state, x_next, c), (x, u)

        (st, xf, c), (xs, us) = lax.scan(
            tick, (state, jnp.asarray(x0), carry), None, length=num_ticks
        )
        return st, xf, xs, us, c

    return jax.jit(run) if jit else run


def make_fleet_closed_loop(
    batched_solver,
    plant_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    num_ticks: int,
    info_fn: Optional[Callable[[Any, jnp.ndarray], Any]] = None,
    jit: bool = True,
):
    """Fleet of independent episodes in ONE dispatched program.

    The simulation-farm mode: ``batch_size`` control problems (from
    ``parallel.make_batched_solver`` / ``make_batched_fused_solver``,
    built with ``jit=False, donate_state=False`` — this loop is the jit
    unit), each stepped for ``num_ticks`` ticks, scanned inside a single
    program.  Amortizes the per-dispatch cost over ``B * num_ticks``
    solves; scenarios shard over the mesh's scenario axis.

    Args:
        plant_fn: batched plant ``(xs [B,n], us [B,m]) -> [B,n]``.
        info_fn: optional ``(carry, xs [B,n]) -> (batched_info, carry)``
            where ``batched_info`` is a dict of ``[B, ...]`` arrays — the
            per-scenario cost context (e.g. each episode's reference
            trajectory), forwarded as ``solve_batch(batched_info=...)``.

    Returns ``run(states, x0s, carry=None) -> (states, xs_final,
    xs [num_ticks, B, n], us [num_ticks, B, m], final_carry)``.
    """

    def run(states: MPPIState, x0s: jnp.ndarray, carry: Any = None):
        def tick(loop_carry, _):
            sts, xs, c = loop_carry
            if info_fn is not None:
                binfo, c = info_fn(c, xs)
            else:
                binfo = None
            result = batched_solver.solve_batch(sts, xs, batched_info=binfo)
            us = result.action_seq[:, 0]
            return (result.state, plant_fn(xs, us), c), (xs, us)

        (sts, xf, c), (xs, us) = lax.scan(
            tick, (states, jnp.asarray(x0s), carry), None, length=num_ticks
        )
        return sts, xf, xs, us, c

    return jax.jit(run) if jit else run
