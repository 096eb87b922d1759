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

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from mppi_playground_tpu.core.config import MPPIState


def _freeze(done, old_tree, new_tree, spec=None):
    """Select ``old_tree`` where ``done`` (broadcast from the left).

    Without ``spec``, the per-episode test is purely structural: leaves
    whose leading shape is ``done``'s shape freeze row-wise, everything
    else (e.g. a fleet ``info_fn`` carry shared by all episodes) passes
    through as ``new``.  A *shared* carry leaf whose leading dimension
    happens to equal the batch size B is indistinguishable from a
    per-episode leaf under that heuristic — pass ``spec``, a pytree of
    bools matching ``new_tree``'s structure (True = per-episode, freeze
    row-wise; False = shared, pass through), to say so explicitly
    (see ``carry_freeze`` on :func:`make_fleet_closed_loop`).
    """

    def row_freeze(o, n):
        return jnp.where(
            done.reshape(done.shape + (1,) * (n.ndim - done.ndim)), o, n
        )

    if spec is not None:
        spec_def = jax.tree.structure(spec)
        new_def = jax.tree.structure(new_tree)
        if spec_def != new_def:
            # Without this check a prefix spec (e.g. a bare bool for a
            # dict carry) would reach pick_spec with a subtree as ``n``
            # and die on ``n.ndim`` — an opaque AttributeError.
            raise ValueError(
                f"carry_freeze must be a pytree of bools with the same "
                f"structure as the info_fn carry: got {spec_def}, "
                f"carry is {new_def}"
            )

        def pick_spec(s, o, n):
            if not s:
                return n
            if n.ndim < done.ndim or n.shape[: done.ndim] != done.shape:
                raise ValueError(
                    f"carry_freeze marks a leaf of shape {n.shape} as "
                    f"per-episode, but its leading shape is not "
                    f"{done.shape}"
                )
            return row_freeze(o, n)

        return jax.tree.map(pick_spec, spec, old_tree, new_tree)

    def pick(o, n):
        if n.ndim < done.ndim or n.shape[: done.ndim] != done.shape:
            return n
        return row_freeze(o, n)

    return jax.tree.map(pick, old_tree, new_tree)


class RunnerCache:
    """Bounded LRU cache of compiled episode runners.

    Keys embed ``id()``s of user callables; each cached runner closes
    over those callables, which keeps them alive, so a live entry's ids
    cannot be recycled into stale hits.  A hit refreshes recency; at
    capacity the least-recently-used entry is evicted (each runner owns
    a whole-episode XLA executable, so unbounded growth is a leak).
    """

    def __init__(self, capacity: int = 8):
        if capacity < 1:
            raise ValueError(f"capacity must be >= 1, got {capacity}")
        self._entries: dict = {}
        self._capacity = capacity

    def get_or_build(self, key, build):
        run = self._entries.pop(key, None)
        if run is None:
            # build() before evicting: if it raises (bad user callable),
            # the still-valid LRU entry must survive
            run = build()
            if len(self._entries) >= self._capacity:
                self._entries.pop(next(iter(self._entries)))
        self._entries[key] = run  # (re-)insertion at the end = most recent
        return run


class PipelinedRunner:
    """Delay-compensated real-time serving: keep ``depth`` solves in flight.

    A strict host-in-the-loop controller pays a full device sync per tick
    (solve -> read action -> act); through a high-latency link the sync
    dominates the tick (measured ~25 ms through this project's tunnel vs
    a ~0.75 ms solve — ``bench.py`` ``host_synced_solves_per_s``).  This
    runner double-buffers: ``step(x)`` dispatches a solve from the
    current state, starts its action transfer asynchronously
    (``copy_to_host_async``), and returns the action of the solve issued
    ``depth`` calls earlier — the link round trip overlaps device compute
    and later dispatches instead of serializing with them.

    **Staleness contract.**  The returned action comes from a solve that
    saw the state ``depth`` ticks ago.  With ``compensate=True`` (the
    default) the runner returns that plan's row ``min(depth, T-1)`` —
    receding-horizon delay compensation: row ``d`` is the action the
    stale plan intended for the current wall-clock tick.  With
    ``compensate=False`` it returns row 0 (act on the stale plan's first
    action).  MPPI's warm start is unaffected either way: solves chain
    their own :class:`MPPIState` sequentially on device, so the sampling
    mean is always the previous solve's solution.  During pipeline fill
    (the first ``depth`` calls) the newest plan's row 0 is returned,
    which blocks on that solve — a one-time ramp.

    **Pick ``depth`` (and ``compensate``) against measured control-
    quality cost, not just latency.**  Closed-loop measurements
    (benchmarks/pipelined_quality.py via the bit-identical scan harness
    :func:`make_pipelined_closed_loop`; 3-seed table in
    docs/ARCHITECTURE.md, PIPELINE_QUALITY_r5.jsonl; regression-bounded
    in tests/test_pipelined_quality.py): depth 1-2 costs single-digit
    percent episode quality on the measured workloads (navigation +2-7%,
    pendulum +3-5% compensated); depth 4 measurably degrades all of
    them (racing mostly misses the goal budget, pendulum fails to
    stabilize at ~3.4x cost).  Compensation is per-plant: it helps the
    fast unstable pendulum but HURTS the high-speed racing
    path-follower (later plan rows carry more sampling noise — depth-1
    *uncompensated* is racing's mildest pipelined mode).  Measure your
    own plant with ``make_pipelined_closed_loop`` before shipping a
    depth.

    The loop semantics match ``bench.py``'s
    ``host_synced_pipelined_solves_per_s`` mode, which measures this
    pattern at flagship scale (≈#depth-independent dispatch-pipelined
    throughput instead of the strict-sync rate).
    """

    def __init__(self, solver, depth: int = 2, compensate: bool = True):
        import collections

        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self._solver = solver
        self._depth = depth
        self._row = (
            min(depth, solver.config.horizon - 1) if compensate else 0
        )
        self._state = solver.init()
        self._queue = collections.deque()

    @property
    def state(self):
        """The warm-start state after the newest dispatched solve."""
        return self._state

    def step(self, x, info: Optional[dict] = None):
        """Dispatch a solve from ``x``; return a numpy action (see class
        docstring for whose plan and which row)."""
        import numpy as np

        result = self._solver.solve(self._state, x, info=info)
        self._state = result.state
        seq = result.action_seq
        try:
            seq.copy_to_host_async()
        except AttributeError:  # older jax array types
            pass
        self._queue.append(seq)
        if len(self._queue) <= self._depth:
            return np.asarray(seq)[0]  # pipeline fill: newest plan, row 0
        return np.asarray(self._queue.popleft())[self._row]

    def flush(self):
        """Drain in-flight solves (e.g. at episode end); returns their
        remaining action sequences as numpy arrays, oldest first."""
        import numpy as np

        out = [np.asarray(q) for q in self._queue]
        self._queue.clear()
        return out

    def reset(self, seed: Optional[int] = None):
        """Drop in-flight solves and re-init the warm-start state."""
        self._queue.clear()
        self._state = (
            self._solver.init() if seed is None else self._solver.init(seed)
        )


def make_closed_loop(
    solver,
    plant_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    num_ticks: int,
    info_fn: Optional[Callable[[Any, jnp.ndarray], Any]] = None,
    done_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    jit: bool = True,
):
    """Build ``run(state, x0, carry=None) -> (state, x_final, xs, us,
    final_carry[, episode])``.

    Args:
        solver: an ``MPPISolver`` (XLA or fused facade), built unjitted
            (``jit=False``) — the loop below is the jit unit.
        plant_fn: ``(x [n], u [m]) -> x_next [n]`` — the simulated plant
            (may differ from the solver's internal dynamics model).
        num_ticks: static episode length.
        info_fn: optional ``(carry, x) -> (info_dict, new_carry)``
            producing the per-tick cost context (e.g. the racing
            reference trajectory + monotone path index).
        done_fn: optional termination predicate ``(x [n]) -> bool``
            evaluated on the post-step state, matching the reference
            host loops' ``break`` on goal/collision after ``env.step``
            (/root/reference/example/navigation2d.py:39-46).  Once done,
            the episode freezes: solver state, plant state, and the
            ``info_fn`` carry stop updating and recorded actions are
            zero.  The scan still runs ``num_ticks`` iterations (SPMD
            programs cannot shrink), so this buys the reference's
            *semantics* — frozen trajectories and an exact tick count —
            not compute savings.

    Returns ``run`` with outputs: final solver state, final plant state,
    ``xs [num_ticks, n]`` visited states, ``us [num_ticks, m]`` applied
    actions, and the final ``info_fn`` carry (None without ``info_fn``).
    With ``done_fn``, a sixth element ``episode`` is appended: a dict
    with ``done`` (bool, terminated at or before the tick budget —
    including a first fire on the final tick's post-step state) and
    ``ticks`` (int32, ticks executed before termination, ``num_ticks``
    if never done).
    """

    def run(state: MPPIState, x0: jnp.ndarray, carry: Any = None):
        # Without done_fn the tick body carries no done/ticks state and
        # traces no masking selects — the hot serving paths (bench.py,
        # RacingController.run_episode) pay nothing for the feature.
        def tick(loop_carry, _):
            st, x, c = loop_carry
            if info_fn is not None:
                info, c_next = info_fn(c, x)
            else:
                info, c_next = None, c
            result = solver.solve(st, x, info=info)
            u = result.action_seq[0]
            return (result.state, plant_fn(x, u), c_next), (x, u)

        def tick_done(loop_carry, _):
            st, x, c, done, ticks = loop_carry
            if info_fn is not None:
                info, c_next = info_fn(c, x)
            else:
                info, c_next = None, c
            result = solver.solve(st, x, info=info)
            u = jnp.where(done, 0.0, result.action_seq[0])
            x_next = jnp.where(done, x, plant_fn(x, u))
            st_next = _freeze(done, st, result.state)
            if info_fn is not None:
                c_next = _freeze(done, c, c_next)
            ticks = ticks + jnp.where(done, 0, 1).astype(jnp.int32)
            done = done | done_fn(x_next)
            return (st_next, x_next, c_next, done, ticks), (x, u)

        if done_fn is None:
            (st, xf, c), (xs, us) = lax.scan(
                tick, (state, jnp.asarray(x0), carry), None, length=num_ticks
            )
            return st, xf, xs, us, c
        done0 = jnp.asarray(False)
        ticks0 = jnp.asarray(0, jnp.int32)
        (st, xf, c, done, ticks), (xs, us) = lax.scan(
            tick_done, (state, jnp.asarray(x0), carry, done0, ticks0), None,
            length=num_ticks,
        )
        return st, xf, xs, us, c, {"done": done, "ticks": ticks}

    return jax.jit(run) if jit else run


def make_pipelined_closed_loop(
    solver,
    plant_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    num_ticks: int,
    depth: int,
    compensate: bool = True,
    info_fn: Optional[Callable[[Any, jnp.ndarray], Any]] = None,
    jit: bool = True,
):
    """Closed loop with :class:`PipelinedRunner`'s staleness semantics,
    scanned on device.

    Bit-for-bit the action schedule of a ``PipelinedRunner(solver, depth,
    compensate)`` host loop (asserted in tests/test_pipelined_quality.py):
    tick ``t`` dispatches a solve from the *current* plant state, but the
    action applied is from the solve of tick ``t - depth`` — row
    ``min(depth, horizon-1)`` with ``compensate`` (the stale plan's
    intention for the current wall-clock tick), row 0 without.  The first
    ``depth`` ticks apply the newest plan's row 0 (pipeline fill).  Solver
    state still chains solve-to-solve (MPPI's warm start is staleness-
    independent).  ``depth=0`` degenerates to the strict-sync loop.

    This is the *evaluation* harness for the pipelined serving mode: it
    runs the staleness semantics at amortized-episode speed so the
    control-quality cost of ``depth`` can be measured (the numbers behind
    the "small staleness" guidance in :class:`PipelinedRunner` — see
    benchmarks/pipelined_quality.py and docs/ARCHITECTURE.md).  Build the
    solver with ``jit=False``; this loop is the jit unit.

    Returns ``run(state, x0, carry=None) -> (state, x_final,
    xs [num_ticks, n], us [num_ticks, m], final_carry)``.
    """
    if depth < 0:
        raise ValueError(f"depth must be >= 0, got {depth}")
    horizon = solver.config.horizon
    row = min(depth, horizon - 1) if compensate else 0

    def run(state: MPPIState, x0: jnp.ndarray, carry: Any = None):
        dim_control = solver.config.dim_control
        dtype = solver.config.dtype

        def tick(loop_carry, t):
            st, x, c, queue = loop_carry
            if info_fn is not None:
                info, c_next = info_fn(c, x)
            else:
                info, c_next = None, c
            result = solver.solve(st, x, info=info)
            plan = result.action_seq
            if depth == 0:
                u = plan[0]
                queue_next = queue
            else:
                # queue[0] is the plan of tick t-depth once filled
                u = jnp.where(t < depth, plan[0], queue[0, row])
                queue_next = jnp.concatenate([queue[1:], plan[None]])
            return (result.state, plant_fn(x, u), c_next, queue_next), (x, u)

        queue0 = jnp.zeros((max(depth, 1), horizon, dim_control), dtype)
        (st, xf, c, _), (xs, us) = lax.scan(
            tick,
            (state, jnp.asarray(x0), carry, queue0),
            jnp.arange(num_ticks),
        )
        return st, xf, xs, us, c

    return jax.jit(run) if jit else run


def make_fleet_closed_loop(
    batched_solver,
    plant_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    num_ticks: int,
    info_fn: Optional[Callable[[Any, jnp.ndarray], Any]] = None,
    done_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    *,
    carry_freeze: Any = None,
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
        done_fn: optional batched termination predicate
            ``(xs [B,n]) -> bool [B]`` evaluated on the post-step
            states.  Episodes that report done freeze individually
            (solver state, plant state, per-episode ``info_fn`` carry
            leaves whose leading axis is ``B``); the fleet keeps running
            until the tick budget — per-episode early exit cannot shrink
            an SPMD program.  Caveat: without ``carry_freeze``,
            "per-episode" is detected purely by shape — a *shared* carry
            leaf whose leading dimension coincidentally equals ``B``
            (e.g. a B-waypoint path common to all episodes) would be
            frozen row-wise.  See :func:`make_closed_loop`.
        carry_freeze: optional pytree of bools matching the ``info_fn``
            carry's structure, replacing the shape heuristic above:
            ``True`` leaves freeze row-wise when their episode is done
            (their leading shape must be ``[B]``), ``False`` leaves are
            shared and always pass through.

    Returns ``run(states, x0s, carry=None) -> (states, xs_final,
    xs [num_ticks, B, n], us [num_ticks, B, m], final_carry[, episode])``
    where ``episode`` (only with ``done_fn``) holds ``done [B]`` and
    ``ticks [B]`` int32 ticks executed per episode.
    """
    if carry_freeze is not None and (done_fn is None or info_fn is None):
        # the spec only ever applies to the info_fn carry of a done_fn
        # loop — silently dropping it would hide a mis-wired call
        raise ValueError(
            "carry_freeze requires both info_fn (it describes the info_fn "
            "carry) and done_fn (freezing only happens on termination)"
        )

    def run(states: MPPIState, x0s: jnp.ndarray, carry: Any = None):
        batch = jnp.shape(x0s)[0]

        def tick(loop_carry, _):
            sts, xs, c = loop_carry
            if info_fn is not None:
                binfo, c_next = info_fn(c, xs)
            else:
                binfo, c_next = None, c
            result = batched_solver.solve_batch(sts, xs, batched_info=binfo)
            us = result.action_seq[:, 0]
            return (result.state, plant_fn(xs, us), c_next), (xs, us)

        def tick_done(loop_carry, _):
            sts, xs, c, done, ticks = loop_carry
            if info_fn is not None:
                binfo, c_next = info_fn(c, xs)
            else:
                binfo, c_next = None, c
            result = batched_solver.solve_batch(sts, xs, batched_info=binfo)
            us = jnp.where(done[:, None], 0.0, result.action_seq[:, 0])
            xs_next = jnp.where(done[:, None], xs, plant_fn(xs, us))
            sts_next = _freeze(done, sts, result.state)
            if info_fn is not None:
                c_next = _freeze(done, c, c_next, spec=carry_freeze)
            ticks = ticks + jnp.where(done, 0, 1).astype(jnp.int32)
            done = done | done_fn(xs_next)
            return (sts_next, xs_next, c_next, done, ticks), (xs, us)

        if done_fn is None:
            (sts, xf, c), (xs, us) = lax.scan(
                tick, (states, jnp.asarray(x0s), carry), None, length=num_ticks
            )
            return sts, xf, xs, us, c
        done0 = jnp.zeros((batch,), bool)
        ticks0 = jnp.zeros((batch,), jnp.int32)
        (sts, xf, c, done, ticks), (xs, us) = lax.scan(
            tick_done, (states, jnp.asarray(x0s), carry, done0, ticks0), None,
            length=num_ticks,
        )
        return sts, xf, xs, us, c, {"done": done, "ticks": ticks}

    return jax.jit(run) if jit else run
