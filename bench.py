"""Flagship benchmark: racing MPCC solve at horizon 50, 100k samples.

Measures end-to-end solves/s of the full control tick (on-device
reference-trajectory generation + sampling + fused rollout/cost over the
obstacle+lane maps + softmin weighted update + warm-start state update) on
the available accelerator, the workload named by BASELINE.json's
north-star ("racing at horizon 50, 100k samples, >=100 solves/s on a v5p
slice").

Serving modes measured:

* **amortized-episode** (the headline ``value``): N ticks scanned inside
  ONE program (``core/closed_loop.py``) — the simulation/data-generation
  mode, which pays the dispatch cost once per episode.  Headline because
  it is the drift-proof number: the host-driven and host-synced rates
  ride the tunnel's ±20% per-dispatch marshaling channel and the same
  kernel has measured anywhere from 549 to 807 host-driven solves/s
  across sessions (RUNALL_r3.jsonl vs BENCH_r03.json), while the
  amortized rate pays one dispatch per 150 ticks and repeats within a
  few percent.
* **host-driven** (``extra.host_driven_solves_per_s``): one dispatched
  program per control tick, dispatches pipelined (the host enqueues tick
  t+1 while t runs; the window syncs at its end) — the sustained
  per-tick dispatch throughput.  Median of ``WINDOWS`` windows.
* **host-synced** (``extra.host_synced_solves_per_s``): same loop but the
  first action is fetched to the host every tick before the next solve is
  issued — the strict host-in-the-loop real-time control mode (a real
  controller must read the action to act on it).  The measured pure
  sync round trip (``extra.tunnel_sync_ms``) is recorded next to it so
  an environmental latency change is not misread as a solver regression.
* **host-synced pipelined** (``extra.host_synced_pipelined_solves_per_s``):
  the double-buffered real-time mode — solve t+1 is dispatched *before*
  the action of solve t is read back, and reads ride async D2H copies a
  few ticks deep, so the tunnel round trip overlaps device compute and
  later dispatches.  The controller acts on an action that is
  ``PIPELINE_DEPTH`` ticks stale; the control-quality cost of that
  staleness is measured per-depth in benchmarks/pipelined_quality.py
  (docs/ARCHITECTURE.md table: depth 1-2 near-strict quality with
  delay compensation, deeper depths degrade fast-timescale plants),
  and the depth is recorded so the latency/throughput trade is
  explicit.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
reports against the 100 solves/s north-star target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
``extra.value_mode`` names the serving mode ``value`` reports
("amortized_episode" normally; "host_driven" if the episode leg failed),
and ``extra.amortized_windows`` carries the individual windows so
run-to-run agreement is checkable from the artifact alone.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:  # package import when cwd differs
    sys.path.insert(0, _REPO)

# Persistent compilation cache: the bench compiles ~4 flagship programs
# (~30-40 s each through the device tunnel); caching them makes repeat
# runs minutes faster.
from mppi_playground_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from mppi_playground_tpu.workloads import (  # noqa: E402 — after sys.path
    FLAGSHIP_HORIZON as HORIZON,
    FLAGSHIP_NUM_SAMPLES as NUM_SAMPLES,
)
TARGET_SOLVES_PER_S = 100.0  # BASELINE.json north star
WARMUP = 5
WINDOWS = 5
ITERS = 50
EPISODE_TICKS = 50
EPISODE_WINDOWS = 3
PIPELINE_DEPTH = 4  # ticks of action staleness in the pipelined mode


def build():
    # shared with __graft_entry__.entry() so the benchmarked program and
    # the driver's compile check cannot drift
    from mppi_playground_tpu.workloads import build_flagship

    env, solver, tick4 = build_flagship(HORIZON, NUM_SAMPLES)

    def tick(solver_state, cind, x):
        action_seq, _, new_state, new_cind = tick4(solver_state, cind, x)
        # state_seq unused here (as before the refactor): XLA dead-code
        # eliminates the nominal re-roll from this executable
        return action_seq, new_state, new_cind

    tick = jax.jit(tick, donate_argnums=(0,))
    return env, solver, tick


def measure_host_driven(
    env, solver, tick, windows, iters, warmup=WARMUP, sync_every_tick=False
):
    """Median-of-windows solves/s of the per-tick dispatch mode.

    With ``sync_every_tick`` the first action is brought to the host every
    tick (``np.asarray``) before the next solve is issued — no dispatch
    pipelining, the rate a real-time controller can act at (a real
    controller must read the action to act on it).  Otherwise the host
    enqueues tick t+1 while t runs and the window syncs only at its end.
    """
    import numpy as np

    x = env.reset()
    state = solver.init()
    cind = jnp.asarray(0, jnp.int32)

    for _ in range(warmup):  # compile + steady state
        action_seq, state, cind = tick(state, cind, x)
        if sync_every_tick:
            np.asarray(action_seq[0])
    jax.block_until_ready(action_seq)

    rates = []
    for _ in range(windows):
        start = time.perf_counter()
        for _ in range(iters):
            action_seq, state, cind = tick(state, cind, x)
            if sync_every_tick:
                np.asarray(action_seq[0])  # the action a controller applies
        jax.block_until_ready(action_seq)
        rates.append(iters / (time.perf_counter() - start))
    return statistics.median(rates), rates


def measure_host_pipelined(
    env, solver, tick, windows, iters, depth=PIPELINE_DEPTH, warmup=WARMUP
):
    """Median solves/s of the double-buffered real-time control mode.

    Every tick's first action reaches the host (like the synced mode),
    but the read is ``depth`` ticks behind the dispatch: solve t+1 is
    enqueued and solve t-depth's action transfer was started
    asynchronously (``copy_to_host_async``) before the loop blocks on it.
    The tunnel round trip then overlaps device compute and later
    dispatches instead of serializing with them.

    Staleness contract: the controller acts on the action of a solve
    ``depth`` ticks old.  A deployment picks ``depth`` against the
    measured per-depth control-quality cost
    (benchmarks/pipelined_quality.py; docs/ARCHITECTURE.md table —
    depth 1-2 is near-strict quality with delay compensation, depth 4
    measurably degrades fast-timescale plants); depth=1 already
    overlaps one full round trip.
    """
    import collections

    import numpy as np

    x = env.reset()
    state = solver.init()
    cind = jnp.asarray(0, jnp.int32)

    for _ in range(warmup):
        action_seq, state, cind = tick(state, cind, x)
    jax.block_until_ready(action_seq)

    rates = []
    for _ in range(windows):
        q = collections.deque()
        start = time.perf_counter()
        for _ in range(iters):
            action_seq, state, cind = tick(state, cind, x)
            # transfer the whole [T, m] sequence (400 B) rather than
            # dispatching a separate [0]-slice program per tick
            try:
                action_seq.copy_to_host_async()
            except AttributeError:  # older jax array types
                pass
            q.append(action_seq)
            if len(q) > depth:
                np.asarray(q.popleft())[0]  # the action the controller applies
        while q:
            np.asarray(q.popleft())
        rates.append(iters / (time.perf_counter() - start))
    return statistics.median(rates), rates


def measure_sync_floor(iters: int = 20) -> float:
    """Median ms of [trivial dispatch -> block_until_ready] round trips.

    The host-synced mode can never beat this floor: it is the pure
    environmental cost of synchronizing with the device once per tick
    (through the tunnel backend this has been observed anywhere from
    ~0.7 ms to ~26 ms across sessions).  Recording it next to
    ``host_synced_solves_per_s`` attributes that number to environment
    vs solver code.
    """
    probe = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    probe(x).block_until_ready()  # compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        probe(x).block_until_ready()
        times.append((time.perf_counter() - t0) * 1000.0)
    return statistics.median(times)


def measure_amortized(env, solver):
    """Solves/s with EPISODE_TICKS ticks scanned inside one program."""
    from mppi_playground_tpu.core.closed_loop import make_closed_loop
    from mppi_playground_tpu.models.racing_mpcc import calc_ref_trajectory

    path = env.racing_center_path

    def info_fn(cind, x):
        xref, new_cind = calc_ref_trajectory(x, path, cind, HORIZON)
        return {"reference_path": xref}, new_cind

    run = make_closed_loop(
        solver, lambda x, u: env.dynamics(x[None], u[None])[0],
        EPISODE_TICKS, info_fn=info_fn,
    )
    x0 = env.reset()
    st = solver.init()
    cind = jnp.asarray(0, jnp.int32)
    out = run(st, x0, cind)  # compile
    jax.block_until_ready(out[1])

    rates = []
    for _ in range(EPISODE_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(3):
            out = run(st, x0, cind)
        jax.block_until_ready(out[1])
        rates.append(3 * EPISODE_TICKS / (time.perf_counter() - t0))
    return statistics.median(rates), rates


def main() -> None:
    env, solver, tick = build()
    on_tpu = jax.default_backend() == "tpu"
    # CPU sanity runs use one short window (a flagship solve takes seconds
    # per tick off-accelerator); the recorded numbers come from TPU runs.
    windows = WINDOWS if on_tpu else 1
    iters = ITERS if on_tpu else 3
    # off-accelerator this is a sanity number, not a timing: one warmup
    # tick triggers compilation, no need for the steady-state ramp
    warmup = WARMUP if on_tpu else 1

    host_driven, rates = measure_host_driven(
        env, solver, tick, windows, iters, warmup=warmup
    )
    # which serving mode `value` reports — the amortized-episode leg
    # upgrades this when it succeeds (BENCH_r03 -> r04 changed the
    # headline's definition; this field makes the artifact self-describing
    # so cross-round `value` diffs cannot silently compare modes)
    value_mode = "host_driven"

    extra = {
        "host_driven_solves_per_s": round(host_driven, 3),
        "host_driven_solve_ms": round(1000.0 / host_driven, 3),
        "host_driven_windows": [round(r, 1) for r in rates],
        "device": str(jax.devices()[0]),
        "backend": jax.default_backend(),
    }
    # The headline is the amortized-episode rate (drift-proof through the
    # tunnel); if that leg fails the host-driven rate is the fallback so
    # the bench always reports something.
    solves_per_s = host_driven
    if on_tpu:
        # the optional phases are individually guarded: the headline
        # host-driven number must survive a failure in any of them.
        # The sync-floor probe brackets the synced loop (before + after)
        # because the tunnel's round-trip latency drifts across a session;
        # a single post-hoc probe on a warmed connection can under-
        # represent what the synced loop actually paid.
        sync_probes = []
        try:
            sync_probes.append(measure_sync_floor())
        except Exception as exc:  # noqa: BLE001 — probe is advisory
            extra["tunnel_sync_pre_note"] = f"pre-probe failed: {type(exc).__name__}"
        try:
            synced, _ = measure_host_driven(
                env, solver, tick, 3, ITERS, sync_every_tick=True
            )
            extra["host_synced_solves_per_s"] = round(synced, 1)
        except Exception as exc:  # noqa: BLE001 — headline must survive
            extra["host_synced_note"] = f"synced bench failed: {type(exc).__name__}"
        try:
            sync_probes.append(measure_sync_floor())
        except Exception as exc:  # noqa: BLE001 — probe is advisory
            extra["tunnel_sync_post_note"] = f"post-probe failed: {type(exc).__name__}"
        if sync_probes:
            extra["tunnel_sync_ms"] = round(statistics.median(sync_probes), 3)
            extra["tunnel_sync_ms_probes"] = [round(p, 3) for p in sync_probes]
        try:
            pipelined, _ = measure_host_pipelined(
                env, solver, tick, 3, ITERS, warmup=warmup
            )
            extra["host_synced_pipelined_solves_per_s"] = round(pipelined, 1)
            extra["pipeline_depth"] = PIPELINE_DEPTH
        except Exception as exc:  # noqa: BLE001 — headline must survive
            extra["pipelined_note"] = (
                f"pipelined bench failed: {type(exc).__name__}"
            )
        try:
            amortized, amortized_windows = measure_amortized(env, solver)
            extra["amortized_solves_per_s"] = round(amortized, 1)
            extra["amortized_solve_ms"] = round(1000.0 / amortized, 3)
            extra["amortized_windows"] = [
                round(r, 1) for r in amortized_windows
            ]
            solves_per_s = amortized  # the drift-proof headline
            value_mode = "amortized_episode"
        except Exception as exc:  # noqa: BLE001 — headline must survive
            extra["amortized_note"] = (
                f"episode bench failed: {type(exc).__name__}; "
                f"value falls back to the host-driven rate"
            )
        # fleet-episode serving mode at the reference racing workload
        # (benchmarks/fleet.py). Works here because the tunnel backend
        # admits a second client process; on exclusive-access libtpu
        # setups this records the failure note instead.
        try:
            import subprocess

            # 900 s: a cold fleet compile through the tunnel is ~30-60 s
            # per program plus env build; with the persistent compilation
            # cache (shared via .jax_cache) warm runs finish in ~2 min.
            out = subprocess.run(
                [sys.executable, "benchmarks/fleet.py", "--batch", "8"],
                capture_output=True, text=True, timeout=900, cwd=_REPO,
            )
            lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
            if lines:
                extra["fleet_b8_total_solves_per_s"] = json.loads(lines[-1])["value"]
            else:
                extra["fleet_note"] = f"fleet bench produced no output (rc={out.returncode})"
        except Exception as exc:  # noqa: BLE001 — headline must survive
            extra["fleet_note"] = f"fleet bench failed: {type(exc).__name__}"
        # device-side truth: the scanned kernel/tick times (isolated
        # dispatches through the tunnel are host-marshaling bound, so the
        # headline host-driven number understates the device; see
        # benchmarks/kernel_fraction.py)
        try:
            import subprocess

            out = subprocess.run(
                [sys.executable, "benchmarks/kernel_fraction.py"],
                capture_output=True, text=True, timeout=900, cwd=_REPO,
            )
            for ln in out.stdout.splitlines():
                if not ln.startswith("{"):
                    continue
                d = json.loads(ln)
                if d.get("metric") == "flagship_kernel_fraction":
                    extra["device_kernel_fraction"] = d["value"]
                    extra["device_kernel_ms"] = d["extra"]["kernel_ms"]
                    extra["device_tick_ms"] = d["extra"]["tick_ms"]
                    extra["device_essps_tick_ms"] = d["extra"]["essps_tick_ms"]
            if "device_tick_ms" not in extra:
                extra["device_note"] = (
                    f"kernel-fraction bench produced no summary "
                    f"(rc={out.returncode})"
                )
        except Exception as exc:  # noqa: BLE001 — headline must survive
            extra["device_note"] = f"kernel-fraction bench failed: {type(exc).__name__}"
    extra["value_mode"] = value_mode
    result = {
        "metric": f"racing_mppi_solves_per_s_h{HORIZON}_k{NUM_SAMPLES}",
        "value": round(solves_per_s, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / TARGET_SOLVES_PER_S, 4),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
