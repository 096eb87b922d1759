"""The driver-facing bench entry prints one parseable JSON line.

``bench.py`` is the artifact the round driver records (BENCH_r*.json);
a malformed or missing line loses the round's perf evidence, so the
schema is pinned here on the CPU path with shrunk shapes (the real
numbers come from TPU runs).
"""

import json

import bench


def test_bench_main_prints_one_json_line(capsys, monkeypatch):
    monkeypatch.setattr(bench, "NUM_SAMPLES", 512)
    monkeypatch.setattr(bench, "HORIZON", 10)
    monkeypatch.setattr(bench, "WARMUP", 1)

    bench.main()

    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one output line, got {lines}"
    d = json.loads(lines[0])
    assert d["metric"] == "racing_mppi_solves_per_s_h10_k512"
    assert d["unit"] == "solves/s"
    assert d["value"] > 0
    assert d["vs_baseline"] > 0
    extra = d["extra"]
    assert extra["host_driven_solves_per_s"] > 0
    assert extra["host_driven_solve_ms"] > 0
    assert len(extra["host_driven_windows"]) >= 1
    assert "backend" in extra and "device" in extra
    # the artifact must name which serving mode `value` reports
    # (VERDICT r4 weak item 6: the r03->r04 headline redefinition was
    # invisible in the JSON); on the CPU path the amortized leg is
    # skipped, so this pins the fallback mode
    assert extra["value_mode"] == "host_driven"


def test_host_synced_mode_measures_and_matches_schema(monkeypatch):
    """The TPU-only host-synced phase reuses measure_host_driven with
    sync_every_tick=True; pin that branch on the CPU path so a timing-loop
    edit cannot silently break the strict host-in-the-loop mode."""
    monkeypatch.setattr(bench, "NUM_SAMPLES", 512)
    monkeypatch.setattr(bench, "HORIZON", 10)

    env, solver, tick = bench.build()
    synced, rates = bench.measure_host_driven(
        env, solver, tick, windows=1, iters=2, warmup=1, sync_every_tick=True
    )
    assert synced > 0
    assert len(rates) == 1


def test_host_pipelined_mode_measures_and_matches_schema(monkeypatch):
    """The double-buffered real-time mode (async D2H, depth-queue) must
    drain its queue and produce a positive rate on the CPU path."""
    monkeypatch.setattr(bench, "NUM_SAMPLES", 512)
    monkeypatch.setattr(bench, "HORIZON", 10)

    env, solver, tick = bench.build()
    rate, rates = bench.measure_host_pipelined(
        env, solver, tick, windows=1, iters=6, depth=2, warmup=1
    )
    assert rate > 0
    assert len(rates) == 1


def test_sync_floor_probe_returns_positive_ms():
    """measure_sync_floor (recorded as extra.tunnel_sync_ms) times the pure
    dispatch+block round trip — the environmental floor the host-synced
    rate is attributed against."""
    ms = bench.measure_sync_floor(iters=3)
    assert ms > 0
