"""utils/timing.py: SolveTimer, time_fn, profile_trace smoke coverage."""

import os

import jax
import jax.numpy as jnp

from mppi_playground_tpu.utils.timing import SolveTimer, profile_trace, time_fn


def test_solve_timer_reference_style_reporting():
    t = SolveTimer()
    with t.measure(result_fn=lambda: jnp.ones(4) * 2.0):
        x = jnp.ones(4) * 2.0  # noqa: F841
    t.add(0.002)
    assert len(t.times) == 2
    assert t.average_ms > 0
    assert "average solve time" in t.summary()


def test_time_fn_sync_correct_stats():
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    stats = time_fn(f, x, warmup=1, iters=5)
    assert stats["mean_s"] > 0
    assert stats["p95_s"] >= stats["p50_s"] > 0
    assert abs(stats["per_s"] * stats["mean_s"] - 1.0) < 1e-6


def test_profile_trace_writes_artifacts(tmp_path):
    log_dir = str(tmp_path / "trace")
    with profile_trace(log_dir) as d:
        jax.block_until_ready(jnp.ones(8) + 1)
    assert d == log_dir
    assert os.path.isdir(log_dir) and os.listdir(log_dir)
