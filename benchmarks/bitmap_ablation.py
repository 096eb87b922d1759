"""Packed-bitmap map-query ablation vs the row-interval representation.

The round-3 review asked whether a structurally different map encoding —
each grid row as ``ceil(height/32)`` int32 words, query = word fetch +
bit test — beats the row-interval tables that cost ~46% of the flagship
kernel.  This harness builds that encoding for the racing maps, verifies
it bit-exact against the grids, and times ``costs_only`` kernel variants
(obstacle-only / lane-only / both) for bitmap vs interval under the same
scanned-dispatch methodology as ``benchmarks/ablate_kernel.py``.

Why the op-count model predicts a loss (measured numbers below decide):
Mosaic's only vectorized dynamic lookup is the 128-lane gather, so any
table is walked as broadcast-and-try over its non-lane dimensions.  The
interval table has ``slots x ceil(W/128)`` cells (racing: 63, trimmed to
40 by the build-time slot plan); the bitmap has ``ceil(H/32) x
ceil(W/128)`` cells (racing: 175), each needing a *two*-term select mask
``(group == g) & (word == w)``.  Build-time trimming of all-zero words
helps the sparse obstacle field but not the dense lane complement.

Run:  python benchmarks/bitmap_ablation.py   (TPU; prints JSON lines)
"""

from __future__ import annotations

import dataclasses
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mppi_playground_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

LANES = 128
WINDOWS = 5
REPS = 3
SCAN_N = 50
HORIZON = 50
SAMPLES = 100_000


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BitmapTable:
    """Occupancy grid as per-row packed 32-bit words.

    ``words`` is ``[ceil(H/32), ceil(W/128), 128]`` int32: bit ``iy & 31``
    of word ``(iy >> 5, ix >> 7, ix & 127)`` is cell ``(ix, iy)``.
    Padding rows (ix >= W) are fully blocked, matching the out-of-bounds
    cost of 1.0 like the interval tables.
    """

    words: jax.Array
    origin: tuple = dataclasses.field(metadata=dict(static=True))
    cell_size: float = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    # per-(word, group) plan: False = all-zero, skip the try entirely
    active: tuple = dataclasses.field(metadata=dict(static=True))


def build_bitmap_table(grid, origin, cell_size) -> BitmapTable:
    g = np.asarray(grid) != 0
    w, h = g.shape
    n_words = -(-h // 32)
    n_rows = -(-w // LANES) * LANES
    full = np.ones((n_rows, h), bool)
    full[:w] = g
    bits = np.zeros((n_rows, n_words), np.uint32)
    for b in range(h):
        bits[:, b >> 5] |= full[:, b].astype(np.uint32) << np.uint32(b & 31)
    words = bits.T.reshape(n_words, n_rows // LANES, LANES)
    active = tuple(
        tuple(bool(words[wd, gp].any()) for gp in range(n_rows // LANES))
        for wd in range(n_words)
    )
    return BitmapTable(
        words=jnp.asarray(words.astype(np.int32)),
        origin=(float(origin[0]), float(origin[1])),
        cell_size=float(cell_size),
        width=int(w),
        height=int(h),
        active=active,
    )


def bitmap_query(table: BitmapTable, px, py):
    """Occupancy cost at world points — same contract as interval_query."""
    ix = jnp.round(px / table.cell_size + table.origin[0])
    iy = jnp.round(py / table.cell_size + table.origin[1])
    oob = (ix < 0) | (ix >= table.width) | (iy < 0) | (iy >= table.height)
    ix = jnp.clip(ix, 0.0, float(table.width - 1)).astype(jnp.int32)
    iy = jnp.clip(iy, 0.0, float(table.height - 1)).astype(jnp.int32)
    group = ix >> 7
    lane = ix & (LANES - 1)
    word_idx = iy >> 5
    bit = iy & 31

    merged = jnp.zeros(lane.shape, jnp.int32)
    n_words, n_groups = table.words.shape[0], table.words.shape[1]
    for wd in range(n_words):
        for gp in range(n_groups):
            if not table.active[wd][gp]:
                continue
            row = jnp.broadcast_to(
                table.words[wd, gp : gp + 1, :], lane.shape
            )
            val = jnp.take_along_axis(row, lane, axis=1)
            merged = jnp.where((group == gp) & (word_idx == wd), val, merged)
    blocked = (jax.lax.shift_right_logical(merged, bit) & 1) > 0
    one = jnp.asarray(1.0, px.dtype)
    zero = jnp.asarray(0.0, px.dtype)
    return jnp.where(oob | blocked, one, zero)


def _verify(table: BitmapTable, grid) -> None:
    """Bit-exactness of the encoding vs the stored grid (all cells)."""
    g = np.asarray(grid) != 0
    w, h = g.shape
    words = np.asarray(table.words).reshape(table.words.shape[0], -1)
    for b in range(h):
        col = (words[b >> 5, :w] >> (b & 31)) & 1
        assert np.array_equal(col.astype(bool), g[:, b]), f"bit column {b}"


def _time_scan(make_kernel_call, seed0):
    from jax import lax

    def scan(seed):
        def body(carry, _):
            sd, acc = carry
            costs = make_kernel_call(sd)
            return (sd + 1 + (costs[0] > 1e30).astype(jnp.int32),
                    acc + costs[0]), None

        (sd, acc), _ = lax.scan(body, (seed, 0.0), None, length=SCAN_N)
        return acc

    fn = jax.jit(scan)
    out = fn(seed0)
    jax.block_until_ready(out)
    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(seed0)
        jax.block_until_ready(out)
        rates.append((time.perf_counter() - t0) / (REPS * SCAN_N))
    return statistics.median(rates) * 1e3


def main() -> None:
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.bicycle import make_dynamics_soa
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_racing_fused_task_from_env,
    )
    from mppi_playground_tpu.ops.fused_solve import FusedTask, make_fused_solve
    from mppi_playground_tpu.ops.row_intervals import interval_query

    env = RacingEnv()
    config = MPPIConfig(
        horizon=HORIZON, num_samples=SAMPLES, dim_state=4, dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.1), lambda_=1.0, store_rollouts=False,
    )
    base_task = make_racing_fused_task_from_env(env)
    x_lim = tuple(env.obstacle_map.x_lim)
    y_lim = tuple(env.obstacle_map.y_lim)

    obs_bm = build_bitmap_table(
        env.obstacle_map._map,
        env.obstacle_map._cell_map_origin,
        env.obstacle_map._cell_size,
    )
    lane_bm = build_bitmap_table(
        env.lane_map._map, env.lane_map._cell_map_origin,
        env.lane_map._cell_size,
    )
    _verify(obs_bm, env.obstacle_map._map)
    _verify(lane_bm, env.lane_map._map)
    n_active = {
        "obstacle": sum(sum(r) for r in obs_bm.active),
        "lane": sum(sum(r) for r in lane_bm.active),
    }
    print(json.dumps({
        "metric": "bitmap_active_cells", "value": None, "unit": "tries",
        "vs_baseline": None,
        "extra": {**n_active,
                  "total_cells": len(obs_bm.active) * len(obs_bm.active[0])},
    }))

    x0 = env.reset()
    path = env.racing_center_path
    xref, _ = jax.jit(
        lambda x, c: calc_ref_trajectory(x, path, c, HORIZON)
    )(x0, jnp.asarray(0, jnp.int32))
    info = {"reference_path": xref}
    lam = jnp.asarray(1.0, jnp.float32)
    seed = jnp.asarray(1234, jnp.int32)
    prev = jnp.zeros((HORIZON, 2), jnp.float32)
    dyn = make_dynamics_soa(x_lim=x_lim, y_lim=y_lim)

    def interval_cost(key):
        def cost(xs, us, ctx):
            x, y, _theta, _v = xs
            return 1e4 * interval_query(ctx["vmem"][key], x, y)
        return cost

    def bitmap_cost(key):
        def cost(xs, us, ctx):
            x, y, _theta, _v = xs
            return 1e4 * bitmap_query(ctx["vmem"][key], x, y)
        return cost

    def pair_cost(query):
        def cost(xs, us, ctx):
            x, y, _theta, _v = xs
            return 1e4 * (
                query(ctx["vmem"]["a"], x, y) + query(ctx["vmem"]["b"], x, y)
            )
        return cost

    variants = {
        "interval_obstacle": (
            interval_cost("t"), {"t": base_task.vmem_args["obstacle_table"]}),
        "bitmap_obstacle": (bitmap_cost("t"), {"t": obs_bm}),
        "interval_lane": (
            interval_cost("t"), {"t": base_task.vmem_args["lane_table"]}),
        "bitmap_lane": (bitmap_cost("t"), {"t": lane_bm}),
        "bitmap_both": (
            pair_cost(bitmap_query), {"a": obs_bm, "b": lane_bm}),
    }

    results = {}
    for name, (cost, vmem) in variants.items():
        task = FusedTask(
            dynamics_soa=dyn, stage_cost_soa=cost, vmem_args=vmem,
            smem_builder=base_task.smem_builder,
        )
        core = make_fused_solve(config, task)
        smem = task.smem_builder(info)

        def call(sd, core=core, smem=smem):
            (costs,) = core.run_kernel(x0, prev, lam, sd, smem, costs_only=True)
            return costs

        try:
            ms = _time_scan(call, seed)
        except Exception as exc:  # noqa: BLE001 — a variant that cannot
            # compile (e.g. the dense lane bitmap's 173-cell walk blows the
            # 16 MB scoped-VMEM limit) is itself an ablation result
            msg = str(exc)
            results[name] = (
                "vmem_oom" if "vmem" in msg.lower() else type(exc).__name__
            )
            print(json.dumps({"metric": f"bitmap_ablate_{name}_ms",
                              "value": None, "unit": "ms",
                              "vs_baseline": None,
                              "extra": {"failed": results[name]}}))
            continue
        results[name] = round(ms, 4)
        print(json.dumps({"metric": f"bitmap_ablate_{name}_ms",
                          "value": results[name], "unit": "ms",
                          "vs_baseline": None, "extra": {}}))

    bb = results.get("bitmap_both")
    print(json.dumps({
        "metric": "bitmap_ablate_summary",
        "value": bb if isinstance(bb, (int, float)) else None,
        "unit": "ms", "vs_baseline": None,
        "extra": {"device": str(jax.devices()[0]), **results, **n_active},
    }))


if __name__ == "__main__":
    main()
