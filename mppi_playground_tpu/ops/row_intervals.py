"""Per-row interval encoding of occupancy grids for in-kernel queries.

Any 2D occupancy grid can be encoded row-by-row as a union of blocked
column intervals: ``blocked(ix, iy) = any_k( lo_k[ix] <= iy < hi_k[ix] )``.
Reference-style maps are extremely interval-sparse — the racing lane
corridor has <= 3 blocked intervals per row and the obstacle field <= 6
(``/root/reference/src/envs/lane_map_2d.py``, ``obstacle_map_2d.py``) — so
a full map query needs only ``2 * max_intervals`` values per point.

Why this representation: inside a Pallas kernel the interval tables are a
handful of 128-lane rows in VMEM, and the per-point row lookup is a
lane-gather per ``ceil(width/128)`` row group plus selects (~3 vector ops
per table slot per group; racing's 800-row maps need 7 groups,
navigation's 200-row maps 2).
That prices the whole two-map MPCC occupancy query at ~0.4 vector
instructions per rollout point, versus ~7 ns/point for an XLA HBM gather
(the reference's approach on GPU) or ~`num_features` multiply-adds for the
analytic disc test (maps/feature_query.py).  Exactness is structural: the
intervals are extracted from the stored grid itself, so the encoding is
bit-exact for *any* grid, not only geometric ones.

Host build: :func:`build_row_interval_table`.  In-kernel query:
:func:`interval_query` (also runs under jit outside Pallas for testing).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
SUBLANES = 8

# slot_plan codes (see RowIntervalTable.slot_plan)
PLAN_SKIP = 0
PLAN_UNIFORM = 1
PLAN_GATHER = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RowIntervalTable:
    """Blocked-interval tables for one occupancy grid.

    ``packed`` is ``[M, G, 128]`` with ``G = ceil(width / 128)`` row
    groups: slot ``k`` holds the k-th blocked interval ``[lo, hi)`` of
    grid row ``ix`` at group ``ix >> 7``, lane ``ix & 127``.  Unused
    slots are ``lo=hi=height`` (empty).  Rows beyond the grid (the
    padding up to the next 128 multiple) are fully blocked, matching the
    out-of-bounds cost of 1.0.
    """

    # Each slot packs one interval as lo * 2048 + hi — a single exact-f32
    # integer (< 2^24 for grids up to 2048 cells high / 8191 wide), so a
    # full interval costs ONE table lookup + a cheap floor/fma unpack
    # instead of two lookups.
    packed: jax.Array
    # origin/cell_size are static so in-kernel uses are scalar literals
    origin: tuple = dataclasses.field(metadata=dict(static=True))
    cell_size: float = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    # Per-(slot, group) lookup plan, computed at build time: PLAN_SKIP for
    # a 128-row group whose slot-k intervals are all empty (the merged
    # value is then the static empty constant — no gather, no select),
    # PLAN_UNIFORM when all 128 rows share one interval (broadcast a
    # scalar load instead of gathering), PLAN_GATHER otherwise.  On the
    # racing maps this trims the gather/select chains from 63 to 40 per
    # point block.  ``None`` (e.g. an old pickle) means all-gather.
    slot_plan: tuple = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    @property
    def max_intervals(self) -> int:
        return self.packed.shape[0]


def build_row_interval_table(
    grid: np.ndarray,
    origin: np.ndarray,
    cell_size: float,
    dtype=jnp.float32,
) -> RowIntervalTable:
    """Encode ``grid [W, H]`` (nonzero = blocked) as per-row intervals."""
    g = np.asarray(grid) != 0
    w, h = g.shape
    rows = []
    max_m = 1
    for r in range(w):
        padded = np.concatenate([[0], g[r].astype(np.int8), [0]])
        d = np.diff(padded)
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        rows.append((starts, ends))
        max_m = max(max_m, len(starts))

    assert h < 2048 and w < 8192, "packed interval encoding limits"
    # pad rows to LANES multiples only: the in-kernel lookup broadcasts
    # and tries each 128-row sublane group, so ceil(w/128) groups is the
    # query cost — padding to full [8,128] vregs would always pay 8
    # (racing 800 rows -> 7 groups; navigation 200 rows -> 2)
    n_table_rows = -(-w // LANES) * LANES
    lo = np.full((max_m, n_table_rows), float(h))
    hi = np.full((max_m, n_table_rows), float(h))
    for r, (starts, ends) in enumerate(rows):
        lo[: len(starts), r] = starts
        hi[: len(ends), r] = ends
    # padding rows (>= w) are fully blocked, like out-of-bounds queries
    lo[0, w:] = 0.0
    hi[0, w:] = float(h)

    packed = lo * 2048.0 + hi
    assert packed.max() < 2**24  # exact in f32
    shape = (max_m, n_table_rows // LANES, LANES)
    packed = packed.reshape(shape)
    empty = float(h) * 2048.0 + float(h)
    plan = []
    for k in range(max_m):
        row_plan = []
        for g in range(shape[1]):
            cell = packed[k, g]
            if np.all(cell == empty):
                row_plan.append(PLAN_SKIP)
            elif np.all(cell == cell[0]):
                row_plan.append(PLAN_UNIFORM)
            else:
                row_plan.append(PLAN_GATHER)
        plan.append(tuple(row_plan))
    return RowIntervalTable(
        packed=jnp.asarray(packed, dtype),
        origin=(float(origin[0]), float(origin[1])),
        cell_size=float(cell_size),
        width=int(w),
        height=int(h),
        slot_plan=tuple(plan),
    )


def _row_lookup(
    table_vreg: jnp.ndarray,
    group: jnp.ndarray,
    lane: jnp.ndarray,
    plan=None,
    empty: float | None = None,
):
    """Gather ``table_vreg[group[p], lane[p]]`` for a point block ``[8,128]``.

    ``table_vreg`` is ``[G, 128]`` (G <= 8 sublane groups).  Mosaic's
    dynamic lane-gather requires indices shaped like the operand, so each
    sublane group is broadcast and tried in turn — G gathers + selects,
    the cheapest full-crossbar lookup available on the VPU.

    ``plan`` (one slot's row of ``RowIntervalTable.slot_plan``) prunes the
    tries: PLAN_SKIP groups contribute the static ``empty`` constant
    without a gather or select, PLAN_UNIFORM groups broadcast one scalar
    load.  Exact by construction — the skipped/uniform values are what the
    gather would have returned.
    """
    n_groups = table_vreg.shape[0]
    if plan is None:
        plan = (PLAN_GATHER,) * n_groups
    lane = lane.astype(jnp.int32)
    # when any group is skipped, points in it must read the empty value
    out = (
        None
        if PLAN_SKIP not in plan
        else jnp.full(lane.shape, empty, table_vreg.dtype)
    )
    for grp in range(n_groups):
        if plan[grp] == PLAN_SKIP:
            continue
        if plan[grp] == PLAN_UNIFORM:
            val = jnp.broadcast_to(table_vreg[grp, 0], lane.shape)
        else:
            row = jnp.broadcast_to(table_vreg[grp : grp + 1, :], lane.shape)
            val = jnp.take_along_axis(row, lane, axis=1)
        out = val if out is None else jnp.where(group == grp, val, out)
    return out


def _query_indices(table: RowIntervalTable, px, py):
    """Shared index math: (oob mask, iy, sublane group, lane) per point."""
    # Divide (not multiply-by-reciprocal): the reference and grid_cost use
    # x / cell_size, and the f32 results differ at cell boundaries.
    ix = jnp.round(px / table.cell_size + table.origin[0])
    iy = jnp.round(py / table.cell_size + table.origin[1])
    oob = (ix < 0) | (ix >= table.width) | (iy < 0) | (iy >= table.height)
    ix = jnp.clip(ix, 0.0, float(table.width - 1))
    iy = jnp.clip(iy, 0.0, float(table.height - 1))

    ixi = ix.astype(jnp.int32)
    return oob, iy, ixi >> 7, ixi & (LANES - 1)


def _blocked(table: RowIntervalTable, iy, group, lane):
    """Interval-membership test for one table at shared indices."""
    empty = float(table.height) * 2048.0 + float(table.height)
    plan = table.slot_plan or ((None,) * table.max_intervals)
    blocked = jnp.zeros(iy.shape, bool)
    for k in range(table.max_intervals):
        if plan[k] is not None and all(c == PLAN_SKIP for c in plan[k]):
            continue
        p = _row_lookup(table.packed[k], group, lane, plan[k], empty)
        lo_k = jnp.floor(p * (1.0 / 2048.0))
        hi_k = p - lo_k * 2048.0
        blocked = blocked | ((iy >= lo_k) & (iy < hi_k))
    return blocked


def _to_lane_blocks(px, py):
    shape = px.shape
    total = int(np.prod(shape)) if shape else 1
    if len(shape) == 2 and shape[1] == LANES:
        return px, py, shape, total, True
    # flatten + pad to [R, 128] so the lane-gather shapes line up
    pad = (-total) % LANES
    px = jnp.concatenate([px.reshape(-1), jnp.zeros(pad, px.dtype)])
    py = jnp.concatenate([py.reshape(-1), jnp.zeros(pad, py.dtype)])
    return px.reshape(-1, LANES), py.reshape(-1, LANES), shape, total, False


def interval_query(
    table: RowIntervalTable, px: jnp.ndarray, py: jnp.ndarray
) -> jnp.ndarray:
    """Occupancy cost at world positions ``(px, py)`` (any 2D block shape).

    Equals ``grid_cost(grid_map, stack([px, py]))``: round to cell,
    out-of-bounds -> 1.0, else the cell's blocked bit via the row's
    interval tests.  Pure jnp — traces both under jit (tests) and inside
    Pallas kernels (production path).
    """
    px, py, shape, total, native = _to_lane_blocks(px, py)
    oob, iy, group, lane = _query_indices(table, px, py)
    blocked = _blocked(table, iy, group, lane)

    one = jnp.asarray(1.0, px.dtype)
    zero = jnp.asarray(0.0, px.dtype)
    cost = jnp.where(oob | blocked, one, zero)
    if native:
        return cost
    return cost.reshape(-1)[:total].reshape(shape)


def same_geometry(a: RowIntervalTable, b: RowIntervalTable) -> bool:
    """Whether two tables share origin/cell/extent (index math reusable)."""
    return (
        a.origin == b.origin
        and a.cell_size == b.cell_size
        and a.width == b.width
        and a.height == b.height
    )


def interval_query_pair(
    table_a: RowIntervalTable,
    table_b: RowIntervalTable,
    px: jnp.ndarray,
    py: jnp.ndarray,
) -> jnp.ndarray:
    """``interval_query(a, ...) + interval_query(b, ...)`` in one pass.

    For same-geometry tables (asserted) the round/clip/oob/group/lane
    index math — ~18 vector ops per point — is computed once and shared
    by both tables' slot loops.  Identical arithmetic to the two separate
    queries, so results are bit-equal (asserted in
    tests/test_fused_solve.py);
    used by the MPCC stage cost where the obstacle and lane grids cover
    the same raster.
    """
    assert same_geometry(table_a, table_b), (
        "interval_query_pair requires same-geometry tables; query "
        "separately otherwise"
    )
    px, py, shape, total, native = _to_lane_blocks(px, py)
    oob, iy, group, lane = _query_indices(table_a, px, py)
    blocked_a = _blocked(table_a, iy, group, lane)
    blocked_b = _blocked(table_b, iy, group, lane)

    one = jnp.asarray(1.0, px.dtype)
    zero = jnp.asarray(0.0, px.dtype)
    cost = jnp.where(oob | blocked_a, one, zero) + jnp.where(
        oob | blocked_b, one, zero
    )
    if native:
        return cost
    return cost.reshape(-1)[:total].reshape(shape)
