"""Gather-free analytic occupancy queries (TPU fast path for grid maps).

The reference queries occupancy grids with a per-point gather
(``/root/reference/src/envs/obstacle_map_2d.py:168-200``,
``lane_map_2d.py:90-122``).  Random gathers are the single slowest
primitive on TPU (~7 ns/element through XLA — two maps x K=100k samples
x T=50 steps = 10M gathers ≈ 100 ms/solve), while the VPU/MXU sustain
teraops of dense arithmetic.  Both reference map families are *geometric*:

* obstacle maps are unions of rasterized disks/rectangles
  (obstacle_map_2d.py:103-162), and
* lane maps are an EDT-threshold corridor, i.e. the union of radius-w
  disks centered on the rasterized centerline cells (lane_map_2d.py:68-88).

So the grid lookup can be replaced by dense integer geometry on cell
coordinates — a broadcast distance test against a small feature set —
which is **bit-exact** w.r.t. the rasterized grid:

* all quantities are small integers held in f32 (cells < 2^11, squared
  distances < 2^21 « 2^24, the f32 exact-integer limit);
* the cell projection reuses the same round-half-even as the grid path;
* redundant corridor features are pruned host-side, and
  :func:`build_feature_map` *verifies* at build time that the analytic
  region reproduces the stored grid cell-for-cell, falling back to the
  gather path if it cannot (e.g. exotic hand-edited grids).

The query is a pure function of a :class:`FeatureMapData` pytree, usable
inside ``jit``/``lax.scan``/Pallas (it lowers to multiply-add + compare +
max-reduce, no gather), and is the default fast path for the solver's hot
cost loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FeatureMapData:
    """Analytic equivalent of one occupancy grid.

    ``inside_is_blocked=True`` models obstacle maps (occupied inside the
    feature union); ``False`` models corridor/lane maps (occupied outside
    the union of centerline disks).  All coordinates are in integer cell
    space, stored as f32.
    """

    disc_x: jax.Array  # [Nd] disc center cell x
    disc_y: jax.Array  # [Nd] disc center cell y
    disc_r2: jax.Array  # [Nd] squared cell radius (inclusive test)
    rect_x0: jax.Array  # [Nr] inclusive cell bounds
    rect_x1: jax.Array  # [Nr] exclusive
    rect_y0: jax.Array  # [Nr]
    rect_y1: jax.Array  # [Nr]
    origin: jax.Array  # [2] cell coordinates of the world origin
    cell_size: float = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    inside_is_blocked: bool = dataclasses.field(metadata=dict(static=True))


def feature_cost(fm: FeatureMapData, x: jnp.ndarray) -> jnp.ndarray:
    """Occupancy cost of positions ``x [..., 2]`` -> ``[...]``.

    Produces exactly the same values as ``grid_cost`` on the grid this
    feature map was built from: out-of-bounds -> 1.0, otherwise the cell's
    occupancy — computed by geometry instead of a gather.
    """
    cell = jnp.round(x / fm.cell_size + fm.origin)
    ix, iy = cell[..., 0], cell[..., 1]
    out_of_bounds = (ix < 0) | (ix >= fm.width) | (iy < 0) | (iy >= fm.height)
    # Out-of-bounds queries take the *clamped* cell in the grid path; the
    # result is overwritten by the OOB penalty either way, so clamping here
    # only needs to keep the arithmetic in the exact-integer range.
    ix = jnp.clip(ix, 0.0, fm.width - 1.0)
    iy = jnp.clip(iy, 0.0, fm.height - 1.0)

    inside = jnp.zeros(ix.shape, bool)
    if fm.disc_x.shape[0]:
        dx = ix[..., None] - fm.disc_x
        dy = iy[..., None] - fm.disc_y
        inside = jnp.any(dx * dx + dy * dy <= fm.disc_r2, axis=-1)
    if fm.rect_x0.shape[0]:
        in_rect = (
            (ix[..., None] >= fm.rect_x0)
            & (ix[..., None] < fm.rect_x1)
            & (iy[..., None] >= fm.rect_y0)
            & (iy[..., None] < fm.rect_y1)
        )
        inside = inside | jnp.any(in_rect, axis=-1)

    blocked = inside if fm.inside_is_blocked else ~inside
    one = jnp.asarray(1.0, x.dtype)
    zero = jnp.asarray(0.0, x.dtype)
    return jnp.where(out_of_bounds | blocked, one, zero)


# ----------------------------------------------------------------------
# Host-side construction
# ----------------------------------------------------------------------


def _prune_disc_features(
    centers: np.ndarray, r2: float, shape: tuple
) -> np.ndarray:
    """Select a small disc subset with the exact same lattice coverage.

    Lazy greedy max-cover: repeatedly pick the disc covering the most
    still-uncovered cells until the union equals the full region.  The
    query cost is linear in the feature count (a [points, features]
    distance reduction on the VPU), so every pruned feature is a direct
    hot-loop saving; corridor maps (feature spacing ~1 cell, radius ~26
    cells) typically shrink ~10x.
    """
    import heapq

    r = int(np.floor(np.sqrt(r2)))
    offs = np.arange(-r, r + 1)
    ii, jj = np.meshgrid(offs, offs, indexing="ij")
    disc_mask = (ii * ii + jj * jj) <= r2
    di, dj = ii[disc_mask], jj[disc_mask]

    flat_lists = []
    covered = np.zeros(shape[0] * shape[1], bool)
    for cx, cy in centers:
        xs = cx + di
        ys = cy + dj
        keep = (xs >= 0) & (xs < shape[0]) & (ys >= 0) & (ys < shape[1])
        flat = xs[keep] * shape[1] + ys[keep]
        flat_lists.append(flat)
        covered[flat] = True
    remaining = int(covered.sum())
    covered[:] = False

    heap = [(-len(f), idx) for idx, f in enumerate(flat_lists)]
    heapq.heapify(heap)
    selected = []
    while remaining > 0 and heap:
        neg_gain, idx = heapq.heappop(heap)
        gain = int((~covered[flat_lists[idx]]).sum())
        if gain == 0:
            continue
        if heap and gain < -heap[0][0]:  # stale score — reinsert (lazy greedy)
            heapq.heappush(heap, (-gain, idx))
            continue
        selected.append(idx)
        covered[flat_lists[idx]] = True
        remaining -= gain
    return centers[np.sort(selected)]


def _region_from_features(
    disc_centers: np.ndarray,
    disc_r2: np.ndarray,
    rects: np.ndarray,
    shape: tuple,
) -> np.ndarray:
    """Rebuild the lattice region covered by a feature set (verification)."""
    region = np.zeros(shape, bool)
    for (cx, cy), r2 in zip(disc_centers, disc_r2):
        r = int(np.floor(np.sqrt(r2)))
        offs = np.arange(-r, r + 1)
        ii, jj = np.meshgrid(offs, offs, indexing="ij")
        mask = (ii * ii + jj * jj) <= r2
        xs = cx + ii[mask]
        ys = cy + jj[mask]
        keep = (xs >= 0) & (xs < shape[0]) & (ys >= 0) & (ys < shape[1])
        region[xs[keep], ys[keep]] = True
    for x0, x1, y0, y1 in rects.astype(int):
        region[max(x0, 0) : max(x1, 0), max(y0, 0) : max(y1, 0)] = True
    return region


def build_feature_map(
    grid: np.ndarray,
    origin: np.ndarray,
    cell_size: float,
    disc_centers: np.ndarray,
    disc_r2: np.ndarray,
    rects: Optional[np.ndarray] = None,
    inside_is_blocked: bool = True,
    prune: bool = True,
    dtype=jnp.float32,
) -> Optional[FeatureMapData]:
    """Build + verify a :class:`FeatureMapData` from grid metadata.

    Args:
        grid: the stored occupancy grid ``[W, H]`` (ground truth).
        disc_centers: ``[Nd, 2]`` integer cell centers.
        disc_r2: ``[Nd]`` squared cell radii (inclusive membership test).
        rects: ``[Nr, 4]`` cell-space ``(x0, x1, y0, y1)``, end-exclusive.
        inside_is_blocked: True for obstacle maps, False for corridors.

    Returns:
        The verified feature map, or ``None`` if the analytic region does
        not reproduce ``grid`` exactly (caller keeps the gather path).
    """
    disc_centers = np.asarray(disc_centers, np.int64).reshape(-1, 2)
    # Squared distances between cells are integers, so flooring r^2 never
    # changes membership — and a floored r^2 < 2^24 is exact in f32, making
    # the device-side compare identical to this float64 verification.
    disc_r2 = np.floor(np.asarray(disc_r2, np.float64).reshape(-1))
    rects = (
        np.zeros((0, 4), np.int64)
        if rects is None
        else np.asarray(rects, np.int64).reshape(-1, 4)
    )

    if prune and len(disc_centers) and rects.shape[0] == 0 and (
        disc_r2 == disc_r2[0]
    ).all():
        disc_centers = _prune_disc_features(disc_centers, float(disc_r2[0]), grid.shape)
        disc_r2 = np.full(len(disc_centers), disc_r2[0])

    region = _region_from_features(disc_centers, disc_r2, rects, grid.shape)
    blocked = region if inside_is_blocked else ~region
    if not (blocked == (np.asarray(grid) != 0)).all():
        return None

    return FeatureMapData(
        disc_x=jnp.asarray(disc_centers[:, 0], dtype),
        disc_y=jnp.asarray(disc_centers[:, 1], dtype),
        disc_r2=jnp.asarray(disc_r2, dtype),
        rect_x0=jnp.asarray(rects[:, 0], dtype),
        rect_x1=jnp.asarray(rects[:, 1], dtype),
        rect_y0=jnp.asarray(rects[:, 2], dtype),
        rect_y1=jnp.asarray(rects[:, 3], dtype),
        origin=jnp.asarray(origin, dtype),
        cell_size=float(cell_size),
        width=int(grid.shape[0]),
        height=int(grid.shape[1]),
        inside_is_blocked=inside_is_blocked,
    )
