"""Device-side occupancy-grid cost query.

Behavioral reference: ``ObstacleMap.compute_cost`` / ``LaneMap.compute_cost``
(``/root/reference/src/envs/obstacle_map_2d.py:168-200``,
``lane_map_2d.py:90-122``): project positions to cells with
round-half-to-even, out-of-bounds points cost 1.0, in-bounds points gather
the grid value.

TPU-first: the grid lives on device as a pytree leaf (a
:class:`GridMapData`), the query is a pure function usable inside the jitted
solve, and the whole lookup is branchless (mask + clamp + gather).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridMapData:
    """Device-resident occupancy grid (a pytree; jit/shard friendly).

    Attributes:
        grid: ``[W, H]`` occupancy values (1.0 = blocked).
        origin: ``[2]`` cell coordinates of the world origin.
        cell_size: meters per cell (static metadata).
    """

    grid: jax.Array
    origin: jax.Array
    cell_size: float = dataclasses.field(metadata=dict(static=True))


def map_query(map_data, x: jnp.ndarray) -> jnp.ndarray:
    """Occupancy cost through either map representation.

    Dispatches on the pytree type: :class:`GridMapData` -> gather query,
    :class:`FeatureMapData` (maps/feature_query.py) -> gather-free analytic
    query.  Both return identical values; the feature path is ~50x faster
    on TPU because random gathers bypass the VPU/MXU entirely.
    """
    if isinstance(map_data, GridMapData):
        return grid_cost(map_data, x)
    from mppi_playground_tpu.maps.feature_query import feature_cost

    return feature_cost(map_data, x)


def grid_cost(map_data: GridMapData, x: jnp.ndarray) -> jnp.ndarray:
    """Occupancy cost of positions ``x [..., 2]`` -> ``[...]``.

    Matches obstacle_map_2d.py:168-200: round-to-nearest cell, clamp,
    gather; any out-of-bounds position costs 1.0.
    """
    grid = map_data.grid
    occ = jnp.round(x / map_data.cell_size + map_data.origin).astype(jnp.int32)
    ix, iy = occ[..., 0], occ[..., 1]
    out_of_bounds = (
        (ix < 0) | (ix >= grid.shape[0]) | (iy < 0) | (iy >= grid.shape[1])
    )
    ix = jnp.clip(ix, 0, grid.shape[0] - 1)
    iy = jnp.clip(iy, 0, grid.shape[1] - 1)
    values = grid[ix, iy]
    return jnp.where(out_of_bounds, jnp.asarray(1.0, grid.dtype), values)
