"""Drivable-corridor lane map via distance transform.

Behavioral reference: ``/root/reference/src/envs/lane_map_2d.py:13-126``:
rasterize the lane centerline into a ones-grid, apply
``scipy.ndimage.distance_transform_edt`` and threshold at half the lane
width -> 0 (drivable) / 1 (off-lane); queries use the shared grid gather.
"""

from __future__ import annotations

from math import ceil
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import distance_transform_edt

from mppi_playground_tpu.maps.grid_cost import GridMapData, grid_cost
from mppi_playground_tpu.maps.feature_query import FeatureMapData, build_feature_map


class LaneMap:
    """Lane-corridor occupancy grid (lane_map_2d.py:13-126)."""

    def __init__(
        self,
        lane: np.ndarray,
        lane_width: float,
        map_size: Tuple[int, int] = (20, 20),
        cell_size: float = 0.01,
        dtype=jnp.float32,
    ) -> None:
        """
        Args:
            lane: centerline ``[[x, y, angle], ...]``.
            lane_width: drivable width in meters.
            map_size: (width, height) in meters, origin at the center.
            cell_size: meters per cell.
        """
        assert lane_width > 0
        assert lane.ndim == 2 and lane.shape[1] == 3

        cell_map_dim = (ceil(map_size[0] / cell_size), ceil(map_size[1] / cell_size))
        self._cell_size = cell_size
        self._cell_map_origin = np.array(
            [cell_map_dim[0] // 2, cell_map_dim[1] // 2]
        )
        self._dtype = dtype
        self.x_lim = [-map_size[0] / 2, map_size[0] / 2]
        self.y_lim = [-map_size[1] / 2, map_size[1] / 2]

        # Rasterize centerline into a ones-grid (lane_map_2d.py:68-79)
        grid = np.ones(cell_map_dim)
        cells = (
            np.round(lane[:, :2] / cell_size).astype(int) + self._cell_map_origin
        )
        in_bounds = (
            (cells[:, 0] >= 0)
            & (cells[:, 0] < cell_map_dim[0])
            & (cells[:, 1] >= 0)
            & (cells[:, 1] < cell_map_dim[1])
        )
        cells = cells[in_bounds]
        grid[cells[:, 0], cells[:, 1]] = 0

        # EDT corridor threshold (lane_map_2d.py:81-83)
        distance_map = distance_transform_edt(grid)
        max_distance = (lane_width / 2) / cell_size
        self._map = np.where(distance_map <= max_distance, 0, 1)

        self._centerline_cells = np.unique(cells, axis=0)
        self._max_distance = max_distance
        self._device_map: Optional[GridMapData] = None
        self._feature_map: Optional[FeatureMapData] = None
        self._feature_map_built = False

    # ------------------------------------------------------------------
    @property
    def device_map(self) -> GridMapData:
        if self._device_map is None:
            self._device_map = GridMapData(
                grid=jnp.asarray(self._map, self._dtype),
                origin=jnp.asarray(self._cell_map_origin, self._dtype),
                cell_size=float(self._cell_size),
            )
        return self._device_map

    @property
    def feature_map(self) -> Optional[FeatureMapData]:
        """Gather-free analytic corridor query (see maps/feature_query.py).

        The EDT-threshold corridor equals the union of radius-``w`` disks
        on the rasterized centerline cells; redundant cells are pruned and
        the result is verified against the stored grid at build time.
        """
        if not self._feature_map_built:
            self._feature_map = build_feature_map(
                self._map,
                self._cell_map_origin,
                self._cell_size,
                self._centerline_cells,
                np.full(len(self._centerline_cells), self._max_distance**2),
                inside_is_blocked=False,
                prune=True,
                dtype=self._dtype,
            )
            self._feature_map_built = True
        return self._feature_map

    @property
    def row_interval_table(self):
        """Per-row interval encoding for in-kernel queries (ops/row_intervals)."""
        if getattr(self, "_row_interval_table", None) is None:
            from mppi_playground_tpu.ops.row_intervals import build_row_interval_table

            self._row_interval_table = build_row_interval_table(
                self._map, self._cell_map_origin, self._cell_size
            )
        return self._row_interval_table

    @property
    def cost_map(self):
        """Fastest exact query representation for hot cost loops.

        The analytic feature map when it reproduces the grid exactly,
        else the gather-backed grid.
        """
        fm = self.feature_map
        return fm if fm is not None else self.device_map

    def compute_cost(self, x: jnp.ndarray) -> jnp.ndarray:
        """Batched off-lane cost (lane_map_2d.py:90-122)."""
        return grid_cost(self.device_map, x)

    def render_occupancy(self, ax, cmap: str = "binary") -> None:
        extent = [self.x_lim[0], self.x_lim[1], self.y_lim[0], self.y_lim[1]]
        ax.imshow(self._map.T, cmap=cmap, origin="lower", extent=extent)
