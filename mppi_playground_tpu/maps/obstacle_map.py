"""Occupancy-grid obstacle map with seeded random obstacle generation.

Behavioral reference: ``/root/reference/src/envs/obstacle_map_2d.py``:
centered grid of ``map_size / cell_size`` cells (``:52-101``), circle
rasterization with rounded centers (``:103-126``), rectangle rasterization
with ceil'd centers (``:128-162``), batched device-side cost query
(``:168-200``), and the seeded rejection-sampling obstacle generator
(``:235-345``).  The rasterization arithmetic (round vs ceil, clip bounds,
exclusive slice ends) and the ``np.random.default_rng(seed)`` draw order are
reproduced exactly so that a given seed yields the same cost landscape as
the reference — required for behavioral parity of the navigation/racing
tasks (SURVEY.md quirk ledger).

TPU-first split: map *construction* is one-time host-side numpy; map
*queries* run on device through :func:`maps.grid_cost.grid_cost` with the
grid as a pytree leaf inside the jitted solve.
"""

from __future__ import annotations

import dataclasses
from math import ceil
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from mppi_playground_tpu.maps.grid_cost import GridMapData, grid_cost
from mppi_playground_tpu.maps.feature_query import FeatureMapData, build_feature_map


@dataclasses.dataclass
class CircleObstacle:
    center: np.ndarray
    radius: float


@dataclasses.dataclass
class RectangleObstacle:
    """Axis-aligned rectangle (no rotation, as in the reference)."""

    center: np.ndarray
    width: float
    height: float


class ObstacleMap:
    """Centered occupancy grid (obstacle_map_2d.py:47-232)."""

    def __init__(
        self,
        map_size: Tuple[int, int] = (20, 20),
        cell_size: float = 0.01,
        dtype=jnp.float32,
    ) -> None:
        if len(map_size) != 2:
            raise ValueError("map_size must be (width, height) in meters")
        if cell_size <= 0:
            raise ValueError("cell_size must be positive (meters per cell)")
        # the grid is centered on the origin, so both extents must split
        # evenly into halves (obstacle_map_2d.py:52-55 carries the same
        # constraint implicitly through its x_lim/y_lim arithmetic)
        if map_size[0] % 2 != 0 or map_size[1] % 2 != 0:
            raise ValueError(
                f"map_size extents must be even (centered grid), got {map_size}"
            )

        cell_map_dim = (ceil(map_size[0] / cell_size), ceil(map_size[1] / cell_size))
        self._map = np.zeros(cell_map_dim)
        self._cell_size = cell_size
        self._cell_map_origin = np.array(
            [cell_map_dim[0] / 2, cell_map_dim[1] / 2]
        ).astype(int)
        self._dtype = dtype

        x_range = cell_size * cell_map_dim[0]
        y_range = cell_size * cell_map_dim[1]
        self.x_lim = [-x_range / 2, x_range / 2]
        self.y_lim = [-y_range / 2, y_range / 2]

        self.circle_obs_list: List[CircleObstacle] = []
        self.rectangle_obs_list: List[RectangleObstacle] = []
        self._device_map: Optional[GridMapData] = None
        self._feature_map: Optional[FeatureMapData] = None
        self._feature_map_built = False
        self._version = 0

    # ------------------------------------------------------------------
    def add_circle_obstacle(self, center: np.ndarray, radius: float) -> None:
        """Rasterize a disk (obstacle_map_2d.py:103-126): rounded center."""
        if len(center) != 2 or radius <= 0:
            raise ValueError(
                f"need a 2D center and positive radius, got center={center!r} "
                f"radius={radius!r}"
            )
        center_occ = np.round(center / self._cell_size + self._cell_map_origin).astype(int)
        radius_occ = ceil(radius / self._cell_size)

        offsets = np.arange(-radius_occ, radius_occ + 1)
        ii, jj = np.meshgrid(offsets, offsets, indexing="ij")
        inside = ii**2 + jj**2 <= radius_occ**2
        xs = np.clip(center_occ[0] + ii[inside], 0, self._map.shape[0] - 1)
        ys = np.clip(center_occ[1] + jj[inside], 0, self._map.shape[1] - 1)
        self._map[xs, ys] = 1

        self.circle_obs_list.append(CircleObstacle(np.asarray(center, float), radius))
        self._device_map = None
        self._feature_map_built = False
        self._row_interval_table = None
        self._version += 1

    def add_rectangle_obstacle(
        self, center: np.ndarray, width: float, height: float
    ) -> None:
        """Rasterize a rectangle (obstacle_map_2d.py:128-162): ceil'd center."""
        if len(center) != 2 or width <= 0 or height <= 0:
            raise ValueError(
                f"need a 2D center and positive width/height, got "
                f"center={center!r} width={width!r} height={height!r}"
            )
        center_occ = np.ceil(center / self._cell_size + self._cell_map_origin).astype(int)
        width_occ = ceil(width / self._cell_size)
        height_occ = ceil(height / self._cell_size)

        x_init = np.clip(center_occ[0] - ceil(width_occ / 2), 0, self._map.shape[0] - 1)
        x_end = np.clip(center_occ[0] + ceil(width_occ / 2), 0, self._map.shape[0] - 1)
        y_init = np.clip(center_occ[1] - ceil(height_occ / 2), 0, self._map.shape[1] - 1)
        y_end = np.clip(center_occ[1] + ceil(height_occ / 2), 0, self._map.shape[1] - 1)
        self._map[x_init:x_end, y_init:y_end] = 1

        self.rectangle_obs_list.append(
            RectangleObstacle(np.asarray(center, float), width, height)
        )
        self._device_map = None
        self._feature_map_built = False
        self._row_interval_table = None
        self._version += 1

    # ------------------------------------------------------------------
    @property
    def version(self) -> int:
        """Mutation counter, bumped by every ``add_*_obstacle`` call.

        Compiled consumers that bake the map's tables in as jit constants
        (e.g. ``RacingController``) compare this to detect a mutated map
        and rebuild, matching the reference controllers' live-map reads
        (racing.py:146-152) despite the XLA compilation model.
        """
        return self._version

    @property
    def device_map(self) -> GridMapData:
        """Upload-once device grid (the reference's convert_to_torch)."""
        if self._device_map is None:
            self._device_map = GridMapData(
                grid=jnp.asarray(self._map, self._dtype),
                origin=jnp.asarray(self._cell_map_origin, self._dtype),
                cell_size=float(self._cell_size),
            )
        return self._device_map

    @property
    def feature_map(self) -> Optional[FeatureMapData]:
        """Gather-free analytic query data (see maps/feature_query.py).

        Built from the obstacle list with the rasterizer's exact cell
        arithmetic and verified cell-for-cell against the stored grid;
        ``None`` when the grid cannot be reproduced analytically (e.g.
        clipped off-map rasterization), in which case callers keep the
        gather path.
        """
        if not self._feature_map_built:
            discs = np.array(
                [
                    np.round(c.center / self._cell_size + self._cell_map_origin)
                    for c in self.circle_obs_list
                ],
                np.int64,
            ).reshape(-1, 2)
            r2 = np.array(
                [ceil(c.radius / self._cell_size) ** 2 for c in self.circle_obs_list],
                np.float64,
            )
            rects = []
            for r in self.rectangle_obs_list:
                center_occ = np.ceil(
                    r.center / self._cell_size + self._cell_map_origin
                ).astype(int)
                w_occ = ceil(ceil(r.width / self._cell_size) / 2)
                h_occ = ceil(ceil(r.height / self._cell_size) / 2)
                rects.append(
                    [
                        np.clip(center_occ[0] - w_occ, 0, self._map.shape[0] - 1),
                        np.clip(center_occ[0] + w_occ, 0, self._map.shape[0] - 1),
                        np.clip(center_occ[1] - h_occ, 0, self._map.shape[1] - 1),
                        np.clip(center_occ[1] + h_occ, 0, self._map.shape[1] - 1),
                    ]
                )
            self._feature_map = build_feature_map(
                self._map,
                self._cell_map_origin,
                self._cell_size,
                discs,
                r2,
                rects=np.asarray(rects, np.int64).reshape(-1, 4),
                inside_is_blocked=True,
                prune=False,
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
        """Batched occupancy cost (obstacle_map_2d.py:168-200)."""
        return grid_cost(self.device_map, x)

    # ------------------------------------------------------------------
    def render_occupancy(self, ax, cmap: str = "binary") -> None:
        ax.imshow(self._map, cmap=cmap)

    def render(self, ax, zorder: int = 0) -> None:
        """Continuous-space rendering (obstacle_map_2d.py:205-232)."""
        from matplotlib import pyplot as plt

        ax.set_xlim(self.x_lim)
        ax.set_ylim(self.y_lim)
        ax.set_aspect("equal")
        for circle in self.circle_obs_list:
            ax.add_patch(
                plt.Circle(circle.center, circle.radius, color="gray", zorder=zorder)
            )
        for rect in self.rectangle_obs_list:
            ax.add_patch(
                plt.Rectangle(
                    rect.center - np.array([rect.width / 2, rect.height / 2]),
                    rect.width,
                    rect.height,
                    color="gray",
                    zorder=zorder,
                )
            )


def generate_random_obstacles(
    obstacle_map: ObstacleMap,
    random_x_range: Tuple[float, float],
    random_y_range: Tuple[float, float],
    num_circle_obs: int,
    radius_range: Tuple[float, float],
    num_rectangle_obs: int,
    width_range: Tuple[float, float],
    height_range: Tuple[float, float],
    max_iteration: int,
    seed: int,
) -> None:
    """Seeded rejection sampling of non-overlapping obstacles.

    Reproduces obstacle_map_2d.py:235-345 exactly (same
    ``np.random.default_rng`` draw order, same overlap predicates) so the
    same seed yields the same obstacle field as the reference environments.
    """
    rng = np.random.default_rng(seed)

    x_lo = max(random_x_range[0], obstacle_map.x_lim[0])
    x_hi = min(random_x_range[1], obstacle_map.x_lim[1])
    y_lo = max(random_y_range[0], obstacle_map.y_lim[0])
    y_hi = min(random_y_range[1], obstacle_map.y_lim[1])

    for _ in range(num_circle_obs):
        num_trial = 0
        while num_trial < max_iteration:
            center = np.array(
                [rng.uniform(x_lo, x_hi), rng.uniform(y_lo, y_hi)]
            )
            radius = rng.uniform(radius_range[0], radius_range[1])

            is_overlap = False
            for circle in obstacle_map.circle_obs_list:
                if np.linalg.norm(circle.center - center) <= circle.radius + radius:
                    is_overlap = True
            for rect in obstacle_map.rectangle_obs_list:
                dist = np.linalg.norm(rect.center - center)
                if dist <= rect.width / 2 + radius and dist <= rect.height / 2 + radius:
                    is_overlap = True

            if not is_overlap:
                break
            num_trial += 1
            if num_trial == max_iteration:
                raise RuntimeError(
                    "random obstacle placement failed: no non-overlapping spot "
                    f"found within {max_iteration} tries"
                )
        obstacle_map.add_circle_obstacle(center, radius)

    for _ in range(num_rectangle_obs):
        num_trial = 0
        while num_trial < max_iteration:
            center = np.array(
                [rng.uniform(x_lo, x_hi), rng.uniform(y_lo, y_hi)]
            )
            width = rng.uniform(width_range[0], width_range[1])
            height = rng.uniform(height_range[0], height_range[1])

            is_overlap = False
            for circle in obstacle_map.circle_obs_list:
                dist = np.linalg.norm(circle.center - center)
                if (
                    dist <= circle.radius + width / 2
                    and dist <= circle.radius + height / 2
                ):
                    is_overlap = True
            for rect in obstacle_map.rectangle_obs_list:
                dist = np.linalg.norm(rect.center - center)
                if (
                    dist <= rect.width / 2 + width / 2
                    and dist <= rect.height / 2 + height / 2
                ):
                    is_overlap = True

            if not is_overlap:
                break
            num_trial += 1
            if num_trial == max_iteration:
                raise RuntimeError(
                    "random obstacle placement failed: no non-overlapping spot "
                    f"found within {max_iteration} tries"
                )
        obstacle_map.add_rectangle_obstacle(center, width, height)
