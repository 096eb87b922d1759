"""Map/circuit construction parity against the actual reference code.

Builds the occupancy grids and the circuit path pipeline with BOTH the
upstream modules (read-only mount, host-side numpy) and ours, from
identical inputs, and asserts cell-for-cell / point-for-point agreement.
This pins the quirk-ledger items (rasterization round/ceil arithmetic,
seeded rejection-sampling draw order, EDT thresholding, CSV resampling)
that the cost-landscape parity of the navigation/racing tasks depends on.

Skipped when the reference mount is unavailable (public CI).
"""

import os
import sys

import numpy as np
import pytest

_REF = "/root/reference/src"
if not os.path.exists(os.path.join(_REF, "envs", "obstacle_map_2d.py")):
    pytest.skip("reference mount unavailable", allow_module_level=True)
pytest.importorskip("torch")
sys.path.insert(0, _REF)

from envs import obstacle_map_2d as ref_obstacle  # noqa: E402
from envs import lane_map_2d as ref_lane  # noqa: E402
from envs.circuit_generator import path_generate as ref_paths  # noqa: E402

from mppi_playground_tpu.maps.circuit import (  # noqa: E402
    make_csv_paths,
    make_side_lane,
)
from mppi_playground_tpu.maps.lane_map import LaneMap  # noqa: E402
from mppi_playground_tpu.maps.obstacle_map import (  # noqa: E402
    ObstacleMap,
    generate_random_obstacles,
)

_CSV = os.path.join(_REF, "envs", "circuit_generator", "circuit.csv")


def test_obstacle_grid_matches_reference_navigation_seed():
    """Navigation2D obstacle field (7 circles + 7 rects, seed 42)."""
    ref = ref_obstacle.ObstacleMap(map_size=(20, 20), cell_size=0.1, device="cpu")
    ref_obstacle.generate_random_obstacles(
        obstacle_map=ref,
        random_x_range=(-7.5, 7.5),
        random_y_range=(-7.5, 7.5),
        num_circle_obs=7,
        radius_range=(1, 1),
        num_rectangle_obs=7,
        width_range=(2, 2),
        height_range=(2, 2),
        max_iteration=1000,
        seed=42,
    )
    ours = ObstacleMap(map_size=(20, 20), cell_size=0.1)
    generate_random_obstacles(
        obstacle_map=ours,
        random_x_range=(-7.5, 7.5),
        random_y_range=(-7.5, 7.5),
        num_circle_obs=7,
        radius_range=(1, 1),
        num_rectangle_obs=7,
        width_range=(2, 2),
        height_range=(2, 2),
        max_iteration=1000,
        seed=42,
    )
    np.testing.assert_array_equal(np.asarray(ref._map), np.asarray(ours._map))


def test_circuit_path_pipeline_matches_reference():
    """CSV -> centered, resampled centerline + side lanes (path_generate)."""
    ref_center, ref_right, ref_left = ref_paths.make_csv_paths(_CSV, DL=0.1)
    our_center, our_right, our_left = make_csv_paths(_CSV, DL=0.1)
    np.testing.assert_allclose(our_center, ref_center, atol=1e-9)
    np.testing.assert_allclose(our_right, ref_right, atol=1e-9)
    np.testing.assert_allclose(our_left, ref_left, atol=1e-9)

    ref_r, ref_l = ref_paths.make_side_lane(ref_center, lane_width=6.5)
    our_r, our_l = make_side_lane(our_center, lane_width=6.5)
    np.testing.assert_allclose(our_r, ref_r, atol=1e-9)
    np.testing.assert_allclose(our_l, ref_l, atol=1e-9)


def test_lane_grid_matches_reference_on_circuit():
    """EDT corridor grid from the reference circuit centerline."""
    center, _, _ = ref_paths.make_csv_paths(_CSV, DL=0.1)
    ref = ref_lane.LaneMap(
        lane=center, lane_width=6.5 * 0.8, map_size=(80, 80), cell_size=0.1,
        device="cpu",
    )
    ours = LaneMap(
        lane=center, lane_width=6.5 * 0.8, map_size=(80, 80), cell_size=0.1
    )
    np.testing.assert_array_equal(np.asarray(ref._map), np.asarray(ours._map))


def test_racing_obstacle_grid_matches_reference_seed():
    """Racing obstacle field (50 circles in +-35, seed 42)."""
    kw = dict(
        random_x_range=(-35, 35),
        random_y_range=(-35, 35),
        num_circle_obs=50,
        radius_range=(0.9, 1.2),
        num_rectangle_obs=0,
        width_range=(1.5, 2.0),
        height_range=(1.5, 2.0),
        max_iteration=1000,
        seed=42,
    )
    ref = ref_obstacle.ObstacleMap(map_size=(80, 80), cell_size=0.1, device="cpu")
    ref_obstacle.generate_random_obstacles(obstacle_map=ref, **kw)
    ours = ObstacleMap(map_size=(80, 80), cell_size=0.1)
    generate_random_obstacles(obstacle_map=ours, **kw)
    np.testing.assert_array_equal(np.asarray(ref._map), np.asarray(ours._map))
