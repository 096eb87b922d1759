"""Analytic feature-map query: exact parity with the grid gather path.

The feature path (maps/feature_query.py) replaces the reference's occupancy
gather (obstacle_map_2d.py:168-200, lane_map_2d.py:90-122) with dense
integer geometry; these tests assert bit-exact agreement on every map the
framework builds, including out-of-bounds and cell-boundary points.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mppi_playground_tpu.maps.feature_query import build_feature_map, feature_cost
from mppi_playground_tpu.maps.grid_cost import grid_cost, map_query
from mppi_playground_tpu.maps.lane_map import LaneMap
from mppi_playground_tpu.maps.obstacle_map import ObstacleMap, generate_random_obstacles


def _assert_exact(device_map, feature_map, span, n=50_000, seed=0):
    key = jax.random.PRNGKey(seed)
    pts = jax.random.uniform(key, (n, 2), jnp.float32, -span, span)
    # include exact cell centers and boundaries
    grid_pts = (
        jnp.stack(
            jnp.meshgrid(
                jnp.linspace(-span, span, 101), jnp.linspace(-span, span, 101)
            ),
            axis=-1,
        ).reshape(-1, 2)
    )
    pts = jnp.concatenate([pts, grid_pts], axis=0)
    a = np.asarray(jax.jit(lambda p: grid_cost(device_map, p))(pts))
    b = np.asarray(jax.jit(lambda p: feature_cost(feature_map, p))(pts))
    np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def nav_map():
    m = ObstacleMap(map_size=(20, 20), cell_size=0.1)
    generate_random_obstacles(
        obstacle_map=m,
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
    return m


def test_obstacle_feature_map_verifies(nav_map):
    fm = nav_map.feature_map
    assert fm is not None, "reference-style obstacle map must verify analytically"
    assert fm.disc_x.shape[0] == 7
    assert fm.rect_x0.shape[0] == 7


def test_obstacle_feature_query_exact(nav_map):
    _assert_exact(nav_map.device_map, nav_map.feature_map, span=12.0)


def test_lane_feature_map_pruned_and_exact():
    theta = np.linspace(0, 2 * np.pi, 700, endpoint=False)
    lane = np.stack(
        [6.0 * np.cos(theta), 4.0 * np.sin(theta), np.zeros_like(theta)], axis=1
    )
    lm = LaneMap(lane=lane, lane_width=2.4, map_size=(20, 20), cell_size=0.1)
    fm = lm.feature_map
    assert fm is not None
    assert not fm.inside_is_blocked
    # pruning must shrink the feature set substantially
    assert fm.disc_x.shape[0] < len(lm._centerline_cells) * 0.7
    _assert_exact(lm.device_map, fm, span=12.0)


def test_map_query_dispatch(nav_map):
    pts = jnp.asarray([[0.0, 0.0], [100.0, 100.0]])
    via_grid = map_query(nav_map.device_map, pts)
    via_features = map_query(nav_map.feature_map, pts)
    np.testing.assert_array_equal(np.asarray(via_grid), np.asarray(via_features))
    assert float(via_grid[1]) == 1.0  # out-of-bounds costs 1.0 on both paths


def test_build_returns_none_on_mismatch():
    grid = np.zeros((64, 64))
    grid[10, 10] = 1  # a cell no feature explains
    fm = build_feature_map(
        grid,
        origin=np.array([32, 32]),
        cell_size=0.1,
        disc_centers=np.zeros((0, 2)),
        disc_r2=np.zeros((0,)),
    )
    assert fm is None
