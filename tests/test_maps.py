"""Cost-map construction and device-query semantics tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from mppi_playground_tpu.maps import (
    LaneMap,
    ObstacleMap,
    generate_random_obstacles,
    grid_cost,
)
from mppi_playground_tpu.maps.circuit import (
    default_circuit_paths,
    generate_circuit,
    interpolate_path,
    make_csv_paths,
    make_side_lane,
    write_circuit_csv,
)


# ---------------------------------------------------------------------------
# ObstacleMap
# ---------------------------------------------------------------------------

def test_circle_rasterization():
    m = ObstacleMap(map_size=(20, 20), cell_size=0.1)
    m.add_circle_obstacle(np.array([0.0, 0.0]), 1.0)
    # center occupied, outside the disk free
    assert float(m.compute_cost(jnp.asarray([[0.0, 0.0]]))[0]) == 1.0
    assert float(m.compute_cost(jnp.asarray([[0.0, 0.95]]))[0]) == 1.0
    assert float(m.compute_cost(jnp.asarray([[0.0, 2.0]]))[0]) == 0.0
    assert float(m.compute_cost(jnp.asarray([[3.0, 3.0]]))[0]) == 0.0


def test_map_argument_validation():
    """Constructor/obstacle validation raises ValueError (survives -O)."""
    with pytest.raises(ValueError, match="even"):
        ObstacleMap(map_size=(21, 20), cell_size=0.1)
    with pytest.raises(ValueError, match="cell_size"):
        ObstacleMap(map_size=(20, 20), cell_size=0.0)
    m = ObstacleMap(map_size=(20, 20), cell_size=0.1)
    with pytest.raises(ValueError, match="radius"):
        m.add_circle_obstacle(np.array([0.0, 0.0]), -1.0)
    with pytest.raises(ValueError, match="width"):
        m.add_rectangle_obstacle(np.array([0.0, 0.0]), 0.0, 1.0)


def test_rectangle_rasterization():
    m = ObstacleMap(map_size=(20, 20), cell_size=0.1)
    m.add_rectangle_obstacle(np.array([2.0, -1.0]), 2.0, 2.0)
    assert float(m.compute_cost(jnp.asarray([[2.0, -1.0]]))[0]) == 1.0
    assert float(m.compute_cost(jnp.asarray([[2.8, -1.0]]))[0]) == 1.0
    assert float(m.compute_cost(jnp.asarray([[4.0, -1.0]]))[0]) == 0.0


def test_out_of_bounds_costs_one():
    m = ObstacleMap(map_size=(20, 20), cell_size=0.1)
    costs = m.compute_cost(jnp.asarray([[100.0, 0.0], [0.0, -100.0], [0.0, 0.0]]))
    np.testing.assert_array_equal(np.asarray(costs), [1.0, 1.0, 0.0])


def test_grid_query_matches_manual_round_clamp_gather():
    """Device query reproduces round-half-to-even + clamp + gather + OOB=1."""
    m = ObstacleMap(map_size=(20, 20), cell_size=0.1)
    rng = np.random.default_rng(0)
    for _ in range(5):
        m.add_circle_obstacle(rng.uniform(-7, 7, size=2), rng.uniform(0.5, 1.5))
    pts = rng.uniform(-11, 11, size=(500, 2)).astype(np.float32)

    grid = m._map
    origin = m._cell_map_origin
    occ = np.round(pts / 0.1 + origin).astype(int)
    oob = (
        (occ[:, 0] < 0)
        | (occ[:, 0] >= grid.shape[0])
        | (occ[:, 1] < 0)
        | (occ[:, 1] >= grid.shape[1])
    )
    ix = np.clip(occ[:, 0], 0, grid.shape[0] - 1)
    iy = np.clip(occ[:, 1], 0, grid.shape[1] - 1)
    expected = grid[ix, iy].astype(np.float32)
    expected[oob] = 1.0

    ours = np.asarray(m.compute_cost(jnp.asarray(pts)))
    np.testing.assert_array_equal(ours, expected)


def test_generate_random_obstacles_seeded_and_nonoverlapping():
    m1 = ObstacleMap(map_size=(20, 20), cell_size=0.1)
    m2 = ObstacleMap(map_size=(20, 20), cell_size=0.1)
    for m in (m1, m2):
        generate_random_obstacles(
            m, (-7.5, 7.5), (-7.5, 7.5),
            num_circle_obs=7, radius_range=(1, 1),
            num_rectangle_obs=7, width_range=(2, 2), height_range=(2, 2),
            max_iteration=1000, seed=42,
        )
    np.testing.assert_array_equal(m1._map, m2._map)
    assert len(m1.circle_obs_list) == 7
    assert len(m1.rectangle_obs_list) == 7
    # circle/circle separation (the generator's rejection predicate)
    for i, a in enumerate(m1.circle_obs_list):
        for b in m1.circle_obs_list[i + 1:]:
            assert np.linalg.norm(a.center - b.center) > a.radius + b.radius
    # map is non-trivially filled
    occupancy = m1._map.mean()
    assert 0.02 < occupancy < 0.6


def test_different_seeds_differ():
    m1 = ObstacleMap(map_size=(20, 20), cell_size=0.1)
    m2 = ObstacleMap(map_size=(20, 20), cell_size=0.1)
    generate_random_obstacles(
        m1, (-7.5, 7.5), (-7.5, 7.5), 5, (1, 1), 0, (1, 1), (1, 1), 1000, seed=1
    )
    generate_random_obstacles(
        m2, (-7.5, 7.5), (-7.5, 7.5), 5, (1, 1), 0, (1, 1), (1, 1), 1000, seed=2
    )
    assert not np.array_equal(m1._map, m2._map)


# ---------------------------------------------------------------------------
# LaneMap
# ---------------------------------------------------------------------------

def test_lane_map_corridor():
    # straight horizontal lane through the origin
    xs = np.linspace(-8, 8, 400)
    lane = np.column_stack((xs, np.zeros_like(xs), np.zeros_like(xs)))
    lm = LaneMap(lane=lane, lane_width=2.0, map_size=(20, 20), cell_size=0.1)
    # on the centerline: drivable (cost 0)
    assert float(lm.compute_cost(jnp.asarray([[0.0, 0.0]]))[0]) == 0.0
    assert float(lm.compute_cost(jnp.asarray([[5.0, 0.5]]))[0]) == 0.0
    # beyond half-width: blocked
    assert float(lm.compute_cost(jnp.asarray([[0.0, 2.0]]))[0]) == 1.0
    # out of bounds: blocked
    assert float(lm.compute_cost(jnp.asarray([[50.0, 0.0]]))[0]) == 1.0


# ---------------------------------------------------------------------------
# Circuit pipeline
# ---------------------------------------------------------------------------

def test_interpolate_path_spacing():
    path = np.array([[0.0, 0.0], [10.0, 0.0]])
    out = interpolate_path(path, DL=0.1)
    # int(10.0 // 0.1) + 1 == 100 (binary-float quirk preserved from the
    # reference's interpolate_path, path_generate.py:143)
    assert out.shape == (100, 2)
    spacing = np.linalg.norm(np.diff(out, axis=0), axis=1)
    np.testing.assert_allclose(spacing, 10.0 / 99.0, rtol=1e-6)


def test_generate_circuit_properties():
    x, y, w_right, w_left = generate_circuit(seed=7)
    radius = np.hypot(x, y)
    assert radius.max() < 35.0  # fits the 80x80 map with margin
    assert radius.min() > 10.0
    assert np.all(w_right > 3.0) and np.all(w_left > 3.0)
    # open loop: start and goal distinct (racing goal check threshold is 1 m)
    assert np.hypot(x[0] - x[-1], y[0] - y[-1]) > 1.5


def test_csv_roundtrip(tmp_path):
    csv_file = write_circuit_csv(str(tmp_path / "circuit.csv"), seed=7)
    center_csv, right_csv, left_csv = make_csv_paths(csv_file)
    center_gen, right_gen, left_gen = default_circuit_paths(seed=7)
    np.testing.assert_allclose(center_csv, center_gen, atol=1e-8)
    np.testing.assert_allclose(right_csv, right_gen, atol=1e-8)
    np.testing.assert_allclose(left_csv, left_gen, atol=1e-8)


def test_center_path_resampled_and_angled():
    center, right, left = default_circuit_paths()
    assert center.shape[1] == 3
    spacing = np.linalg.norm(np.diff(center[:, :2], axis=0), axis=1)
    np.testing.assert_allclose(spacing, spacing.mean(), rtol=0.2)
    assert abs(spacing.mean() - 0.1) < 0.01
    # headings match forward differences
    diffs = np.diff(center[:, :2], axis=0)
    angles = np.arctan2(diffs[:, 1], diffs[:, 0])
    np.testing.assert_allclose(center[1:, 2], angles, atol=1e-9)


def test_make_side_lane_offsets():
    center, _, _ = default_circuit_paths()
    right, left = make_side_lane(center, lane_width=6.5)
    d_right = np.linalg.norm(right[:, :2] - center[:, :2], axis=1)
    d_left = np.linalg.norm(left[:, :2] - center[:, :2], axis=1)
    np.testing.assert_allclose(d_right, 3.25, rtol=1e-6)
    np.testing.assert_allclose(d_left, 3.25, rtol=1e-6)
