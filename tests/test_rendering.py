"""Geometry / viz helper tests (reference: circuit_generator/utils.py:12-58
and the render machinery in navigation_2d.py:119-216).

These helpers are the C11 parity surface; everything runs on the Agg
backend so the suite stays headless.
"""

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest

from mppi_playground_tpu.envs.rendering import (
    circle,
    draw_predicted_trajectory,
    draw_top_samples,
    fig_to_rgb,
    plot_arrow,
    plot_robot,
    save_gif,
)


@pytest.fixture
def ax():
    fig, ax = plt.subplots()
    yield ax
    plt.close(fig)


def test_circle_points_lie_on_radius():
    xs, ys = circle(2.0, -1.0, size=0.5, steps=64)
    assert xs.shape == (64,) and ys.shape == (64,)
    r = np.hypot(xs - 2.0, ys + 1.0)
    np.testing.assert_allclose(r, 0.5, atol=1e-12)
    # closed arc: 0 and 360 degrees coincide (utils.py:12-23)
    np.testing.assert_allclose([xs[0], ys[0]], [xs[-1], ys[-1]], atol=1e-12)


def test_plot_arrow_adds_heading_arrow(ax):
    before = len(ax.patches)
    plot_arrow(ax, 1.0, 2.0, yaw=np.pi / 2, length=2.0)
    assert len(ax.patches) == before + 1
    # the arrow spans from the pose along the heading (+y for yaw=pi/2)
    verts = ax.patches[-1].get_verts()
    assert verts[:, 1].max() >= 3.9  # tip reaches y ~ 2 + length


def test_plot_robot_draws_rotated_footprint(ax):
    plot_robot(ax, 0.0, 0.0, yaw=np.pi / 2, robot_length=2.0, robot_width=1.0)
    (line,) = ax.lines
    xs, ys = line.get_data()
    assert len(xs) == 5  # closed rectangle outline (utils.py:43-58)
    # at yaw=90deg the length axis maps onto y, the width axis onto x
    np.testing.assert_allclose(np.max(np.abs(ys)), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.max(np.abs(xs)), 0.5, atol=1e-12)
    np.testing.assert_allclose([xs[0], ys[0]], [xs[-1], ys[-1]], atol=1e-12)


def test_draw_top_samples_alpha_scales_with_weight(ax):
    samples = np.zeros((3, 4, 2))
    samples[:, :, 0] = np.arange(4)
    draw_top_samples(ax, samples, np.array([1.0, 0.5, 0.01]))
    alphas = [line.get_alpha() for line in ax.lines]
    assert len(alphas) == 3
    assert alphas[0] == pytest.approx(0.7)  # max weight clamps at 0.7
    assert alphas[2] == pytest.approx(0.1)  # floor clamp (nav2d:157-171)
    assert alphas[0] > alphas[1] > alphas[2]


def test_draw_predicted_trajectory_marks_collisions(ax):
    traj = np.zeros((1, 5, 3))
    traj[0, :, 0] = np.arange(5)
    collisions = np.zeros((2, 5), dtype=bool)
    collisions[1, 3] = True
    draw_predicted_trajectory(ax, traj, collisions)
    colors = ax.collections[-1].get_facecolor()
    assert colors.shape[0] == 5
    red = matplotlib.colors.to_rgba("red")
    darkblue = matplotlib.colors.to_rgba("darkblue")
    np.testing.assert_allclose(colors[3], red)
    np.testing.assert_allclose(colors[0], darkblue)


def test_fig_to_rgb_and_save_gif_roundtrip(tmp_path):
    fig, ax = plt.subplots(figsize=(2, 2))
    ax.plot([0, 1], [0, 1])
    frame = fig_to_rgb(fig)
    plt.close(fig)
    assert frame.ndim == 3 and frame.shape[2] == 3 and frame.dtype == np.uint8

    path = os.path.join(tmp_path, "clip.gif")
    # identical consecutive frames get merged by the gif writer
    out = save_gif([frame, 255 - frame], path, fps=5)
    assert out == path and os.path.getsize(path) > 0
    import imageio.v2 as imageio

    clip = imageio.mimread(path)
    assert len(clip) == 2

    assert save_gif([], os.path.join(tmp_path, "empty.gif")) is None
