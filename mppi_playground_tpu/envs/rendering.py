"""Shared matplotlib/gif rendering utilities for the environments.

Behavioral reference: the render/close machinery duplicated across the
reference environments (``/root/reference/src/envs/navigation_2d.py:119-216``,
``racing_env.py:165-325``): top-k sample trajectories drawn with
weight-proportional alpha, collision-colored predicted trajectory, human
(interactive pause) vs rgb_array (frame capture) modes, and gif export on
close (the reference uses moviepy; we use imageio, which is available in
this image).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def fig_to_rgb(fig) -> np.ndarray:
    """Rasterize a matplotlib figure to an RGB uint8 array."""
    fig.canvas.draw()
    # buffer_rgba carries its own (physical-pixel) shape — never pair it
    # with logical get_width_height(), which differs on HiDPI backends
    buf = np.asarray(fig.canvas.buffer_rgba(), dtype=np.uint8)
    return buf[..., :3].copy()


def draw_top_samples(ax, top_samples, top_weights) -> None:
    """Weight-alpha'd sample trajectories (navigation_2d.py:157-171)."""
    top_samples = np.asarray(top_samples)
    top_weights = np.asarray(top_weights)
    top_weights = 0.7 * top_weights / np.max(top_weights)
    top_weights = np.clip(top_weights, 0.1, 0.7)
    for i in range(top_samples.shape[0]):
        ax.plot(
            top_samples[i, :, 0],
            top_samples[i, :, 1],
            color="lightblue",
            alpha=float(top_weights[i]),
            zorder=1,
        )


def draw_predicted_trajectory(ax, predicted_trajectory, is_collisions=None) -> None:
    """Collision-colored nominal trajectory (navigation_2d.py:173-189)."""
    predicted_trajectory = np.asarray(predicted_trajectory)
    colors = np.array(["darkblue"] * predicted_trajectory.shape[1])
    if is_collisions is not None:
        is_collisions = np.any(np.asarray(is_collisions), axis=0)
        colors[is_collisions] = "red"
    ax.scatter(
        predicted_trajectory[0, :, 0],
        predicted_trajectory[0, :, 1],
        color=colors,
        marker="o",
        s=3,
        zorder=2,
    )


def save_gif(frames, path: str, fps: int = 10) -> Optional[str]:
    """Write captured frames as a gif (reference: moviepy, ours: imageio)."""
    if not frames:
        return None
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    import imageio.v2 as imageio

    # imageio >= 2.28 deprecated the fps= kwarg for gifs in favor of a
    # per-frame duration in milliseconds
    imageio.mimsave(path, frames, duration=1000.0 / fps)
    return path


# ----------------------------------------------------------------------
# Geometry / viz helpers (reference: circuit_generator/utils.py:12-58)
# ----------------------------------------------------------------------


def circle(x: float, y: float, size: float = 0.5, steps: int = 100):
    """Arc sample points of a circle (utils.py:12-23)."""
    deg = np.linspace(0.0, 360.0, steps)
    rad = np.deg2rad(deg)
    return x + size * np.cos(rad), y + size * np.sin(rad)


def plot_arrow(ax, x, y, yaw, length: float = 1.0, width: float = 0.5, fc="r", ec="k"):
    """Heading arrow at a pose (utils.py:26-40)."""
    ax.arrow(
        float(x),
        float(y),
        length * np.cos(yaw),
        length * np.sin(yaw),
        fc=fc,
        ec=ec,
        head_width=width,
        head_length=width,
    )


def plot_robot(ax, x, y, yaw, robot_length: float = 1.0, robot_width: float = 0.5):
    """Oriented rectangle footprint of a robot pose (utils.py:43-58)."""
    outline = np.array(
        [
            [-robot_length / 2, robot_length / 2, robot_length / 2,
             -robot_length / 2, -robot_length / 2],
            [robot_width / 2, robot_width / 2, -robot_width / 2,
             -robot_width / 2, robot_width / 2],
        ]
    )
    rot = np.array([[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]])
    outline = rot @ outline
    ax.plot(outline[0] + float(x), outline[1] + float(y), "-k")
