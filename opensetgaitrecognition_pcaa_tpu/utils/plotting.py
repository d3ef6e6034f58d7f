"""Point-cloud visualization (reference ``plot_pointcloud``, ``utils.py:22-69``).

Torch-free: takes numpy/JAX arrays. Colors each point by its normalized
xyz position, same fixed axis limits and equal-aspect option as the
reference.
"""

from __future__ import annotations

import numpy as np


def plot_pointcloud(
    ax,
    point_cloud,
    title: str = "Title",
    show_axis: bool = True,
    aspect: str = "equal",
    point_dimension: int = 8,
) -> None:
    """Scatter a ``(n_points, ≥3)`` cloud on a 3-D Axes.

    :param ax: an Axes created with ``fig.add_subplot(..., projection="3d")``.
    """
    pc = np.asarray(point_cloud)
    xs, ys, zs = pc[:, 0], pc[:, 1], pc[:, 2]

    def _norm(v):
        v0 = v - v.min()
        rng = v0.max()
        return v0 / rng if rng > 0 else np.zeros_like(v0)

    cols = np.stack([_norm(xs), _norm(ys), _norm(zs)], axis=1)
    ax.scatter(xs, ys, zs, c=cols, s=point_dimension)
    ax.set_xlim3d(-20, 20)
    ax.set_ylim3d(-10, 10)
    ax.set_zlim3d(-10, 10)

    if aspect == "equal":
        ax.set_box_aspect((np.ptp(xs), np.ptp(zs), np.ptp(ys)))
    if not show_axis:
        ax.set_axis_off()
    ax.set_title(title)
