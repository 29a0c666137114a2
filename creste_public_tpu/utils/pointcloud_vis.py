"""Point-cloud / elevation-mesh visualisation.

Parity target: creste/utils/pointcloud_vis.py:101 (vispy interactive
LaserScanVis). vispy is not in this image, so the same drawing surface is
provided on matplotlib's 3-D backend: scatter point clouds colored by
height/intensity/label, elevation surface meshes, and BEV trajectory
overlays — renderable headless to PNG (the framework's debug-dump style,
SURVEY §4.1) or interactively when a display exists.
"""
from __future__ import annotations

import numpy as np


class PointCloudFigure:
    def __init__(self, figsize=(8, 8), elev: float = 35.0, azim: float = -60.0):
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        self.fig = plt.figure(figsize=figsize)
        self.ax = self.fig.add_subplot(projection="3d")
        self.ax.view_init(elev=elev, azim=azim)
        self._plt = plt

    def draw_points(
        self, points: np.ndarray, colors=None, color_by: str = "height",
        size: float = 1.0, max_points: int = 100_000, cmap: str = "turbo",
    ) -> "PointCloudFigure":
        """points [N, >=3]; colors: explicit RGB(A), per-point scalars, or
        None -> colour by ``color_by`` ('height' | 'intensity')."""
        pts = np.asarray(points)
        if len(pts) > max_points:
            idx = np.random.default_rng(0).choice(
                len(pts), max_points, replace=False
            )
            pts = pts[idx]
            if colors is not None and np.ndim(colors) >= 1 and len(colors) == len(points):
                colors = np.asarray(colors)[idx]
        if colors is None:
            scal = pts[:, 2] if color_by == "height" else (
                pts[:, 3] if pts.shape[1] > 3 else pts[:, 2]
            )
            self.ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=scal,
                            cmap=cmap, s=size)
        else:
            self.ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=colors, s=size)
        return self

    def draw_mesh_grid(
        self, height_map: np.ndarray, valid: np.ndarray | None = None,
        cell: float = 0.1, cmap: str = "viridis",
    ) -> "PointCloudFigure":
        """Elevation map [H, W] as a surface (NaN/invalid cells removed)."""
        H, W = height_map.shape
        ys, xs = np.mgrid[0:H, 0:W].astype(float) * cell
        z = np.asarray(height_map, float).copy()
        bad = ~np.isfinite(z)
        if valid is not None:
            bad |= ~np.asarray(valid, bool)
        z[bad] = np.nan
        self.ax.plot_surface(xs, ys, z, cmap=cmap, linewidth=0,
                             antialiased=False)
        return self

    def draw_trajectory(self, xyz: np.ndarray, color="red", lw: float = 2.0):
        xyz = np.asarray(xyz)
        z = xyz[:, 2] if xyz.shape[1] > 2 else np.zeros(len(xyz))
        self.ax.plot(xyz[:, 0], xyz[:, 1], z, color=color, linewidth=lw)
        return self

    def save(self, path: str) -> None:
        self.fig.savefig(path, bbox_inches="tight", dpi=120)
        self._plt.close(self.fig)

    def show(self) -> None:
        self._plt.show()


def render_scan(points: np.ndarray, path: str, **kwargs) -> None:
    """One-call scan render to PNG (the LaserScanVis quick path)."""
    PointCloudFigure().draw_points(points, **kwargs).save(path)
