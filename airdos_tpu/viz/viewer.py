"""Offline map/trajectory viewer (reference: Viewer/MapDrawer/FrameDrawer,
Pangolin-based).  TPU rebuild keeps visualization entirely off the hot
path: state snapshots accumulate cheaply per frame; rendering happens via
matplotlib on demand (save_map_figure) or not at all.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

# per-track colormap in the spirit of Map.h:59-86
_TRACK_COLORS = np.array([
    [0.85, 0.32, 0.31], [0.13, 0.59, 0.95], [0.30, 0.69, 0.31],
    [0.96, 0.70, 0.10], [0.61, 0.35, 0.71], [0.00, 0.74, 0.83],
    [0.91, 0.12, 0.39], [0.55, 0.76, 0.29],
])


class Viewer:
    def __init__(self, slam_map, tracking):
        self.map = slam_map
        self.tracking = tracking
        self.poses = []          # camera centres over time
        self.frame_overlays = []

    def update(self, frame):
        self.poses.append(frame.Ow.copy())

    def close(self):
        pass

    # ---------------------------------------------------------------- io
    def save_map_figure(self, path: str, show_humans: bool = True,
                        optimized_only: bool = False):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from airdos_tpu.slam.map import BODY1, BODY2

        fig, ax = plt.subplots(figsize=(8, 8))
        pt = self.map.points
        live = pt.live_ids()
        if len(live):
            ax.scatter(pt.pos[live, 0], pt.pos[live, 2], s=1, c="#999999",
                       label="map points")
        if self.poses:
            P = np.asarray(self.poses)
            ax.plot(P[:, 0], P[:, 2], "-", c="#1565c0", lw=1.5, label="camera")
        kf_centers = np.asarray([kf.Ow for kf in self.map.kfs.values()
                                 if not kf.bad]) if self.map.kfs else None
        if kf_centers is not None and len(kf_centers):
            ax.scatter(kf_centers[:, 0], kf_centers[:, 2], s=12, c="#0d47a1",
                       marker="s", label="keyframes")
        if show_humans:
            for tid, traj in self.map.trajectories.items():
                if optimized_only and not traj.optimized:
                    continue
                col = _TRACK_COLORS[tid % len(_TRACK_COLORS)]
                centers = np.asarray([hp.joints_w[1] for hp in traj.poses])
                ax.plot(centers[:, 0], centers[:, 2], "-o", ms=2, lw=1,
                        color=col, label=f"human {tid}")
        ax.set_xlabel("x [m]")
        ax.set_ylabel("z [m]")
        ax.set_aspect("equal")
        ax.legend(loc="best", fontsize=8)
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
