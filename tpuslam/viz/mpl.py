"""Native plotting frontend (the reference's GR window, matplotlib here).

Behavioral spec: sim/gr-draw.jl + sim/run-ekfsim.jl — scene axes/map,
waypoints, true landmarks, true & SLAM paths, vehicle glyph, SLAM landmark
estimates, 2-sigma vehicle / landmark covariance ellipses, lidar beams.

Works headless (Agg) for frame capture and interactively when a display
exists.  Like the reference (run-ekfsim.jl:13-29) it is just another
monitor over the engine's per-epoch telemetry.
"""

from __future__ import annotations

import numpy as np


class ScenePlotter:
    """Draw the full SLAM scene; ref gr-draw.jl:4-152.

    `live=True` asks for an interactive window redrawn per epoch — the
    reference's real-time GR window (gr-draw.jl:17-23 init_plot_window +
    run-ekfsim.jl:13-29 per-tick monitor).  Falls back to headless Agg
    (and reports it via `.live`) when no display/GUI backend exists, so
    the same script works on a workstation and in CI."""

    def __init__(self, boundaries, waypoints, landmarks, figsize=6.0,
                 live=False):
        import matplotlib

        self.live = False
        if live:
            try:
                import os as _os

                if _os.environ.get("DISPLAY") or _os.environ.get(
                        "WAYLAND_DISPLAY"):
                    for backend in ("QtAgg", "TkAgg", "GTK3Agg"):
                        try:
                            matplotlib.use(backend, force=True)
                            self.live = True
                            break
                        except Exception:
                            continue
            except Exception:
                pass
        if not self.live:
            matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        self.plt = plt
        if self.live:
            plt.ion()
        self.fig, self.ax = plt.subplots(
            figsize=(figsize, figsize), dpi=100
        )
        xmin, xmax, ymin, ymax = boundaries
        self.ax.set_xlim(xmin, xmax)
        self.ax.set_ylim(ymin, ymax)
        self.ax.set_aspect("equal")
        self.ax.set_title("tpu-slam")

        # Static scene (ref draw_map/landmarks/waypoints, gr-draw.jl:26-61).
        wp = np.asarray(waypoints)
        lm = np.asarray(landmarks)
        self.ax.plot(wp[:, 0], wp[:, 1], "o", ms=4, color="#4d5766",
                     label="waypoints")
        self.ax.plot(lm[:, 0], lm[:, 1], "s", ms=6, mfc="none",
                     color="#8899aa", label="landmarks")

        (self.true_line,) = self.ax.plot([], [], "-", lw=1.2,
                                         color="#3a78d8", label="true")
        (self.slam_line,) = self.ax.plot([], [], "-", lw=1.2,
                                         color="#2fae62", label="slam")
        (self.est_lm,) = self.ax.plot([], [], "*", ms=7, color="#d957b0",
                                      label="slam landmarks")
        self.lidar_lines = []
        self.ellipse_lines = []
        self.vehicle_patch = None
        self.ax.legend(loc="upper right", fontsize=7)

    def update(self, true_track, slam_track, state=None, lidar=None):
        """Redraw dynamic layers.

        true_track/slam_track: (T, 3); state: EKFState (for landmark
        estimates + ellipses); lidar: (nz, 4) beam segments.
        """
        from tpuslam.core.ellipse import compute_landmark_ellipses, ellipse

        tt = np.asarray(true_track)
        st_ = np.asarray(slam_track)
        self.true_line.set_data(tt[:, 0], tt[:, 1])
        self.slam_line.set_data(st_[:, 0], st_[:, 1])

        for coll in self.lidar_lines + self.ellipse_lines:
            coll.remove()
        self.lidar_lines, self.ellipse_lines = [], []
        if self.vehicle_patch is not None:
            self.vehicle_patch.remove()
            self.vehicle_patch = None

        if lidar is not None and len(lidar):
            seg = np.asarray(lidar)
            for s in seg:
                (ln,) = self.ax.plot([s[0], s[2]], [s[1], s[3]], "-",
                                     lw=0.6, color="#d8a435", alpha=0.8)
                self.lidar_lines.append(ln)

        if state is not None:
            n = int(state.n)
            x = np.asarray(state.x)
            P = np.asarray(state.P)
            if n > 0:
                feats = x[3:3 + 2 * n].reshape(-1, 2)
                self.est_lm.set_data(feats[:, 0], feats[:, 1])
                ell = np.asarray(compute_landmark_ellipses(state))[:n]
                for e in ell:
                    (ln,) = self.ax.plot(e[:, 0], e[:, 1], "-", lw=0.7,
                                         color="#d957b0", alpha=0.8)
                    self.ellipse_lines.append(ln)
            # Vehicle 2-sigma ellipse + triangle (ref gr-draw.jl:77-123).
            ve = np.asarray(ellipse(x[:2], P[:2, :2]))
            (ln,) = self.ax.plot(ve[:, 0], ve[:, 1], "-", lw=0.9,
                                 color="#2fae62")
            self.ellipse_lines.append(ln)
            tri = np.array([[1.5, 0], [-1.0, 0.75], [-1.0, -0.75]])
            c, s = np.cos(x[2]), np.sin(x[2])
            R = np.array([[c, -s], [s, c]])
            pts = tri @ R.T + x[:2]
            self.vehicle_patch = self.plt.Polygon(
                pts, closed=True, color="#2fae62"
            )
            self.ax.add_patch(self.vehicle_patch)

    def refresh(self, pause_s: float = 0.001):
        """Push the current frame to the live window (no-op headless)."""
        if not self.live:
            return
        self.fig.canvas.draw_idle()
        self.fig.canvas.flush_events()
        self.plt.pause(max(pause_s, 1e-4))

    def save(self, path: str):
        self.fig.savefig(path, bbox_inches="tight")

    def close(self):
        self.plt.close(self.fig)
