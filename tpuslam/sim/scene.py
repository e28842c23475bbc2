"""Scene construction: waypoint courses and ground-truth landmark maps.

Host-side (NumPy) — runs once at setup, never inside the device loop.
Behavioral spec: reference sim/sim-utils.jl:1-6 (make_landmarks) and
sim/ekfslam-sim.jl:17-45 (ekfsim_setup).
"""

from __future__ import annotations

import numpy as np

from tpuslam.config import SceneConfig, COURSE1_PATH
from tpuslam.core.geometry import read_waypoints


def make_landmarks(cfg: SceneConfig, seed: int = 0) -> np.ndarray:
    """Random ground-truth landmark positions, (n_landmarks, 2).

    The reference (sim/sim-utils.jl:1-6) samples every coordinate iid from
    the *concatenated unit-stride ranges* [xmin+bx : xmax-bx ; ymin+by :
    ymax-by] — i.e. landmark coordinates are integers drawn from the union of
    the (margin-inset) x- and y-ranges.  `legacy_integer_landmarks=True`
    reproduces that; False gives continuous uniforms inside the same margins.
    """
    rng = np.random.default_rng(seed)
    bx = cfg.landmark_margin * (cfg.xmax - cfg.xmin)
    by = cfg.landmark_margin * (cfg.ymax - cfg.ymin)
    if cfg.legacy_integer_landmarks:
        pool = np.concatenate(
            [
                np.arange(np.ceil(cfg.xmin + bx), np.floor(cfg.xmax - bx) + 1),
                np.arange(np.ceil(cfg.ymin + by), np.floor(cfg.ymax - by) + 1),
            ]
        ).astype(np.float64)
        return rng.choice(pool, size=(cfg.n_landmarks, 2))
    x = rng.uniform(cfg.xmin + bx, cfg.xmax - bx, size=cfg.n_landmarks)
    y = rng.uniform(cfg.ymin + by, cfg.ymax - by, size=cfg.n_landmarks)
    return np.stack([x, y], axis=-1)


def load_course(path: str = COURSE1_PATH) -> np.ndarray:
    """(N, 2) waypoint array from a 2-column headered text file."""
    return read_waypoints(path)


def make_grid_course(
    extent: float, n_per_side: int = 5, inset: float = 0.15,
    perimeter_first: bool = False,
) -> np.ndarray:
    """Synthetic boustrophedon (lawnmower) course over a square scene —
    used by the large-scale benchmark configs, which need bigger scenes than
    course1's 100x100 m.

    `perimeter_first` prepends one full perimeter lap — the surveyor
    pattern.  A bare lawnmower pass only ever closes loops against the
    ADJACENT row (mapped moments earlier with nearly the same accumulated
    drift), so loop-closure corrections are relative and absolute drift
    random-walks with row count (measured: 20k-landmark 21-row single
    pass, online error 5.8 -> 37 m by run third despite per-closure
    alignment).  With the perimeter mapped first at low drift, every row
    END re-enters an early-mapped strip and the per-closure alignment
    gets an absolute correction twice per row."""
    lo, hi = inset * extent, (1.0 - inset) * extent
    pts = []
    if perimeter_first:
        pts += [[lo, lo], [hi, lo], [hi, hi], [lo, hi]]
    ys = np.linspace(lo, hi, n_per_side)
    for i, y in enumerate(ys):
        xs = [lo, hi] if i % 2 == 0 else [hi, lo]
        pts += [[x, y] for x in xs]
    return np.asarray(pts, dtype=np.float64)


def make_survey_course(extent: float, row_spacing: float = 40.0,
                       block: float = 280.0, inset: float = 0.05
                       ) -> np.ndarray:
    """Block-partitioned survey course: the field is tiled into square
    blocks of side <= `block`; each block is mapped as one perimeter lap
    followed by boustrophedon rows, blocks visited in boustrophedon
    order so every block after the first starts adjacent to an
    already-mapped edge strip.

    Why blocks: loop-closure registration can only absorb drift it can
    search (translation voting) — a SINGLE perimeter lap of a large
    field accrues drift ~1%% of its length plus heading error before it
    can first close (measured: 2880 m perimeter at 800 m extent ->
    ~30 m + ~5 deg at first closure, unregisterable, online ATE 346 m),
    while a ~280 m block's ~1.1 km loop closes at ~13 m drift, within a
    scaled vote radius (measured at 260 m extent: coverage 0.84).
    Bounding the unclosed-loop length by COURSE design is the standard
    surveying answer; global error then grows only as a random walk of
    per-block closure residuals."""
    lo, hi = inset * extent, (1.0 - inset) * extent
    usable = hi - lo
    nb = max(1, int(np.ceil(usable / block)))
    edges = np.linspace(lo, hi, nb + 1)
    pts = []
    for bj in range(nb):              # block rows, bottom-up
        y0, y1 = edges[bj], edges[bj + 1]
        cols = range(nb) if bj % 2 == 0 else range(nb - 1, -1, -1)
        for bi in cols:
            x0, x1 = edges[bi], edges[bi + 1]
            # Perimeter lap of the block (start at the corner nearest
            # the previous block's exit, which adjacency provides).
            pts += [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
            # Rows inside the block (skip y0: the perimeter covered it).
            n_rows = max(2, int(round((y1 - y0) / row_spacing)) + 1)
            ys = np.linspace(y0, y1, n_rows)[1:-1]
            for i, y in enumerate(ys):
                xs = [x0, x1] if i % 2 == 0 else [x1, x0]
                pts += [[x, y] for x in xs]
    return np.asarray(pts, dtype=np.float64)
