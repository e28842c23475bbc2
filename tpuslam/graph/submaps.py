"""Hierarchical submap EKF-SLAM — the unbounded-landmark (config 5)
architecture.

The dense joint covariance is the EKF's scaling wall: at 1M landmarks P is
(2e6)^2 * 4 B = 16 TB — no amount of sharding makes the O(n^2) per-update
covariance pass affordable.  The classical, provably-consistent escape is
*submapping* (Atlas / constrained local submap filter): run the full dense
EKF only over a bounded LOCAL map, and maintain global consistency with a
pose graph over submap anchor frames — which is exactly the batch-BA
machinery this package already scales to 1M landmarks (graph/ba_large.py,
82 ms/GN-iter measured on one chip).

Structure:

  * Each submap is a standard EKF-SLAM filter (the existing fused engine,
    filters/ + sim/) run in its OWN anchor frame: the filter restarts at
    pose (0,0,0) with P = 0, so per-update cost is O((2C)^2) for submap
    capacity C — independent of the total landmark count.  Because each
    local filter consumes disjoint measurement noise and starts with zero
    uncertainty, local maps are statistically independent (the CLSF
    argument), which is what makes the later join consistent.
  * Closing a submap (map filled past `close_frac`, checked between
    jit-compiled chunks — the same host-side recompile-tier pattern as
    state.grow_capacity) freezes its landmark means + 2x2 marginals and
    records the final local pose as the relative transform to the next
    anchor (with its 3x3 covariance).
  * The anchor graph is a BAProblem (graph/ba.py): anchors are pose
    nodes, consecutive-anchor transforms are odometry factors, and every
    submap landmark becomes a range-bearing observation factor from its
    anchor (a landmark at local (x, y) IS a (hypot, atan2) observation
    from the anchor pose — no new factor type needed).  Landmarks seen
    from several submaps are matched in the global frame (native C++ grid
    index, tpuslam_grid_match) and share one landmark node: those are the
    loop-closure constraints.
  * gauss_newton / the sharded + grid variants (ba_sharded.py,
    ba_large.py) then optimize anchors + global landmarks; the global map
    is each submap re-anchored at its optimized pose.

Approximations (documented, standard for submap methods): per-factor
noise is summarized by shared sqrt-information matrices (BAProblem keeps
one (3,3) odometry and one (2,2) observation whitener — we use the means
over submaps); within-submap landmark correlations beyond the marginals
are dropped at closure.  Both err toward conservative weighting of the
global solve, not the local filters.

Reference anchor: the reference caps out at ~35 landmarks in one dense
EKF (src/ekf.jl grows x/P dynamically); this layer is the TPU-native
answer to scaling that same filter math to unbounded maps.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np


# ---------------------------------------------------------------- SE(2)

def se2_compose(a, b):
    """a ⊕ b: pose b expressed in frame a, returned in a's parent frame."""
    ca, sa = np.cos(a[2]), np.sin(a[2])
    return np.array([
        a[0] + ca * b[0] - sa * b[1],
        a[1] + sa * b[0] + ca * b[1],
        _wrap(a[2] + b[2]),
    ])


def se2_transform_points(pose, pts_local):
    """(N, 2) points from `pose`'s frame to its parent frame."""
    c, s = np.cos(pose[2]), np.sin(pose[2])
    R = np.array([[c, -s], [s, c]])
    return pts_local @ R.T + pose[:2]


def _wrap(phi):
    return (phi + np.pi) % (2 * np.pi) - np.pi


def _se2_apply_to_pose(th, t, pose):
    """Apply a global-frame rigid correction (th, t) to an SE(2) pose."""
    c, s = np.cos(th), np.sin(th)
    return np.concatenate([
        np.array([c * pose[0] - s * pose[1],
                  s * pose[0] + c * pose[1]]) + t,
        [_wrap(pose[2] + th)],
    ])


def fit_se2(src, dst):
    """Least-squares SE(2) alignment: (theta, t) minimizing
    sum |R(theta) src_i + t - dst_i|^2 (2-D Kabsch/Procrustes, closed
    form).  Returns (theta, t (2,))."""
    src = np.asarray(src, np.float64).reshape(-1, 2)
    dst = np.asarray(dst, np.float64).reshape(-1, 2)
    ms, md = src.mean(0), dst.mean(0)
    u, v = src - ms, dst - md
    sin_acc = float((u[:, 0] * v[:, 1] - u[:, 1] * v[:, 0]).sum())
    cos_acc = float((u * v).sum())
    th = np.arctan2(sin_acc, cos_acc)
    c, s = np.cos(th), np.sin(th)
    R = np.array([[c, -s], [s, c]])
    return th, md - R @ ms


# ------------------------------------------------------------ containers

class ClosedSubmap(NamedTuple):
    """One frozen local map (all arrays are host-side NumPy)."""

    anchor0: np.ndarray    # (3,) global anchor estimate when OPENED
    lm_local: np.ndarray   # (n, 2) landmark means, anchor frame
    lm_cov: np.ndarray     # (n, 2, 2) landmark marginal covariances
    rel_pose: np.ndarray   # (3,) final local pose == transform to next anchor
    rel_cov: np.ndarray    # (3, 3) covariance of rel_pose


class SubmapRun(NamedTuple):
    submaps: list            # list[ClosedSubmap]
    slam_pose: np.ndarray    # (T, 3) ONLINE global pose estimate per tick
    true_pose: np.ndarray    # (T, 3)
    active: np.ndarray       # (T,) bool — course not yet finished
    anchors: np.ndarray      # (S, 3) dead-reckoned anchor chain (pre-BA)
    # Align-mode only: the ONLINE cross-submap associations.  gids[i] is
    # submap i's global landmark ids into online_table — recorded when
    # each submap was matched against the emerging map with relative
    # drift near zero.  Assembly should inherit these instead of
    # re-matching from scratch at final-anchor drift: the offline
    # re-match has a quality CLIFF once accumulated drift crosses the
    # match gate (measured 20k: online aligned-ATE 2.1 m yet re-matched
    # coverage 0.39 from ghost copies), while the online associations
    # were made under the gate by construction.
    online_gids: list | None = None
    online_table: np.ndarray | None = None


# ------------------------------------------------------------ the driver

class SubmapSLAM:
    """Host-side submap orchestrator around the jitted closed-loop engine.

    cfg.capacity is the LOCAL submap capacity C; per-update cost is
    O((2C)^2) regardless of how many landmarks the whole run maps.  Chunks
    of `chunk_epochs` epochs run as one compiled executable
    (sim.run_epochs_rng — static (cfg, n) so every chunk reuses it);
    closure decisions happen on host between chunks.
    """

    def __init__(self, cfg, close_frac: float = 0.75,
                 chunk_epochs: int = 8, dtype=None,
                 handover: bool = True, handover_inflate: float = 4.0,
                 online_ba: bool = True, match_radius: float = 3.0,
                 online_ba_iters: int = 8, adaptive_chunks: bool = True,
                 register_radius: float | None = 15.0,
                 online_mode: str | None = None,
                 refine_window: int = 48,
                 vote_topk: int = 1,
                 budget_vote_window: bool = False,
                 place_rec: bool = True,
                 reloc_gap: int = 3,
                 reloc_min_inliers: int = 18,
                 constel_bin: float = 0.25):
        import jax.numpy as jnp

        self.cfg = cfg
        self.close_frac = close_frac
        self.chunk_epochs = chunk_epochs
        self.dtype = dtype or jnp.float32
        # Online drift-correction mode at each closure:
        #   'ba'    — re-match + Gauss-Newton the whole anchor graph (cost
        #             grows with the run; can propagate corrections
        #             backward through the chain);
        #   'align' — rigid SE(2) registration of the just-closed submap
        #             against an incrementally-maintained global landmark
        #             table (align_submap_to_table): O(overlap) per
        #             closure, constant in run length — the at-scale mode;
        #   'none'  — dead-reckoned anchors (final BA only).
        if online_mode is None:
            online_mode = "ba" if online_ba else "none"
        assert online_mode in ("ba", "align", "none")
        self.online_mode = online_mode
        self._table = np.zeros((0, 2))
        # Which submap inserted each table row (loop-closure probe needs
        # the temporal split), the last submap with an absolute fix
        # (rubber-band distribution anchor), and the epoch count at that
        # fix (drift-budget gate for loop corrections).
        self._table_src = np.zeros(0, np.int64)
        self._online_gids: list = []
        self._last_fix = 0
        self._last_fix_done = 0
        self._last_align = 0
        self.align_min_epochs = int(
            os.environ.get("TPUSLAM_ALIGN_MIN_EPOCHS", "0"))
        # Online incremental anchor optimization: after each closure,
        # re-match + Gauss-Newton the anchor graph built so far and carry
        # the CORRECTED anchor into the next submap.  Without it the
        # anchor chain is pure submap-odometry — heading errors compound
        # until revisits drift past any match gate and loop closures
        # become unrecoverable (measured: online ATE 17 m vs 1.1 m
        # monolithic on a 600-landmark course).  With it, drift since the
        # last correction stays within `match_radius`, each revisit
        # closes the loop, and global error stays bounded — the standard
        # incremental pose-graph arrangement.
        self.online_ba = online_ba
        self.match_radius = match_radius
        self.online_ba_iters = online_ba_iters
        # Translation-voting registration window for cross-submap
        # matching (see match_submap_landmarks): closes loops whose drift
        # exceeds the landmark spacing.  None disables.
        self.register_radius = register_radius
        # adaptive_chunks=False pins every chunk to chunk_epochs (fixed
        # key schedule — deterministic-equivalence tests); True shrinks
        # chunks near closure so the filter never runs saturated.
        self.adaptive_chunks = adaptive_chunks
        # Per-closure diagnostics (host-side, appended by run()): dicts of
        # anchor-correction size / acceptance / table growth — what a
        # failed at-scale run needs for offline analysis.
        self.trace: list[dict] = []
        # Per-chunk (n_epochs, wall_s), filled by run(); verbose=True
        # prints a progress line every 200 chunks.
        self.chunk_wall: list[tuple[int, float]] = []
        self.verbose = False
        # Handover seeding: landmarks within sensor range of the closure
        # pose are copied into the new submap (re-anchored means, marginal
        # covariances inflated by `handover_inflate`, cross-covariances
        # dropped).  Two effects, both load-bearing at scale: the new
        # local filter re-observes known landmarks immediately instead of
        # re-mapping them (keeps local drift down through the
        # transition), and the shared landmarks appear in BOTH submaps'
        # factor sets, so after matching they constrain consecutive
        # anchors beyond the single odometry factor (the CLSF
        # shared-feature device).  The inflation keeps the information
        # reuse conservative.
        self.handover = handover
        self.handover_inflate = handover_inflate
        # At-closure GN polish window (submaps) — bounds the per-closure
        # refine cost independent of run length.  Env overrides for
        # at-scale attribution experiments: TPUSLAM_REFINE_WINDOW (int),
        # TPUSLAM_REFINE_GATE=off (disable the displacement gate).
        self.refine_window = int(
            os.environ.get("TPUSLAM_REFINE_WINDOW", refine_window))
        self.refine_gate = os.environ.get(
            "TPUSLAM_REFINE_GATE", "on") != "off"
        # Loop-probe vote options: topk>1 scores the k tallest vote
        # peaks at a tight gate instead of argmax-only (de-masks true
        # offsets that a denser alias out-votes); budget_vote_window
        # clamps the vote window to loop_budget(done).  The r4 20k A/B
        # measured top-k BETTER on both course families (survey coverage
        # 0.66 -> 0.81, RMSE 1.19 -> 0.78; lawnmower rescued outright),
        # so scripts/submap_scale_tpu.py defaults --vote-topk 6; the
        # library default stays 1 only to keep the small-course tests'
        # pinned behavior (at test densities the argmax probe is already
        # unambiguous).  budget_vote_window starves mid-run corrections
        # (measured at 20k AND 100k) and stays opt-in.
        self.vote_topk = vote_topk
        self.budget_vote_window = budget_vote_window
        # Drift-INDEPENDENT place recognition (VERDICT r4 task 1): a
        # constellation-hash relocalizer (graph/placerec.py) probed when
        # the windowed translation-vote loop probe finds nothing — the
        # measured 100k failure mode is drift random-walking past every
        # vote window that stays safe against aliases, and recognition
        # by local landmark GEOMETRY is immune to drift by construction.
        # Accepted relocs go through the same rubber-band + windowed-GN
        # application as voted loops, but their acceptance gate
        # (accept_reloc) carries NO drift budget: safety comes from
        # rigid-consistency RANSAC dominance + full-cloud tight-gate
        # verification against the temporally-old table segment.
        self.place_rec = place_rec
        self.reloc_gap = reloc_gap
        self.reloc_min_inliers = reloc_min_inliers
        # Triangle-hash bin [m].  0.25 is the validated 20k/100k value;
        # at 1M-landmark scale use 0.125 — bucket density (and so query
        # cost AND alias collisions) falls ~8x while the +-1-bin
        # tolerance still covers the ~0.15 m cross-pass position noise.
        self.constel_bin = constel_bin
        self._constel = None

    def run(self, waypoints, landmarks, n_epochs: int, key) -> SubmapRun:
        import jax
        import jax.numpy as jnp

        from tpuslam.filters.state import make_ekf_state
        from tpuslam.sim.simulator import init_sim_state, run_epochs_rng

        cfg, dtype = self.cfg, self.dtype
        # Reentrancy: a second run() on the same instance must not carry
        # ANY first-run state — a stale _last_align would suppress early
        # midrun aligns, and a stale table/gids would make the second run
        # match against the first run's map and return contaminated
        # online associations (advisor r4).
        self._last_align = 0
        self._online_gids: list = []
        self._table = np.zeros((0, 2))
        self._table_src = np.zeros(0, np.int64)
        self._last_fix = 0
        self._last_fix_done = 0
        self.trace = []
        if self.place_rec and self.online_mode == "align":
            from tpuslam.graph.placerec import ConstellationDB
            self._constel = ConstellationDB(bin_size=self.constel_bin)
        else:
            self._constel = None
        wp = jnp.asarray(waypoints, dtype)
        lm = jnp.asarray(landmarks, dtype)
        st = init_sim_state(cfg, wp, dtype=dtype)
        # Global frame of the whole run == frame of the first anchor; the
        # filter starts at the true pose (ref ekfslam-sim.jl:42), so
        # anchor_0 is the initial pose and the first local filter runs at
        # origin-with-zero-P in that frame.
        anchor = np.asarray(st.vehicle.pose, np.float64)
        st = st._replace(ekf=make_ekf_state(np.zeros(3), cfg.capacity, dtype))

        origin = jnp.zeros(3, dtype)
        submaps: list[ClosedSubmap] = []
        anchors = [anchor.copy()]
        close_at = int(self.close_frac * cfg.capacity)
        slam_g, true_g, act_g = [], [], []

        done = 0
        # Chunk tiers (each a distinct compiled executable): the big tier
        # amortizes dispatch, the small ones land the closure precisely.
        # A saturated local map in a dense field CORRUPTS the filter
        # (unmapped observations mis-associate into nearby features once
        # augmentation has no free slots), so the filter must never run
        # saturated: shrink the chunk as n approaches the closure
        # threshold using the observed landmark-add rate.
        tiers = (sorted({self.chunk_epochs,
                         max(self.chunk_epochs // 4, 1),
                         max(self.chunk_epochs // 16, 1)}, reverse=True)
                 if self.adaptive_chunks else [self.chunk_epochs])
        add_rate = None
        # TPUSLAM_CHUNK_RESERVE_FRAC lets a chunk budget part of the
        # reserve above close_at (bigger steady-state chunks, fewer
        # dispatches) — but it is OFF by default: measured at 2k and in
        # the dense-field regression test, any planned overshoot pushes
        # bursts into cap and re-opens the mid-chunk saturation
        # corruption this adaptive logic exists to prevent (spurious 42
        # vs <=30 in the guard test at frac 0.5).
        reserve = float(os.environ.get("TPUSLAM_CHUNK_RESERVE_FRAC", "0")) \
            * max(cfg.capacity - close_at, 0)
        # n_now is carried on HOST between iterations (updated from the
        # chunk's combined device_get below, refreshed by _close's known
        # seed count) — the int(st.ekf.n) that used to sit here was one
        # extra tunnel round-trip per chunk (advisor r3).
        n_now = int(st.ekf.n)
        # Per-chunk wall clock (n_epochs, seconds), measured around the
        # WHOLE iteration (dispatch + the single combined fetch + any
        # align/closure host work) — the scale script reads this instead
        # of monkeypatching a blocking timer around the runner, which
        # itself added one sync per chunk.
        self.chunk_wall: list[tuple[int, float]] = []
        # Host-side phase attribution (filled via _tick_phase): keys
        # dispatch_fetch / midrun_align / closure / reloc_probe.  The
        # scale script prints it — rising per-epoch wall needs a
        # culprit, not a guess.
        self.phase_wall: dict = {}
        import time as _time
        while done < n_epochs:
            t_iter = _time.time()
            t_ph = _time.perf_counter()
            head = max(close_at - n_now, 1) + reserve
            n_chunk = tiers[-1]
            if add_rate is not None:
                for t in tiers:
                    if 1.5 * add_rate * t <= head:  # 1.5: burst margin
                        n_chunk = t
                        break
            n_chunk = min(n_chunk, n_epochs - done)
            key, kc = jax.random.split(key)
            st, recs = run_epochs_rng(cfg, wp, lm, st, n_chunk, kc)
            # ONE host fetch for EVERYTHING this iteration reads — the
            # scalars, the track records, and (in align mode) the state
            # vector the midrun conformance needs.  Each separate
            # int()/np.asarray on a device value is a full tunnel
            # round-trip (~30-90 ms); at thousands of chunks the r3 run's
            # 4-6 separate fetches per chunk made the front end ~90%
            # host time (VERDICT r3 weak #1).
            pull = [st.ekf.n, st.vehicle.waypoint_id, recs.slam_pose,
                    recs.true_pose, recs.active]
            if self.online_mode == "align":
                pull.append(st.ekf.x)
            vals = jax.device_get(pull)
            t_ph = self._tick_phase("dispatch_fetch", t_ph)
            n_new, wp_id = int(vals[0]), int(vals[1])
            x_host = vals[5] if self.online_mode == "align" else None
            added = n_new - n_now
            n_now = n_new
            rate = added / n_chunk
            add_rate = (rate if add_rate is None
                        else 0.5 * add_rate + 0.5 * rate)
            done += n_chunk

            sp = np.asarray(vals[2], np.float64).reshape(-1, 3)
            # Compose each local pose with the (fixed-within-chunk) anchor.
            c, s = np.cos(anchor[2]), np.sin(anchor[2])
            R = np.array([[c, -s], [s, c]])
            gp = np.concatenate(
                [sp[:, :2] @ R.T + anchor[:2],
                 _wrap(sp[:, 2:] + anchor[2])], axis=1,
            )
            slam_g.append(gp)
            true_g.append(np.asarray(vals[3]).reshape(-1, 3))
            act_g.append(np.asarray(vals[4]).reshape(-1))

            if wp_id == -1:
                self.chunk_wall.append((n_chunk, _time.time() - t_iter))
                break  # course finished — further epochs are no-ops

            # TPUSLAM_ALIGN_MIN_EPOCHS throttles the scan-to-map
            # conformance cadence (default 0 = after every chunk, the
            # validated behavior).  The state vector rides the combined
            # fetch above, so an align costs no extra round-trip.
            if (self.online_mode == "align" and len(self._table)
                    and n_new >= 24
                    and done - self._last_align >= self.align_min_epochs):
                self._last_align = done
                anchor = self._midrun_align(st, anchor, len(submaps), done,
                                            submaps, n=n_new,
                                            x_host=x_host)
                t_ph = self._tick_phase("midrun_align", t_ph)

            if n_new >= close_at and done < n_epochs:
                st, anchor, n_now = self._close(st, anchor, submaps, dtype,
                                                n=n_new)
                if self.online_mode == "align":
                    anchor = self._align_closure(submaps, anchor, done)
                elif self.online_mode == "ba" and len(submaps) >= 2:
                    # Seed from the anchors as corrected so far (each
                    # submap's anchor0 was the corrected estimate when it
                    # opened) — NOT the raw dead-reckoned chain.
                    _, _, opt = optimize_anchor_graph(
                        submaps, rounds=2, iters=self.online_ba_iters,
                        match_radius=self.match_radius,
                        init_anchors=[sm.anchor0 for sm in submaps],
                        register_radius=self.register_radius,
                    )
                    cand = se2_compose(opt[-1], submaps[-1].rel_pose)
                    ok = self.accept_correction(cand, anchor)
                    self.trace.append({
                        "closure": len(submaps),
                        "n_epochs": done,
                        "corr_m": float(np.linalg.norm(
                            cand[:2] - anchor[:2])),
                        "corr_rad": float(_wrap(cand[2] - anchor[2])),
                        "accepted": bool(ok),
                    })
                    if ok:
                        anchor = cand
                anchors.append(anchor.copy())
                t_ph = self._tick_phase("closure", t_ph)
            self.chunk_wall.append((n_chunk, _time.time() - t_iter))
            if self.verbose and len(self.chunk_wall) % 200 == 0:
                ep = sum(c for c, _ in self.chunk_wall)
                w = sum(t for _, t in self.chunk_wall)
                print(f"# chunk {len(self.chunk_wall)} epochs {ep} "
                      f"submaps {len(submaps)} "
                      f"wall {w:.0f}s ({w / max(ep, 1) * 1e3:.1f} ms/ep)",
                      file=__import__('sys').stderr, flush=True)

        # Final (partial) submap.
        self._close(st, anchor, submaps, dtype, n=n_now)
        if self.online_mode == "align" and submaps:
            self._align_closure(submaps, anchor, done)

        online_ok = (self.online_mode == "align"
                     and len(self._online_gids) == len(submaps))
        return SubmapRun(
            submaps=submaps,
            slam_pose=np.concatenate(slam_g),
            true_pose=np.concatenate(true_g),
            active=np.concatenate(act_g),
            anchors=np.asarray(anchors),
            online_gids=(list(self._online_gids) if online_ok else None),
            online_table=(self._table.copy() if online_ok else None),
        )

    def _align_closure(self, submaps, anchor, done):
        """'align' online mode, two stages per closure:

        1. LOCAL alignment of the just-closed submap against the full
           table by plain NN matching (no translation voting here — the
           vote is dominated by the submap's own recent trail, which
           shares its drift, so it can never see a loop-closure offset:
           measured on a 2k perimeter course, votes at every closure
           returned ~0 while the revisited start region sat 13 m away).
        2. LOOP-CLOSURE probe against the temporally-OLD table segment
           only (entries inserted >= `gap` submaps ago): translation
           voting + rigid refinement (align_submap_to_table).  On a
           decisive hit the correction is applied to the chain head and
           RUBBER-BANDED back over the drifted segment (anchors and
           table entries of submaps since the last absolute fix get a
           linearly-scaled share, Lu-Milios style), so the table never
           keeps a meters-offset ghost copy of the revisited region.

        Constant cost per closure (the probe is cropped to the submap's
        bounding box).  Returns the corrected chain head."""
        from tpuslam.native import SpatialIndex

        sm = submaps[-1]
        i = len(submaps) - 1
        g = se2_transform_points(sm.anchor0, sm.lm_local)
        if len(self._table):
            res = align_submap_to_table(
                g, self._table, self.match_radius, register_radius=None,
            )
            if res is not None:
                th, t, n_in = res
                a0 = _se2_apply_to_pose(th, t, sm.anchor0)
                cand = se2_compose(a0, sm.rel_pose)
                ok = self.accept_correction(cand, anchor)
                self.trace.append({
                    "closure": len(submaps), "n_epochs": done,
                    "corr_m": float(np.linalg.norm(cand[:2] - anchor[:2])),
                    "corr_rad": float(_wrap(cand[2] - anchor[2])),
                    "n_inliers": int(n_in),
                    "accepted": bool(ok),
                })
                if ok:
                    submaps[-1] = sm = sm._replace(anchor0=a0)
                    g = se2_transform_points(a0, sm.lm_local)
                    anchor = cand
            if self.register_radius:
                applied = False
                lc = self._loop_closure_probe(g, i, done=done)
                if lc is not None:
                    th, t, n_in = lc
                    cand = _se2_apply_to_pose(th, t, anchor)
                    ok = self.accept_loop(cand, anchor, n_in, len(g), done)
                    self.trace.append({
                        "closure": len(submaps), "n_epochs": done,
                        "corr_m": float(np.linalg.norm(
                            cand[:2] - anchor[:2])),
                        "corr_rad": float(_wrap(cand[2] - anchor[2])),
                        "n_inliers": int(n_in), "loop": True,
                        "accepted": bool(ok),
                    })
                    if ok:
                        sm, g, anchor = self._apply_loop(
                            submaps, th, t, i, done)
                        applied = True
                if self._constel is not None:
                    # The drift-independent relocalizer probes at EVERY
                    # closure — not only when the windowed vote fails:
                    # a drifted chain often "succeeds" locally by
                    # conforming to its own ghost branch (measured:
                    # 0.0 m loop corrections at 100 inliers while true
                    # error sat at 13 m), so local acceptance is no
                    # evidence of global placement.  The probe's
                    # dominance test makes it a no-op when placement is
                    # already right.
                    rl = self._reloc_probe(
                        submaps, np.asarray(sm.lm_local, np.float64),
                        g, i, done)
                    if rl is not None:
                        th, t, n_in = rl
                        cand = _se2_apply_to_pose(th, t, anchor)
                        ok = self.accept_reloc(cand, anchor, n_in)
                        self.trace.append({
                            "closure": len(submaps), "n_epochs": done,
                            "corr_m": float(np.linalg.norm(
                                cand[:2] - anchor[:2])),
                            "corr_rad": float(_wrap(cand[2] - anchor[2])),
                            "n_inliers": int(n_in), "reloc": True,
                            "accepted": bool(ok),
                        })
                        if ok:
                            sm, g, anchor = self._apply_loop(
                                submaps, th, t, i, done)
        if len(g):
            if len(self._table):
                idx = SpatialIndex(self._table,
                                   cell_size=max(self.match_radius, 1.0))
                m = idx.match(np.asarray(g, np.float64), self.match_radius)
            else:
                m = np.full(len(g), -1, np.int64)
            new = m < 0
            ids = m.astype(np.int64)
            ids[new] = len(self._table) + np.arange(int(new.sum()))
            self._online_gids.append(ids)
            self._table = np.concatenate(
                [self._table, np.asarray(g, np.float64)[new]])
            self._table_src = np.concatenate(
                [self._table_src, np.full(int(new.sum()), i, np.int64)])
            if self._constel is not None:
                # Index the MINTED rows' constellations (each physical
                # landmark enters the recognizer once, from its first
                # observer); neighbors come from the full local cloud.
                # Local-frame points: descriptors are rigid-invariant,
                # so later anchor updates never stale the db.
                self._constel.add_submap(
                    i, np.asarray(sm.lm_local, np.float64),
                    index_mask=new)
        else:
            self._online_gids.append(np.zeros(0, np.int64))
        return anchor

    def _apply_loop(self, submaps, th, t, i, done):
        """Apply an accepted loop/reloc correction for closed submap `i`
        (the chain tail): rubber-band the drifted segment, GN-polish a
        significant closure, and mark the absolute fix.  Returns the
        refreshed (sm, g, anchor) for the caller."""
        self._rubber_band(submaps, th, t, i)
        if (np.hypot(*t) > 0.5 * self.match_radius
                and len(submaps) >= 3):
            # Significant loop closure: polish the chain tail with the
            # odometry-aware GN (the linear rubber band is only a
            # prior) and rebuild the table ghost-free — BEFORE later
            # submaps conform to a bent ring.
            self._refine_chain(
                submaps,
                max_move=2.0 * float(np.hypot(*t))
                + 3.0 * self.match_radius)
        sm = submaps[-1]
        g = se2_transform_points(sm.anchor0, sm.lm_local)
        anchor = se2_compose(sm.anchor0, sm.rel_pose)
        self._last_fix = i
        self._last_fix_done = done
        return sm, g, anchor

    def _reloc_probe(self, submaps, loc, g, i, done):
        """Drift-independent relocalization of one submap cloud.

        loc: (n, 2) local-frame landmarks; g: the same cloud at the
        CURRENT global placement (the thing a correction applies to).
        Queries the constellation db for (query -> db landmark)
        correspondence candidates among submaps closed >= reloc_gap ago,
        fits the largest rigid-consistent subset (placerec.ransac_se2),
        and verifies the implied correction against the temporally-old
        table segment at a tight gate — acceptance requires the
        corrected cloud to register DECISIVELY better than the current
        placement does.  Returns (theta, t, n_verified) or None.

        No drift budget anywhere: this is the candidate source for
        exactly the corrections the budget-windowed vote cannot reach
        (the measured 100k blocker, PERF.md 'joined pipeline')."""
        import time as _time

        _t0 = _time.perf_counter()
        db = self._constel
        src_max = i - self.reloc_gap + 1
        if db is None or src_max <= 0 or len(g) < 12:
            return None
        try:
            return self._reloc_probe_inner(submaps, loc, g, i, done,
                                           db, src_max)
        finally:
            if hasattr(self, "phase_wall"):
                self.phase_wall["reloc_probe"] = \
                    self.phase_wall.get("reloc_probe", 0.0) \
                    + (_time.perf_counter() - _t0)

    def _reloc_probe_inner(self, submaps, loc, g, i, done, db, src_max):
        from tpuslam.native import SpatialIndex
        # Pre-check before the (db-sized) hash probe: if the cloud
        # already registers tightly against the temporally-old segment
        # at its CURRENT placement, a reloc could never pass the
        # dominance test — skip.  This bounds probe cost to the
        # closures that actually need relocalization (on a clean 20k
        # run that is a few percent of them).
        old = self._table_src <= i - self.reloc_gap
        if old.sum() < self.reloc_min_inliers:
            return None
        pts_old = self._table[old]
        sg = min(self.match_radius, 1.0)
        pad = 2.0 * self.match_radius

        def _hits(cloud):
            lo, hi = cloud.min(0) - pad, cloud.max(0) + pad
            sel = ((pts_old[:, 0] >= lo[0]) & (pts_old[:, 0] <= hi[0])
                   & (pts_old[:, 1] >= lo[1]) & (pts_old[:, 1] <= hi[1]))
            if sel.sum() == 0:
                return 0
            idx = SpatialIndex(pts_old[sel], cell_size=max(sg, 1.0))
            return int((idx.match(cloud, sg) >= 0).sum())

        h0 = _hits(np.asarray(g, np.float64))
        if h0 >= 0.5 * len(g):
            return None
        # Stride up the probe as the db grows (query cost ~ triangles x
        # bucket density); votes accumulate per correspondence so recall
        # degrades gracefully.
        stride = min(6, 1 + db.n_entries // 1_500_000)
        q_idx, src, lidx, votes = db.query(loc, src_max=src_max,
                                           center_stride=stride)
        if len(q_idx) < self.reloc_min_inliers:
            return None
        from tpuslam.graph.placerec import ransac_se2

        # Target positions from the CURRENT anchor estimates (votes
        # reference (src, local-idx), so table rebuilds never dangle).
        submaps_ref = submaps
        tgt = np.empty((len(q_idx), 2))
        for s in np.unique(src):
            m = src == s
            tgt[m] = se2_transform_points(
                submaps_ref[int(s)].anchor0,
                np.asarray(submaps_ref[int(s)].lm_local)[lidx[m]])
        res = ransac_se2(np.asarray(g, np.float64)[q_idx], tgt,
                         weights=votes.astype(np.float64),
                         min_inliers=max(8, self.reloc_min_inliers // 2))
        if res is None:
            return None
        th, t, mask, n_second = res
        n_in = int(mask.sum())
        # Ambiguity: a second distinct rigid hypothesis explaining a
        # comparable share of the candidates means aliasing — abstain.
        if n_second > 0.5 * n_in:
            return None
        # Net correction implied for the cloud (evaluated at its
        # centroid; the origin-frame t alone is lever-arm-amplified).
        cen = np.asarray(g, np.float64).mean(0)
        c, s_ = np.cos(th), np.sin(th)
        moved = np.hypot(c * cen[0] - s_ * cen[1] + t[0] - cen[0],
                         s_ * cen[0] + c * cen[1] + t[1] - cen[1])
        if moved < 0.5 * self.match_radius:
            return None  # already in place — stage-1 conformance owns it
        # Verification: tight-gate registration of the WHOLE cloud
        # against the temporally-old table rows, corrected vs current
        # (h0 and the old-segment index machinery computed above).
        gg = np.asarray(g, np.float64) @ np.array(
            [[c, s_], [-s_, c]]) + t
        hs = _hits(gg)
        if hs < max(self.reloc_min_inliers, 1.5 * h0 + 8):
            return None
        return float(th), t, hs

    def accept_reloc(self, cand, anchor, n_in) -> bool:
        """Acceptance gate for place-recognition corrections.  Unlike
        accept_loop there is NO drift budget (the probe exists for
        corrections beyond it); safety comes from the probe's own
        dominance + verification tests.  The rotation bound only
        excludes the physically impossible (heading drift accrues
        ~1e-4 rad/m; 0.5 rad would be ~5 km un-fixed travel)."""
        if not np.isfinite(cand).all():
            return False
        if abs(_wrap(cand[2] - anchor[2])) > 0.5:
            return False
        return n_in >= self.reloc_min_inliers

    def _midrun_align(self, st, anchor, i, done, submaps, n=None,
                      x_host=None):
        """Continuous scan-to-map registration of the OPEN submap: after
        every chunk, rigidly conform the partial local map to the global
        table (NN alignment) and probe the temporally-old segment for a
        loop closure (translation vote).  Correcting `anchor` mid-submap
        is exact — the local filter runs in its own frame and the whole
        open submap re-places rigidly.

        This is what keeps cross-submap seams under the match gate at
        scale: closure-time-only alignment leaves each ~130 m submap to
        drift internally before conforming (measured 1-3 m rubber-band
        residual seams -> duplicate/spurious-ridden maps); per-chunk
        (~77 m) conformance keeps relative drift near zero, the standard
        submap-SLAM arrangement (scan-to-map localization against the
        emerging global map)."""
        if n is None:
            n = int(st.ekf.n)
        x = (np.asarray(x_host, np.float64) if x_host is not None
             else np.asarray(st.ekf.x, np.float64))
        loc = x[3:3 + 2 * n].reshape(-1, 2)
        g = se2_transform_points(anchor, loc)
        res = align_submap_to_table(
            g, self._table, self.match_radius, register_radius=None,
        )
        if res is not None:
            th, t, n_in = res
            cand = _se2_apply_to_pose(th, t, anchor)
            ok = self.accept_correction(cand, anchor)
            corr = float(np.linalg.norm(cand[:2] - anchor[:2]))
            dth = float(_wrap(cand[2] - anchor[2]))
            if not ok or corr > 0.5 * self.match_radius or abs(dth) > 0.01:
                # The stage-1 conformance fit used to be untraced — the
                # 75 m rotation failure (see accept_correction) was
                # invisible in the run log.  Record anything nontrivial.
                self.trace.append({
                    "closure": i, "n_epochs": done, "corr_m": corr,
                    "corr_rad": dth, "n_inliers": int(n_in),
                    "stage1": True, "accepted": bool(ok),
                })
            if ok:
                anchor = cand
                g = se2_transform_points(anchor, loc)
        if self.register_radius:
            lc = self._loop_closure_probe(g, i, done=done)
            if lc is not None:
                th, t, n_in = lc
                cand = _se2_apply_to_pose(th, t, anchor)
                ok = self.accept_loop(cand, anchor, n_in, len(g), done)
                self.trace.append({
                    "closure": i, "n_epochs": done,
                    "corr_m": float(np.linalg.norm(cand[:2] - anchor[:2])),
                    "corr_rad": float(_wrap(cand[2] - anchor[2])),
                    "n_inliers": int(n_in), "loop": True, "midrun": True,
                    "accepted": bool(ok),
                })
                if ok:
                    anchor = cand
                    if submaps:
                        # Distribute over the CLOSED chain; the open
                        # submap (index i) takes the full correction via
                        # `anchor`, closed submap j the fraction
                        # (j - last_fix)/(i - last_fix).
                        self._rubber_band(submaps, th, t, i)
                        if (np.hypot(*t) > 0.5 * self.match_radius
                                and len(submaps) >= 3):
                            # Same at-closure GN polish as the closure
                            # branch; the OPEN submap follows the last
                            # closed anchor's refinement delta.
                            pre = submaps[-1].anchor0.copy()
                            mm = (2.0 * float(np.hypot(*t))
                                  + 3.0 * self.match_radius)
                            if self._refine_chain(submaps, max_move=mm):
                                post = submaps[-1].anchor0
                                d_th = _wrap(post[2] - pre[2])
                                cd, sd = np.cos(d_th), np.sin(d_th)
                                rel = anchor[:2] - pre[:2]
                                anchor = np.concatenate([
                                    np.array([cd * rel[0] - sd * rel[1],
                                              sd * rel[0] + cd * rel[1]])
                                    + post[:2],
                                    [_wrap(anchor[2] + d_th)],
                                ])
                    self._last_fix = i
                    self._last_fix_done = done
        return anchor

    def _refine_chain(self, submaps, max_move=None):
        """Gauss-Newton polish right after a significant loop closure,
        WINDOWED to the drifted tail (host factor-list path).

        The r3 version optimized the WHOLE chain and rebuilt the whole
        table — an O(run-length) cost per significant closure that broke
        the constant-cost-per-epoch claim at scale (20k run: one late
        refine over 271 submaps ~ 10^5 Python-loop factor builds, the
        measured late-chunk wall spike).  The window is the LAST
        `refine_window` submaps — for chains shorter than the window
        this is exactly the old whole-chain polish (bisected: an earlier
        attempt that also cut the window at the last loop fix regressed
        a 600-landmark run's map RMSE 0.286 -> 0.627 by skipping the
        polish of recently-banded-but-fixed segments).  The window's
        first anchor holds the gauge via the BA prior, so the refined
        tail stays registered to the frozen head."""
        j0 = max(0, len(submaps) - self.refine_window)
        tail = submaps[j0:]
        if len(tail) < 3:
            return False
        init = np.asarray([sm.anchor0 for sm in tail])
        try:
            if j0 == 0:
                # Short chain: the proven whole-chain factor-GN polish.
                _, _, opt = optimize_anchor_graph(
                    tail, rounds=1, iters=12,
                    match_radius=self.match_radius, init_anchors=init,
                )
            else:
                # Windowed: a tail-only GN is a CANTILEVER — anchored to
                # the frozen head only through the gauge prior on
                # tail[0], a few wrong matches can swing the free end
                # (measured: 60 m proposed moves, all rejected, so the
                # banded segment got NO polish and quality decayed).
                # Instead run consensus GPA sweeps with the frozen
                # head's table rows (cropped to the tail's bbox) as the
                # gauge-holding pseudo-submap 0: the tail is then
                # anchored to the global map along its whole overlap,
                # and the trim/damping keep the update bounded.
                head = self._table[self._table_src < j0]
                ctr = [se2_transform_points(sm.anchor0, sm.lm_local)
                       for sm in tail if len(sm.lm_local)]
                allg = np.concatenate(ctr) if ctr else np.zeros((0, 2))
                if len(head) and len(allg):
                    lo = allg.min(0) - 2 * self.match_radius
                    hi = allg.max(0) + 2 * self.match_radius
                    sel = ((head[:, 0] >= lo[0]) & (head[:, 0] <= hi[0])
                           & (head[:, 1] >= lo[1]) & (head[:, 1] <= hi[1]))
                    head = head[sel]
                if len(head) < 12:
                    return False
                pseudo = ClosedSubmap(
                    anchor0=np.zeros(3), lm_local=head,
                    lm_cov=np.tile(0.01 * np.eye(2), (len(head), 1, 1)),
                    rel_pose=np.zeros(3), rel_cov=np.eye(3) * 1e-6)
                opt, _, _ = gpa_refine_anchors(
                    [pseudo] + list(tail),
                    np.concatenate([np.zeros((1, 3)), init]),
                    match_radius=self.match_radius,
                    register_radius=None, sweeps=8, rematch_rounds=1)
                opt = np.asarray(opt)[1:]
        except Exception:
            return False
        opt = np.asarray(opt)
        if not np.isfinite(opt).all():
            return False
        # Acceptance gate: the refine is a POLISH of a just-banded chain
        # — anchors should move by at most ~the applied correction plus a
        # few match gates.  A finite-but-wrong tail solve (wrong matches
        # on a short window have little redundancy) must not silently
        # throw the chain.
        disp = float(np.linalg.norm((opt[:, :2] - init[:, :2]), axis=1).max())
        dth = float(np.abs(_wrap(opt[:, 2] - init[:, 2])).max())
        gate = (max_move if max_move is not None
                else 3.0 * self.match_radius)
        if self.refine_gate and (disp > gate or dth > 0.05):
            self.trace.append({"refine": True, "n_submaps": len(submaps),
                               "max_move_m": disp,
                               "max_rad": dth, "accepted": False})
            return False
        for j, sm in enumerate(tail):
            submaps[j0 + j] = sm._replace(anchor0=opt[j])
        self._rebuild_table_tail(submaps, j0)
        return True

    def _rebuild_table_tail(self, submaps, j0):
        """Re-derive the online table rows sourced from submaps >= j0
        (same first-seen incremental-growth semantics, with the online
        gids refreshed in lockstep); rows from the frozen head keep
        their row NUMBERS (insertion order is by closure, so `src` is
        non-decreasing and the kept rows are a prefix) — head gids stay
        valid and the cost is O(tail), not O(run-length)."""
        from tpuslam.native import SpatialIndex

        keep = self._table_src < j0
        table, src = self._table[keep], self._table_src[keep]
        for j in range(j0, len(submaps)):
            sm = submaps[j]
            if not len(sm.lm_local):
                if j < len(self._online_gids):
                    self._online_gids[j] = np.zeros(0, np.int64)
                continue
            g = se2_transform_points(sm.anchor0, sm.lm_local)
            if len(table):
                idx = SpatialIndex(table,
                                   cell_size=max(self.match_radius, 1.0))
                m = idx.match(np.asarray(g, np.float64), self.match_radius)
            else:
                m = np.full(len(g), -1, np.int64)
            new = m < 0
            ids = m.astype(np.int64)
            ids[new] = len(table) + np.arange(int(new.sum()))
            if j < len(self._online_gids):
                self._online_gids[j] = ids
            table = np.concatenate([table, np.asarray(g, np.float64)[new]])
            src = np.concatenate(
                [src, np.full(int(new.sum()), j, np.int64)])
        self._table, self._table_src = table, src

    def _tick_phase(self, name, t0):
        """Accumulate host-side phase wall [s] into self.phase_wall."""
        import time as _t

        now = _t.perf_counter()
        self.phase_wall[name] = self.phase_wall.get(name, 0.0) \
            + (now - t0)
        return now

    def loop_budget(self, done) -> float:
        """Drift budget [m] accruable since the last absolute fix —
        heading error integrates, so position drift grows superlinearly
        with travel: measured ~16 m after 330 m around a block perimeter
        (5%), budgeted at 6% of travel, floored at a few match gates for
        the steady re-conformed regime."""
        dist_m = 0.6 * max(done - self._last_fix_done, 0)
        return 0.06 * max(dist_m, 50.0) + 3.0 * self.match_radius

    def _loop_closure_probe(self, g, i, done=None, gap: int = 3):
        """Registration of the just-closed submap against table entries
        inserted >= `gap` submaps ago, cropped to the submap's bbox —
        the temporal split that makes a loop-closure offset visible to
        translation voting (stage 2 of _align_closure).

        The vote window is scheduled from the DRIFT BUDGET, not the
        course structure: any offset beyond loop_budget(done) would be
        rejected by accept_loop anyway, so searching there is pure harm
        — in a dense field those bins hold alias peaks that out-vote and
        MASK the true one (the r3 20k lawnmower failure).  Within the
        window, the top-k vote peaks are each scored at a tight gate
        (align_submap_to_table topk path) so a taller alias cannot mask
        a true offset that actually registers the cloud."""
        rr = self.register_radius
        if done is not None and self.budget_vote_window:
            rr = min(rr, self.loop_budget(done))
        old = self._table_src <= i - gap
        if old.sum() < 12 or not len(g):
            return None
        lo = g.min(0) - rr
        hi = g.max(0) + rr
        sel = (old & (self._table[:, 0] >= lo[0])
               & (self._table[:, 0] <= hi[0])
               & (self._table[:, 1] >= lo[1])
               & (self._table[:, 1] <= hi[1]))
        if sel.sum() < 12:
            return None
        return align_submap_to_table(
            g, self._table[sel], self.match_radius,
            register_radius=rr, topk=self.vote_topk,
        )

    def _rubber_band(self, submaps, th, t, i):
        """Distribute a loop-closure correction (th, t — full SE(2) for
        the submap at index `i`) linearly over submaps (last_fix, i] and
        their table entries, pivoted at the last absolutely-fixed
        anchor: entry j gets the fraction (j - last_fix)/(i - last_fix)
        of the rotation and translation.  `i` may be the still-open
        submap (== len(submaps)); the loop then covers only the closed
        ones at partial fractions and the caller applies the full
        correction to the open chain head.  Keeps the online table
        ghost-free after a closure instead of leaving the drifted
        segment meters off."""
        j0 = min(self._last_fix, i - 1, len(submaps) - 1)
        pivot = submaps[j0].anchor0[:2].astype(np.float64)
        c, s = np.cos(th), np.sin(th)
        t_piv = (np.array([c * pivot[0] - s * pivot[1],
                           s * pivot[0] + c * pivot[1]]) + t - pivot)
        denom = max(i - j0, 1)
        for j in range(j0 + 1, min(i, len(submaps) - 1) + 1):
            f = (j - j0) / denom
            fth = f * th
            cf, sf = np.cos(fth), np.sin(fth)
            a = submaps[j].anchor0
            rel = a[:2] - pivot
            submaps[j] = submaps[j]._replace(anchor0=np.concatenate([
                np.array([cf * rel[0] - sf * rel[1],
                          sf * rel[0] + cf * rel[1]]) + pivot + f * t_piv,
                [_wrap(a[2] + fth)],
            ]))
            rows = self._table_src == j
            if rows.any():
                p = self._table[rows] - pivot
                self._table[rows] = np.stack(
                    [cf * p[:, 0] - sf * p[:, 1],
                     sf * p[:, 0] + cf * p[:, 1]], axis=1,
                ) + pivot + f * t_piv

    def accept_correction(self, cand, anchor) -> bool:
        """Sanity gate on one online-BA anchor correction.

        An online GN round destabilized by wrong matches (dense fields,
        gate ~ landmark spacing) must not poison the chain.  A legitimate
        correction is bounded by physics: with BA running every closure,
        NN matching only works at all if drift since the last correction
        stays within `match_radius` (measured 1-3 m between closures on
        the 20k-landmark course), and translation-voting registration can
        legitimately recover shifts up to `register_radius` on top.
        Anything beyond register_radius + a few match gates can only be a
        poisoned solve — reject it and keep the dead-reckoned chain (the
        next closure gets another chance with fresh matches).  The old
        20x match_radius gate (60 m at defaults) admitted corrections the
        size of the 71 m ATE failure it was meant to stop.

        The gate must ALSO bound the ROTATION: an SE(2) fit pivots about
        its matched cloud's centroid, so the anchor can move millimeters
        while everything far from the pivot swings by |dtheta| x
        distance — measured 20k failure: an untraced 0.2 rad stage-1
        alignment fit passed the position-only gate (anchor moved
        0.21 m) and displaced the vehicle pose 75 m in one chunk.  A
        legitimate conformance correction of an online-aligned chain has
        |dtheta| ~ 1e-3 rad (trace p50); 0.03 rad is generous."""
        if not np.isfinite(cand).all():
            return False
        if abs(_wrap(cand[2] - anchor[2])) > 0.03:
            return False
        gate = (self.register_radius or 0.0) + 4.0 * self.match_radius
        return bool(np.linalg.norm(cand[:2] - anchor[:2]) < gate)

    def accept_loop(self, cand, anchor, n_in, n_pts, done) -> bool:
        """Acceptance gate for LOOP-CLOSURE corrections, stricter than
        accept_correction: the correction size is bounded by the drift
        physically accruable since the last absolute fix (~3% of travel
        + a few match gates — measured drift rate is ~1%/m), and the
        registration must explain a solid fraction of the submap's
        points.  Both bounds exist because one wrong vote is
        catastrophic: a 17 m mis-registration accepted with 25 inliers
        threw a 2k survey run's chain 14 m for a tenth of the course."""
        if not np.isfinite(cand).all():
            return False
        # Heading error integrates, so position drift grows SUPERlinearly
        # with travel (measured ~16 m after 330 m around a block
        # perimeter) — see loop_budget, which also schedules the vote
        # window so search and acceptance use the same bound.  The
        # rotation gate mirrors accept_correction's (see there): heading
        # drift accrues ~1e-4 rad/m of travel, so budget it the same way.
        if abs(_wrap(cand[2] - anchor[2])) > \
                0.05 + 2e-4 * 0.6 * max(done - self._last_fix_done, 0):
            return False
        corr = float(np.linalg.norm(cand[:2] - anchor[:2]))
        return corr < self.loop_budget(done) and n_in >= 12

    def _closure_extract(self, ekf):
        """On-device view of what a closure needs: (x, per-landmark 2x2
        marginal blocks, pose 3x3).  One ~12 KB fetch instead of pulling
        the full (3+2C)^2 P over the tunnel (4.2 MB at C=512, per
        closure — measured part of the r3 host wall)."""
        import jax
        import jax.numpy as jnp

        if getattr(self, "_extract_fn", None) is None:
            cap = self.cfg.capacity

            @jax.jit
            def extract(x, P):
                B = P[3:, 3:].reshape(cap, 2, cap, 2)
                lm_cov = jnp.diagonal(B, axis1=0, axis2=2)  # (2, 2, cap)
                return x, jnp.transpose(lm_cov, (2, 0, 1)), P[:3, :3]

            self._extract_fn = extract
        return jax.device_get(self._extract_fn(ekf.x, ekf.P))

    def _seed_state_build(self, seeds, covs, k):
        """Device-side construction of a handover-seeded fresh EKF state
        from (cap/2, 2) means + (cap/2, 2, 2) marginals (only the first
        k rows live).  Replaces a host-built full (3+2C)^2 P pushed
        through the tunnel per closure.  Inactive slots are exactly zero
        (the augmentation invariant)."""
        import jax
        import jax.numpy as jnp

        if getattr(self, "_seed_fn", None) is None:
            cap = self.cfg.capacity
            cap2 = cap // 2
            dtype = self.dtype

            @jax.jit
            def build(s, c, k):
                m = jnp.arange(cap2) < k
                s = jnp.where(m[:, None], s, 0.0)
                c = jnp.where(m[:, None, None], c, 0.0)
                x = jnp.concatenate([
                    jnp.zeros(3, dtype), s.reshape(-1).astype(dtype),
                    jnp.zeros(2 * (cap - cap2), dtype),
                ])
                blk = jnp.einsum(
                    "ij,iab->iajb", jnp.eye(cap2, dtype=dtype),
                    c.astype(dtype)).reshape(2 * cap2, 2 * cap2)
                N = 3 + 2 * cap
                P = jnp.zeros((N, N), dtype)
                P = jax.lax.dynamic_update_slice(P, blk, (3, 3))
                return x, P

            self._seed_fn = build
        # Transfer at self.dtype (the f64 CPU spec path must not round
        # the handover seeds through f32 — advisor r4); the jitted
        # builder casts down only when dtype is narrower.
        return self._seed_fn(jnp.asarray(seeds, self.dtype),
                             jnp.asarray(covs, self.dtype),
                             jnp.asarray(k, jnp.int32))

    def _close(self, st, anchor, submaps, dtype, n=None):
        """Freeze the active local map; restart the filter at the new
        anchor's origin (optionally seeded with nearby landmarks)."""
        import jax.numpy as jnp

        from tpuslam.filters.state import make_ekf_state

        if n is None:
            n = int(st.ekf.n)
        x, lm_cov_all, Ppp = self._closure_extract(st.ekf)
        x = np.asarray(x, np.float64)
        lm_local = x[3:3 + 2 * n].reshape(n, 2)
        lm_cov = (np.asarray(lm_cov_all, np.float64)[:n] if n
                  else np.zeros((0, 2, 2)))

        rel = x[:3].copy()
        rel[2] = _wrap(rel[2])
        submaps.append(ClosedSubmap(
            anchor0=np.asarray(anchor, np.float64),
            lm_local=lm_local, lm_cov=lm_cov,
            rel_pose=rel, rel_cov=np.asarray(Ppp, np.float64),
        ))
        new_anchor = se2_compose(anchor, rel)
        ekf = make_ekf_state(np.zeros(3), self.cfg.capacity, dtype)
        n_seed = 0

        if self.handover and n:
            # Seed: landmarks in range of the closure pose, re-expressed in
            # the new anchor frame (origin = closure pose).
            d = np.linalg.norm(lm_local - rel[:2], axis=1)
            keep = np.nonzero(
                d < self.cfg.vehicle.sensor_range
            )[0][: self.cfg.capacity // 2]
            if len(keep):
                c, s = np.cos(rel[2]), np.sin(rel[2])
                R = np.array([[c, s], [-s, c]])  # rotate INTO new frame
                seeds = (lm_local[keep] - rel[:2]) @ R.T
                covs = (R @ lm_cov[keep] @ R.T) * self.handover_inflate
                k = len(keep)
                cap2 = self.cfg.capacity // 2
                sp = np.zeros((cap2, 2))
                cp = np.zeros((cap2, 2, 2))
                sp[:k], cp[:k] = seeds, covs
                xs, Ps = self._seed_state_build(sp, cp, k)
                ekf = ekf._replace(
                    x=xs, P=Ps, n=jnp.asarray(k, ekf.n.dtype),
                )
                n_seed = k
        # n_seed lets the caller keep its host-side active-count mirror
        # without a device round-trip (advisor r3).
        return st._replace(ekf=ekf), new_anchor, n_seed


def _vote_topk(dst, src, radius: float, bin_size: float = 1.0, k: int = 6):
    """Top-k peaks of the pairwise-offset histogram from `src` onto `dst`
    (NumPy, chunked; same binning/refinement semantics as the native
    offset_vote, which returns only the argmax).  Argmax-only voting is
    exactly the at-scale alias failure: in a dense field a wrong 50 m
    alias peak can out-vote the true offset, and the acceptance gate then
    rejects everything — the true peak never even surfaces (the r3 20k
    lawnmower failure, PERF.md).  Returning the k tallest NON-ADJACENT
    peaks lets the caller score each with the tight-gate test and keep
    the one that actually registers.

    Returns list of ((dx, dy), votes), tallest first."""
    dst = np.asarray(dst, np.float64).reshape(-1, 2)
    src = np.asarray(src, np.float64).reshape(-1, 2)
    if not len(dst) or not len(src):
        return []
    nb = max(1, int(2 * radius / bin_size) + 1)
    H = np.zeros((nb, nb), np.int64)
    sx = np.zeros((nb, nb))
    sy = np.zeros((nb, nb))
    r2 = radius * radius
    for q0 in range(0, len(src), 128):
        q = src[q0:q0 + 128]
        d = dst[None, :, :] - q[:, None, :]
        ok = (d * d).sum(-1) < r2
        dd = d[ok]
        if not len(dd):
            continue
        bx = np.clip(((dd[:, 0] + radius) / bin_size).astype(int), 0, nb - 1)
        by = np.clip(((dd[:, 1] + radius) / bin_size).astype(int), 0, nb - 1)
        np.add.at(H, (bx, by), 1)
        np.add.at(sx, (bx, by), dd[:, 0])
        np.add.at(sy, (bx, by), dd[:, 1])
    # 3x3-summed peak strength, refined to the neighborhood mean offset.
    from numpy.lib.stride_tricks import sliding_window_view

    Hp = np.pad(H, 1)
    S = sliding_window_view(Hp, (3, 3)).sum((2, 3))
    SX = sliding_window_view(np.pad(sx, 1), (3, 3)).sum((2, 3))
    SY = sliding_window_view(np.pad(sy, 1), (3, 3)).sum((2, 3))
    out = []
    S = S.copy()
    for _ in range(k):
        i, j = np.unravel_index(np.argmax(S), S.shape)
        v = int(S[i, j])
        if v <= 0:
            break
        out.append(((SX[i, j] / v, SY[i, j] / v), v))
        # suppress this peak's neighborhood so the next pick is distinct
        S[max(i - 2, 0):i + 3, max(j - 2, 0):j + 3] = 0
    return out


def align_submap_to_table(g, table, radius: float,
                          register_radius: float | None = None,
                          min_matches: int = 12, tighten: float = 0.5,
                          topk: int = 1):
    """Rigid SE(2) registration of one submap's global-frame landmarks
    against the running global table (native radius-NN + closed-form
    Kabsch, two match->fit rounds, the second at a tightened gate).

    The O(matches)-per-closure alternative to re-solving the whole anchor
    graph online: a new submap only needs LOCAL consistency with the map
    it overlaps, which is a single-pose alignment problem.  With
    `register_radius`, translation voting bootstraps drift beyond the
    match gate first (same RANSAC-style acceptance as
    match_submap_landmarks).

    Returns (theta, t, n_inliers) — the correction mapping the submap's
    current global-frame points onto the table — or None when overlap is
    insufficient (fresh territory; dead reckoning stands)."""
    from tpuslam.native import SpatialIndex

    table = np.asarray(table, np.float64).reshape(-1, 2)
    gg = np.asarray(g, np.float64).reshape(-1, 2).copy()
    if len(table) < min_matches or len(gg) < min_matches:
        return None
    idx = SpatialIndex(table, cell_size=max(radius, 1.0))

    Rc = np.eye(2)
    tc = np.zeros(2)
    if register_radius:
        if topk > 1:
            peaks = _vote_topk(table, gg, register_radius, bin_size=1.0,
                               k=topk)
        else:
            peaks = [idx.offset_vote(gg, register_radius, bin_size=1.0)]
        sg = min(radius, 1.0)
        h0 = int((idx.match(gg, sg) >= 0).sum())
        need = max(1.5 * h0, h0 + min(8, max(2, len(gg) // 4)))
        best_d, best_hs = None, need
        for (dx, dy), votes in peaks:
            if votes < min_matches or (dx * dx + dy * dy) <= 0.25:
                continue
            d = np.asarray([dx, dy])
            # RANSAC-style scoring at a TIGHT gate: an alias peak matches
            # ~random-baseline points there, the true offset registers
            # the cloud — this is what discriminates when vote counts
            # alone cannot (argmax masking).
            hs = int((idx.match(gg + d, sg) >= 0).sum())
            if hs > best_hs:
                best_hs, best_d = hs, d
        if best_d is not None:
            gg += best_d
            tc += best_d

    n_in = 0
    for r in (radius, tighten * radius):
        m = idx.match(gg, r)
        ok = m >= 0
        n_in = int(ok.sum())
        if n_in < min_matches:
            return None
        th, t = fit_se2(gg[ok], table[m[ok]])
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, -s], [s, c]])
        gg = gg @ R.T + t
        Rc = R @ Rc
        tc = R @ tc + t
    return float(np.arctan2(Rc[1, 0], Rc[0, 0])), tc, n_in


def gpa_refine_anchors(submaps, anchors, *, match_radius: float = 2.0,
                       sweeps: int = 12, rematch_rounds: int = 2,
                       register_radius: float | None = None,
                       trim: float = 3.0, min_matches: int = 6,
                       step: float = 0.7, tol: float = 1e-3):
    """Generalized-Procrustes refinement of the anchor chain ("global
    alignment sweeps") — the cloud-agreement optimizer the factor graph
    is not.

    The graph BA's least-squares optimum trades within-submap nonrigid
    distortion (EKF drift over a submap's span, ~0.5 m) against
    loop-closure consistency, both weighted at local sensor noise
    (~5 cm); on dense fields this converges to a GLOBALLY BENT map
    (measured: matched RMSE ~1.3 m where rigid per-submap alignment
    supports ~0.35 m).  This routine instead optimizes what the final
    map is scored on — agreement of the rigidly-placed submap clouds:

        min_{T_1..T_S}  sum_i sum_k  || T_i x_ik  -  m_{g(ik)} ||^2

    with m the consensus (mean) position of each global landmark id.
    Block-coordinate descent: each sweep recomputes the leave-one-out
    consensus and fits one closed-form SE(2) (Kabsch) per submap, all
    submaps vectorized via bincount — O(total landmarks) per sweep, no
    Python per-submap loop, scales to 1M points.  Matches are re-derived
    `rematch_rounds` times as alignment improves; residuals beyond
    `trim` robust sigmas are dropped per sweep (wrong-merge outliers).

    Gauge: submap 0's pose is held fixed (every sweep's updates are
    composed with the inverse of submap 0's update).

    Returns (anchors, gids, table): refined anchors, per-submap global
    id arrays, and the final (M, 2) first-seen position table — the same
    contract as match_submap_landmarks, ready for assemble_global_map or
    a grid-BA polish.
    """
    anchors = np.asarray(anchors, np.float64).reshape(-1, 3).copy()
    S = len(submaps)
    loc = [np.asarray(sm.lm_local, np.float64).reshape(-1, 2)
           for sm in submaps]
    sizes = np.array([len(p) for p in loc], np.int64)
    sub_of = np.repeat(np.arange(S), sizes)
    L = (np.concatenate([p for p in loc if len(p)])
         if sizes.sum() else np.zeros((0, 2)))
    gids = table = None

    for _ in range(max(rematch_rounds, 1)):
        gids, table, anchors = match_submap_landmarks(
            submaps, anchors, match_radius,
            register_radius=register_radius,
        )
        fg = (np.concatenate([np.asarray(g, np.int64) for g in gids])
              if len(L) else np.zeros(0, np.int64))
        M = len(table)
        for _ in range(max(sweeps, 1)):
            ca, sa = np.cos(anchors[:, 2]), np.sin(anchors[:, 2])
            cp, sp = ca[sub_of], sa[sub_of]
            G = np.stack([cp * L[:, 0] - sp * L[:, 1],
                          sp * L[:, 0] + cp * L[:, 1]], axis=1)
            G += anchors[sub_of, :2]
            cnt = np.bincount(fg, minlength=M).astype(np.float64)
            sx = np.bincount(fg, G[:, 0], minlength=M)
            sy = np.bincount(fg, G[:, 1], minlength=M)
            c = cnt[fg]
            shared = c >= 2.0
            d = np.maximum(c - 1.0, 1.0)
            T = np.stack([(sx[fg] - G[:, 0]) / d,
                          (sy[fg] - G[:, 1]) / d], axis=1)
            r = T - G
            rn2 = (r * r).sum(1)
            ok = shared
            if trim and ok.any():
                sig = max(1.4826 * np.sqrt(np.median(rn2[ok])), 0.02)
                ok = ok & (rn2 < (trim * sig) ** 2)
            w = ok.astype(np.float64)
            Ws = np.bincount(sub_of, w, minlength=S)
            good = Ws >= min_matches
            Wd = np.maximum(Ws, 1.0)
            msx = np.bincount(sub_of, w * G[:, 0], minlength=S) / Wd
            msy = np.bincount(sub_of, w * G[:, 1], minlength=S) / Wd
            mdx = np.bincount(sub_of, w * T[:, 0], minlength=S) / Wd
            mdy = np.bincount(sub_of, w * T[:, 1], minlength=S) / Wd
            ux, uy = G[:, 0] - msx[sub_of], G[:, 1] - msy[sub_of]
            vx, vy = T[:, 0] - mdx[sub_of], T[:, 1] - mdy[sub_of]
            sin_acc = np.bincount(sub_of, w * (ux * vy - uy * vx),
                                  minlength=S)
            cos_acc = np.bincount(sub_of, w * (ux * vx + uy * vy),
                                  minlength=S)
            th = np.where(good, np.arctan2(sin_acc, cos_acc), 0.0) * step
            cc, ss = np.cos(th), np.sin(th)
            # t = m_dst - R m_src, then damp the translation too.
            tx = np.where(good, mdx - (cc * msx - ss * msy), 0.0) * step
            ty = np.where(good, mdy - (ss * msx + cc * msy), 0.0) * step
            # Gauge: compose every update with inv(update_0).
            inv_c, inv_s = cc[0], -ss[0]
            itx = -(inv_c * tx[0] - inv_s * ty[0])
            ity = -(inv_s * tx[0] + inv_c * ty[0])
            th = _wrap(th - th[0])
            tx2 = inv_c * tx - inv_s * ty + itx
            ty2 = inv_s * tx + inv_c * ty + ity
            cc, ss = np.cos(th), np.sin(th)
            ax = cc * anchors[:, 0] - ss * anchors[:, 1] + tx2
            ay = ss * anchors[:, 0] + cc * anchors[:, 1] + ty2
            moved = np.max(np.hypot(ax - anchors[:, 0],
                                    ay - anchors[:, 1]) + np.abs(th))
            anchors = np.stack(
                [ax, ay, _wrap(anchors[:, 2] + th)], axis=1)
            if moved < tol:
                break
    return anchors, gids, table


def align_refine_anchors(submaps, anchors, *, match_radius: float = 2.0,
                         register_radius: float | None = None,
                         sweeps: int = 4, min_matches: int = 12,
                         tol: float = 1e-2):
    """ICP-style block-coordinate refinement of the anchor chain: each
    sweep re-registers every submap against the union of all OTHERS
    (leave-self-out), with translation-vote bootstrap so seams larger
    than the match gate (the 1-3 m rubber-band residuals between online
    loop-closure fixes) are still captured.  Submap 0 holds the gauge.

    This is the robust joint-registration backend for loop-closed
    chains; unlike the factor-graph GN it needs no correspondences to
    START (the vote finds them) and unlike consensus-GPA its per-submap
    target is the other submaps' clouds, not a mean that the submap
    itself biases.  Cost: O(sweeps x total landmarks) host work + one
    native index per submap per sweep.

    Returns refined anchors (match/assemble afterwards for the map)."""
    anchors = np.asarray(anchors, np.float64).reshape(-1, 3).copy()
    S = len(submaps)
    loc = [np.asarray(sm.lm_local, np.float64).reshape(-1, 2)
           for sm in submaps]
    for _ in range(max(sweeps, 1)):
        G = [se2_transform_points(anchors[i], loc[i]) for i in range(S)]
        sizes = np.array([len(g) for g in G])
        allp = (np.concatenate([g for g in G if len(g)])
                if sizes.sum() else np.zeros((0, 2)))
        src = np.repeat(np.arange(S), sizes)
        moved = 0.0
        for i in range(1, S):
            g = G[i]
            if len(g) < min_matches:
                continue
            pad = register_radius or match_radius
            lo, hi = g.min(0) - pad, g.max(0) + pad
            sel = ((src != i) & (allp[:, 0] >= lo[0])
                   & (allp[:, 0] <= hi[0]) & (allp[:, 1] >= lo[1])
                   & (allp[:, 1] <= hi[1]))
            if sel.sum() < min_matches:
                continue
            res = align_submap_to_table(
                g, allp[sel], match_radius,
                register_radius=register_radius,
                min_matches=min_matches,
            )
            if res is None:
                continue
            th, t, _ = res
            anchors[i] = _se2_apply_to_pose(th, t, anchors[i])
            moved = max(moved, float(np.hypot(*t)) + abs(th) * 30.0)
        if moved < tol:
            break
    return anchors


def reconcile_anchors(submaps, anchors, match_radius: float, *,
                      sweeps: int = 3, gap: int = 2,
                      min_inliers: int = 18, register_radius: float = 12.0,
                      tol: float = 0.05, log=None):
    """Offline global re-registration of a bent / ghost-branched chain —
    the assembly-stage counterpart of the online constellation reloc
    (VERDICT r4 tasks 1-2).

    The online corrector can only conform the chain HEAD; segments whose
    drift was baked into the table before a loop closed stay bent, and a
    revisit that failed to relocalize leaves a ghost branch.  No
    assembly-side MATCHING can recover that (measured on a bent 20k run:
    online gids coverage 0.38, plain re-match 0.39, vote re-match 0.40)
    because the ANCHORS are wrong.  This pass fixes the anchors: each
    sweep re-registers every submap INDIVIDUALLY against the union of
    all others (leave-self-out +- gap, so handover-shared landmarks
    cannot self-confirm), by

      * NN + translation-vote alignment for in-window displacement
        (align_submap_to_table), and
      * constellation relocalization (graph/placerec.py) for submaps
        beyond any vote window — accepted on tight-gate verification
        DOMINANCE over the current placement (h_move >= 1.5 h_stay + 8),
        which is also what dissolves ghost branches: a minority-branch
        submap's move onto the majority branch strictly dominates
        staying.

    Submap 0 holds the gauge.  Returns the reconciled anchors; derive
    gids/table with match_submap_landmarks afterwards."""
    from tpuslam.graph.placerec import ConstellationDB, ransac_se2
    from tpuslam.native import SpatialIndex

    anchors = np.asarray(anchors, np.float64).reshape(-1, 3).copy()
    S = len(submaps)
    loc = [np.asarray(sm.lm_local, np.float64).reshape(-1, 2)
           for sm in submaps]
    # First-observer-only indexing (same as the online db): indexing
    # every observation of every landmark multiplies bucket density by
    # the mean observation count and blew the per-submap query to ~9 s
    # at 20k; first-seen keeps it in the tens of ms at identical recall
    # (the revisit query still carries the full cloud).
    gids0, _, _ = match_submap_landmarks(submaps, anchors, match_radius)
    n_table0 = 1 + max((int(np.max(g)) for g in gids0 if len(g)),
                       default=0)
    seen = np.zeros(n_table0, bool)
    db = ConstellationDB()
    for i in range(S):
        if not len(loc[i]):
            continue
        ids = np.asarray(gids0[i], np.int64)
        mask = ~seen[ids]
        seen[ids] = True
        db.add_submap(i, loc[i], index_mask=mask)
    sg = min(match_radius, 1.0)

    for sweep in range(max(sweeps, 1)):
        G = [se2_transform_points(anchors[i], loc[i]) for i in range(S)]
        sizes = np.array([len(g) for g in G])
        allp = (np.concatenate([g for g in G if len(g)])
                if sizes.sum() else np.zeros((0, 2)))
        src = np.repeat(np.arange(S), sizes)
        moved_total = 0.0
        n_nn = n_reloc = 0
        for i in range(1, S):
            g = G[i]
            if len(g) < min_inliers:
                continue
            excl = (src < i - gap) | (src > i + gap)

            def _hits(cloud, pad=2.0 * match_radius):
                lo, hi = cloud.min(0) - pad, cloud.max(0) + pad
                sel = (excl & (allp[:, 0] >= lo[0]) & (allp[:, 0] <= hi[0])
                       & (allp[:, 1] >= lo[1]) & (allp[:, 1] <= hi[1]))
                if sel.sum() == 0:
                    return 0, sel
                idx = SpatialIndex(allp[sel], cell_size=max(sg, 1.0))
                return int((idx.match(cloud, sg) >= 0).sum()), sel

            # Stage 1: in-window NN + vote alignment against the others.
            pad = register_radius + 2 * match_radius
            lo, hi = g.min(0) - pad, g.max(0) + pad
            sel = (excl & (allp[:, 0] >= lo[0]) & (allp[:, 0] <= hi[0])
                   & (allp[:, 1] >= lo[1]) & (allp[:, 1] <= hi[1]))
            if sel.sum() >= min_inliers:
                res = align_submap_to_table(
                    g, allp[sel], match_radius,
                    register_radius=register_radius, topk=4,
                    min_matches=min_inliers)
                if res is not None:
                    th, t, _ = res
                    cand = _se2_apply_to_pose(th, t, anchors[i])
                    if (np.isfinite(cand).all()
                            and abs(_wrap(cand[2] - anchors[i][2])) < 0.2):
                        c_, s_ = np.cos(th), np.sin(th)
                        gg = g @ np.array([[c_, s_], [-s_, c_]]) + t
                        d = float(np.linalg.norm(
                            gg.mean(0) - g.mean(0)))
                        if d > 0.05:
                            h0, _ = _hits(g)
                            hm, _ = _hits(gg)
                            if hm > max(1.2 * h0, h0 + 4):
                                anchors[i] = cand
                                G[i] = g = gg
                                moved_total += d
                                n_nn += 1
            # Stage 2: constellation reloc for beyond-window placement /
            # ghost-branch resolution.
            q_idx, qsrc, qlidx, votes = db.query(
                loc[i], src_max=S, src_skip=(max(i - gap, 0), i + gap))
            if len(q_idx) < min_inliers:
                continue
            tgt = np.empty((len(q_idx), 2))
            for s2 in np.unique(qsrc):
                m = qsrc == s2
                tgt[m] = se2_transform_points(
                    anchors[int(s2)], loc[int(s2)][qlidx[m]])
            res = ransac_se2(g[q_idx], tgt,
                             weights=votes.astype(np.float64),
                             min_inliers=max(8, min_inliers // 2))
            if res is None:
                continue
            th, t, mask, n_second = res
            cand = _se2_apply_to_pose(th, t, anchors[i])
            if not np.isfinite(cand).all() \
                    or abs(_wrap(cand[2] - anchors[i][2])) > 0.5:
                continue
            c_, s_ = np.cos(th), np.sin(th)
            gg = g @ np.array([[c_, s_], [-s_, c_]]) + t
            d = float(np.linalg.norm(gg.mean(0) - g.mean(0)))
            if d < 0.5 * match_radius:
                continue
            # Verification DOMINANCE over staying put (no abstention on
            # a near-identity second hypothesis: stay-vs-move is exactly
            # the test).
            h0, _ = _hits(g)
            hm, _ = _hits(gg)
            if hm >= max(min_inliers, 1.5 * h0 + 8):
                anchors[i] = cand
                G[i] = gg
                moved_total += d
                n_reloc += 1
        if log:
            log(f"reconcile sweep {sweep}: nn={n_nn} reloc={n_reloc} "
                f"moved={moved_total:.1f} m")
        if moved_total < tol:
            break
    return anchors


# ------------------------------------------------- anchor-graph assembly

def _discriminative_matches(idx_obj, table, g, idx, radius: float,
                            ratio: float, mutual: bool):
    """Filter NN matches to the unambiguous ones.

    Wrong cross-submap merges are the graph poison at scale: in a uniform
    random field the nearest-neighbor distance distribution reaches well
    under half the mean spacing, so a gate wide enough to absorb drift
    also merges NEIGHBORS (measured: 12.6% of global ids carried
    conflicting true landmarks at 2k density, dragging the BA optimum
    ~1.5 m off truth).  Two classic stereo-matching tests kill these:

      * ratio test — reject when the second-nearest table entry is closer
        than `ratio` x the nearest (ambiguous);
      * mutual test — reject unless the table point's nearest submap
        landmark is the same pair (one-to-one).

    Returns the filtered idx (rejected entries set to -1)."""
    from tpuslam.native import SpatialIndex

    ok = idx >= 0
    if not ok.any():
        return idx
    out = idx.copy()
    sel = np.nonzero(ok)[0]
    d1 = np.linalg.norm(g[sel] - table[idx[sel]], axis=1)
    if ratio:
        nn2 = idx_obj.match_excluding(g[sel], radius * ratio, idx[sel])
        has2 = nn2 >= 0
        d2 = np.full(len(sel), np.inf)
        d2[has2] = np.linalg.norm(g[sel][has2] - table[nn2[has2]], axis=1)
        out[sel[d2 < ratio * d1]] = -1
    if mutual:
        sel = np.nonzero(out >= 0)[0]
        if len(sel):
            gidx = SpatialIndex(g, cell_size=max(radius, 1.0))
            back = gidx.match(table[out[sel]], radius)
            out[sel[back != sel]] = -1
    return out


def match_submap_landmarks(submaps, anchors, radius: float,
                           register_radius: float | None = None,
                           min_votes: int = 12, ratio: float = 1.5,
                           mutual: bool = True):
    """Greedy sequential cross-submap landmark association.

    Transforms each submap's landmarks into the global frame with the
    given anchors and matches them against the running global table via
    the native grid index (radius-NN).

    With `register_radius` set, each submap is first REGISTERED against
    the table by translation voting (native offset_vote — landmark-cloud
    scan matching): the dominant pairwise offset within register_radius
    is subtracted before matching.  This closes loops whose drift exceeds
    the landmark spacing, where plain nearest-neighbor matching locks in
    wrong pairs (measured: 20k-landmark single-pass course, drift 5-15 m
    over 5.7 m spacing).  The anchor corrections are applied cumulatively
    along the chain (downstream anchors inherit upstream drift).

    Returns (gids, table, anchors_adj): gids[i] is an (n_i,) int array of
    global landmark ids for submap i; table is the (M, 2) global position
    table (first-seen estimate); anchors_adj the registration-corrected
    anchors (== input anchors when registration is off).
    """
    from tpuslam.native import SpatialIndex

    table_arr = np.zeros((0, 2))
    gids = []
    anchors_adj = []
    shift = np.zeros(2)
    for sm, a in zip(submaps, anchors):
        a = np.asarray(a, np.float64).copy()
        a[:2] += shift  # inherit upstream registration corrections
        g = se2_transform_points(a, sm.lm_local)
        if len(table_arr) and len(g):
            idx_obj = SpatialIndex(table_arr, cell_size=max(radius, 1.0))
            idx = _discriminative_matches(
                idx_obj, table_arr, g, idx_obj.match(g, radius), radius,
                ratio, mutual)
            if register_radius:
                (dx, dy), votes = idx_obj.offset_vote(
                    g, register_radius, bin_size=1.0
                )
                if votes >= min_votes and (dx * dx + dy * dy) > 0.25:
                    # Accept the voted shift ONLY if it increases the
                    # inlier count decisively (RANSAC-style score) at a
                    # TIGHT gate: at the normal gate a random shift in a
                    # dense field still matches ~half the points (gate ~
                    # 0.4x spacing), so discrimination needs a gate well
                    # under the spacing; the vote-refined offset is good
                    # to ~0.5 m when real.
                    d = np.asarray([dx, dy])
                    sg = min(radius, 1.0)
                    h0 = int((idx_obj.match(g, sg) >= 0).sum())
                    hs = int((idx_obj.match(g + d, sg) >= 0).sum())
                    gain = min(8, max(2, len(g) // 4))
                    if hs > max(1.5 * h0, h0 + gain):
                        g = g + d
                        a[:2] += d
                        shift += d
                        idx = _discriminative_matches(
                            idx_obj, table_arr, g,
                            idx_obj.match(g, radius), radius, ratio, mutual)
        else:
            idx = np.full(len(g), -1, dtype=np.int64)
        # Unmatched landmarks get fresh sequential ids in scan order
        # (vectorized; identical assignment to the per-landmark loop it
        # replaces, which was the host-side wall at >=100k landmarks).
        new = idx < 0
        ids = idx.copy()
        ids[new] = len(table_arr) + np.arange(int(new.sum()))
        gids.append(ids)
        anchors_adj.append(a)
        table_arr = np.concatenate([table_arr, g[new]], axis=0)
    return gids, table_arr, np.asarray(anchors_adj).reshape(-1, 3)


def build_anchor_ba(submaps, *, match_radius: float = 2.0, dtype=None,
                    anchors=None, register_radius: float | None = None):
    """Pack the closed submaps into a BAProblem over (anchors, landmarks).

    Returns (prob, gids).  Solve with graph.ba.gauss_newton (or the
    sharded/grid variants at scale), then feed poses back through
    assemble_global_map.  Anchors default to the dead-reckoned chain
    (pass refined ones to re-match after an optimization round); the
    gauge is fixed by the prior on anchor 0.  `register_radius` enables
    translation-voting registration before matching (see
    match_submap_landmarks) — the registered anchors also become the BA
    initialization.
    """
    import jax
    import jax.numpy as jnp

    from tpuslam.graph.ba import BAProblem

    dtype = dtype or (np.float64 if jax.config.jax_enable_x64
                      else np.float32)
    S = len(submaps)
    if anchors is None:
        anchors = [submaps[0].anchor0]
        for sm in submaps[:-1]:
            anchors.append(se2_compose(anchors[-1], sm.rel_pose))
    anchors = np.asarray(anchors)

    gids, table, anchors = match_submap_landmarks(
        submaps, anchors, match_radius, register_radius=register_radius
    )
    M = len(table)

    # Odometry factors between consecutive anchors; shared whitener from
    # the mean relative-pose covariance (documented approximation).
    odo_i = np.arange(S - 1, dtype=np.int32)
    odo_j = odo_i + 1
    odo_meas = np.asarray([sm.rel_pose for sm in submaps[:-1]]
                          ).reshape(-1, 3)
    covs = np.asarray([sm.rel_cov for sm in submaps[:-1]])
    mean_cov = (covs.mean(0) if len(covs)
                else np.eye(3) * 1e-4)
    mean_cov = mean_cov + 1e-8 * np.eye(3)
    odo_W = np.linalg.cholesky(np.linalg.inv(mean_cov)).T

    # Observation factors: landmark at local (x, y) == range-bearing
    # (hypot, atan2) measured from the anchor pose (which is (0,0,0) in
    # its own frame).  Shared whitener from the median marginal sigma
    # mapped to (range, bearing) at the median range.
    obs_p, obs_l, obs_z = [], [], []
    sig2, rngs = [], []
    for i, sm in enumerate(submaps):
        for j in range(len(sm.lm_local)):
            lx, ly = sm.lm_local[j]
            r = float(np.hypot(lx, ly))
            obs_p.append(i)
            obs_l.append(int(gids[i][j]))
            obs_z.append([r, float(np.arctan2(ly, lx))])
            sig2.append(np.trace(sm.lm_cov[j]) / 2)
            rngs.append(r)
    Fz = len(obs_p)
    sig = float(np.sqrt(np.median(sig2))) if Fz else 0.1
    med_r = float(np.median(rngs)) if Fz else 10.0
    sig = max(sig, 1e-3)
    obs_W = np.diag([1.0 / sig, med_r / sig])

    # Bucket-pad the landmark/factor axes (masked slots) so repeated
    # solves during a growing run hit a handful of compiled shapes
    # instead of one per closure.
    Mp = max(-(-M // 2048) * 2048, 2048) if M else 1
    Fp = max(-(-Fz // 2048) * 2048, 2048) if Fz else 1
    lm_pad = np.zeros((Mp, 2))
    lm_pad[:M] = table
    lm_mask = np.zeros(Mp, bool)
    lm_mask[:M] = True
    op = np.zeros(Fp, np.int32)
    ol = np.zeros(Fp, np.int32)
    oz = np.zeros((Fp, 2))
    om = np.zeros(Fp, bool)
    op[:Fz] = obs_p
    ol[:Fz] = obs_l
    oz[:Fz] = np.asarray(obs_z).reshape(Fz, 2) if Fz else oz[:0]
    om[:Fz] = True

    prob = BAProblem(
        poses=jnp.asarray(anchors, dtype),
        landmarks=jnp.asarray(lm_pad, dtype),
        lm_mask=jnp.asarray(lm_mask),
        odo_i=jnp.asarray(odo_i),
        odo_j=jnp.asarray(odo_j),
        odo_meas=jnp.asarray(odo_meas, dtype),
        odo_mask=jnp.ones(max(S - 1, 0), bool),
        odo_sqrt_info=jnp.asarray(odo_W, dtype),
        obs_p=jnp.asarray(op),
        obs_l=jnp.asarray(ol),
        obs_z=jnp.asarray(oz, dtype),
        obs_mask=jnp.asarray(om),
        obs_sqrt_info=jnp.asarray(obs_W, dtype),
        prior_sqrt_info=jnp.eye(3, dtype=dtype) * 1e3,
    )
    return prob, gids


def optimize_anchor_graph(submaps, *, rounds: int = 3, iters: int = 15,
                          match_radius: float = 2.0, dtype=None,
                          init_anchors=None, on_host: bool = True,
                          register_radius: float | None = None,
                          huber: float | None = 3.0):
    """Alternate landmark matching and Gauss-Newton over the anchor graph.

    Round 1 matches with `init_anchors` (default: the dead-reckoned
    chain); later rounds re-match with the optimized ones, merging
    duplicate landmark nodes that initial anchor drift kept apart (the
    loop-closure constraints tighten as the estimate improves — an
    ICP-style EM alternation).  Returns (prob_opt, gids, anchors_opt).

    on_host=True pins the solve to the host CPU: the anchor graph is tiny
    next to the filter (K anchors, not K poses-per-tick) and its pose
    count CHANGES every closure, so solving it on the accelerator would
    recompile per closure — on this stack a 30-200 s remote compile each
    time.  The big-M 1M-landmark batch solve stays on-device via
    ba_large/ba_sharded (static shapes)."""
    import contextlib

    import jax

    from tpuslam.graph.ba import gauss_newton

    ctx = contextlib.nullcontext()
    if on_host:
        try:
            ctx = jax.default_device(jax.devices("cpu")[0])
        except RuntimeError:
            pass
    import jax.numpy as jnp

    if init_anchors is not None:
        anchors = np.asarray(init_anchors)
    else:
        anchors = [submaps[0].anchor0]
        for sm in submaps[:-1]:
            anchors.append(se2_compose(anchors[-1], sm.rel_pose))
        anchors = np.asarray(anchors)
    prob = gids = None
    with ctx:
        for _ in range(max(rounds, 1)):
            prob, gids = build_anchor_ba(
                submaps, match_radius=match_radius, dtype=dtype,
                anchors=anchors, register_radius=register_radius,
            )
            prob, _ = gauss_newton(prob, iters, huber=huber)
            new = np.asarray(prob.poses)
            if not np.isfinite(new).all():
                # GN blow-up (inconsistent wrong matches): keep the last
                # finite anchors; the caller's sanity gates handle the
                # rest.
                prob = prob._replace(
                    poses=jnp.asarray(anchors, prob.poses.dtype))
                break
            anchors = new
    return prob, gids, anchors


def build_grid_from_submaps(submaps, anchors, *, match_radius: float = 2.0,
                            register_radius: float | None = None,
                            max_obs_per_lm: int = 8, chunk: int = 4096,
                            pad_to: int | None = None, dtype=None):
    """Pack closed submaps into ba_large's landmark-major BAGridProblem —
    the join between the submap front end and the 1M-landmark grid BA
    backend (BASELINE config 5; same factor semantics as build_anchor_ba,
    laid out scatter-free for the on-device solve).

    Anchors are the pose nodes; each submap landmark is one (range,
    bearing) observation of its global landmark id from its anchor;
    consecutive anchors get odometry factors.  Landmarks seen from more
    than `max_obs_per_lm` submaps drop the extra sightings (reported in
    the return, never silent).  The landmark axis is padded to a multiple
    of `chunk` (or to `pad_to`) so repeated solve rounds of a shrinking
    matched set reuse ONE compiled executable.

    Returns (prob, gids, n_landmarks, n_dropped_obs).
    """
    import jax
    import jax.numpy as jnp

    from tpuslam.graph.ba_large import BAGridProblem

    dtype = dtype or (np.float64 if jax.config.jax_enable_x64
                      else np.float32)
    S = len(submaps)
    O = max_obs_per_lm
    gids, table, anchors = match_submap_landmarks(
        submaps, np.asarray(anchors), match_radius,
        register_radius=register_radius,
    )
    M = len(table)
    # pad_to is a floor, not a cap: if re-matching ever yields more ids
    # than the requested bucket, grow to the next chunk multiple (costs a
    # recompile but never a wrong result).
    Mp = max(pad_to or 0, -(-max(M, 1) // chunk) * chunk, chunk)

    obs_p = np.zeros((Mp, O), np.int32)
    obs_z = np.zeros((Mp, O, 2))
    obs_mask = np.zeros((Mp, O), bool)
    counts = np.zeros(Mp, np.int32)
    dropped = 0
    sig2_all, rng_all = [], []
    for i, sm in enumerate(submaps):
        n_i = len(sm.lm_local)
        if not n_i:
            continue
        ids = np.asarray(gids[i], np.int64)
        r = np.hypot(sm.lm_local[:, 0], sm.lm_local[:, 1])
        b = np.arctan2(sm.lm_local[:, 1], sm.lm_local[:, 0])
        # Vectorized slot assignment with intra-submap duplicate ids:
        # stable-sort by id, rank within each group, offset by the running
        # per-id count.  (A per-landmark Python loop here was the r2
        # host-side wall — VERDICT weak #5.)
        uniq, inv, cnt = np.unique(ids, return_inverse=True,
                                   return_counts=True)
        order = np.argsort(inv, kind="stable")
        ranks = np.empty(n_i, np.int64)
        ranks[order] = np.arange(n_i) - np.repeat(
            np.cumsum(np.concatenate([[0], cnt[:-1]])), cnt)
        slot = counts[ids] + ranks
        ok = slot < O
        dropped += int((~ok).sum())
        obs_p[ids[ok], slot[ok]] = i
        obs_z[ids[ok], slot[ok], 0] = r[ok]
        obs_z[ids[ok], slot[ok], 1] = b[ok]
        obs_mask[ids[ok], slot[ok]] = True
        counts[uniq] = np.minimum(counts[uniq] + cnt, O)
        if len(sm.lm_cov):
            sig2_all.append(np.trace(sm.lm_cov, axis1=1, axis2=2) / 2)
            rng_all.append(r)

    # Shared whiteners, summarized exactly as build_anchor_ba.
    sig = (float(np.sqrt(np.median(np.concatenate(sig2_all))))
           if sig2_all else 0.1)
    sig = max(sig, 1e-3)
    med_r = (float(np.median(np.concatenate(rng_all))) if rng_all else 10.0)
    obs_W = np.diag([1.0 / sig, med_r / sig])
    covs = np.asarray([sm.rel_cov for sm in submaps[:-1]])
    mean_cov = (covs.mean(0) if len(covs) else np.eye(3) * 1e-4)
    mean_cov = mean_cov + 1e-8 * np.eye(3)
    odo_W = np.linalg.cholesky(np.linalg.inv(mean_cov)).T

    lm_pad = np.zeros((Mp, 2))
    lm_pad[:M] = table
    lm_mask = np.zeros(Mp, bool)
    lm_mask[:M] = True

    # Information-scaled gauge prior (see make_grid_ba_problem): at f32
    # and >=100k factors the anchor prior must be as stiff as the data
    # modes or accumulation noise drifts the solution along the gauge.
    n_obs_total = int(obs_mask.sum())
    prior_w = (1.0 / sig) * np.sqrt(max(n_obs_total, 1))

    prob = BAGridProblem(
        poses=jnp.asarray(anchors, dtype),
        landmarks=jnp.asarray(lm_pad, dtype),
        lm_mask=jnp.asarray(lm_mask),
        obs_p=jnp.asarray(obs_p),
        obs_z=jnp.asarray(obs_z, dtype),
        obs_mask=jnp.asarray(obs_mask),
        odo_i=jnp.asarray(np.arange(S - 1, dtype=np.int32)),
        odo_j=jnp.asarray(np.arange(1, S, dtype=np.int32)),
        odo_meas=jnp.asarray(
            np.asarray([sm.rel_pose for sm in submaps[:-1]]
                       ).reshape(-1, 3), dtype),
        odo_mask=jnp.asarray(np.ones(max(S - 1, 0), bool)),
        odo_sqrt_info=jnp.asarray(odo_W, dtype),
        obs_sqrt_info=jnp.asarray(obs_W, dtype),
        prior_sqrt_info=jnp.asarray(np.eye(3) * prior_w, dtype),
    )
    return prob, gids, M, dropped


def optimize_anchor_graph_grid(submaps, *, rounds: int = 3, iters: int = 10,
                               match_radius: float = 2.0,
                               register_radius: float | None = None,
                               init_anchors=None, chunk: int = 4096,
                               max_obs_per_lm: int = 8, dtype=None,
                               huber: float | None = 3.0, log=None):
    """The at-scale global solve: alternate host-side landmark matching
    with ON-DEVICE grid Gauss-Newton (ba_large) over the anchor graph —
    optimize_anchor_graph's big-M sibling (that one solves on host via the
    factor-list path; this one scales to 1M landmarks on the chip).

    The landmark axis is padded to one static bucket sized from round 1,
    so every round reuses the same compiled executable (a remote compile
    costs 30-200 s on this stack).  Returns (prob, gids, anchors)."""
    from tpuslam.graph.ba_large import gauss_newton_grid

    if init_anchors is not None:
        anchors = np.asarray(init_anchors)
    else:
        anchors = [submaps[0].anchor0]
        for sm in submaps[:-1]:
            anchors.append(se2_compose(anchors[-1], sm.rel_pose))
        anchors = np.asarray(anchors)

    pad_to = None
    prob = gids = None
    for rnd in range(max(rounds, 1)):
        prob, gids, M, dropped = build_grid_from_submaps(
            submaps, anchors, match_radius=match_radius,
            register_radius=register_radius, chunk=chunk,
            max_obs_per_lm=max_obs_per_lm, pad_to=pad_to, dtype=dtype,
        )
        pad_to = prob.landmarks.shape[0]  # sticky bucket: reuse the compile
        if log:
            log(f"grid round {rnd}: M={M} dropped_obs={dropped} "
                f"pad={pad_to}")
        prob, _ = gauss_newton_grid(prob, iters, chunk=chunk,
                                    with_cost=False, huber=huber)
        new = np.asarray(prob.poses)
        if not np.isfinite(new).all():
            import jax.numpy as jnp

            prob = prob._replace(poses=jnp.asarray(anchors,
                                                   prob.poses.dtype))
            break
        anchors = new
    return prob, gids, anchors


def merge_duplicates(positions, weights=None, radius: float = 1.5):
    """Union-find merge of near-coincident global landmarks.

    Residual cross-submap duplicates arise when drift AT MATCH TIME
    exceeded the gate but the post-BA positions coincide; one transitive
    pass (i ~ nearest-other within `radius`) collapses them.  Keep
    `radius` well under the landmark spacing.  Returns (merged (M', 2),
    remap (M,) int64 old->new)."""
    from tpuslam.native import SpatialIndex, union_find_roots

    pos = np.asarray(positions, np.float64).reshape(-1, 2)
    M = len(pos)
    if M == 0:
        return pos, np.zeros(0, np.int64)
    w = (np.asarray(weights, np.float64) if weights is not None
         else np.ones(M))
    idx = SpatialIndex(pos, cell_size=max(radius, 1.0))
    nn = idx.match_excluding(pos, radius, np.arange(M))
    roots = union_find_roots(nn)
    uniq, remap = np.unique(roots, return_inverse=True)
    merged = np.zeros((len(uniq), 2))
    wsum = np.zeros(len(uniq))
    np.add.at(merged, remap, pos * w[:, None])
    np.add.at(wsum, remap, w)
    return merged / wsum[:, None], remap.astype(np.int64)


def chain_consistency(submaps, anchors, radius: float,
                      register_radius: float | None = None):
    """Truth-free internal consistency of an anchor chain: re-match at
    these anchors, then measure how tightly each submap's sightings
    agree with the consensus position of their global id.

    Returns {"med_res": median shared-sighting residual [m],
             "n_shared": ids seen from >= 2 submaps, "M": table size}.
    med_res is the backend-selection signal (lower = submap clouds agree
    better); n_shared/M are the guards — a backend that 'improves'
    med_res by losing cross-submap matches (n_shared collapse) or by
    splitting ids (M blow-up) is rejected, not rewarded."""
    gids, table, anc = match_submap_landmarks(
        submaps, anchors, radius, register_radius=register_radius)
    M = len(table)
    pos = np.zeros((M, 2))
    cnt = np.zeros(M)
    allg, allid = [], []
    for sm, a, ids in zip(submaps, anc, gids):
        if not len(sm.lm_local):
            continue
        g = se2_transform_points(a, sm.lm_local)
        ids = np.asarray(ids, np.int64)
        np.add.at(pos, ids, g)
        np.add.at(cnt, ids, 1.0)
        allg.append(g)
        allid.append(ids)
    if not allg:
        return {"med_res": np.inf, "n_shared": 0, "M": M}
    pos /= np.maximum(cnt, 1)[:, None]
    G = np.concatenate(allg)
    I = np.concatenate(allid)
    shared = cnt[I] >= 2
    r = np.linalg.norm(G - pos[I], axis=1)
    med = float(np.median(r[shared])) if shared.any() else np.inf
    return {"med_res": med, "n_shared": int((cnt >= 2).sum()), "M": M}


def select_backend(submaps, init_anchors, radius: float, *,
                   register_radius: float | None = None,
                   candidates=("gpa", "grid"), chunk: int = 4096,
                   log=None):
    """Evaluated global-solve selection (VERDICT r3 task 2).

    Round-3's fixed policy ('plain when online-aligned, gpa+grid when
    dead-reckoned') was measured wrong in both directions on the r4
    saved runs: whether an optimizer helps depends on how close the
    front end already is to the consensus floor, and the single biggest
    real-data failure was not an optimizer at all but the translation
    VOTE inside the final matching (2k chip run: plain assembly 0.614 m
    matched RMSE with a 26 m vote window vs 0.237 m with voting off —
    the vote occasionally locks onto an alias peak and drags whole
    submaps; callers should pass register_radius=None for chains the
    online aligner already conformed).

    This routine runs cheap candidate backends from `init_anchors` and
    keeps the one that best improves the truth-free chain_consistency
    score, GUARDED so no candidate that degrades matching structure can
    win: accept only if med_res < 0.98x plain AND n_shared >= 0.97x
    plain AND M within [0.90, 1.05]x plain.  Otherwise plain assembly
    stands.  Measured (2k chip run, no vote): plain 0.237 / gpa 0.223 /
    grid 0.25 truth RMSE with internal med_res ranking them the same
    way — and the guards reject the re-match instability modes (a
    poisoned round loses ~3% of n_shared immediately).

    Returns (name, anchors, report) — report has each candidate's
    internal metrics for the run log."""
    init = np.asarray(init_anchors, np.float64).reshape(-1, 3)
    base = chain_consistency(submaps, init, radius,
                             register_radius=register_radius)
    cands = {}
    if "gpa" in candidates and len(submaps) >= 3:
        try:
            a, _, _ = gpa_refine_anchors(
                submaps, init, match_radius=radius,
                register_radius=register_radius, rematch_rounds=2)
            cands["gpa"] = np.asarray(a)
        except Exception as e:  # backend failure must never kill the run
            if log:
                log(f"gpa failed: {type(e).__name__}")
    if "grid" in candidates and len(submaps) >= 2:
        try:
            _, _, a = optimize_anchor_graph_grid(
                submaps, rounds=1, iters=12, match_radius=radius,
                init_anchors=init, register_radius=register_radius,
                chunk=chunk, log=log)
            cands["grid"] = np.asarray(a)
        except Exception as e:
            if log:
                log(f"grid failed: {type(e).__name__}")
    report = {"plain": base}
    best_name, best_a, best_med = "plain", init, base["med_res"]
    for name, a in cands.items():
        if not np.isfinite(a).all():
            continue
        c = chain_consistency(submaps, a, radius,
                              register_radius=register_radius)
        report[name] = c
        ok = (c["med_res"] < 0.98 * base["med_res"]
              and c["n_shared"] >= 0.97 * base["n_shared"]
              and 0.90 * base["M"] <= c["M"] <= 1.05 * base["M"])
        if ok and c["med_res"] < best_med:
            best_name, best_a, best_med = name, a, c["med_res"]
    return best_name, best_a, report


def merge_duplicates_covisibility(submaps, anchors, gids,
                                  n_landmarks: int, radius: float,
                                  chi2: float = 16.0,
                                  seam: float = 0.35):
    """Evidence-gated duplicate merge at assembly (VERDICT r3 task 5).

    The fixed-radius union-find (`merge_duplicates`) trades coverage for
    duplicates because within one match gate it cannot tell a ghost pair
    (one true landmark split across ids by drift or by the ratio-test
    rejection) from two TRUE neighbors.  The sighting evidence already in
    the submaps can: a local filter maps every landmark in its region,
    so two true neighbors are almost always CO-OBSERVED by at least one
    submap (which kept them distinct — trust it), while a ghost pair by
    construction never is (each sighting chain lives in different
    submaps).  Merge rule, per candidate NN pair within the FULL match
    `radius`:

      * co-visibility veto — reject if any submap observed both ids;
      * compatibility gate — reject unless |pos_a - pos_b|^2 <
        chi2 * (sig_a^2 + sig_b^2 + seam^2), with sig^2 the id's
        inverse-variance-combined marginal and `seam` the residual
        cross-submap alignment error the positions can legitimately
        differ by (measured 0.2-0.5 m rubber-band residual).

    Accepted pairs merge transitively (host union-find); merged position
    is the inverse-variance mean over ALL member sightings.  Returns
    (merged (M', 2), remap (M,) old->new).
    """
    from tpuslam.native import SpatialIndex

    M = int(n_landmarks)
    if M == 0:
        return np.zeros((0, 2)), np.zeros(0, np.int64)
    pos = np.zeros((M, 2))
    wsum = np.zeros(M)
    # Per-(id, submap) incidence for the co-visibility veto, and the
    # inverse-variance aggregates.
    ids_all, sub_all = [], []
    for si, (sm, a, ids) in enumerate(zip(submaps, np.asarray(anchors),
                                          gids)):
        if not len(sm.lm_local):
            continue
        g = se2_transform_points(a, sm.lm_local)
        w = 1.0 / np.maximum(
            np.trace(sm.lm_cov, axis1=1, axis2=2) / 2.0, 1e-9)
        np.add.at(pos, ids, g * w[:, None])
        np.add.at(wsum, ids, w)
        ids_all.append(np.asarray(ids, np.int64))
        sub_all.append(np.full(len(ids), si, np.int64))
    pos = pos / np.maximum(wsum, 1e-12)[:, None]
    sig2 = 1.0 / np.maximum(wsum, 1e-12)   # combined marginal variance
    ids_all = np.concatenate(ids_all) if ids_all else np.zeros(0, np.int64)
    sub_all = np.concatenate(sub_all) if sub_all else np.zeros(0, np.int64)
    # Sorted (id, submap) pairs -> per-id slices for fast intersection.
    order = np.lexsort((sub_all, ids_all))
    ids_s, sub_s = ids_all[order], sub_all[order]
    starts = np.searchsorted(ids_s, np.arange(M))
    ends = np.searchsorted(ids_s, np.arange(M), side="right")

    idx = SpatialIndex(pos, cell_size=max(radius, 1.0))
    nn = idx.match_excluding(pos, radius, np.arange(M))
    cand = np.nonzero(nn >= 0)[0]

    parent = np.arange(M)
    # Per-root source-submap sets: the veto must hold TRANSITIVELY — a
    # ghost bridging two co-observed neighbors would otherwise chain
    # them into one cluster.  Closest pairs first, so genuine ghosts
    # claim their cluster before a farther neighbor tries to bridge.
    root_src = {int(a): set(sub_s[starts[a]:ends[a]].tolist())
                for a in range(M)}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    d2 = np.einsum("ij,ij->i", pos - pos[nn.clip(0)],
                   pos - pos[nn.clip(0)])
    gate2 = chi2 * (sig2 + sig2[nn.clip(0)] + seam * seam)
    for a in cand[np.argsort(d2[cand], kind="stable")]:
        b = int(nn[a])
        if d2[a] >= gate2[a]:
            continue
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if root_src[ra] & root_src[rb]:
            continue  # some submap saw both clusters -> true neighbors
        rlo, rhi = min(ra, rb), max(ra, rb)
        parent[rhi] = rlo
        root_src[rlo] |= root_src.pop(rhi)
    roots = np.array([find(a) for a in range(M)])
    uniq, remap = np.unique(roots, return_inverse=True)
    merged = np.zeros((len(uniq), 2))
    msum = np.zeros(len(uniq))
    np.add.at(merged, remap, pos * wsum[:, None])
    np.add.at(msum, remap, wsum)
    return merged / np.maximum(msum, 1e-12)[:, None], remap.astype(np.int64)


def assemble_global_map(submaps, anchors, gids, n_landmarks: int):
    """Merge the submap maps under the given anchor poses.

    Each global landmark's position is the inverse-variance-weighted mean
    of its cross-submap sightings.  Returns (M, 2)."""
    pos = np.zeros((n_landmarks, 2))
    wsum = np.zeros(n_landmarks)
    for sm, a, ids in zip(submaps, np.asarray(anchors), gids):
        g = se2_transform_points(a, sm.lm_local)
        w = 1.0 / np.maximum(
            np.trace(sm.lm_cov, axis1=1, axis2=2), 1e-9
        ) if len(sm.lm_cov) else np.zeros(0)
        np.add.at(pos, ids, g * w[:, None])
        np.add.at(wsum, ids, w)
    return pos / np.maximum(wsum, 1e-12)[:, None]
