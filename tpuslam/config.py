"""Frozen configuration dataclasses.

The reference hardcodes every parameter inline (scenario/vehicle constants in
ekfsim_setup, sim/ekfslam-sim.jl:20-44; noise+timing in sim!,
sim/ekfslam-sim.jl:62-77; association gates at the call site,
sim/ekfslam-sim.jl:111-114).  Here they live in one frozen config tree, with
the reference values as the `course1` preset so runs are comparable.
"""

from __future__ import annotations

import dataclasses
import math
import os

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
COURSE1_PATH = os.path.join(_REPO_ROOT, "sim", "data", "course1.txt")


@dataclasses.dataclass(frozen=True)
class VehicleConfig:
    """Bicycle-model vehicle intrinsics (ref: sim/ekfslam-sim.jl:29-38)."""

    wheelbase: float = 4.0              # [m] front-to-rear wheel separation
    max_gamma: float = 60 * math.pi / 180   # [rad] max steering angle
    steer_rate: float = 60 * math.pi / 180  # [rad/s] max steering-angle rate
    sensor_range: float = 30.0          # [m] landmark detection radius
    target_speed: float = 8.0           # [m/s]


@dataclasses.dataclass(frozen=True)
class NoiseConfig:
    """Control / observation noise (ref: sim/ekfslam-sim.jl:64-72)."""

    sigma_speed: float = 0.5                    # [m/s]
    sigma_steer: float = 3.0 * math.pi / 180    # [rad]
    sigma_range: float = 0.1                    # [m]
    sigma_bearing: float = 1.0 * math.pi / 180  # [rad]

    @property
    def Q(self):  # 2x2 control covariance diag
        return (self.sigma_speed**2, self.sigma_steer**2)

    @property
    def R(self):  # 2x2 observation covariance diag
        return (self.sigma_range**2, self.sigma_bearing**2)


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    """Scene geometry + landmark generation (ref: sim/ekfslam-sim.jl:19-26)."""

    xmin: float = 0.0
    xmax: float = 100.0
    ymin: float = 0.0
    ymax: float = 100.0
    n_landmarks: int = 35
    landmark_margin: float = 0.05  # fraction of extent kept clear at edges
    # The reference samples landmark coordinates from a *unit-stride integer
    # range* inside the margins (sim/sim-utils.jl:1-6) — coordinates land on
    # integer grid points.  True by default for fidelity with the reference;
    # set False for continuous-uniform landmarks.
    legacy_integer_landmarks: bool = True
    waypoints_file: str = COURSE1_PATH

    @property
    def boundaries(self):
        return (self.xmin, self.xmax, self.ymin, self.ymax)


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Closed-loop sim parameters (ref: sim/ekfslam-sim.jl:49-143)."""

    scene: SceneConfig = dataclasses.field(default_factory=SceneConfig)
    vehicle: VehicleConfig = dataclasses.field(default_factory=VehicleConfig)
    noise: NoiseConfig = dataclasses.field(default_factory=NoiseConfig)

    dt: float = 0.025        # [s] control interval (40 Hz), ekfslam-sim.jl:75
    # The reference fires the EKF measurement update when the Float64
    # accumulator `dtsum` (incremented by dt per tick) exceeds dt_obs = 8*dt
    # (ekfslam-sim.jl:76,105).  In IEEE double arithmetic the 8-fold sum of
    # 0.025 equals 8*0.025 exactly, so `dtsum > dt_obs` is first true on the
    # *ninth* tick — the update cadence is every 9 control steps, not 8.
    substeps_per_obs: int = 9
    d_min: float = 1.0       # [m] waypoint switch radius, ekfslam-sim.jl:62
    nlaps: int = 2           # laps through the course, ekfslam-sim.jl:44
    gate_assoc: float = 4.0      # NIS gate for association, ekfslam-sim.jl:113
    gate_newfeat: float = 25.0   # NIS gate for new features, ekfslam-sim.jl:114

    # --- TPU-native capacity parameters (no reference analog: the reference
    # grows x/P dynamically, src/ekf.jl:108-109; we preallocate + mask). ---
    capacity: int = 64       # max landmarks in the map
    max_obs: int = 48        # max simultaneous observations per update
    max_steps: int = 10000   # track-history capacity (ekfslam-sim.jl:24-25)
    # XLA unroll factor for the per-epoch control-tick scan.  Semantics
    # are identical at any value (lax.scan unroll); >1 lets XLA fuse the
    # tiny per-tick kernels across ticks.
    tick_unroll: int = 1

    # --- FastSLAM per-particle map maintenance (no reference analog: the
    # reference declares FastSLAM but implements none, src/common.jl:14-34;
    # without maintenance the per-particle gated-NN maps saturate their
    # slots with drift-induced duplicates over multiple laps). ---
    pf_merge_radius: float = 1.0   # [m] merge features closer than this
    pf_prune_below: int = -3       # drop features with evidence count < this
    pf_visibility_margin: float = 0.7   # miss-penalty range fraction
    # New-feature NIS gate for the PARTICLE filter, deliberately much
    # stricter than the EKF's reference gate 25 (ekfslam-sim.jl:114).
    # A particle's innovation covariance S = Hf Pf Hf' + R carries no
    # pose uncertainty (the pose is a sample), so pose drift inflates
    # NIS and the reference gate mints ghost features on revisits — the
    # measured dominant FastSLAM failure mode: 2/5 seeds collapse
    # (ATE 2.1-3.9, 21-42 spurious, slot saturation) at gate 25;
    # at 100 the same seeds track (5-seed 100p CPU ATE
    # [1.13, 0.99, 1.20, 0.29, 1.42], spurious <= 6).  Failures were
    # particle-count-INDEPENDENT (same per-seed ATE at 100/1k/10k),
    # which is what pinned the mechanism on the shared observation
    # stream gating rather than proposal starvation.
    pf_gate_newfeat: float = 100.0
    # Measured (100p, course1, 2 seeds): floor -3 + margin 0.7 keeps the
    # prune dormant on healthy runs (identical results to merge-only)
    # while still bounding true spurious growth; floor 0 + margin 0.85
    # over-prunes — pose-sample error near the visibility boundary makes
    # false "missed" penalties, features prune+respawn, and the map
    # collapses (seed 0: coverage 0.37 vs 0.91).

    @property
    def state_dim(self) -> int:
        return 3 + 2 * self.capacity


def course1_config(
    n_landmarks: int = 35,
    capacity: int = 64,
    max_obs: int = 48,
    **overrides,
) -> SimConfig:
    """The canonical benchmark preset: reference parameters on course1.txt.

    The reference entry scripts use 10 landmarks (sim/run-ekfsim.jl:8,
    sim/browser/wsserver.jl:9); BASELINE config 1 uses ~35.  Both are just
    `n_landmarks` here.
    """
    scene = SceneConfig(n_landmarks=n_landmarks)
    return SimConfig(
        scene=scene,
        capacity=capacity,
        max_obs=max_obs,
        **overrides,
    )
