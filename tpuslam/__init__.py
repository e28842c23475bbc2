"""tpu-slam: a TPU-native 2-D SLAM engine (JAX / XLA / Pallas / pjit).

Built from scratch against the behavioral spec of andrewadare/SLAM.jl
(range-bearing EKF-SLAM + FastSLAM on a waypoint-following bicycle vehicle),
re-designed TPU-first: fixed-capacity masked state, batched/vmapped kernels,
Pallas for the hot covariance algebra, and landmark-block / particle sharding
over a `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md section 7):
  core/      pure-JAX geometry, motion and observation models
  filters/   fixed-capacity masked EKF + FastSLAM RBPF
  assoc/     vectorized gated nearest-neighbor data association
  kernels/   Pallas TPU kernels for the EKF update / association scoring
  parallel/  mesh + shard_map Schur-reduction EKF, particle sharding
  sim/       closed-loop simulation (jitted scan) + NumPy oracle
  graph/     keyframe pose-graph / bundle-adjustment backend
  viz/       WebSocket telemetry server (reference JSON schema)
  bench/     ATE/NEES/throughput benchmark harness
"""

__version__ = "0.1.0"

from tpuslam.config import (  # noqa: F401
    NoiseConfig,
    SceneConfig,
    SimConfig,
    VehicleConfig,
    course1_config,
)
