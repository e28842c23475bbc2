"""Flat convenience namespace mirroring the reference's public API.

The reference's entire public surface is the SLAM module's export list
(src/SLAM.jl:5-30).  Every exported name has a direct counterpart here;
this module collects them so `from tpuslam import api as slam` gives a
reference-shaped view of the engine.

Reference export -> here:
  Scene               -> SceneConfig + (waypoints, landmarks, TickRecord)
  Vehicle             -> VehicleConfig (static) + VehicleState (dynamic)
  SimData             -> SimState / PFSimState
  SlamState           -> EKFState | BlockEKFState | PFState
  EKFSlamState        -> EKFState
  PFSlamState         -> PFState
  predict             -> predict
  update              -> update
  add_features        -> add_features
  associate           -> associate
  compute_association -> association_scores (batched; per-pair values equal)
  predict_observation -> predict_observation
  steer!              -> steer (pure)
  step_vehicle!       -> step_vehicle (pure)
  local_to_global     -> local_to_global
  mpi_to_pi           -> mpi_to_pi
  inbounds            -> inbounds
  initial_pose        -> initial_pose
  get_waypoints       -> read_waypoints
  ellipse             -> ellipse
  compute_landmark_ellipses -> compute_landmark_ellipses
  laser_lines         -> laser_lines
"""

from tpuslam.assoc.nn import associate, association_scores  # noqa: F401
from tpuslam.config import (  # noqa: F401
    NoiseConfig,
    SceneConfig,
    SimConfig,
    VehicleConfig,
    course1_config,
)
from tpuslam.core.ellipse import (  # noqa: F401
    compute_landmark_ellipses,
    ellipse,
    laser_lines,
)
from tpuslam.core.geometry import (  # noqa: F401
    inbounds,
    initial_pose,
    local_to_global,
    mpi_to_pi,
    read_waypoints,
)
from tpuslam.core.motion import steer, step_vehicle  # noqa: F401
from tpuslam.core.observation import predict_observation  # noqa: F401
from tpuslam.filters.ekf import (  # noqa: F401
    add_features,
    predict,
    update,
)
from tpuslam.filters.fastslam import PFState, make_pf_state  # noqa: F401
from tpuslam.filters.state import EKFState, make_ekf_state  # noqa: F401
from tpuslam.sim.simulator import (  # noqa: F401
    SimState,
    VehicleState,
    init_sim_state,
    run_epochs,
    run_epochs_rng,
)
