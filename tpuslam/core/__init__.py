from tpuslam.core.geometry import (  # noqa: F401
    inbounds,
    initial_pose,
    local_to_global,
    mpi_to_pi,
    read_waypoints,
)
from tpuslam.core.motion import (  # noqa: F401
    motion_jacobians,
    steer,
    step_vehicle,
)
from tpuslam.core.observation import (  # noqa: F401
    predict_observation,
    predict_observations_batch,
)
