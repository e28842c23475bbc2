from tpuslam.parallel.mesh import make_slam_mesh  # noqa: F401
from tpuslam.parallel.ekf_sharded import (  # noqa: F401
    BlockEKFState,
    from_dense,
    to_dense,
)
