from tpuslam.filters.state import EKFState, make_ekf_state  # noqa: F401
from tpuslam.filters.ekf import (  # noqa: F401
    add_features,
    predict,
    update,
)
