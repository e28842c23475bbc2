from tpuslam.sim.scene import make_landmarks, load_course  # noqa: F401
from tpuslam.sim.sensors import get_observations, visible_mask  # noqa: F401
