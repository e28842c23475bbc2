from tpuslam.kernels.dispatch import use_pallas  # noqa: F401
