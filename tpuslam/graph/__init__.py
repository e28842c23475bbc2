from tpuslam.graph.ba import BAProblem, gauss_newton  # noqa: F401
