from tpuslam.utils.tree import tree_select  # noqa: F401
