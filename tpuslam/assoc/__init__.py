from tpuslam.assoc.nn import associate, association_scores  # noqa: F401
