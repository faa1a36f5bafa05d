from bigclam_apachespark_spark.operators.graph import (
    symmetrize,
    vertices,
    degrees,
    total_volume,
    neighbor_lists,
    ego_nets,
    ego_conductance,
    local_min_seeds,
    top_k_seeds,
)

__all__ = [
    "symmetrize",
    "vertices",
    "degrees",
    "total_volume",
    "neighbor_lists",
    "ego_nets",
    "ego_conductance",
    "local_min_seeds",
    "top_k_seeds",
]
