from bigclam_apachespark_spark.sources.edgelist import (
    read_edge_list,
    edges_from_pairs,
    copurchase_edges,
    customer_supplier_edges,
)

__all__ = [
    "read_edge_list",
    "edges_from_pairs",
    "copurchase_edges",
    "customer_supplier_edges",
]
