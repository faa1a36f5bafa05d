from bigclam_apachespark_spark.sources.edgelist import (
    read_edge_list,
    edges_from_pairs,
    copurchase_edges,
    customer_supplier_edges,
    weighted_copurchase_edges,
)
from bigclam_apachespark_spark.sources.docs import (
    read_documents_csv,
    read_documents_jsonl,
    write_corpus_partitioned,
    write_compacted,
)

__all__ = [
    "read_edge_list",
    "edges_from_pairs",
    "copurchase_edges",
    "customer_supplier_edges",
    "weighted_copurchase_edges",
    "read_documents_csv",
    "read_documents_jsonl",
    "write_corpus_partitioned",
    "write_compacted",
]
