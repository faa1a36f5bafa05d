"""PySpark-native analytics engine with the capabilities of
thangdnsf/BigCLAM-ApacheSpark, rebuilt Spark-first.

The reference (three Scala spark-shell scripts under
``/root/reference/codes/``) implements BigCLAM — Cluster Affiliation
Model for Big Networks (Yang & Leskovec, WSDM 2013) — overlapping
community detection, on RDD/GraphX/Breeze. This package re-expresses
every operator in the reference's inventory (SURVEY.md §2) as pure
DataFrame → DataFrame functions so Catalyst/Tungsten/AQE pick the
physical strategy, plus the large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal
plumbing, event-time windows).

Layout:
    sources/    edge-list readers, graph derivations from tables (A1-A2)
    operators/  graph ops (B*), BigCLAM optimizer (C*/F*), dedup,
                similarity, text analysis, multimodal
    functions/  reusable array/vector column expressions
    plans/      explain/plan-inspection helpers
    streaming/  event-time windows + Structured Streaming wrappers
"""

__version__ = "0.1.0"
