"""Cross-query shared relations for suite sessions (bench / gate /
sweep): one cached copy of an expensive derivation consumed by several
registry queries in the SAME session, with explicit release.

Motivation (VERDICT r8 asks #3/#6): the structural-similarity wedge
join (|E|^1.5-bounded) and the weighted co-purchase pair derivation
(lineitem → basket → pair hash-agg) are each consumed by 3-5 registry
queries per suite pass; uncached, every consumer pays the full
derivation again. ``q_louvain_coarsen``'s intra-query cache took its
wall time 14.1 → 7.3 s at sf0.1 — this module applies the same move
ACROSS queries, which is exactly what a production pipeline sharing a
session does (build the feature relation once, serve many analyses).

Contract:
  - Keyed by (applicationId, sf_dir, name): a new Spark session or a
    different scale factor never sees a stale entry.
  - ``shared()`` re-persists if something (e.g. bench.py's
    ``spark.catalog.clearCache()`` on a re-measure) dropped the cache:
    consumers always get a cached-or-recaching relation, never a
    silently-uncached one.
  - Suite harnesses call ``release_all()`` when done; single-query
    callers may skip it — the cache dies with the session, and every
    entry is bounded (edge-similarity / thresholded-pair relations,
    |E|-sized, far below executor memory at any tested SF).

Scale note: at 100 TB the same pattern holds — the shared relation is
a persisted (or checkpoint-materialized) intermediate dataset, built
once per pipeline run, not per downstream consumer.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_POOL: dict[tuple[str, str, str], DataFrame] = {}


def shared(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the session-shared cached relation ``name`` for
    ``sf_dir``, building + persisting it on first use."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _POOL.get(key)
    if df is None:
        df = build().persist()
        _POOL[key] = df
    elif df.storageLevel.useMemory is False and df.storageLevel.useDisk is False:
        # clearCache() (bench re-measure path) dropped it — re-arm.
        df.persist()
    return df


def shared_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCAN structural similarity over the co-purchase graph — the
    |E|^1.5 wedge join shared by ``graph_structural_similarity`` and
    ``graph_scan_clusters`` (``scan_clusters(sim=...)``).

    Built FROM the pooled ``shared_sym`` substrate (OPTIMIZATION r13,
    guide §2.4/§5): ``structural_similarity`` references its edge set
    seven times (the support pass's union + orientation-degree joins +
    the closing left join, plus the two endpoint-degree joins), and
    with the raw derivation each reference re-derived the full
    lineitem → basket → double-explode → distinct chain — the
    committed before-plan shows 42 parquet scans / 122 Exchanges for
    ONE build. Reading the session-cached relation turns every
    reference into an InMemoryTableScan of the |E|-row edge set."""
    from bigclam_apachespark_spark.operators.graph import structural_similarity

    return shared(
        spark,
        sf_dir,
        "structural_similarity",
        lambda: structural_similarity(shared_sym(spark, sf_dir)),
    )


def shared_sym(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The plain (unweighted) co-purchase edge relation — the
    ``_sym`` substrate consumed by ~40 graph/BigCLAM registry queries
    per suite pass (OPTIMIZATION r13, guide §2.4/§5: one cached copy
    of the lineitem → basket → pair-explode → distinct derivation per
    session instead of one per consumer; the BigCLAM registry already
    did this via a plan-keyed ``.cache()``, which the CacheManager
    incidentally shared with every other ``_sym`` consumer — this
    makes the sharing explicit, pooled, and released at suite
    teardown)."""
    from bigclam_apachespark_spark.sources import copurchase_edges

    return shared(
        spark, sf_dir, "sym_copurchase_edges",
        lambda: copurchase_edges(spark, sf_dir),
    )


def shared_wedges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-≥2 weighted co-purchase edges — the lineitem → basket →
    pair derivation shared by the Louvain family, weighted PageRank,
    weighted SSSP, and components."""
    from bigclam_apachespark_spark.sources import weighted_copurchase_edges

    return shared(
        spark,
        sf_dir,
        "weighted_copurchase_edges_2",
        lambda: weighted_copurchase_edges(spark, sf_dir, 2),
    )


def release_all() -> None:
    """Unpersist and forget every pooled relation (suite teardown)."""
    for df in _POOL.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _POOL.clear()
