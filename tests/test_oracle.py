"""Driver-contract rehearsal: run each registry query on Spark AND its
DuckDB oracle SQL, compare row count + order-insensitive values — the
same gate the driver applies at sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from bigclam_apachespark_spark.registry import ORACLE, QUERIES

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(rows, colnames):
    """Order-insensitive normalized row multiset (column-name sorted,
    floats rounded) mirroring the driver's value-hash semantics."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = 0.0 if v == 0 else round(v, 9) if math.isfinite(v) else v
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


# Fast-tier subset: one or two representatives per surface (scan,
# graph, kernels, dedup, similarity, text, events, streaming,
# multimodal, relational, sketches) so the default run still
# rehearses the driver contract end-to-end; the FULL sweep is the
# slow tier (and scripts/check_correctness.py covers the whole
# registry against DuckDB every round regardless).
QUICK = {
    "graph_conductance",
    "graph_seeds",
    "graph_pagerank",
    "graph_triangles",
    "bigclam_gradient",
    "bigclam_line_search",
    "bigclam_fit_fixture",
    "bigclam_gradient_long_k256",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_stream_minhash",
    "sim_topk_brute",
    "sim_ivf_topk",
    "text_quality",
    "text_training_corpus",
    "events_sessionize",
    "events_hll_users",
    "events_asof_attribution",
    "events_stream_tumbling",
    "events_stream_sessionize",
    "multimodal_wav_stats",
    "rel_pricing_summary",
    "rel_upsert_merge",
    "docs_jsonl_scan",
    "sql_degree_hist",
}


@pytest.mark.parametrize(
    "name",
    [
        n if n in QUICK else pytest.param(n, marks=pytest.mark.slow)
        for n in sorted(QUERIES)
    ],
)
def test_query_matches_oracle(spark, duck, name):
    if name not in ORACLE:
        # rows-only queries (bigclam_fit_smoke, multimodal, …): the
        # driver applies a weaker ≥0-rows check; rehearse that here.
        sdf = QUERIES[name](spark, SF_DIR)
        assert len(sdf.columns) > 0 and sdf.count() >= 0
        return
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    ns, nd = _norm(spark_rows, spark_cols), _norm(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_no_hugeint_outputs(duck, name):
    """Dtype-parity guard: Python-value comparison above is BLIND to
    DuckDB HUGEINT/DECIMAL output columns, but the driver's hasher
    goes through pandas/arrow where HUGEINT becomes float64/decimal128
    and stringifies as "3.0" vs Spark's LONG "3" — the r1/r2
    dedup_simhash / sim_hyperplane_buckets / events_sessionize
    failure class (SUM over integers promotes to HUGEINT; the oracle
    must CAST every integer aggregate it outputs back to BIGINT).
    DESCRIBE resolves types without executing the query."""
    bad = [
        f"{r[0]}:{r[1]}"
        for r in duck.execute(f"DESCRIBE {ORACLE[name]}").fetchall()
        if "HUGEINT" in r[1] or r[1].startswith("DECIMAL")
    ]
    assert not bad, f"{name}: driver-hostile oracle output types {bad}"
