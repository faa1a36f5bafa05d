"""Physical-plan shape regressions: the 100-TB design properties the
operators rely on, asserted against `.explain`-style plan text so a
refactor that silently reintroduces a scan-wide read, an extra
shuffle, or a cartesian product fails CI — not just a bench run.

Checks are substring-based and deliberately loose (Spark version
shifts operator names); each asserts ONE property the docstrings
promise.
"""

from __future__ import annotations

import os

import pytest

from bigclam_apachespark_spark.registry import QUERIES

# Same fixture-root override test_oracle.py honors; default = the
# driver's smallest fixture.
SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str, execute: bool = False) -> str:
    # Other tests may leave operator-internal caches behind, which
    # would swap FileScan for InMemoryTableScan and change exchange
    # counts — plan shapes are asserted cache-free.
    spark.catalog.clearCache()
    df = QUERIES[name](spark, SF_DIR)
    if execute:
        # AQE prints `AdaptiveSparkPlan isFinalPlan=false` with no
        # WholeStageCodegen markers until the plan materializes;
        # collect() finalizes THIS df's queryExecution (count() would
        # build and execute a different plan).
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_products_anywhere(spark):
    """No query may degrade to an unbounded cartesian. The only
    intended cross join (line-search step fan-out) broadcasts a
    16-row side, which Spark plans as BroadcastNestedLoopJoin — also
    not a CartesianProduct."""
    for name in [
        "graph_conductance",
        "dedup_token_jaccard",
        "dedup_minhash_lsh_pairs",
        "sim_cosine_near_dups",
        "sim_lsh_topk",
        "bigclam_line_search",
    ]:
        assert "CartesianProduct" not in _plan(spark, name), name


def test_copurchase_scan_is_pruned(spark):
    """Column pruning must reach the lineitem scan: the co-purchase
    derivation reads exactly (l_orderkey, l_partkey), never the
    16-column table."""
    plan = _plan(spark, "graph_copurchase_edges")
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln or "ReadSchema" in ln]
    scan_txt = "\n".join(scan) or plan
    assert "l_orderkey" in scan_txt
    assert "l_comment" not in scan_txt
    assert "l_extendedprice" not in scan_txt


def test_copurchase_single_lineitem_pass(spark):
    """The basket formulation scans lineitem ONCE (the old self-join
    scanned it twice). Also exercises the partial-aggregate combine:
    exactly one hash-partitioning exchange on l_orderkey."""
    plan = _plan(spark, "graph_copurchase_edges")
    assert plan.count("FileScan parquet") == 1
    assert "partial_" in plan  # map-side combine before the shuffle


def test_clean_corpus_single_scan_single_shuffle(spark):
    """The corpus-cleaning composition computes fingerprint + quality
    + language in ONE narrow map and elects dedup survivors with a
    window — one documents scan, one exchange, no join (the naive
    groupBy-min + join-back shape re-scans the corpus and re-runs the
    quality expressions)."""
    plan = _plan(spark, "text_clean_corpus")
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_events_filter_pushdown(spark):
    """The temporal attribution queries read events filtered to two
    event types — the predicate must reach the scan (PushedFilters),
    not run post-scan only."""
    plan = _plan(spark, "events_asof_attribution")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, "no PushedFilters in events scan"
    assert any("event_type" in ln for ln in pushed)


def test_brute_force_topk_broadcasts_queries(spark):
    """sim_topk_brute: the tiny query side is broadcast — the corpus
    never shuffles. A SortMergeJoin here would be a full-corpus
    shuffle at 100 TB."""
    plan = _plan(spark, "sim_topk_brute")
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_text_queries_have_no_shuffle(spark):
    """Per-document text analysis is a narrow map over the scan —
    zero exchanges (what makes it embarrassingly parallel at 100 TB)."""
    for name in ["text_token_stats", "text_quality", "text_fingerprints"]:
        plan = _plan(spark, name)
        assert "Exchange" not in plan, name


def test_whole_stage_codegen_covers_numeric_kernels(spark):
    """The LLH/gradient arithmetic must stay inside whole-stage
    codegen (JVM-side), not fall out to interpreted eval or Python."""
    plan = _plan(spark, "bigclam_gradient", execute=True)
    # `*(n)` prefixes are the WholeStageCodegen markers in the
    # finalized plan's toString rendering.
    assert "*(" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_minhash_no_python_udfs(spark):
    """MinHash/LSH is pure built-in expressions — no Python eval
    nodes anywhere in the pipeline's plan."""
    plan = _plan(spark, "dedup_minhash_lsh_pairs")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_hash_split_no_shuffle(spark):
    """Split assignment is a pure function of the id — a narrow map
    with zero exchanges, like the other per-document text ops."""
    plan = _plan(spark, "text_hash_split")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_vocab_topk_uses_take_ordered(spark):
    """The df top-k must compile to TakeOrderedAndProject (distributed
    per-partition top-k + driver merge of k rows), never a global
    Sort of the vocabulary."""
    plan = _plan(spark, "text_vocab_topk")
    assert "TakeOrderedAndProject" in plan


def test_salient_terms_no_python_no_cartesian(spark):
    """tf/df ranking is built-in expressions end-to-end: no Python
    eval nodes, no cartesian; the df join is an equi-join on term."""
    plan = _plan(spark, "text_salient_terms")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_retention_single_events_scan(spark):
    """Cohort retention reads events ONCE: the per-user min and the
    offset join both reuse the deduplicated (user, week) exchange
    output — a second FileScan would double the 100-TB scan cost."""
    plan = _plan(spark, "events_retention")
    assert plan.count("FileScan parquet") == 1
    # the (user, week) distinct agg combines map-side
    assert "partial_" in plan or "HashAggregate" in plan


def test_ordered_funnel_pushes_type_filters(spark):
    """Each funnel stage reads events filtered to ONE event type —
    the predicate must reach the scans."""
    plan = _plan(spark, "events_ordered_funnel")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("event_type" in ln for ln in pushed)
    assert "CartesianProduct" not in plan


def test_anomaly_single_scan(spark):
    """The z-score query scans events once: window stats derive from
    the (window, type) count table via window functions, never a
    second pass over the raw stream."""
    plan = _plan(spark, "events_anomaly")
    assert plan.count("FileScan parquet") == 1


def test_unigram_logprob_no_python(spark):
    """The LM score is built-in expressions end-to-end."""
    plan = _plan(spark, "text_unigram_logprob")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed identically on the join key co-locate:
    the join plans as SortMergeJoin with ZERO Exchange (the shuffle
    was paid at write time). Broadcast is disabled for the assertion
    so the small fixture cannot sidestep the shuffle question."""
    from bigclam_apachespark_spark.sources.docs import write_bucketed

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    stats = docs.selectExpr("doc_id", "length(text) AS n")
    write_bucketed(docs, "b_docs", "doc_id", 4, str(tmp_path / "b_docs"))
    write_bucketed(stats, "b_stats", "doc_id", 4, str(tmp_path / "b_stats"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_docs").join(spark.table("b_stats"), "doc_id")
        assert j.count() > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_stats")


def test_mix_sample_broadcast_and_pruned_scan(spark):
    """mix_sample's per-source threshold joins back as a BROADCAST
    (20 sources — shipping the corpus to a shuffle join would be the
    bug), and the documents scan reads only (doc_id, text, source)."""
    plan = _plan(spark, "text_mix_sample")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    scan = "\n".join(
        ln for ln in plan.splitlines() if "FileScan" in ln or "ReadSchema" in ln
    )
    assert "lang" not in scan and "n_chars" not in scan


def test_link_candidates_focus_broadcast(spark):
    """The focus cohort reaches the wedge u-side as a broadcast
    semi-join; no cartesian anywhere in the wedge plan."""
    plan = _plan(spark, "graph_link_candidates")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_repetition_single_scan_per_n(spark):
    """repetition_signals scans documents once per requested n (plus
    the id spine) — the gram tables must come from the staged token
    projection, not re-tokenize per consumer."""
    plan = _plan(spark, "text_repetition")
    # 2 gram branches + 2 id-spine branches = 4 scans max; the
    # regression this pins is accidental plan duplication (8+).
    assert plan.count("FileScan parquet") <= 4


def test_kcore_output_is_aggregated_not_collected(spark):
    """kcore's final projection is a hash aggregate over the
    checkpointed edge list (no driver-side loop artifacts in plan)."""
    plan = _plan(spark, "graph_kcore")
    assert "HashAggregate" in plan


def test_pii_scrub_zero_exchange_no_python(spark):
    """PII redaction is three JVM regexp passes in one narrow
    projection: zero shuffles, zero Python — it must run at scan
    speed at 100 TB."""
    plan = _plan(spark, "text_pii_scrub")
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_ivf_assign_no_window(spark):
    """The IVF assignment argmax must be a max_by hash aggregate —
    map-side partial aggregation reduces n_cells scored rows per
    vector to one BEFORE the exchange — not a per-vector window
    (which would shuffle n_cells times the data and sort it)."""
    plan = _plan(spark, "sim_ivf_topk")
    import re

    # no window whose partition spec is the corpus vec_id argmax
    assert "max_by" in plan
    assert not re.search(r"Window \[row_number\(\)[^\n]*\[vec_id#\d+L\],", plan), plan


def test_ivf_persisted_index_prunes_cells(spark):
    """The persisted-IVF serving path must read only the probed cell
    partitions: the broadcast probe list becomes a dynamic partition
    pruning filter on the `cell` partition column of the index scan
    (at 100 TB: nprobe/n_cells of the corpus read per query batch,
    not a full pass)."""
    plan = _plan(spark, "sim_ivf_topk_persisted")
    assert "dynamicpruning" in plan
    cells_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "/cells" in ln
    ]
    assert cells_scans and all(
        "dynamicpruning" in ln for ln in cells_scans
    ), cells_scans


def test_ivfpq_persisted_index_prunes_cells(spark):
    """The persisted IVF-PQ serving path must combine BOTH 100-TB
    properties: the packed-code scan reads only probed cell
    partitions (dynamic partition pruning from the broadcast probe
    list), and the ADC ranking stays a hash agg — no window over the
    corpus-sized code relation (the per-q rank runs post-agg on
    |Q|·candidates rows partitioned by q)."""
    plan = _plan(spark, "sim_ivfpq_topk")
    assert "dynamicpruning" in plan
    codes_scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "/codes" in ln
    ]
    assert codes_scans and all(
        "dynamicpruning" in ln for ln in codes_scans
    ), codes_scans
    import re

    assert not re.search(r"Window \[row_number\(\)[^\n]*\[vec_id#\d+L\],", plan), plan


def test_asof_nearest_single_sort(spark):
    """direction='nearest' must compute BOTH scans (backward last +
    forward first) in one Window over one Exchange + one Sort — no
    second shuffle, no join, filters pushed to the scans."""
    plan = _plan(spark, "events_asof_nearest")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("+- Sort ") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]" in plan
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]" in plan


def _window_groups(line: str) -> list[str]:
    """Top-level bracket groups of a ``Window …`` plan line."""
    out: list[str] = []
    depth, cur = 0, ""
    for ch in line:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = ""
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                out.append(cur)
                continue
        if depth >= 1:
            cur += ch
    return out


def _unpartitioned_ordered_windows(plan: str) -> list[str]:
    """Order specs of every single-partition ordered Window in the
    plan. Rendering: ``Window [exprs], [partSpec], [orderSpec]`` when
    partitioned (3 groups); 2 groups is either unpartitioned+ordered
    (2nd group carries ASC/DESC markers — the dangerous kind: the
    whole relation sorts through ONE task) or partitioned+orderless
    (bare columns — fine)."""
    hits = []
    for ln in plan.splitlines():
        s = ln.strip().lstrip("+-: ").strip()
        if not s.startswith("Window "):
            continue
        g = _window_groups(s)
        if len(g) == 2 and (" ASC" in g[1] or " DESC" in g[1]):
            hits.append(g[1])
    return hits


# Queries allowed to keep an unpartitioned ordered window, each over
# a provably tiny relation. Windows ordering on a `_cb`-prefixed
# column are allowed everywhere: the bucketed two-stage kernels'
# offsets windows run over <= `buckets` aggregate rows by
# construction, and `_seed_ranked`'s `_cb_seed` window ranks a
# .limit(n)-row seed sample (similarity.py) — both bounded shapes.
_UNPARTITIONED_WINDOW_OK = {
    # inverse-CDF cumsum over DISTINCT token lengths (bounded domain)
    "text_length_quantiles",
    # ranks k rows AFTER a TakeOrderedAndProject limit
    "text_vocab_topk",
    # round-9 limit-then-rank shapes: each window runs over <= k rows
    # selected by a TakeOrderedAndProject head (k = 30 / 16 / 30 /
    # 100 respectively) — the same bounded contract as vocab_topk
    "graph_walk_pmi",
    "sim_kmeanspp_init",
    "text_bpe_encode",
    "text_weighted_sample",
    # r13: the F1 threshold derivation windows over the <= 10-row
    # calibration-decile aggregate, never the corpus
    "text_classifier_threshold",
}

# Construction executes multi-minute iterative jobs (rows-only
# smokes) or streaming state — their building blocks (seed ranking,
# LPA, factors init) are covered by the cheaper oracle queries swept
# below.
_PLAN_SWEEP_SKIP = {
    "bigclam_facebook_pipeline",
    "bigclam_fit_long_smoke",
    "bigclam_model_selection_smoke",
    # r11 iterative-fit smokes: building their DataFrame runs the
    # whole driver fit loop (minutes); every kernel they compose
    # (sgns_apply, bigclam one_iteration, louvain levels, modularity)
    # is plan-audited through its oracle-checked query already.
    "graph_sgns_fit_facebook",
    "graph_q_method_compare_facebook_fit",
}


@pytest.mark.slow  # heavy tier (pytest.ini): runs in the round-close sweep
def test_no_unpartitioned_window_over_unbounded_relation(spark):
    """Registry-wide 100-TB guard: no query may sort a corpus-sized
    relation through a single window task (`WindowExec: No Partition
    Defined`). Global orderings must use the bucketed two-stage
    exact-rank kernels (functions/ranks.py, text.py cap/shuffle);
    the only unpartitioned ordered windows allowed are the kernels'
    own <= `buckets`-row offsets windows (ordered on `_cb`) and the
    explicitly-bounded relations in _UNPARTITIONED_WINDOW_OK."""
    bad = {}
    for name in sorted(QUERIES):
        if "stream" in name or name in _PLAN_SWEEP_SKIP:
            continue
        hits = [
            h
            for h in _unpartitioned_ordered_windows(_plan(spark, name))
            if not h.lstrip().startswith("_cb")
        ]
        if hits and name not in _UNPARTITIONED_WINDOW_OK:
            bad[name] = hits
    assert not bad, f"unpartitioned ordered windows over unbounded relations: {bad}"


def test_cap_per_source_bucketed_rank(spark):
    """The per-source cap must NOT funnel a hot source through one
    window partition: the big-side rank window partitions by
    (source, _cb) — the order-hash range bucket — so a mega-source
    spreads across `buckets` tasks. The only source-ONLY window runs
    on the metadata-sized (source, bucket) count aggregate."""
    plan = _plan(spark, "text_cap_per_source")
    assert "PythonUDF" not in plan
    # the rank window's partition spec includes the bucket column
    import re

    specs = re.findall(r"Window \[[^\]]*row_number[^\]]*\], \[([^\]]*)\]", plan)
    assert any("_cb" in s for s in specs), specs


def test_bucketed_join_elides_exchanges(spark):
    """The co-located join must read matching buckets directly: with
    auto-broadcast off (forcing the join shape a 100-TB run would
    take), the ONLY hash exchange in the plan is the final
    per-segment aggregate — neither join side re-shuffles on the
    bucket key, and the scans report their bucket selection."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "rel_bucketed_join")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    ex = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(ex) == 1 and "c_mktsegment" in ex[0], plan
    assert "SelectedBucketsCount" in plan


def test_disjunctive_predicate_factors_reach_scans(spark):
    """Q19 shape: Catalyst must extract the disjunction's common
    factors per side — the 3-brand IN-list and size lower bound push
    into the part scan's parquet filters, the quantity range reaches
    the lineitem scan as a data filter (the double cast blocks the
    parquet-level push, not the scan-level evaluation), and the
    lineitem read schema prunes to exactly the 4 needed columns."""
    plan = _plan(spark, "rel_disjunctive_revenue")
    part_scans = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "part.parquet" in ln
    ]
    li_scans = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "lineitem.parquet" in ln
    ]
    assert len(part_scans) == 1 and len(li_scans) == 1
    assert "In(p_brand" in part_scans[0]
    assert "GreaterThanOrEqual(p_size,1)" in part_scans[0]
    assert "l_quantity" in li_scans[0].split("DataFilters:")[1].split("Format:")[0]
    assert (
        "struct<l_partkey:bigint,l_quantity:double,"
        "l_extendedprice:double,l_discount:double>" in li_scans[0]
    )


def test_partitioned_roundtrip_prunes(spark):
    """The partitioned-corpus serving read must satisfy the source
    filter from PartitionFilters on the hive-layout scan — the
    non-matching source directories contribute zero bytes read (at
    100 TB: 2/20 of the corpus scanned, before any row filtering)."""
    plan = _plan(spark, "docs_partitioned_roundtrip")
    scan = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "spark_graft_part_docs" in ln
    ]
    assert scan, plan
    assert all("PartitionFilters: [" in ln and "source" in ln.split(
        "PartitionFilters"
    )[1][:120] for ln in scan), scan


def test_ivf_upsert_serving_prunes_cells(spark):
    """The UPSERTED index (base build + frozen-centroid delta append)
    must serve with the same dynamic-partition-pruning property as
    the freshly built one: appended files land inside the cell=...
    directory layout, so the probe list still prunes the scan to the
    probed cells — incremental maintenance must not cost the serving
    path its O(nprobe/n_cells) read."""
    plan = _plan(spark, "sim_ivf_index_upsert")
    assert "dynamicpruning" in plan
    cells_scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "/cells" in ln
    ]
    assert cells_scans and all(
        "dynamicpruning" in ln for ln in cells_scans
    ), cells_scans


def test_classifier_scoring_broadcasts_weights(spark):
    """The trained-classifier scoring join (feats ⋈ weights on the
    257-key dim column) must BROADCAST the weight table: a
    hash-partitioned exchange keyed on dim would funnel the whole
    corpus into ≤ dims+1 partitions at scale. Asserted on the
    inference row (text_classifier_filter's plan contains the 2-step
    train AND the final scoring pass)."""
    p = _plan(spark, "text_classifier_filter")
    assert "BroadcastHashJoin" in p
    for line in p.splitlines():
        if "Exchange hashpartitioning" not in line:
            continue
        keys = line.split("hashpartitioning(", 1)[1].rsplit(",", 1)[0]
        # dim-only partitioning is the funnel; (doc_id, dim) keys from
        # the feature distinct() are high-cardinality and fine
        if "dim#" in keys and "doc_id#" not in keys and "label#" not in keys:
            raise AssertionError(f"corpus shuffled on dim alone: {line.strip()[:160]}")


def test_walk_family_plans_are_materialized(spark):
    """The r12 verdict's one plan defect: the walk chain re-derived
    its shared prefixes per reference — 17-18 lineitem scans and 0
    ReusedExchange in the committed plans, O(walk_len²) at DeepWalk-
    realistic lengths, and the source of graph_walk_pmi's 7.6→52.3 s
    variance band. With the per-level eager localCheckpoint (the MIS
    discipline applied to random_walks/node2vec_walks, plus the
    pairs checkpoint in walk_cooccurrence_pmi) the FINAL plan of
    every walk-consuming query must contain at most one base-table
    scan — the corpus arrives as in-memory LogicalRDD leaves."""
    for name in (
        "graph_random_walks",
        "graph_node2vec_walks",
        "graph_walk_pmi",
    ):
        plan = _plan(spark, name)
        n_scans = plan.count("FileScan parquet")
        assert n_scans <= 1, f"{name}: {n_scans} base-table scans (want <=1)"
