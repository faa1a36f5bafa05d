"""Regenerate PLANS.md: the physical plan TREES (operator skeletons,
not the per-node detail dump) of representative headline queries at
sf0.001, with the scale property each plan demonstrates. Run after
any planner-affecting change:

    python scripts/dump_plans.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigclam_apachespark_spark.registry import QUERIES
from bigclam_apachespark_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

SHOWCASE = {
    "graph_copurchase_edges": "one pruned lineitem scan, one shuffle (basket agg), bounded explode",
    "graph_conductance": "neighbor agg + one member join + one hash-agg; no cartesian",
    "dedup_minhash_lsh_pairs": "map-side min-combine signatures; band-key equi-join only (never docs^2)",
    "sim_topk_brute": "corpus never shuffles: query side broadcast, TakeOrdered per q",
    "events_asof_attribution": "union-sort merge_asof: ONE exchange, ZERO joins",
    "text_mix_sample": "per-source thresholds broadcast back onto a narrow keep projection",
    "graph_link_candidates": "focus cohort broadcast into the wedge u-side",
    "bigclam_gradient": "edges joined to factors twice, array kernel inside codegen",
    "text_pii_scrub": "five regexp passes in ONE narrow projection: zero exchanges, zero Python",
    "text_cap_per_source": "mega-source-safe rank: offsets broadcast, ONE big-side shuffle on (source, bucket) reused by join and window",
    "events_asof_nearest": "dual-direction scan in ONE Window over one exchange + one sort; no join",
    "sim_kmeans_refined": "per round: 16-centroid broadcast argmax + one long-layout shuffle with map-side combine",
    "rel_pricing_summary": "pruned+pushed scan into ONE map-side-combined hash agg on integer cents",
    "graph_label_prop": "per round: vertex-keyed join + label histogram + max_by argmax, all hash aggs (no hub window)",
    "text_global_shuffle": "corpus-wide exact rank: one big-side shuffle on the hash bucket; offsets broadcast",
    "text_pack_sequences": "bucketed two-stage prefix sum: per-doc window partitions by _cb; only the <=buckets-row offsets window is global",
    "sim_ivf_topk_persisted": "persisted index serving: probe list broadcast, cells scan pruned via dynamic partition pruning",
    "dedup_stream_minhash": "per-doc narrow band keys (no agg), state-store dedup on (band, bucket)",
    "sim_pq_topk": "corpus crosses the wire as m codes; LUT broadcast; ADC is a hash agg (no big-side window)",
    "sim_pq_recall": "PQ ranking + exact truth joined on (q, nn): both sides bounded top-k",
    "multimodal_png_features": "Arrow-batched mapInPandas decode over a binary column: one narrow pass, no shuffle",
    "bigclam_fit_fixture": "3 unrolled optimizer rounds: per round one join-agg gradient + broadcast x16 Armijo fan-out",
    "sim_ivfpq_topk": "IVF-PQ composition: probed cells prune the code table, ADC scores only survivors",
    "dedup_span_scrub": "duplicate-proportional rewrite: one gram hash agg, drop-set anti-join, per-doc rebuild — no corpus window",
    "rel_local_supplier_volume": "Q5 join ordering: nation chain broadcast, date pushed to orders scan, lineitem touched once, big joins left to AQE",
    "rel_bucketed_join": "co-located join: bucketed scans on the key, the only exchange is the final segment agg",
    "rel_disjunctive_revenue": "Q19 CNF extraction: brand IN-list + size bound pushed to the part scan, qty range onto the lineitem scan",
    "rel_big_orders": "Q18 agg-before-join: lineitem collapses to qualifying keys first, then two AQE-sized joins + TakeOrdered",
    "rel_late_supplier_blame": "Q21 decorrelated: one lineitem-orders join, two cascaded hash aggs reusing the orderkey partitioning, no self-joins",
    "rel_pit_dimension_join": "PIT lookup: SCD2 islands + backward as-of in key-partitioned sorts — no interval range join",
    "text_bigram_logprob": "pair relation by array self-slicing (narrow), vocab-sized count tables joined back — no positional self-join",
    "rel_order_priority": "Q4 EXISTS decorrelated to a LEFT SEMI join: date window pushed to the orders scan, no match-list materialization",
    "rel_top_supplier": "Q15 scalar subquery: per-supplier agg computed once, 1-row max broadcast back onto it — no self-join-on-aggregate",
    "rel_idle_rich": "Q22: 1-row (sum,n) broadcast, exact integer mean compare, never-ordered via LEFT ANTI (no DISTINCT on the fact side)",
    "text_pmi_topk": "collocation mining: narrow array-slice pairs (no positional self-join), vocab-bounded aggs, exact-integer ranking products",
    "text_bpe_pair_counts": "BPE trick: ONE corpus pass collapses to the vocab relation; char pairs + weighted counts run over |V|, not tokens",
    "sim_jl_topk": "JL search: plan-time sign matrix as plain codegen add-chains (no HOF), 4x smaller pair wire, queries broadcast",
    "graph_harmonic_sampled": "Eppstein-Wang: fixed 16-seed sample, labeled-BFS state |S|*n (never n^2), per-round frontier joins only",
    "multimodal_phash_pairs": "image near-dup: decode once to 64-bit aHash, band equi-join candidates (never images^2), integer Hamming verify",
    "events_cohort_ltv": "payback curve: one user-collapse agg, integer-cents cumsum window over the aggregate (not the event stream)",
    "sim_ann_ladder": "four ANN methods vs ONE shared exact truth; micro recall as a single exact-integer division per method",
    "rel_nation_volume": "Q7: ONE join tree with the direction pair as a disjunction (not a UNION of two 6-way joins); nation dims broadcast twice",
    "rel_excess_suppliers": "Q20: nested agg rolls up from the first agg's partitioning - no second lineitem scan; integer dominance threshold",
    "events_session_funnel": "in-session order test: converted iff max(purchase key) > min(click key) - one hash agg, no self-join on events",
    "text_split_repair": "decontamination repair: leak-pair relation (not corpus) drives a left join + CASE over the split table",
    "text_heldout_perplexity": "train-only counts (leakage discipline), val pairs by narrow array slicing, vocab-bounded joins",
    "multimodal_video_near_dup": "video dedup: frames collapse to sampled 64-bit hashes; signature-intersection join, never frames^2",
    "events_robust_outliers": "median/MAD: two partitioned order-statistic windows; the k*MAD compare is on identical doubles",
    "docs_partitioned_roundtrip": "hive-layout sink + serving read pruned by PartitionFilters: 2/20 of the corpus scanned",
}

# Streaming registry entries: the last executed MICRO-BATCH physical
# plan, captured by the replay harness (events_stream.LAST_STREAM_PLANS)
# while each bounded replay runs. Captions state the STATE-size story —
# the property that decides whether the query survives an unbounded
# 100-TB/day stream.
STREAM_CAPTIONS = {
    "events_stream_tumbling": "watermarked tumbling agg: state = open windows only; rows emit (append) once the watermark passes",
    "events_stream_sessionize": "applyInPandasWithState sessionize: per-user state row, Arrow-batched numpy kernel, event-time eviction",
    "events_stream_interval_join": "stream-stream interval join: two-sided watermark-bounded state; the range predicate caps retention",
    "events_stream_interval_left": "LEFT OUTER interval join: null emission gated on the watermark passing the bound — state stays bounded",
    "events_stream_enrich": "stream-static enrichment: dimension broadcast into each micro-batch, ZERO join state",
    "events_stream_dedup_watermark": "dropDuplicatesWithinWatermark: state = arrival-rate x horizon, not stream lifetime",
    "events_stream_hll_windows": "per-window HLL registers: state = m integers per open window, max-mergeable downstream",
    "events_stream_cms_windows": "per-window count-min counters: state = d*w integers per open window, sum-mergeable",
    "events_stream_session_window": "built-in session_window: state-store session merge + watermark eviction, zero user state code",
    "events_stream_session_funnel": "in-session funnel on session_window state: MIN/MAX key structs merge associatively across batches",
    "dedup_stream_bloom": "static Bloom filter as a plan-literal array: k element_at+AND checks per doc — pure narrow filter, ZERO state",
    "dedup_stream_exact": "state-store dropDuplicates over pre-hashed fingerprints: one narrow map + one state lookup per doc",
    "dedup_stream_minhash": "band keys as a pure narrow map (zero aggregation), state-store dedup on (band, bucket)",
    "dedup_stream_minhash_watermark": "watermark-bounded near-dup state: retention = arrival horizon, not corpus lifetime",
    "rel_upsert_stream": "foreachBatch MERGE: per-batch read-merge-rewrite of the snapshot; the stream side carries no state",
    "events_stream_topk": "foreachBatch additive count merge: per-batch map-side agg + aggregate-sized state rewrite; rank once at the end",
}


# Composed mega-pipelines (the method-compare and SGNS composition
# queries) produce multi-thousand-line trees that drown the doc; the
# skeleton's first N lines already show every distinct operator shape.
TREE_MAX_LINES = 400


def tree(plan: str) -> str:
    """Keep the operator tree; drop the numbered node details."""
    lines = []
    for ln in plan.splitlines():
        if ln.startswith("== Physical Plan"):
            continue
        if ln.strip().startswith("(1) ") and lines:
            break
        lines.append(ln.rstrip())
    # detail section starts after the blank line following the tree
    out = []
    for ln in lines:
        if not ln and out:
            break
        out.append(ln)
    if len(out) > TREE_MAX_LINES:
        dropped = len(out) - TREE_MAX_LINES
        out = out[:TREE_MAX_LINES] + [
            f"... [{dropped} more tree lines truncated - composed"
            " pipeline; every operator shape appears above]"
        ]
    return "\n".join(out)


def main() -> None:
    spark = get_spark("plan_dump")
    parts = [
        "# PLANS — physical plan skeletons (auto-generated)",
        "",
        "Generated by `scripts/dump_plans.py` at sf0.001 (plan SHAPE is",
        "scale-invariant; AQE may further coalesce at runtime). Each",
        "tree is the `.explain(\"formatted\")` operator skeleton; the",
        "one-line caption states the 100-TB property the shape proves.",
        "",
    ]
    # Streaming SHOWCASE entries drive their bounded replay at build
    # time; capture the micro-batch plans HERE so the streaming
    # appendix can reuse them instead of re-running the replay
    # (ADVICE r8: each replay costs tens of seconds).
    from bigclam_apachespark_spark.streaming.events_stream import (
        LAST_STREAM_PLANS,
    )

    showcase_stream_sinks: dict[str, list[str]] = {}
    for name, caption in SHOWCASE.items():
        seen = dict(LAST_STREAM_PLANS)
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "stream" in name:
            showcase_stream_sinks[name] = [
                k for k, v in LAST_STREAM_PLANS.items() if seen.get(k) != v
            ]
        parts += [f"## {name}", "", f"*{caption}*", "", "```", tree(plan), "```", ""]

    # Complete appendix: the plan skeleton of EVERY other registry
    # query (streaming queries and multi-minute iterative smokes
    # excluded — their building blocks appear above / in the batch
    # twins), so no operator ships without a reviewable plan.
    SKIP = {
        "bigclam_facebook_pipeline",
        "bigclam_fit_long_smoke",
        "bigclam_model_selection_smoke",
        "bigclam_enron_pipeline",
        "bigclam_fit_long_highk",
        # r12: plateau-fit driver loops — building the row RUNS the
        # multi-minute fit; the per-step plan is already reviewable
        # via text_classifier_step / text_classifier_filter
        "text_classifier_eval",
        "text_classifier_distill",
    }
    parts += ["# Appendix: all remaining registry plans", ""]
    for name in sorted(QUERIES):
        if name in SHOWCASE or name in SKIP or "stream" in name:
            continue
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        parts += [f"## {name}", "", "```", tree(plan), "```", ""]

    # Streaming appendix (VERDICT r7 ask #7): run each bounded replay
    # and attribute the micro-batch plans the harness captured — each
    # registry query may start several named sinks (e.g. a staging
    # replay plus the scored one); every plan new since the previous
    # query ran belongs to it. Replays already driven by the SHOWCASE
    # pass are NOT re-run — their captured plans are attributed from
    # showcase_stream_sinks (ADVICE r8).
    parts += [
        "# Appendix: streaming micro-batch plans",
        "",
        "Last executed micro-batch physical plan of each streaming",
        "registry entry's bounded replay (captured live via",
        "`StreamingQuery.explainInternal`). The caption states the",
        "STATE-size property — what bounds the query on an unbounded",
        "stream.",
        "",
    ]
    for name in sorted(n for n in QUERIES if "stream" in n):
        if name in showcase_stream_sinks:
            new_plans = showcase_stream_sinks[name]
        else:
            # snapshot VALUES, not just keys: a sink name re-used by an
            # earlier run re-captures with a fresh runId/checkpoint
            # path, so a changed value attributes here too
            seen = dict(LAST_STREAM_PLANS)
            try:
                df = QUERIES[name](spark, SF_DIR)
                df.count()  # drive the replay to completion
            except Exception as ex:  # pragma: no cover - best-effort dump
                parts += [f"## {name}", "", f"*replay failed: {ex}*", ""]
                continue
            new_plans = [
                k for k, v in LAST_STREAM_PLANS.items() if seen.get(k) != v
            ]
        caption = STREAM_CAPTIONS.get(name, "")
        parts += [f"## {name}", ""]
        if caption:
            parts += [f"*{caption}*", ""]
        for sink in sorted(new_plans):
            parts += [
                f"micro-batch plan of sink `{sink}`:",
                "",
                "```",
                tree(LAST_STREAM_PLANS[sink]),
                "```",
                "",
            ]
        if not new_plans:
            parts += ["*(no new micro-batch plan captured)*", ""]
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(parts)
    )
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
