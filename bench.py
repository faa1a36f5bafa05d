"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric": ..., "value": N, "unit": "sec", "queries":
{...}, "sf": ...}.

Each query is forced to execute fully (count of a noop-aggregated
plan) so the timing covers scan → shuffle → result, not lazy plan
construction.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bigclam_apachespark_spark.registry import QUERIES  # noqa: E402
from bigclam_apachespark_spark.session import get_spark  # noqa: E402

# Headline subset: the expensive, representative plans. Cheap
# count-style queries are excluded to keep signal high. Covers every
# major surface: graph substrate, dedup (MinHash-LSH end-to-end),
# events (window agg + sessionize), similarity, and text.
HEADLINE = [
    "graph_copurchase_edges",
    "graph_degrees",
    "graph_neighbors",
    "graph_conductance",
    "graph_seeds",
    "dedup_minhash_lsh_pairs",
    "events_tumbling",
    "events_sessionize",
    "sim_cosine_near_dups",
    "text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bigclam_bench")

    names = [n for n in HEADLINE if n in QUERIES]
    extra = os.environ.get("BENCH_QUERIES")
    if extra:
        names = [n.strip() for n in extra.split(",") if n.strip() in QUERIES]

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
