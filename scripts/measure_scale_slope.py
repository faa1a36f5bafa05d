"""sf0.1 → sf1 weak-scaling slope for the most expensive queries
(VERDICT r12 ask #4). Runs each query at both scales in ONE session
(interleaved per query: small then big, so a host-window drift hits
both readings of a pair roughly equally), takes the min of N runs at
each scale, and prints a ratio table. The 10× corpus (disjoint
replicas — scripts/make_scale_corpus.py) makes ~10× the ideal linear
ratio; materially above that is the engine's own superlinearity and
must be explained or fixed (PERFORMANCE.md records the adjudication).

Usage:
    python scripts/measure_scale_slope.py [runs] [name ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigclam_apachespark_spark.registry import QUERIES
from bigclam_apachespark_spark.session import get_spark

SMALL = "/root/testdata/sf0.1"
BIG = str(Path(__file__).resolve().parent.parent / "data" / "sf1x")

# The 10 most expensive committed-record rows + the two structurally
# riskiest iterative kernels (MIS, walk corpus) — the set the r12
# verdict asked to see a measured derivative for.
DEFAULT = [
    "graph_coreness",
    "text_training_corpus",
    "bigclam_two_iterations",
    "graph_sgns_rank_corr",
    "graph_structural_similarity",
    "graph_ktruss_backbone",
    "graph_kcore",
    "dedup_minhash_lsh_pairs",
    "graph_bfs_hops",
    "graph_pagerank",
    "graph_walk_pmi",
    "graph_mis",
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    names = [n for n in sys.argv[2:] if n in QUERIES] or DEFAULT
    spark = get_spark("scale_slope")
    spark.sparkContext.setLogLevel("ERROR")
    # warm both scan paths
    spark.read.parquet(f"{SMALL}/lineitem.parquet").count()
    spark.read.parquet(f"{BIG}/lineitem.parquet").count()

    def best(name: str, sf_dir: str) -> tuple[float, int]:
        t_best, n_rows = float("inf"), -1
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            n_rows = df.count()
            t_best = min(t_best, time.perf_counter() - t0)
            for h in getattr(df, "_cache_handles", []) or []:
                try:
                    h.unpersist()
                except Exception:
                    pass
        return t_best, n_rows

    out = {}
    for name in names:
        try:
            t_s, n_s = best(name, SMALL)
            t_b, n_b = best(name, BIG)
        except Exception as ex:  # keep sweeping; record the failure
            out[name] = {"error": str(ex).splitlines()[0][:200]}
            print(f"{name}: ERROR {out[name]['error']}", file=sys.stderr)
            continue
        ratio = round(t_b / t_s, 2) if t_s > 0 else None
        out[name] = {
            "sf0.1_sec": round(t_s, 2),
            "sf1_sec": round(t_b, 2),
            "ratio": ratio,
            "rows_small": n_s,
            "rows_big": n_b,
        }
        print(
            f"{name}: {t_s:.2f}s -> {t_b:.2f}s  ratio {ratio}  "
            f"rows {n_s} -> {n_b}",
            file=sys.stderr,
        )
    print(json.dumps({"runs": runs, "queries": out}))


if __name__ == "__main__":
    main()
