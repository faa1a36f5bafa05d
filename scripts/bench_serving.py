"""Cold-vs-warm ANN index serving measurement (PERFORMANCE.md round
7): how much of the per-batch cost the persisted index amortizes.

- cold  = build + write the index, then answer one query batch
- warm  = answer the same batch from the already-persisted index
  (the steady-state serving cost — at 100 TB the only number that
  matters per batch)

Run at the bench scale:  python scripts/bench_serving.py [sf_dir]
Prints one JSON line (min of N passes per leg).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bigclam_apachespark_spark.operators import similarity as S
from bigclam_apachespark_spark.session import get_spark

PASSES = 2


def _timed(fn):
    best = float("inf")
    for _ in range(PASSES):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("serving_bench")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    base = f"/tmp/spark_graft_serving_{os.getpid()}"
    out: dict[str, float] = {}

    ivf_path = f"{base}/ivf"

    def ivf_cold():
        S.write_ivf_index(emb, ivf_path, n_cells=16)
        S.ivf_topk_persisted(spark, ivf_path, queries, k=5, nprobe=4).collect()

    out["ivf_cold"] = _timed(ivf_cold)
    out["ivf_warm"] = _timed(
        lambda: S.ivf_topk_persisted(spark, ivf_path, queries, k=5, nprobe=4).collect()
    )
    out["ivf_inline"] = _timed(
        lambda: S.ivf_topk(emb, queries, k=5, n_cells=16, nprobe=4).collect()
    )

    pq_path = f"{base}/ivfpq"

    def ivfpq_cold():
        S.write_ivfpq_index(emb, pq_path, n_cells=16, m=16, ksub=64)
        S.ivfpq_topk_persisted(spark, pq_path, queries, k=5, nprobe=4, m=16).collect()

    out["ivfpq_cold"] = _timed(ivfpq_cold)
    out["ivfpq_warm"] = _timed(
        lambda: S.ivfpq_topk_persisted(
            spark, pq_path, queries, k=5, nprobe=4, m=16
        ).collect()
    )
    out["ivfpq_inline"] = _timed(
        lambda: S.ivfpq_topk(
            emb, queries, k=5, n_cells=16, nprobe=4, m=16, ksub=64
        ).collect()
    )

    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"sf_dir": sf_dir, "sec": out}))
    spark.stop()


if __name__ == "__main__":
    main()
