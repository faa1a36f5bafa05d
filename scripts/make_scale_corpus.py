"""Synthesize a deterministic N× replica of an sf directory (VERDICT
r12 ask #4: one measured scale point ABOVE sf0.1 — every 100-TB claim
so far rests on static plan audits; a measured sf0.1→sf1 wall-time
slope converts "the plan looks linear" into a number).

Replication is DISJOINT by construction — replica k's keys are offset
into their own id band and replica k's document tokens carry a
``_r<k>`` suffix — so the replicated dataset is k independent copies
of the original's structure, not a denser version of it:

- the co-purchase graph becomes N disconnected copies of the sf0.1
  graph (same degree distribution, same coreness/truss depth per
  copy), so iterative fixpoints run the SAME number of rounds over
  N× the rows — the ideal weak-scaling probe: a linear operator
  should read ≈ N× wall, and any extra is the engine's own
  superlinearity, not the generator's;
- token suffixing keeps replicas shingle-disjoint, so near-dup /
  LSH workloads scale their pair structure N× linearly instead of
  quadratically exploding on N identical copies of every doc (10
  copies of each doc would mean 45 cross-copy dup pairs per doc —
  an artifact of naive replication, not a property of the engine);
- events replicate per-user: N× users, same per-user session
  structure; embeddings get a per-replica deterministic micro-jitter
  on one component so brute-force top-k does not drown in exact
  ties.

Usage:
    python scripts/make_scale_corpus.py [N] [src_sf_dir] [dst_dir]
Defaults: N=10, src=/root/testdata/sf0.1, dst=data/sf1x — i.e. a
10× corpus ("sf1-equivalent", ~170 MB parquet). Deterministic:
re-running produces byte-identical row sets (writer sharding aside).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F

from bigclam_apachespark_spark.session import get_spark

# Key-band offsets: far above every sf0.1 key space (max l_orderkey at
# sf0.1 is 600k, custkey 15k, partkey 20k, suppkey 1k, doc/emb ids 5k,
# event user ids ~50k) and far below the 1e8 supplier offset used by
# the bipartite graph derivation... which only applies to suppkey
# inside queries, so replica bands at 1e9·k keep EVERY id space
# disjoint from both the originals and the derived offsets.
BAND = 1_000_000_000


def _rep(spark, n: int) -> DataFrame:
    return spark.range(n).select(F.col("id").cast("long").alias("_r"))


def _offset(col: str):
    return (F.col(col) + F.col("_r") * F.lit(BAND)).alias(col)


def replicate(df: DataFrame, n: int, key_cols: list[str]) -> DataFrame:
    """Cross-join with the replica dimension and shift every key
    column into replica _r's band (replica 0 = the original rows)."""
    rep = _rep(df.sparkSession, n)
    out = df.crossJoin(F.broadcast(rep))
    cols = [
        _offset(c) if c in key_cols else F.col(c)
        for c in df.columns
    ]
    return out.select(*cols)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else str(
        Path(__file__).resolve().parent.parent / "data" / "sf1x"
    )
    spark = get_spark("make_scale_corpus")
    spark.sparkContext.setLogLevel("ERROR")

    def read(t: str) -> DataFrame:
        return spark.read.parquet(f"{src}/{t}.parquet")

    def write(df: DataFrame, t: str, parts: int) -> None:
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"{t}: {spark.read.parquet(f'{dst}/{t}.parquet').count()} rows")

    # Facts: every key column banded per replica.
    write(
        replicate(
            read("lineitem"), n,
            ["l_orderkey", "l_partkey", "l_suppkey"],
        ),
        "lineitem", 32,
    )
    write(replicate(read("orders"), n, ["o_orderkey", "o_custkey"]),
          "orders", 16)
    write(replicate(read("events"), n, ["event_id", "user_id"]),
          "events", 16)

    # Dims: banded the same way so fact⋈dim joins stay consistent
    # inside each replica.
    write(replicate(read("customer"), n, ["c_custkey", "c_nationkey"]),
          "customer", 4)
    write(replicate(read("supplier"), n, ["s_suppkey", "s_nationkey"]),
          "supplier", 4)
    write(replicate(read("part"), n, ["p_partkey"]), "part", 4)
    write(replicate(read("nation"), n, ["n_nationkey", "n_regionkey"]),
          "nation", 1)
    write(replicate(read("region"), n, ["r_regionkey"]), "region", 1)

    # Documents: ids banded AND every NON-STOPWORD word Caesar-rotated
    # by k letters in replica k. Three generator designs failed on the
    # live measurement before this one, each caught by a different
    # pipeline gate — the requirements they jointly establish:
    #
    #   1. TOKEN COUNT preserved exactly (a `_r3` suffix explodes
    #      every token into four under the repo tokenizer — a 37×
    #      corpus masquerading as 10×, inflating tokenize-bound
    #      slopes);
    #   2. STOPWORDS untouched (the clean/lang/quality heuristics key
    #      on the embedded stopword lists; tagging them made every
    #      replica doc fail the quality gate and the "10×" input
    #      collapse back to 1× after the clean stage);
    #   3. CHAR-5-GRAM disjointness vs EVERY other replica including
    #      the untouched replica 0 (dedup shingles are CHARACTER
    #      grams: a pure-letter SUFFIX `wordxb` still contains all of
    #      `word`'s grams, so suffixed replicas verified as jaccard
    #      ≥ 0.35 near-dups of their source docs and the near-dup
    #      stage "correctly" collapsed each replica family to ~1
    #      survivor — 45,460 cleaned docs → 6,114 final rows).
    #
    # A per-replica rotation of content words satisfies all three:
    # token count, word lengths, stopwords, spaces, digits and
    # n_chars are all invariant; a rotated word shares no char grams
    # with its source (or with any other rotation) except through
    # incidental vocabulary collisions. Shared grams across replicas
    # are stopword/digit/space grams only — few DISTINCT shingles, so
    # cross-replica Jaccard stays near 0 and near-dup structure
    # replicates instead of multiplying. Replica 0 keeps the original
    # text byte-for-byte. (Source docs are pure [a-z0-9 ] — verified —
    # so word-splitting on single spaces is lossless.)
    from bigclam_apachespark_spark.operators.text import (
        EN_STOPWORDS, ES_STOPWORDS, FR_STOPWORDS,
    )

    docs = read("documents")
    rep = _rep(spark, n)

    abc = "abcdefghijklmnopqrstuvwxyz"
    stop = sorted(set(EN_STOPWORDS) | set(ES_STOPWORDS) | set(FR_STOPWORDS))

    def _rotated(k: int):
        rot = abc[k % 26:] + abc[: k % 26]
        return F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.when(w.isin(*stop), w).otherwise(
                    F.translate(w, abc, rot)
                ),
            ),
            " ",
        )

    text_expr = F.col("text")
    for k in range(n - 1, 0, -1):
        text_expr = F.when(F.col("_r") == k, _rotated(k)).otherwise(text_expr)

    docs_out = (
        docs.crossJoin(F.broadcast(rep))
        .select(
            (F.col("doc_id") + F.col("_r") * F.lit(BAND)).alias("doc_id"),
            text_expr.alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
    )
    write(docs_out, "documents", 16)

    # Embeddings: ids banded; component 0 jittered by a deterministic
    # per-replica epsilon (k·1e-4) for k > 0 so replicated vectors are
    # near- but not exactly-identical.
    emb = read("embeddings")
    emb_out = (
        emb.crossJoin(F.broadcast(rep))
        .select(
            (F.col("vec_id") + F.col("_r") * F.lit(BAND)).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    (i == 0) & (F.col("_r") > 0),
                    x + F.col("_r").cast("float") * F.lit(1e-4),
                ).otherwise(x),
            ).cast("array<float>").alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
    )
    write(emb_out, "embeddings", 8)
    print(f"done: {n}x replica of {src} at {dst}")


if __name__ == "__main__":
    main()
