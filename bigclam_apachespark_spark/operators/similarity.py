"""Similarity search over the ``embeddings`` table (north-star
extension): brute-force cosine top-k as the exact baseline, plus an
LSH-bucketed (random-hyperplane) variant as the 100-TB scale path.

Scale shapes:
- brute force: queries × corpus join. Correct baseline; cost is
  |Q|·|N|·K multiply-adds. Keep |Q| small or go bucketed. The corpus
  side streams; the (small) query side is broadcast — no shuffle of
  the big table at all.
- hyperplane LSH (SimHash-for-vectors): sign-pattern of h random
  hyperplanes → bucket key; only intra-bucket pairs are scored. With
  multiple tables (independent hyperplane sets) recall rises; each
  table is one hash-join. Hyperplanes are deterministic md5-derived
  pseudo-Gaussians so the DuckDB oracle reproduces the exact buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigclam_apachespark_spark.functions.arrays import arr_dot


def _cos(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    dot = arr_dot(a, b)
    na = F.sqrt(arr_dot(a, a))
    nb = F.sqrt(arr_dot(b, b))
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query → ``(q, vec_id, rank, cos_sim)``.

    ``queries`` is a small (q, qvec) DataFrame — broadcast, so the
    corpus never shuffles; ranking is a per-q window (the shuffle is
    |Q|·|N| scored rows, partitioned by q)."""
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("q"), F.col(vec_col).alias("qvec"))
    corpus = embeddings.select(F.col(id_col), F.col(vec_col))
    scored = corpus.crossJoin(F.broadcast(q)).where(F.col("q") != F.col(id_col)).select(
        "q", id_col, F.round(_cos("qvec", vec_col), 6).alias("cos_sim")
    )
    w = Window.partitionBy("q").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", id_col, "rank", "cos_sim")
    )


def _hyperplane(dim: int, plane: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-Gaussian hyperplane via md5 — reproducible
    in DuckDB SQL for the oracle (sum of 2 uniforms − 1, CLT-ish;
    direction quality is ample for LSH)."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}:{plane}:{d}".encode()).hexdigest()
        u1 = int(h[:8], 16) / 0xFFFFFFFF
        u2 = int(h[8:16], 16) / 0xFFFFFFFF
        vals.append(u1 + u2 - 1.0)
    return vals


def hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector → ``(vec_id, bucket)``;
    bucket = Σ_p (sign(v·h_p) > 0) << p. Narrow map, no shuffle."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        hp = F.array(*[F.lit(v) for v in _hyperplane(dim, p, seed)])
        # Quantize before the sign test: Spark's sequential aggregate
        # fold and DuckDB's list_dot_product can differ in the last
        # ulp, which flips sign(dot) for near-zero dots. round(·, 6)
        # on both engines makes the discontinuous comparison stable.
        bit = F.when(F.round(arr_dot(F.col(vec_col), hp), 6) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, p)
    return embeddings.select(F.col(id_col), bucket.alias("bucket"))


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's
    hyperplane bucket. One hash join on the bucket key — the ANN
    scale path (per-bucket candidate lists, not the full corpus)."""
    from pyspark.sql import Window

    b = hyperplane_buckets(embeddings, n_planes, seed, dim, id_col, vec_col)
    corpus = embeddings.join(b, id_col)
    qb = hyperplane_buckets(queries, n_planes, seed, dim, id_col, vec_col)
    q = (
        queries.join(qb, id_col)
        .select(F.col(id_col).alias("q"), F.col(vec_col).alias("qvec"), "bucket")
    )
    scored = corpus.join(F.broadcast(q), "bucket").where(F.col("q") != F.col(id_col)).select(
        "q", id_col, F.round(_cos("qvec", vec_col), 6).alias("cos_sim")
    )
    w = Window.partitionBy("q").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", id_col, "rank", "cos_sim")
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer → ``(cell, cvec)``: the ``n_cells`` corpus
    vectors with the smallest md5-derived sample key act as centroids
    (a deterministic pseudo-random sample both engines reproduce
    bit-for-bit; k-means refinement would be an orthogonal driver
    loop and would break oracle determinism).

    Scale shape: ``orderBy(...).limit(n)`` compiles to
    TakeOrderedAndProject — a distributed per-partition top-n + driver
    merge of n_cells rows, NOT a global sort; the row_number window
    then ranks only the n_cells selected rows."""
    from pyspark.sql import Window

    from bigclam_apachespark_spark.functions.hashing import hash64

    keyed = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        hash64(F.col(id_col).cast("string")).alias("skey"),
    )
    cent = keyed.orderBy("skey", id_col).limit(n_cells)
    w = Window.orderBy("skey", id_col)
    return cent.withColumn("cell", F.row_number().over(w) - 1).select(
        "cell", F.col(vec_col).alias("cvec")
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverted-file assignment → ``(vec_id, cell)``: nearest centroid
    by cosine (rounded to 6 dp for cross-engine argmax stability; ties
    → lowest cell). Centroids broadcast — the corpus never shuffles
    for the scoring; the argmax is a per-vector window over n_cells
    scored rows."""
    from pyspark.sql import Window

    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        "cell",
        F.round(_cos(F.col(vec_col), F.col("cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cos_sim").desc(), F.col("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, "cell")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k → ``(q, vec_id, rank, cos_sim)``: score
    only vectors assigned to the query's ``nprobe`` closest cells.

    The 100-TB shape: the corpus is scanned once for assignment (a
    narrow broadcast-scored map + per-vector argmax), then candidate
    scoring joins corpus rows against the (tiny, broadcast) probe
    list on the cell key — expected candidate volume is
    |Q| · nprobe/n_cells · |N|, against the brute-force |Q| · |N|. In
    a persisted deployment the assignment is written bucketed by
    ``cell`` so probes prune at the scan."""
    from pyspark.sql import Window

    cent = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    assign = ivf_assign(embeddings, cent, id_col, vec_col)
    corpus = embeddings.join(assign, id_col)

    qscored = queries.crossJoin(F.broadcast(cent)).select(
        F.col(id_col).alias("q"),
        F.col(vec_col).alias("qvec"),
        "cell",
        F.round(_cos(F.col(vec_col), F.col("cvec")), 6).alias("cos_sim"),
    )
    wq = Window.partitionBy("q").orderBy(F.col("cos_sim").desc(), F.col("cell"))
    probes = (
        qscored.withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= nprobe)
        .select("q", "qvec", "cell")
    )
    scored = (
        corpus.join(F.broadcast(probes), "cell")
        .where(F.col("q") != F.col(id_col))
        .select("q", id_col, F.round(_cos("qvec", vec_col), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("q").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", id_col, "rank", "cos_sim")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine ≥ threshold) via
    hyperplane-bucket blocking: score pairs only within a bucket.
    High-cosine pairs land in the same bucket with prob ≥
    (1−θ/π)^n_planes — for θ near 0 (near-dups) that is ≈1."""
    b = hyperplane_buckets(embeddings, n_planes, seed, dim, id_col, vec_col)
    e = embeddings.join(b, id_col)
    a = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket")
    c = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket")
    return (
        a.join(c, "bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.round(_cos("va", "vb"), 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
        .select("a", "b", "cos_sim")
        .distinct()
    )
