"""Streaming CDC apply: a changefeed stream merged into a warehouse
snapshot via ``foreachBatch`` — the sink-side half of the streaming
story (the other modules cover stateful transforms; this covers
committing their output transactionally-per-batch into a table).

On a real deployment the merge body is one ``MERGE INTO`` against a
table format (Delta/Iceberg) and the read-rewrite below collapses to
a metadata-pruned file rewrite; plain parquet has no transaction log,
so the demonstrable-here version rewrites the snapshot per batch.
The ALGEBRA — last-write-wins per key, insert-or-replace, carry-over
— is exactly ``operators/relational.upsert_merge`` and is what the
oracle checks; the plumbing (foreachBatch, availableNow trigger,
epoch-id-per-batch) is the part Structured Streaming adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigclam_apachespark_spark.operators.relational import upsert_merge


def cdc_upsert_stream(
    spark: SparkSession,
    snapshot: DataFrame,
    changefeed: DataFrame,
    target_dir: str,
    key: str = "o_orderkey",
    timeout_sec: float = 120.0,
) -> DataFrame:
    """Apply a streaming changefeed to a snapshot with per-micro-batch
    MERGE semantics; returns the final merged table.

    Each ``foreachBatch`` invocation reads the current snapshot,
    merges the batch (updates replace same-key rows, new keys insert,
    the rest carry over), and rewrites. The merged frame is EAGERLY
    materialized (localCheckpoint) before the overwrite — reading and
    overwriting the same path lazily would corrupt it. Batch splits
    are safe whenever each key appears at most once in the feed
    (sequential merges of key-disjoint batches commute to one merge);
    feeds with per-key histories must be collapsed last-write-wins
    upstream, the documented ``upsert_merge`` precondition.

    ``availableNow`` processes the staged feed and stops itself;
    ``timeout_sec`` is the hang watchdog (same posture as
    ``run_stream_to_memory``)."""
    snapshot.write.mode("overwrite").parquet(target_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        cur = spark.read.parquet(target_dir)
        merged = upsert_merge(cur, batch_df, key=key).localCheckpoint(
            eager=True
        )
        merged.write.mode("overwrite").parquet(target_dir)

    q = (
        changefeed.writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"cdc_upsert_stream did not finish in {timeout_sec}s"
            )
    finally:
        try:
            from bigclam_apachespark_spark.streaming.events_stream import (
                LAST_STREAM_PLANS,
            )

            LAST_STREAM_PLANS["cdc_upsert_stream"] = q._jsq.explainInternal(
                False
            )
        except Exception:
            pass
        if q.isActive:
            q.stop()
    return spark.read.parquet(target_dir)


def counting_topk_stream(
    spark: SparkSession,
    stream: DataFrame,
    key_col: str,
    target_dir: str,
    k: int = 20,
    timeout_sec: float = 120.0,
) -> DataFrame:
    """Streaming global top-k heavy hitters via ``foreachBatch``
    count-merge → the final ``(key, n, rank)`` head: each micro-batch
    aggregates its own counts (map-side combined) and ADDS them into
    a persisted count table; the head is ranked once at the end from
    the aggregate-sized state. Unlike the CDC merge, the count merge
    is fully associative AND commutative, so ANY batch split —
    including a key seen in every batch — yields the identical final
    table; no upstream collapse precondition at all.

    This is the production shape for "top domains/users/tokens so
    far" over an unbounded feed: state is one row per DISTINCT key
    (swap in the CMS sketch when distinct keys outgrow a table), the
    stream itself stays a stateless per-batch agg, and the expensive
    global rank runs once over the final aggregate, not per batch.

    State durability (ADVICE r9): the count table is kept in
    VERSIONED generation dirs under ``target_dir`` with an atomically
    replaced ``_CURRENT`` pointer file (``os.replace``), so a crash
    mid-write leaves the previous generation intact for a rerun
    instead of a half-written overwrite; and a source that yields
    ZERO batches returns an empty (key, n, rank) frame instead of
    throwing on a never-created directory."""
    import os

    current_file = os.path.join(target_dir, "_CURRENT")

    def _read_state():
        if not os.path.isfile(current_file):
            return None
        # explicit pointer check — a bare except around the read
        # would silently restart the count table on a CORRUPT state
        # file, which must fail loudly instead
        with open(current_file) as fh:
            gen = fh.read().strip()
        return spark.read.parquet(os.path.join(target_dir, gen))

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        import pyspark.sql.functions as F

        counts = batch_df.groupBy(key_col).agg(F.count("*").alias("n"))
        cur = _read_state()
        if cur is not None:
            merged = (
                cur.unionByName(counts)
                .groupBy(key_col)
                .agg(F.sum("n").alias("n"))
                .localCheckpoint(eager=True)
            )
        else:
            merged = counts.localCheckpoint(eager=True)
        old_gen = None
        if os.path.isfile(current_file):
            with open(current_file) as fh:
                old_gen = fh.read().strip()
        new_gen = f"v{batch_id}"
        merged.write.mode("overwrite").parquet(os.path.join(target_dir, new_gen))
        # atomic pointer swap: the new generation becomes visible in
        # one os.replace; a crash before it leaves the old pointer
        # (and its intact generation) in place
        tmp = current_file + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(new_gen)
        os.replace(tmp, current_file)
        if old_gen and old_gen != new_gen:
            shutil.rmtree(os.path.join(target_dir, old_gen), ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"counting_topk_stream did not finish in {timeout_sec}s"
            )
    finally:
        try:
            from bigclam_apachespark_spark.streaming.events_stream import (
                LAST_STREAM_PLANS,
            )

            LAST_STREAM_PLANS["counting_topk_stream"] = q._jsq.explainInternal(
                False
            )
        except Exception:
            pass
        if q.isActive:
            q.stop()
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    final = _read_state()
    if final is None:
        # zero batches produced: empty head, not an AnalysisException
        key_type = dict(stream.dtypes)[key_col]
        return spark.createDataFrame(
            [], f"{key_col} {key_type}, n long, rank int"
        )
    top = final.orderBy(F.col("n").desc(), key_col).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col(key_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        key_col, F.col("n").cast("long").alias("n"), "rank"
    )


def cms_topk_stream(
    spark: SparkSession,
    stream: DataFrame,
    key_col: str,
    target_dir: str,
    k: int = 20,
    d: int = 4,
    w: int = 1024,
    candidates: int = 256,
    timeout_sec: float = 120.0,
) -> DataFrame:
    """Streaming heavy hitters with BOUNDED state via a count-min
    sketch (VERDICT r11 ask #8 — the documented CMS swap-in for
    ``counting_topk_stream`` when distinct keys outgrow a count
    table) → the final ``(key, n_cms, rank)`` head ranked by CMS
    estimate.

    State per generation is d·w counters (``sketches.cms_counters``
    rows — FIXED size at any key cardinality) plus a ``candidates``-
    bounded key set: each micro-batch adds its own counter table into
    the persisted one (counter merge is associative+commutative, so
    the FINAL counters are batch-split-invariant like the exact count
    merge), then re-estimates batch keys ∪ previous candidates
    against the merged counters and keeps the top ``candidates`` by
    (estimate DESC, key). The final head re-ranks the surviving
    candidates against the FINAL counters.

    Approximation contract (the standard ε-heavy-hitter argument,
    stated instead of hidden): a true top-k key is in the final head
    whenever its count exceeds the CMS collision noise floor by more
    than the margin between it and the candidate cutoff — with
    candidates ≫ k (default 12.8×) a top-k key would have to be
    outside the top-``candidates`` of some prefix of the feed to be
    lost. The estimates themselves are deterministic integer
    functions of the data (md5 buckets, integer sums), so the oracle
    twin recomputes them exactly; ``n_cms ≥ n_exact`` always (CMS
    never under-counts).

    Same versioned-generation + atomic ``_CURRENT`` pointer
    durability as ``counting_topk_stream``."""
    import os

    from bigclam_apachespark_spark.operators.sketches import cms_counters

    current_file = os.path.join(target_dir, "_CURRENT")

    def _gen_dir(gen: str) -> str:
        return os.path.join(target_dir, gen)

    def _read_gen():
        if not os.path.isfile(current_file):
            return None, None
        with open(current_file) as fh:
            gen = fh.read().strip()
        return (
            spark.read.parquet(os.path.join(_gen_dir(gen), "counters")),
            spark.read.parquet(os.path.join(_gen_dir(gen), "cands")),
        )

    def _estimate(keys: DataFrame, counters: DataFrame) -> DataFrame:
        """(key, n_cms): min over the d probed counters — exact ints."""
        import pyspark.sql.functions as F

        from bigclam_apachespark_spark.functions.hashing import hash64

        probes = keys.select(
            key_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            (
                                hash64(
                                    F.concat(
                                        F.lit(f"cms{r}:"),
                                        F.col(key_col).cast("string"),
                                    )
                                )
                                % w
                            ).cast("int").alias("bucket"),
                        )
                        for r in range(d)
                    ]
                )
            ).alias("p"),
        ).select(key_col, F.col("p.r").alias("r"), F.col("p.bucket").alias("bucket"))
        return (
            probes.join(counters, ["r", "bucket"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("n_cms"))
        )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        import pyspark.sql.functions as F

        toks = batch_df.select(F.col(key_col).cast("string").alias("term"))
        batch_counters = cms_counters(toks, "term", d, w)
        prev_counters, prev_cands = _read_gen()
        if prev_counters is not None:
            merged = (
                prev_counters.unionByName(batch_counters)
                .groupBy("r", "bucket")
                .agg(F.sum("c").alias("c"))
                .localCheckpoint(eager=True)
            )
            cand_keys = (
                batch_df.select(key_col)
                .distinct()
                .unionByName(prev_cands.select(key_col))
                .distinct()
            )
        else:
            merged = batch_counters.localCheckpoint(eager=True)
            cand_keys = batch_df.select(key_col).distinct()
        kept = (
            _estimate(cand_keys, merged)
            .orderBy(F.col("n_cms").desc(), key_col)
            .limit(candidates)
            .select(key_col)
            .localCheckpoint(eager=True)
        )
        old_gen = None
        if os.path.isfile(current_file):
            with open(current_file) as fh:
                old_gen = fh.read().strip()
        new_gen = f"v{batch_id}"
        merged.write.mode("overwrite").parquet(
            os.path.join(_gen_dir(new_gen), "counters")
        )
        kept.write.mode("overwrite").parquet(
            os.path.join(_gen_dir(new_gen), "cands")
        )
        tmp = current_file + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(new_gen)
        os.replace(tmp, current_file)
        if old_gen and old_gen != new_gen:
            shutil.rmtree(_gen_dir(old_gen), ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(f"cms_topk_stream did not finish in {timeout_sec}s")
    finally:
        try:
            from bigclam_apachespark_spark.streaming.events_stream import (
                LAST_STREAM_PLANS,
            )

            LAST_STREAM_PLANS["cms_topk_stream"] = q._jsq.explainInternal(False)
        except Exception:
            pass
        if q.isActive:
            q.stop()
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    counters, cands = _read_gen()
    if counters is None:
        key_type = dict(stream.dtypes)[key_col]
        return spark.createDataFrame(
            [], f"{key_col} {key_type}, n_cms long, rank int"
        )
    top = (
        _estimate(cands, counters)
        .orderBy(F.col("n_cms").desc(), key_col)
        .limit(k)
    )
    win = Window.orderBy(F.col("n_cms").desc(), F.col(key_col))
    return top.withColumn("rank", F.row_number().over(win)).select(
        key_col, F.col("n_cms").cast("long").alias("n_cms"), "rank"
    )
