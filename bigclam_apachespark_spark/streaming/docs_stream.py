"""Streaming deduplication over the ``documents`` table (north-star
extension; the reference has no streaming of any kind — SURVEY.md §2
"not present").

The production shape this models: documents arrive continuously
(Kafka / file drops) and the pipeline must admit each distinct
content exactly once — the streaming twin of the batch
``operators.dedup.exact_dedup``. Spark's ``dropDuplicates`` on a
streaming DataFrame keeps one state-store row per distinct key and
emits a row the first time a key is seen, which is precisely
exact-dedup semantics over an unbounded input.

Scale notes:
- State is one (content_fp) long per DISTINCT document — the minimal
  possible exact-dedup state; with the RocksDB state-store provider
  this scales to billions of keys per cluster.
- The fingerprint is computed BEFORE the stateful operator, so the
  state key is a fixed-width long, never the document text.
- When the source carries event time, ``dropDuplicatesWithinWatermark``
  bounds state by the watermark horizon instead (dedup-within-window
  semantics); the documents fixture has no timestamp column, so this
  module models the unbounded-retention variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from bigclam_apachespark_spark.functions.hashing import hash64, normalize_text

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a documents parquet path — replays the
    batch table as a stream (same replay-test harness as
    ``read_events_stream``; a single-file fixture is staged behind a
    symlink directory because the file source requires a directory)."""
    import os
    import tempfile

    if os.path.isfile(path):
        d = tempfile.mkdtemp(prefix="docs_stream_src_")
        os.symlink(path, os.path.join(d, os.path.basename(path)))
        path = d
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def dedup_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming exact dedup → one ``(content_fp)`` row per distinct
    normalized content, emitted on first sight.

    Output carries ONLY the fingerprint: which doc_id arrives first
    for a duplicated content is an artifact of partition scheduling,
    so a deterministic (cross-engine-checkable) streaming answer is
    the distinct fingerprint set itself — the batch twin is
    ``SELECT DISTINCT hash(normalize(text))``."""
    fp = docs.select(hash64(normalize_text(text_col)).alias("content_fp"))
    return fp.dropDuplicates(["content_fp"])


def minhash_band_stream(
    docs: DataFrame,
    text_col: str = "text",
    num_perms: int = 16,
    shingle_n: int = 5,
    rows_per_band: int = 4,
) -> DataFrame:
    """Streaming MinHash/LSH NEAR-dup state → one ``(band, bucket)``
    row per first-seen LSH band bucket — the streaming twin of the
    batch ``lsh_buckets`` path.

    This is the state a streaming near-dup ADMISSION filter
    maintains: an arriving document whose band keys all hit occupied
    buckets is a near-dup suspect (same banding guarantee as batch
    LSH); a document that opens at least one new bucket is novel.
    The emitted first-occupancy stream IS that state, and — like
    ``dedup_stream`` — it is the part of the computation with a
    deterministic cross-engine answer (which doc_id first occupies a
    shared bucket is a scheduling artifact; the occupied-bucket SET
    is not), so the oracle twin is the batch bucket distinct:
    ``SELECT DISTINCT band, bucket FROM lsh_buckets(...)``.

    Scale shape: signatures are computed per document as a pure
    narrow map (``dedup.minhash_band_keys`` — array_min over the
    hashed shingle array, no stateful agg, so the stream stays in
    append mode), then ``dropDuplicates`` keeps one state-store row
    per distinct (band, bucket) — num_bands fixed-width longs per
    distinct content neighborhood, the RocksDB-friendly bounded
    state. With an event-time column upstream,
    ``dropDuplicatesWithinWatermark`` bounds retention to the
    watermark horizon (the documents fixture carries no timestamp,
    so this models the unbounded-retention variant, same stance as
    ``dedup_stream``)."""
    from bigclam_apachespark_spark.operators.dedup import minhash_band_keys

    keys = minhash_band_keys(docs, text_col, num_perms, shingle_n, rows_per_band)
    return keys.select("band", "bucket").dropDuplicates(["band", "bucket"])
