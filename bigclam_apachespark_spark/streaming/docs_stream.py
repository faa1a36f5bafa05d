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
  semantics). The documents fixture has no timestamp column, so the
  exact/near-dup streams model the unbounded-retention variant;
  ``minhash_band_stream_watermark`` (+ ``with_arrival_time`` staging a
  deterministic event time) is the watermark-bounded configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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


def with_arrival_time(docs: DataFrame, epoch0: int = 1704067200) -> DataFrame:
    """Appends a deterministic event-time column ``ts`` = 2024-01-01
    UTC + ``doc_id`` seconds — the timestamped staging of the
    documents fixture (which carries no timestamp of its own). A
    pure narrow projection, so a streaming source stays in append
    mode; deterministic so the bounded-replay oracle can state the
    emitted set exactly."""
    return docs.withColumn(
        "ts", F.timestamp_seconds(F.lit(epoch0) + F.col("doc_id"))
    )


def minhash_band_stream_watermark(
    docs_ts: DataFrame,
    text_col: str = "text",
    num_perms: int = 16,
    shingle_n: int = 5,
    rows_per_band: int = 4,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermark-bounded streaming near-dup state → one ``(band,
    bucket)`` row per band bucket first occupied WITHIN the watermark
    horizon — the ``dropDuplicatesWithinWatermark`` twin of
    ``minhash_band_stream``, closing its documented unbounded-
    retention stance. Requires an event-time column ``ts`` on the
    input (``with_arrival_time`` stages one for the fixture).

    Semantics: a near-dup arriving within the horizon of its bucket's
    first occupant is suppressed; one arriving later RE-ADMITS the
    bucket (dedup-within-window, the content-drift-tolerant policy a
    continuously-ingesting corpus actually wants). State per open
    bucket is evicted once the watermark passes it — bounded by the
    arrival rate × horizon instead of growing with corpus lifetime,
    the 100-TB-safe configuration.

    Oracle: on a bounded AvailableNow replay all rows land in one
    batch where nothing has been evicted yet, so the emitted set
    equals the batch DISTINCT (band, bucket) — same bounded-replay
    contract as ``events_stream.dedup_within_watermark_stream``; the
    state bound is the production property."""
    from bigclam_apachespark_spark.operators.dedup import minhash_band_keys

    keys = minhash_band_keys(
        docs_ts, text_col, num_perms, shingle_n, rows_per_band, keep_cols=("ts",)
    )
    return (
        keys.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["band", "bucket"])
        .select("band", "bucket")
    )


def bloom_decontam_stream(
    docs: DataFrame,
    bitmap_words: list[int],
    text_col: str = "text",
    m_bits: int = 1 << 16,
    k: int = 7,
) -> DataFrame:
    """Streaming Bloom decontamination → the ADMITTED document ids:
    each arriving document probes a STATIC Bloom filter of the
    benchmark corpus (built batch-side by ``sketches.bloom_bitmap``,
    densified to ``bitmap_words[i] = bits of word i``) and passes
    iff at least one of its k bit positions is unset. Bloom's
    no-false-negative guarantee means an admitted document is
    PROVABLY not in the benchmark — the admission decision a
    training-data ingest stream needs, with false positives only
    costing recall.

    Scale shape: the filter is a plan-literal int64 array (m/32
    words — 2 KB per 2¹⁶ bits), evaluated per row as k
    element_at+AND checks: a PURE NARROW projection+filter. No
    stream-stream or stream-static join, no state store, append mode
    trivially — the streaming twin of ``events_stream_enrich``'s
    zero-state broadcast posture, applied to membership instead of
    enrichment. The bitmap collect is bounded by construction
    (m/32 words regardless of benchmark size — the same constant-
    size-aggregate exemption as BigCLAM's K-length sumF)."""
    from bigclam_apachespark_spark.operators.sketches import (
        BLOOM_P,
        bloom_constants,
    )

    arr = F.lit(bitmap_words)
    # element_at over a 32-long power-of-two literal stands in for a
    # column-amount shiftleft (the DataFrame API only shifts by a
    # literal) — same exact bit, still a narrow codegen expression
    pow2 = F.lit([1 << i for i in range(32)])
    h = hash64(normalize_text(text_col)).cast("string")
    hh = hash64(h) % BLOOM_P
    checks = []
    for _, a, b in bloom_constants(k):
        pos = (F.lit(a) * hh + F.lit(b)) % BLOOM_P % m_bits
        word = F.element_at(arr, F.floor(pos / 32).cast("int") + 1)
        bit = F.element_at(pow2, (pos % 32).cast("int") + 1).cast("long")
        checks.append(word.bitwiseAND(bit) != 0)
    all_set = checks[0]
    for c in checks[1:]:
        all_set = all_set & c
    return docs.where(~all_set).select("doc_id")


def dense_bloom_words(bitmap: DataFrame, m_bits: int = 1 << 16) -> list[int]:
    """Collect a (word_idx, bits) Bloom bitmap into the dense int64
    list ``bloom_decontam_stream`` embeds in the plan (missing words
    are zero). Bounded: m/32 rows by construction."""
    words = [0] * (m_bits // 32)
    for r in bitmap.collect():
        words[r.word_idx] = r.bits
    return words
