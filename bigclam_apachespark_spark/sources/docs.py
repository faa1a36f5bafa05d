"""Document corpus sources/sinks (extension surface — the reference
reads only edge-list text, SURVEY.md §2.A; training-data pipelines
live on JSONL in and partitioned parquet out).

Scale notes: JSONL is line-oriented and therefore splittable — Spark
parallelizes the scan like any text source. The schema is DECLARED,
never inferred: schema inference is a full extra pass over the data
(at 100 TB that is the whole job again), and a drifting inferred
schema breaks downstream plans silently. Malformed lines surface as
NULLs (PERMISSIVE mode) and are dropped explicitly rather than
aborting the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL corpus scan → ``(doc_id, text, source)`` with a declared
    schema (no inference pass). Rows whose doc_id fails to parse are
    dropped (PERMISSIVE nulls), mirroring the edge-list reader's
    bad-line policy."""
    df = spark.read.schema(DOCS_JSONL_SCHEMA).json(path)
    return df.where(df.doc_id.isNotNull())


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV corpus scan → ``(doc_id, text, source)``: declared schema
    (no inference pass), header row, RFC-4180 quoting (embedded
    commas and doubled quotes). Malformed rows (unparseable doc_id)
    surface as PERMISSIVE nulls and are dropped explicitly — same
    bad-line policy as the JSONL and edge-list readers.

    Scale note: records are kept single-line on purpose — Spark's
    multiLine CSV mode makes the file non-splittable (one task per
    file), so a corpus with embedded newlines should be re-exported
    as JSONL/parquet rather than scanned with multiLine at 100 TB."""
    df = (
        spark.read.schema(DOCS_JSONL_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        # Spark's default escape is backslash; RFC-4180 escapes a
        # quote by DOUBLING it — escape='"' selects that convention
        .option("escape", '"')
        .csv(path)
    )
    return df.where(df.doc_id.isNotNull())


def write_compacted(df: DataFrame, path: str, by: str | None = None) -> None:
    """Compacting parquet sink: the REBALANCE hint lets AQE coalesce
    AND split shuffle output so every written file lands near
    ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` — the
    idiomatic fix for the small-files problem (a 100-TB pipeline that
    writes one file per upstream task produces millions of KB-sized
    files and kills every downstream scan's task scheduler; a plain
    ``repartition(n)`` needs the row count in advance and cannot
    split skewed partitions). Optional ``by`` adds partition-column
    layout on top."""
    out = df.hint("rebalance")
    writer = out.write.mode("overwrite")
    if by is not None:
        writer = writer.partitionBy(by)
    writer.parquet(path)


def write_corpus_partitioned(df: DataFrame, path: str, by: str = "split") -> None:
    """Training-corpus sink: parquet partitioned by the split (or any
    low-cardinality) column — the standard output layout, because a
    reader of one split (``WHERE split = 'train'``) then prunes the
    other partitions at the FILE level (PartitionFilters in the scan,
    zero bytes read from val/test). Partition columns must stay
    low-cardinality: partitioning by a high-cardinality key creates
    one directory per value and kills the file system at scale."""
    df.write.mode("overwrite").partitionBy(by).parquet(path)


def write_bucketed(
    df: DataFrame, table: str, key: str = "doc_id", n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Bucketed + per-bucket-sorted parquet table sink (``bucketBy``
    requires ``saveAsTable`` — the bucket spec lives in the catalog,
    not the files). Two tables bucketed identically on the join key
    are CO-LOCATED: a join between them compiles to a zero-Exchange
    SortMergeJoin (asserted in tests/test_plans.py), because each
    bucket pair joins independently. At 100 TB this is the tool for
    keys joined repeatedly across jobs — the shuffle is paid once at
    write time instead of once per join; group-bys on the bucket key
    skip their Exchange the same way. Keep n_buckets a multiple of
    the usual parallelism; too few buckets caps join parallelism."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def roundtrip_orc(df: DataFrame, path: str) -> DataFrame:
    """ORC sink + scan — the second columnar interchange format a
    warehouse must speak (Hive-ecosystem peers hand data over as ORC
    at least as often as parquet). Spark's ORC datasource has the
    same vectorized reader, predicate pushdown, and column pruning
    as parquet, so every scan-shape guarantee in this repo carries
    over; the round-trip is lossless for all primitive + nested
    types used here. Writes with overwrite semantics, returns the
    re-read relation (lazy — the read scan's schema comes from the
    ORC footer, not the writer's lineage)."""
    df.write.mode("overwrite").orc(path)
    return df.sparkSession.read.orc(path)


def roundtrip_schema_evolution(docs: DataFrame, path: str) -> DataFrame:
    """Schema-evolution read: two parquet generations of the same
    table — a legacy batch missing the newer columns and a current
    full-schema batch — merged by ``mergeSchema`` into one relation
    whose missing columns surface as NULLs. This is the 100-TB
    reality check for any long-lived corpus: columns get added over
    time and a reader must span generations without a rewrite.
    Spark merges the parquet footers at planning time (cost ∝ number
    of files, not rows); per-row the legacy batch pays nothing — the
    vectorized reader fills the absent columns with NULL batches.
    Splits deterministically by doc_id parity so the oracle can
    replay the generation boundary."""
    legacy = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text", "lang")
    current = docs.where(F.col("doc_id") % 2 == 1)
    legacy.write.mode("overwrite").parquet(f"{path}/gen=legacy")
    current.write.mode("overwrite").parquet(f"{path}/gen=current")
    return (
        docs.sparkSession.read.option("mergeSchema", "true")
        .parquet(f"{path}/gen=legacy", f"{path}/gen=current")
    )


def write_documents_text(df: DataFrame, path: str) -> None:
    """Plain-text corpus sink: one ``<doc_id>\\t<text>`` line per
    document — the simplest interchange format LLM corpora ship in
    (splittable like any line-oriented source; no schema, no
    container). Embedded newlines would break line atomicity, so
    they are stripped at write (the documents fixture has none —
    the strip is the contract, not a lossy surprise)."""
    df.select(
        F.concat_ws(
            "\t",
            F.col("doc_id").cast("string"),
            F.regexp_replace(F.col("text"), "[\\n\\r\\t]", " "),
        ).alias("value")
    ).write.mode("overwrite").text(path)


def read_documents_text(spark: SparkSession, path: str) -> DataFrame:
    """Plain-text corpus scan → ``(doc_id, text)``: split each line
    at the FIRST tab, ``try_cast`` the id (ANSI-safe), drop
    malformed lines — the same bad-line policy as the edge-list and
    JSONL readers. Line-oriented → fully splittable; Spark
    parallelizes the scan like any text source."""
    raw = spark.read.text(path)
    parsed = raw.where(F.expr("instr(value, '\t') > 0")).select(
        F.expr(
            "try_cast(substring_index(value, '\t', 1) AS BIGINT)"
        ).alias("doc_id"),
        F.expr("substring(value, instr(value, '\t') + 1)").alias("text"),
    )
    return parsed.where(F.col("doc_id").isNotNull())
