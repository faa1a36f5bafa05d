"""Text-analysis operators over the ``documents`` table (north-star
extension surface — the reference has no string processing at all,
SURVEY.md §2.E; these are the training-data-pipeline ops the rebuild
adds as first-class components).

All operators are pure DataFrame → DataFrame built from JVM-side
column expressions: at 100 TB the scan is the cost, so every function
here is a narrow map over the scan with no shuffle (except the
explicit aggregations), full predicate-pushdown/column-pruning
compatible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigclam_apachespark_spark.functions.hashing import (
    hash64,
    normalize_text,
    tokens,
)

# Tiny embedded stopword lists for the n-gram language heuristic.
# Deliberately small + hard-coded so the DuckDB oracle can inline the
# identical lists; real deployments would swap in fastText-style
# models behind the same column contract.
EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]
ES_STOPWORDS = ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"]
FR_STOPWORDS = ["le", "la", "de", "et", "un", "que", "est", "en", "du", "pour"]

# BPE-ish subtoken regex: alpha runs, digit runs, single punctuation.
SUBTOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(toks, arr))


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace word tokens + BPE-ish subtoken count
    (regexp match count) + char count. One narrow projection."""
    toks = tokens(text_col)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.regexp_count(F.lower(F.col(text_col)), F.lit(SUBTOKEN_RE)).alias("n_subtokens"),
        F.length(text_col).alias("n_chars"),
    )


def _quality_parts(text_col: str) -> tuple[Column, Column, Column, Column]:
    """(punct_ratio, stop_ratio, mean_word_len, score) expression
    builders — shared by ``quality_score`` and ``clean_corpus`` so the
    two can never drift. Pure expression trees (fixed fold order), so
    the doubles are bit-identical cross-engine."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9\s]", ""))
    punct_ratio = punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    stop_ratio = _stopword_hits(toks, EN_STOPWORDS).cast("double") / F.greatest(
        F.size(F.array_distinct(toks)), F.lit(1)
    ).cast("double")
    mean_word_len = F.length(normalize_text(text_col)).cast("double") / F.greatest(
        n_tok, F.lit(1)
    ).cast("double")
    length_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    word_len_score = F.when((mean_word_len >= 3.0) & (mean_word_len <= 10.0), 1.0).otherwise(0.5)
    score = (
        F.lit(0.3) * length_score
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0)))
        + F.lit(0.2) * F.least(stop_ratio * 4.0, F.lit(1.0))
        + F.lit(0.2) * word_len_score
    )
    return punct_ratio, stop_ratio, mean_word_len, score


def _lang_pred(text_col: str) -> tuple[Column, Column, Column, Column]:
    """(en_hits, es_hits, fr_hits, lang_pred) expression builders —
    shared by ``lang_id`` and ``clean_corpus``."""
    toks = F.array_distinct(tokens(text_col))
    en = _stopword_hits(toks, EN_STOPWORDS)
    es = _stopword_hits(toks, ES_STOPWORDS)
    fr = _stopword_hits(toks, FR_STOPWORDS)
    best = F.greatest(en, es, fr)
    lang = (
        F.when(best == 0, "und")
        # tie-break order fixed: en > es > fr (documented, matches oracle)
        .when(en == best, "en")
        .when(es == best, "es")
        .otherwise("fr")
    )
    return en, es, fr, lang


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: length, punctuation ratio, stopword
    ratio, mean word length — composed into a [0,1] score. The exact
    blend is arbitrary (documented, deterministic); the value is the
    relational shape: narrow map, no shuffle."""
    punct_ratio, stop_ratio, mean_word_len, score = _quality_parts(text_col)
    return docs.select(
        "doc_id",
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: stopword-list hit counts per language,
    argmax with 'und' when nothing hits. n-gram-free variant of the
    classic heuristic — set-intersection counts on distinct tokens."""
    en, es, fr, lang = _lang_pred(text_col)
    return docs.select(
        "doc_id", en.alias("en_hits"), es.alias("es_hits"), fr.alias("fr_hits"),
        lang.alias("lang_pred"),
    )


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    quality_threshold: float = 0.5,
    lang: str = "en",
) -> DataFrame:
    """Training-data corpus cleaning — the canonical LLM-pipeline
    composition, as ONE query: quality filter → language filter →
    exact dedup among the survivors (keep min doc_id per
    normalized-content hash) → ``(doc_id, content_fp, quality,
    lang_pred)``.

    Filter-before-dedup is the standard order (the cheap narrow
    filters shrink the dedup input). 100-TB shape: a single narrow
    map computes fingerprint + quality + language per document (no
    joins between the metric operators — they share one projection);
    survivor election is a row_number window over content_fp — ONE
    scan and ONE shuffle total (a groupBy-min + join-back would
    re-scan the corpus and re-run the quality expressions for the
    second input). The quality threshold compares the ROUNDED score —
    bit-identical cross-engine, so the discrete keep/drop decision
    cannot flip (see registry_ext twin).

    OPTIMIZATION r14 examined, left alone: spreading the single-split
    corpus across cores (``spread_small_input``, applied to the
    MinHash pipeline) was A/B-measured here too — the extra exchange
    costs about what the ~1 s serial metric projection saves (warm
    mins 1.60 vs 2.07 s), because this operator's work per byte is an
    order of magnitude lighter than shingling. Not applied.
    """
    from pyspark.sql import Window

    _, _, _, score = _quality_parts(text_col)
    _, _, _, lang_col = _lang_pred(text_col)
    m = docs.select(
        "doc_id",
        hash64(normalize_text(text_col)).alias("content_fp"),
        F.round(score, 6).alias("quality"),
        lang_col.alias("lang_pred"),
    )
    f = m.where((F.col("quality") >= quality_threshold) & (F.col("lang_pred") == lang))
    w = Window.partitionBy("content_fp").orderBy("doc_id")
    return (
        f.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "content_fp", "quality", "lang_pred")
    )


def salient_terms(docs: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Top-k salient terms per document by the exact rational
    ``tf / df`` (term frequency over corpus document frequency) →
    ``(doc_id, term, tf, df, rank, salience)``.

    Why tf/df and not tf·idf for the RANKING key: the ordering must be
    bit-identical cross-engine (the DuckDB oracle hashes the rank
    column). ``ln`` is not guaranteed correctly rounded across libms —
    and tf·ln(N/df) has genuine cross-engine ties (2·ln 4 = 4·ln 2),
    so a last-ulp difference can flip ranks. A single IEEE division of
    two exact integers IS correctly rounded on every engine, and two
    distinct rationals p₁/q₁ ≠ p₂/q₂ with q ≤ 2¹⁷ are ≥ 2⁻³⁴ apart —
    far beyond double representation error — so equal doubles ⇔ equal
    rationals, and the (salience DESC, term) order is exact. Same
    rarity-weighted-frequency semantics, none of the float hazard.

    Scale shape: tf is one hash-agg over the exploded token table
    (map-side combine); df is a second agg over tf's (doc, term) rows
    — already deduplicated, so no DISTINCT pass; the join back is on
    the term key (AQE broadcasts when the vocab is small); ranking is
    a per-doc window over ≤ |distinct terms per doc| rows."""
    from pyspark.sql import Window

    tok = docs.select("doc_id", F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    sal = F.col("tf").cast("double") / F.col("df").cast("double")
    w = Window.partitionBy("doc_id").orderBy(F.col("salience").desc(), "term")
    return (
        tf.join(dfreq, "term")
        .select("doc_id", "term", "tf", "df", sal.alias("salience"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "rank", F.round("salience", 6).alias("salience"))
    )


def vocab_topk(docs: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Corpus vocabulary heavy hitters: top-k terms by document
    frequency → ``(term, df, rank)``. ``orderBy().limit(k)`` compiles
    to TakeOrderedAndProject (distributed per-partition top-k + driver
    merge of k rows — no global sort); the row_number window then
    ranks only the k selected rows."""
    from pyspark.sql import Window

    dfreq = (
        docs.select("doc_id", F.explode(F.array_distinct(tokens(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    top = dfreq.orderBy(F.col("df").desc(), "term").limit(k)
    w = Window.orderBy(F.col("df").desc(), "term")
    return top.withColumn("rank", F.row_number().over(w)).select("term", "df", "rank")


def _split_cols(id_col: str, train_pct: int, val_pct: int) -> tuple[Column, Column]:
    """(bucket, split) expression builders — shared by ``hash_split``
    and ``training_corpus`` so the assignment can never drift."""
    bucket = (hash64(F.col(id_col).cast("string")) % 100).cast("int")
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return bucket, split


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash →
    ``(doc_id, bucket, split)``. The standard training-data split: a
    document's split is a pure function of its id, so it is stable
    across runs, machines, and corpus growth (new docs never move old
    ones between splits). hash64 is non-negative (60-bit), so ``% 100``
    agrees cross-engine without pmod concerns. Narrow map — no
    shuffle."""
    bucket, split = _split_cols(id_col, train_pct, val_pct)
    return docs.select(id_col, bucket.alias("bucket"), split.alias("split"))


def training_corpus(
    docs: DataFrame,
    text_col: str = "text",
    quality_threshold: float = 0.5,
    lang: str = "en",
    near_dup_threshold: float = 0.35,
    cache_handles: list | None = None,
) -> DataFrame:
    """The full training-data preparation pipeline as ONE query →
    ``(doc_id, content_fp, quality, split)``:

    1. quality + language filter and exact dedup (``clean_corpus`` —
       one narrow map + one shuffle);
    2. near-dup elimination among the survivors: MinHash-LSH candidate
       pairs → connected components → keep the minimum doc_id per
       cluster (``dedup.minhash_lsh_dups`` + ``cluster_survivors``);
    3. deterministic train/val/test hash split of the final corpus.

    Stage order is the production order: the cheap narrow filters
    shrink the expensive near-dup stage's input; near-dup clustering
    runs only over cleaned survivors; the split is a pure per-row
    function of the id, so it costs nothing. Every stage is
    individually oracle-checked (text_clean_corpus,
    dedup_minhash_lsh_pairs, dedup_cluster_survivors,
    text_hash_split); this composition is oracle-checked end-to-end
    as text_training_corpus."""
    from bigclam_apachespark_spark.operators.dedup import (
        minhash_lsh_dups,
        near_dup_clusters,
    )

    # cleaned feeds THREE consumers (the near-dup semi-join, the
    # survivor election, and the final output join) — cache it so the
    # quality/lang scoring scan runs once, not three times. At 100 TB
    # this is the survivors metadata table (ids + hashes, ≪ corpus) —
    # the natural persist point in a production pipeline too.
    # ``cache_handles``: pass a list to receive this cache plus the
    # three internal minhash caches for deterministic release (same
    # contract as minhash_lsh_dups); otherwise LRU eviction applies.
    cleaned = clean_corpus(docs, text_col, quality_threshold, lang).cache()
    if cache_handles is not None:
        cache_handles.append(cleaned)
    cleaned_docs = docs.join(cleaned.select("doc_id"), "doc_id", "left_semi")
    pairs = minhash_lsh_dups(
        cleaned_docs, text_col, threshold=near_dup_threshold,
        cache_handles=cache_handles,
    )
    # OPTIMIZATION r14 (guide §3.1 — VERDICT r13 ask #5): survivor
    # election used cluster_survivors (a corpus-ids ⟕ labels join to
    # compute ``keep``) followed by a corpus semi-join on the keepers.
    # The keeper set is cleaned-ids MINUS the cluster LOSERS (members
    # whose id ≠ their component's min id — losers ⊆ cleaned ids since
    # pairs only relate cleaned docs), so ONE anti-join against the
    # tiny loser table replaces both corpus-sized passes; the loser
    # side is near-dup-cluster-membership-sized and broadcasts.
    # Result-identical (semi-join-on-keepers ≡ anti-join-on-losers on
    # the same corpus; oracle re-verified sf0.01 + sf0.1).
    losers = (
        near_dup_clusters(pairs)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    bucket, split = _split_cols("doc_id", 80, 10)
    return (
        cleaned.join(losers, "doc_id", "left_anti")
        .select("doc_id", "content_fp", "quality", split.alias("split"))
    )


def token_length_quantiles(
    docs: DataFrame,
    text_col: str = "text",
    ps: tuple[float, ...] = (0.5, 0.9, 0.95, 0.99),
) -> DataFrame:
    """EXACT token-count quantiles over the corpus → ``(p, n_tokens_q)``
    with n_tokens_q = the smallest length whose cumulative count
    reaches ceil(p·N) (the classic inverse-CDF definition; integer
    outputs, so cross-engine exact — approx_percentile sketches are
    not reproducible across engines).

    Scale shape: the corpus collapses to a (length → count)
    distribution table first — |distinct lengths| rows (thousands at
    most, whatever the corpus size), so the single-partition cumsum
    window over it is deliberate and cheap; the quantile probe is a
    broadcast cross join of |ps| literals against that tiny table."""
    from pyspark.sql import Window

    lengths = docs.select(F.size(tokens(text_col)).alias("v"))
    counts = lengths.groupBy("v").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = counts.withColumn("cum", F.sum("cnt").over(w))
    total = lengths.agg(F.count("*").alias("n"))
    pdf = docs.sparkSession.createDataFrame([(float(p),) for p in ps], "p double")
    return (
        cum.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(pdf))
        .where(F.col("cum") >= F.ceil(F.col("p") * F.col("n")))
        .groupBy("p")
        .agg(F.min("v").alias("n_tokens_q"))
    )


def split_leakage(
    docs: DataFrame,
    text_col: str = "text",
    near_dup_threshold: float = 0.35,
    train_pct: int = 80,
    val_pct: int = 10,
    cache_handles: list | None = None,
) -> DataFrame:
    """Train/eval contamination check → ``(a, b, jaccard, split_a,
    split_b)``: near-duplicate pairs whose two documents land in
    DIFFERENT hash splits. Any such pair leaks training content into
    evaluation — the decontamination report every pipeline needs
    before a split ships. Empty result = clean.

    Composition of two oracle-checked stages (MinHash-LSH pairs +
    hash_split); the join is pair-table-sized, not corpus-sized.
    ``cache_handles`` propagates to the minhash pipeline for
    deterministic cache release (same contract as training_corpus)."""
    from bigclam_apachespark_spark.operators.dedup import minhash_lsh_dups

    pairs = minhash_lsh_dups(
        docs, text_col, threshold=near_dup_threshold,
        cache_handles=cache_handles,
    )
    splits = hash_split(docs, train_pct=train_pct, val_pct=val_pct).select(
        "doc_id", "split"
    )
    sa = splits.select(F.col("doc_id").alias("a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("a", "b", "jaccard", "split_a", "split_b")
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-unigram language-model score per document →
    ``(doc_id, n_tokens, avg_logprob)`` with avg_logprob =
    mean over tokens of ln(tf_corpus(token) / total_tokens). The
    CCNet-style quality signal: documents whose tokens are improbable
    under the corpus's own unigram distribution (gibberish, boiler-
    plate explosions, wrong-language fragments) score far below the
    bulk and can be percentile-filtered.

    Float discipline: ln appears only in OUTPUT values (rounded to
    6dp), never in a ranking or threshold inside the query — the
    cross-engine last-ulp hazard class that bit the LSH sign bits
    does not apply to value columns (same policy as the round(sum,6)
    aggregates).

    Scale shape: one exploded-token pass feeds both the corpus term
    frequencies and the per-doc join; the tf table is vocabulary-
    sized (AQE broadcasts when small); total_tokens is a scalar
    cross-joined in, not collected."""
    tok = docs.select("doc_id", F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy("term").agg(F.count("*").alias("ctf"))
    total = tf.agg(F.sum("ctf").alias("ctot"))
    return (
        tok.join(tf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("ctf").cast("double") / F.col("ctot").cast("double"))), 6
            ).alias("avg_logprob"),
        )
    )


def bigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-bigram conditional language-model score per document →
    ``(doc_id, n_bigrams, avg_logprob)`` with avg_logprob = mean
    over adjacent token pairs of ln(c(w1,w2) / c(w1,·)) — the
    order-sensitive upgrade of ``unigram_logprob``: token-salad
    documents (scrambled text, keyword stuffing) score high under a
    unigram LM because every token is individually common, but
    their TRANSITIONS are rare, and this catches exactly that. No
    smoothing needed: every scored bigram occurs in the corpus the
    LM is built from (count ≥ 1), so the ratio is always defined
    and in (0, 1]. Documents with fewer than two tokens drop (they
    have no transitions to score).

    Float discipline: ln only in rounded OUTPUT values, never a
    rank or threshold (same policy as ``unigram_logprob``).

    Scale shape: ONE zip_with pair construction (narrow — the pair
    relation is built by slicing the token array against itself,
    no self-join on position), feeding both corpus counts; the
    bigram and head-count tables are vocabulary²-bounded but
    Zipf-small in practice, joined back vertex-keyed; no windows,
    no collects."""
    tk = tokens(text_col)
    pairs = F.zip_with(
        F.slice(tk, 1, F.size(tk) - 1),
        F.slice(tk, 2, F.size(tk) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pr = (
        docs.select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bf = pr.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    hf = pr.groupBy("w1").agg(F.count("*").alias("c1"))
    return (
        pr.join(bf, ["w1", "w2"]).join(hf, "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(
                    F.log(F.col("c2").cast("double") / F.col("c1").cast("double"))
                ),
                6,
            ).alias("avg_logprob"),
        )
    )


def chunk_plan(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Token-window chunking → ``(doc_id, chunk_idx, start_token,
    n_chunk_tokens, chunk_text)``: overlapping windows of ``window``
    tokens advancing by ``stride`` (overlap = window − stride, the
    standard context-window chunker for long documents). The final
    window is short rather than padded; a document shorter than one
    window yields exactly one chunk. Deterministic integer geometry +
    exact substring reassembly (chunk_text re-joins the token slice),
    so the oracle hash is exact.

    Scale shape: pure narrow map + bounded explode (chunks per doc =
    ⌈(n_tokens − window)/stride⌉ + 1) — embarrassingly parallel, the
    fan-out that feeds tokenizer/packing stages."""
    if stride > window:
        # stride > window silently skips tokens between chunks and
        # can emit negative-length tail rows — a caller error.
        raise ValueError(f"stride ({stride}) must be <= window ({window})")
    tk = tokens(text_col)
    n_tok = F.size(tk)
    n_chunks = F.greatest(
        F.ceil((n_tok - F.lit(window)).cast("double") / F.lit(stride)).cast("int")
        + F.lit(1),
        F.lit(1),
    )
    base = docs.select("doc_id", tk.alias("_tk"), n_tok.alias("_n"), n_chunks.alias("_c"))
    start = F.col("chunk_idx") * stride
    return (
        base.select(
            "doc_id", "_tk", "_n",
            F.explode(F.sequence(F.lit(0), F.col("_c") - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            start.alias("start_token"),
            F.least(F.lit(window), F.col("_n") - start).alias("n_chunk_tokens"),
            F.concat_ws(" ", F.slice("_tk", start + 1, F.lit(window))).alias("chunk_text"),
        )
    )


def span_corruption(
    docs: DataFrame, text_col: str = "text", period: int = 7
) -> DataFrame:
    """T5-style span-corruption objective prep → ``(doc_id,
    n_masked, input_text, target_text)``: every ``period``-token
    block masks a fixed 2-token span (0-based offsets 3 and 4 within
    the block), the input replaces each masked span with one
    ``<extra_id_k>`` sentinel (k = block index), and the target is
    the sentinel-prefixed masked spans in order — the denoising
    (input, target) pair a seq2seq pretraining pipeline feeds the
    trainer. Deterministic POSITIONAL masking (not random): the
    whole pair is a pure function of the text, so the oracle
    hash-checks the exact strings; swapping in a seeded-hash mask
    keeps the same shape.

    Documents too short to contain a span (< 5 tokens) emit
    n_masked = 0 with NULL target (stated: string_agg over an empty
    set is NULL — the Spark side nulls its empty concat to match).

    Scale shape: zero exchanges and zero Python — the token array
    transforms in place with index-aware lambdas (filter/transform
    with (x, i)), both output strings are narrow ``concat_ws`` folds
    inside codegen; embarrassingly parallel like chunk_plan."""
    tk = tokens(text_col)
    sentinel = lambda i: F.concat(  # noqa: E731
        F.lit("<extra_id_"),
        F.floor(i / period).cast("long").cast("string"),
        F.lit(">"),
    )
    inp = F.filter(
        F.transform(
            tk,
            lambda x, i: F.when(i % period == 3, sentinel(i))
            .when(i % period == 4, F.lit(None).cast("string"))
            .otherwise(x),
        ),
        lambda x: x.isNotNull(),
    )
    tgt = F.filter(
        F.transform(
            tk,
            lambda x, i: F.when(
                i % period == 3, F.concat(sentinel(i), F.lit(" "), x)
            )
            .when(i % period == 4, x)
            .otherwise(F.lit(None).cast("string")),
        ),
        lambda x: x.isNotNull(),
    )
    n_masked = F.size(
        F.filter(tk, lambda x, i: (i % period == 3) | (i % period == 4))
    )
    return docs.select(
        "doc_id",
        n_masked.cast("long").alias("n_masked"),
        F.concat_ws(" ", inp).alias("input_text"),
        F.nullif(F.concat_ws(" ", tgt), F.lit("")).alias("target_text"),
    )


def pack_sequences(
    docs: DataFrame, text_col: str = "text", budget: int = 256, buckets: int = 64
) -> DataFrame:
    """Context-window packing plan → ``(doc_id, n_tokens, bin,
    bin_offset)``: documents are laid end-to-end in doc_id order and
    cut into ``budget``-token bins — the concat-then-split packing
    every pretraining pipeline uses (deterministic, zero padding
    waste; a doc may straddle two bins, carried by bin/bin_offset of
    its FIRST token). Pure integer cumulative arithmetic.

    Scale shape (bucketed two-stage prefix sum,
    ``functions/ranks.py``): a naive ``SUM() OVER (ORDER BY
    doc_id)`` funnels one row PER DOCUMENT through a single task's
    sort — tens of GB at 1 B docs. The kernel range-buckets docs by
    proportional doc_id position (broadcast bounds row, monotone),
    aggregates per-bucket token sums into a ≤``buckets``-row offsets
    window, and computes cum_end = offset + running sum within the
    bucket — identical output, corpus spread across ``buckets``
    tasks."""
    from bigclam_apachespark_spark.functions.ranks import bucketed_running_sum

    n_tok = F.size(tokens(text_col))
    sized = docs.select("doc_id", n_tok.alias("n_tokens"))
    cum = bucketed_running_sum(
        sized, ["doc_id"], "n_tokens", out="cum_end", buckets=buckets
    )
    cum_start = F.col("cum_end") - F.col("n_tokens")
    return cum.select(
        "doc_id",
        "n_tokens",
        F.floor(cum_start / F.lit(budget)).cast("long").alias("bin"),
        (cum_start % budget).cast("long").alias("bin_offset"),
    )


def langid_confusion(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID evaluation against the corpus's ground-truth
    ``lang`` column → ``(lang, lang_pred, n_docs)`` confusion counts —
    the quality-eval loop for the heuristic classifier (precision/
    recall per language derive directly). Integer counts over one
    narrow map + one hash-agg."""
    _, _, _, pred = _lang_pred(text_col)
    return (
        docs.select("lang", pred.alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )


def balanced_sample(
    docs: DataFrame, per_group: int = 50, group_col: str = "source"
) -> DataFrame:
    """Balanced downsample: the ``per_group`` lowest-hash documents
    per group → ``(doc_id, source, rank)`` — deterministic data
    mixing (equalize source contributions before training) that stays
    stable under corpus growth ONLY for the kept set's ordering
    (adding docs can displace rank-boundary members — inherent to
    balanced sampling; use ``hash_split`` when per-doc stability
    matters more than balance).

    Scale shape: one window rank per group over (id, hash) metadata
    rows — never the text payload."""
    from pyspark.sql import Window

    keyed = docs.select(
        "doc_id", group_col, hash64(F.col("doc_id").cast("string")).alias("_h")
    )
    w = Window.partitionBy(group_col).orderBy("_h", "doc_id")
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= per_group)
        .select("doc_id", group_col, "rank")
    )


def source_token_ledger(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus accounting per source → ``(source, n_docs, n_tokens,
    pct_tokens)`` — the data-mixing ledger: how many tokens each
    source contributes and its share of the training budget (the
    number mixture weights are tuned against). pct is one exact-
    integer division (correctly rounded IEEE), rounded for output."""
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(text_col))).alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").alias("tot"))
    return per.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("tot").cast("double"), 6).alias(
            "pct_tokens"
        ),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Document fingerprinting: (a) full-content hash of the
    normalized text (exact-dup key), (b) winnowing-style min-hash of
    the char n-gram shingle set (robust to local edits). Both 60-bit
    md5-derived so the DuckDB oracle reproduces them exactly."""
    # Materialize the normalized text first: expressions inside
    # higher-order-function lambdas are not CSE'd, so inlining the
    # normalization would re-run its regex once per shingle.
    normd = docs.select("doc_id", normalize_text(text_col).alias("norm"))
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("norm") - F.lit(n - 1), F.lit(1))),
        lambda i: F.col("norm").substr(i, F.lit(n)),
    )
    return normd.select(
        "doc_id",
        hash64("norm").alias("content_fp"),
        F.array_min(F.transform(shingles, lambda s: hash64(s))).alias("min_shingle_fp"),
    )


def repetition_signals(docs: DataFrame, text_col: str = "text",
                       ns: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Within-document repetition metrics (the Gopher/MassiveText
    quality-filter family) → one row per (doc, n): ``(doc_id, gram_n,
    n_grams, n_distinct_grams, top_count, dup_gram_frac,
    top_gram_frac)`` where dup_gram_frac = 1 − distinct/total (mass in
    repeated n-grams) and top_gram_frac = occurrences of the most
    frequent n-gram / total. High values flag boilerplate / SEO spam /
    template text that per-doc quality scores miss.

    Exactness: every ratio is one IEEE division of two exact
    integers, rounded at 6 — bit-stable cross-engine (same argument
    as salient_terms). Docs with < n tokens emit a zero row (left
    join back to the corpus), so row count = |docs| × |ns| always.

    Scale shape: one explode + one (doc, gram) hash-agg + one per-doc
    agg per n — map-side combine on both aggs; the per-doc state is
    three integers. Deliberately NOT the higher-order-function
    formulation (max over array_distinct is O(len²) per row — fine
    for short docs, quadratic death on 100k-token documents)."""
    from functools import reduce

    from bigclam_apachespark_spark.functions.hashing import word_ngrams_of

    ids = docs.select("doc_id")
    # tokens staged once per branch (see word_ngrams_of: no CSE across
    # lambda boundaries — inlining would re-tokenize per gram).
    tk = docs.select("doc_id", tokens(text_col).alias("tk"))
    parts = []
    for n in ns:
        grams = tk.select(
            "doc_id", F.explode(word_ngrams_of(F.col("tk"), n)).alias("g")
        )
        counts = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        per_doc = counts.groupBy("doc_id").agg(
            F.sum("c").alias("n_grams"),
            F.count("*").alias("n_distinct_grams"),
            F.max("c").alias("top_count"),
        )
        parts.append(
            ids.join(per_doc, "doc_id", "left").select(
                "doc_id",
                F.lit(n).cast("int").alias("gram_n"),
                F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                F.coalesce("n_distinct_grams", F.lit(0)).alias("n_distinct_grams"),
                F.coalesce("top_count", F.lit(0)).alias("top_count"),
            )
        )
    u = reduce(lambda a, b: a.unionByName(b), parts)
    tot = F.col("n_grams").cast("double")
    dup = (F.col("n_grams") - F.col("n_distinct_grams")).cast("double")
    return u.select(
        "doc_id", "gram_n", "n_grams", "n_distinct_grams", "top_count",
        F.round(
            F.when(F.col("n_grams") > 0, dup / tot).otherwise(F.lit(0.0)), 6
        ).alias("dup_gram_frac"),
        F.round(
            F.when(F.col("n_grams") > 0, F.col("top_count").cast("double") / tot)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("top_gram_frac"),
    )


def gopher_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 30,
    max_tokens: int = 10_000,
    word_len_range: tuple[float, float] = (2.0, 12.0),
    min_stop_hits: int = 1,
    max_dup_2gram: float = 0.05,
    max_top_2gram: float = 0.06,
) -> DataFrame:
    """Rule-based corpus filter (the Gopher/MassiveText rule family,
    thresholds parameterized) → ``(doc_id, n_tokens, flags, keep)``
    with ``flags`` a bitmask of failed rules:

      bit 0: token count outside [min_tokens, max_tokens]
      bit 1: mean word length outside word_len_range
      bit 2: fewer than min_stop_hits distinct EN stopwords
      bit 3: duplicate-2-gram mass > max_dup_2gram
      bit 4: top-2-gram mass > max_top_2gram

    ``keep`` = no rule failed. Reporting the bitmask (not just the
    boolean) is the production shape: filter-rule ablations need
    per-rule hit rates, and a pipeline that only stores the verdict
    re-runs the whole scan per ablation.

    Exactness: every threshold compares an integer or a ROUNDED
    ratio (round 6 on both engines before comparing), so the
    keep/drop decision cannot flip cross-engine — the clean_corpus
    discipline. One narrow map + the 2-gram agg pair from
    repetition_signals + one join back on doc_id."""
    toks = tokens(text_col)
    _, _, mean_word_len, _ = _quality_parts(text_col)
    base = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(mean_word_len, 6).alias("mwl"),
        _stopword_hits(F.array_distinct(toks), EN_STOPWORDS).alias("stop_hits"),
    )
    rep = repetition_signals(docs, text_col, ns=(2,)).select(
        "doc_id", "dup_gram_frac", "top_gram_frac"
    )
    j = base.join(rep, "doc_id")
    r_len = (F.col("n_tokens") < min_tokens) | (F.col("n_tokens") > max_tokens)
    r_mwl = (F.col("mwl") < word_len_range[0]) | (F.col("mwl") > word_len_range[1])
    r_stop = F.col("stop_hits") < min_stop_hits
    r_dup = F.col("dup_gram_frac") > max_dup_2gram
    r_top = F.col("top_gram_frac") > max_top_2gram
    flags = (
        r_len.cast("int")
        + r_mwl.cast("int") * 2
        + r_stop.cast("int") * 4
        + r_dup.cast("int") * 8
        + r_top.cast("int") * 16
    )
    return j.select(
        "doc_id",
        "n_tokens",
        flags.alias("flags"),
        (flags == 0).alias("keep"),
    )


def mix_sample(
    docs: DataFrame, text_col: str = "text", c: float = 20.0
) -> DataFrame:
    """Temperature-flattened source sampling (the data-mixing step of
    corpus assembly) → ``(doc_id, source, n_tokens, keep)``: each
    source s is downsampled with per-doc keep probability
    p_s = min(1, c / √T_s) where T_s is the source's total token
    count — large sources are flattened ∝ T_s^(−1/2) (the α = 0.5
    temperature), small sources pass intact; ``c`` scales the
    retained volume.

    Why the UNNORMALIZED form (no Σ_r √T_r denominator): the usual
    normalized weights need a cross-source float SUM, whose engine-
    dependent fold order would make p differ in the last ulp and flip
    keep decisions at the hash threshold — the exact cross-engine
    failure class this repo eliminates by design. c/√T_s touches only
    one exact integer per source and correctly-rounded sqrt/divide,
    so p is bit-identical on both engines; the keep test compares
    md5-hash integers against floor(p·2²⁰) — all-integer.

    Scale shape: one tokenize pass + a tiny per-source agg (map-side
    combine) broadcast back onto the narrow keep projection; the
    decision is a pure per-row function — no sort, no sample() (whose
    output is partitioning-dependent), fully reproducible."""
    from bigclam_apachespark_spark.functions.hashing import hash64

    nt = docs.select("doc_id", "source", F.size(tokens(text_col)).alias("n_tokens"))
    per_s = nt.groupBy("source").agg(F.sum("n_tokens").alias("ts"))
    p = F.least(F.lit(1.0), F.lit(c) / F.sqrt(F.col("ts").cast("double")))
    thresh = F.floor(p * F.lit(1 << 20)).cast("long")
    return (
        nt.join(F.broadcast(per_s.select("source", thresh.alias("thr"))), "source")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            ((hash64(F.col("doc_id").cast("string")) % (1 << 20)) < F.col("thr")).alias(
                "keep"
            ),
        )
    )


def feature_hashing(
    docs: DataFrame, text_col: str = "text", dims: int = 64
) -> DataFrame:
    """Hashing-trick bag-of-words features → long layout ``(doc_id,
    dim, cnt)`` with dim = md5-hash(term) mod dims — the classic
    fixed-width featurizer (no vocabulary pass, no OOV problem; the
    tradeoff is hash collisions merging counts, which is the
    documented semantics, not an error).

    Long layout on purpose: the driver's hasher compares scalar
    columns (a 64-wide array column would need stringification), and
    downstream consumers — linear probes, cosine similarity, the IVF
    stack — want sparse (row, col, val) triples anyway; zero entries
    simply don't exist as rows. One explode + one hash-agg with
    map-side combine; dims is a constant, so the shuffle key space is
    |docs|·dims."""
    from bigclam_apachespark_spark.functions.hashing import hash64

    tok = docs.select("doc_id", F.explode(tokens(text_col)).alias("term"))
    return (
        tok.groupBy(
            "doc_id", (hash64("term") % dims).cast("int").alias("dim")
        )
        .agg(F.count("*").alias("cnt"))
    )


def dup_rate_by_source(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Duplication rate per source → ``(source, n_docs, n_unique,
    dup_rate)`` with n_unique = distinct content fingerprints and
    dup_rate = 1 − unique/docs — the data-quality report that decides
    which sources are worth crawling harder vs deduping harder.
    One narrow fingerprint map + one agg (countDistinct is exact —
    the report is small enough per source to afford it; swap in the
    HLL sketch from operators/sketches.py when sources number in the
    millions). The ratio is one IEEE division of exact integers,
    rounded at 6."""
    m = docs.select("source", hash64(normalize_text(text_col)).alias("fp"))
    per = m.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.countDistinct("fp").alias("n_unique")
    )
    return per.select(
        "source",
        "n_docs",
        "n_unique",
        F.round(
            F.lit(1.0) - F.col("n_unique").cast("double") / F.col("n_docs"), 6
        ).alias("dup_rate"),
    )


# PII patterns — deliberately restricted to syntax Java regex (Spark)
# and RE2 (DuckDB) interpret identically: character classes, bounded
# repetition, \b word boundaries, non-capturing groups; no
# lookaround, no backrefs.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# Both separators MANDATORY and a leading anchor required: the old
# all-optional form redacted any bare 10-digit run (order ids, epoch
# seconds) and matched the trailing 10 digits inside longer runs —
# over-redaction that corrupts non-PII training text. `(?:\+|\b)`
# instead of a plain \b because \b fails between a space and '+'
# (both non-word characters).
PII_PHONE = r"(?:\+|\b)\d{3}[-. ]\d{3}[-. ]\d{4}\b"
# Canonical dashed SSN form only — digits-only nine-runs are far more
# often not SSNs. Disjoint from PII_PHONE (3-2-4 vs 3-3-4 grouping).
PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"
# Secret/API-key-shaped tokens: a known prefix, one separator, and a
# long high-entropy tail. Greedy tail, no trailing \b needed. The
# generic English-word prefixes (api/key/token/secret) require an
# UNDERSCORE separator — with '-' allowed they redact ordinary
# hyphenated prose ("key-value-store-backed", "token-based-
# authentication"); only the non-word vendor prefixes sk/pk keep
# both separators (OpenAI/Stripe-style "sk-..." keys).
PII_SECRET = (
    r"\b(?:(?:sk|pk)[-_]|(?:api|key|token|secret)_)[A-Za-z0-9_-]{16,}"
)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction → ``(doc_id, clean_text, n_emails, n_ips,
    n_phones, n_ssns, n_secrets)``: emails, IPv4 addresses,
    phone-shaped numbers, dashed SSNs, and secret/API-key-shaped
    tokens replaced by ``<EMAIL>``/``<IP>``/``<PHONE>``/``<SSN>``/
    ``<SECRET>`` — the scrubbing pass every published training corpus
    runs before tokenization. Patterns apply SEQUENTIALLY (emails →
    IPs → phones → SSNs → secrets) and each count is taken on the
    residual text of the previous stage, so counts equal replacements
    exactly (a phone-shaped substring inside an already-redacted
    email is not double-counted).

    Scale shape: a pure narrow map — five JVM-side regexp passes
    inside one whole-stage-codegen projection, zero shuffles, zero
    Python. At 100 TB this runs at scan speed; further rules (IBANs,
    credit cards) are each one more regexp_replace in the same
    projection."""
    t0 = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t0, F.lit(PII_EMAIL), F.lit(0)))
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(PII_IP), F.lit(0)))
    t2 = F.regexp_replace(t1, PII_IP, "<IP>")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PII_PHONE), F.lit(0)))
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    n_ssns = F.size(F.regexp_extract_all(t3, F.lit(PII_SSN), F.lit(0)))
    t4 = F.regexp_replace(t3, PII_SSN, "<SSN>")
    n_secrets = F.size(F.regexp_extract_all(t4, F.lit(PII_SECRET), F.lit(0)))
    t5 = F.regexp_replace(t4, PII_SECRET, "<SECRET>")
    return docs.select(
        "doc_id",
        t5.alias("clean_text"),
        n_emails.cast("int").alias("n_emails"),
        n_ips.cast("int").alias("n_ips"),
        n_phones.cast("int").alias("n_phones"),
        n_ssns.cast("int").alias("n_ssns"),
        n_secrets.cast("int").alias("n_secrets"),
    )


def cap_per_source(
    docs: DataFrame, cap: int = 100, id_col: str = "doc_id",
    source_col: str = "source", buckets: int = 32,
) -> DataFrame:
    """Per-source document cap → ``(doc_id, source, rk, kept)``: at
    most ``cap`` documents survive per source, selected by a
    DETERMINISTIC content-independent shuffle (rank by
    (hash64(doc_id), doc_id) within the source) — the CommonCrawl-
    style anti-domination rule that stops one boilerplate-heavy
    domain from owning the token budget. Hash-ordered selection keeps
    the choice stable across runs and corpus growth-at-the-tail
    (appending new docs never evicts a previously kept one until the
    cap forces it), unlike ORDER BY random().

    Scale shape (mega-source-safe): the naive plan — one window
    partitioned by source — funnels a hot domain's tens of millions
    of docs through ONE task's sort. Instead the rank is computed in
    two exact stages: (1) each doc is range-bucketed by the top bits
    of its 60-bit order hash (bucket id is MONOTONE in the sort key,
    so bucket boundaries respect the ordering); a per-(source,
    bucket) count aggregate — sources × ``buckets`` rows, metadata-
    sized — yields each bucket's exclusive prefix offset via a tiny
    window; (2) rank = offset + row_number within (source, bucket).
    The hot source now spreads across ``buckets`` window partitions
    (hash64 is uniform, so they are balanced), and the big side is
    shuffled ONCE on (source, bucket), reused by both the offset
    join and the rank window. Identical output to the naive plan:
    ties in the hash share a bucket, so (hash, id) ordering is
    preserved exactly."""
    from pyspark.sql import Window

    # hash64 is 60-bit nonnegative; top-k-bit bucket is monotone in it
    k = max((buckets - 1).bit_length(), 0)
    base = docs.select(
        id_col,
        source_col,
        hash64(F.col(id_col).cast("string")).alias("_h"),
    ).withColumn("_cb", F.shiftrightunsigned("_h", 60 - k).cast("int"))

    off_w = (
        Window.partitionBy(source_col)
        .orderBy("_cb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy(source_col, "_cb")
        .agg(F.count("*").alias("_cnt"))
        .select(
            source_col,
            "_cb",
            F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off"),
        )
    )

    rank_w = Window.partitionBy(source_col, "_cb").orderBy("_h", id_col)
    rk = F.col("_off") + F.row_number().over(rank_w)
    return (
        base.join(offsets, [source_col, "_cb"])
        .select(
            id_col,
            source_col,
            rk.cast("int").alias("rk"),
            (rk <= cap).cast("int").alias("kept"),
        )
    )

def global_shuffle_order(
    docs: DataFrame, id_col: str = "doc_id", buckets: int = 64
) -> DataFrame:
    """Deterministic GLOBAL training order → ``(doc_id, rank)``,
    rank 1..N by (hash64(id), id) — the corpus-shuffle primitive a
    training data-loader needs: stable across runs, uniformly mixed,
    and computed WITHOUT a single-partition global sort.

    Same two-stage exact-rank kernel as ``cap_per_source`` with one
    global "source": docs are range-bucketed by the top bits of the
    order hash (bucket id monotone in the sort key), a ``buckets``-row
    count aggregate yields exclusive prefix offsets, and rank =
    offset + row_number within the bucket. The only
    single-partition step is the offsets window over ≤``buckets``
    rows; the corpus shuffles once, on the bucket key. A plain
    ``ROW_NUMBER() OVER (ORDER BY …)`` would funnel 100 TB through
    one task — this is the scale-correct formulation of the same
    answer."""
    from pyspark.sql import Window

    k = max((buckets - 1).bit_length(), 0)
    base = docs.select(
        id_col, hash64(F.col(id_col).cast("string")).alias("_h")
    ).withColumn("_cb", F.shiftrightunsigned("_h", 60 - k).cast("int"))

    off_w = (
        Window.orderBy("_cb").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("_cb")
        .agg(F.count("*").alias("_cnt"))
        .select(
            "_cb", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off")
        )
    )
    rank_w = Window.partitionBy("_cb").orderBy("_h", id_col)
    return (
        base.join(F.broadcast(offsets), "_cb")
        .select(
            id_col,
            (F.col("_off") + F.row_number().over(rank_w)).cast("long").alias("rank"),
        )
    )


def pmi_topk(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k pointwise-mutual-information collocations → ``(w1, w2,
    n_pair, pmi)``: the token pairs that co-occur within ``window``
    positions far more often than their unigram frequencies predict
    — the classic phrase-mining signal (Mikolov-style word2phrase
    uses exactly this score to glue "new york" into one token before
    LM training). Pairs are position-ordered (w1 before w2) and
    counted once per occurrence.

    Float discipline: the ranking score is ONE division of two
    products that are each exact in the integer domain (num =
    c12·T1², den = T12·c1·c2, both folded as DECIMAL(38,0) /
    HUGEINT before a single cast-to-double divide), so both engines
    produce the bit-identical double; exact rational ties fall back
    to (w1, w2). ``ln`` appears only in the rounded OUTPUT column.

    Scale shape: the pair relation is built NARROWLY by slicing the
    token array against itself once per offset (no positional
    self-join, no explode²); pair counts and unigram counts are
    vocabulary-bounded hash aggs; the two scalar totals broadcast.
    min_count prunes the long Zipf tail before the join."""
    tk = tokens(text_col)
    offs = []
    for d in range(1, window):
        offs.append(
            F.zip_with(
                F.slice(tk, 1, F.greatest(F.size(tk) - d, F.lit(0))),
                F.slice(tk, 1 + d, F.greatest(F.size(tk) - d, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        )
    pr = docs.select(
        F.explode(F.flatten(F.array(*offs))).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))

    c12 = pr.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    t12 = c12.agg(F.sum("n_pair").alias("t12"))
    uni = docs.select(F.explode(tk).alias("w")).groupBy("w").agg(
        F.count("*").alias("cu")
    )
    t1 = uni.agg(F.sum("cu").alias("t1"))

    num = (
        F.col("n_pair").cast("decimal(38,0)")
        * F.col("t1").cast("decimal(38,0)")
        * F.col("t1").cast("decimal(38,0)")
    )
    den = (
        F.col("t12").cast("decimal(38,0)")
        * F.col("cu1").cast("decimal(38,0)")
        * F.col("cu2").cast("decimal(38,0)")
    )
    score = num.cast("double") / den.cast("double")
    return (
        c12.where(F.col("n_pair") >= min_count)
        .join(
            uni.select(F.col("w").alias("w1"), F.col("cu").alias("cu1")), "w1"
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("cu").alias("cu2")), "w2"
        )
        .crossJoin(F.broadcast(t12))
        .crossJoin(F.broadcast(t1))
        .withColumn("_s", score)
        .orderBy(F.col("_s").desc(), "w1", "w2")
        .limit(k)
        .select("w1", "w2", "n_pair", F.round(F.log("_s"), 6).alias("pmi"))
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """First BPE merge-candidate table → ``(left_sym, right_sym,
    pair_count)``: adjacent CHARACTER-pair frequencies weighted by
    word frequency, word boundaries isolated — exactly the statistic
    byte-pair-encoding tokenizer training (Sennrich et al. 2016)
    maximizes at each merge step. Top-k by count, all-integer, so
    the ranking is exact on any engine.

    Scale shape: the BPE trick — ONE corpus-sized pass collapses
    text to a vocabulary-sized word-frequency table; character
    splitting, pair slicing, and the weighted count all run over
    the vocab relation (|V| ≪ corpus), the same reason real BPE
    trainers iterate over word counts and not raw text."""
    wf = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substring(F.col("w"), i, 1),
    )
    pairs = F.zip_with(
        F.slice(chars, 1, F.length("w") - 1),
        F.slice(chars, 2, F.length("w") - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        wf.select("f", F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(F.sum("f").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(k)
    )


def bpe_merge_step(
    docs: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """One FULL BPE training round → the pair-count table AFTER the
    best merge is applied: pick the top character pair by ``(count
    DESC, pair ASC)`` (exact-integer, so the winner is cross-engine
    stable), rewrite every word's symbol sequence with that pair
    merged, recount adjacent pairs over the rewritten vocabulary, and
    return the new top-k ``(left_sym, right_sym, pair_count)`` — the
    statistic the NEXT merge would maximize. ``bpe_pair_counts`` is
    the trainer's first statistic; this closes the iterative loop
    body (count → merge → recount), the part real tokenizer training
    repeats 30k times.

    The greedy left-to-right non-overlapping merge (BPE's rule —
    "aaa" + merge "aa" → ["aa", "a"]) IS string ``replace``
    semantics: the merged pair is substituted with a single
    out-of-alphabet marker char (\\x01), so the rewritten word's
    characters are again one symbol each, and the pair slicing from
    ``bpe_pair_counts`` applies unchanged. Output symbols map the
    marker back to the merged pair's text.

    Scale shape: same BPE trick as ``bpe_pair_counts`` — everything
    after the ONE corpus pass runs over the vocabulary-sized
    word-frequency relation; the 1-row best-pair table broadcasts."""
    wf = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substring(F.col("w"), i, 1),
    )
    pairs = F.zip_with(
        F.slice(chars, 1, F.length("w") - 1),
        F.slice(chars, 2, F.length("w") - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    counts0 = (
        wf.select("f", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("f").alias("c"))
    )
    best = counts0.orderBy(F.col("c").desc(), "l", "r").limit(1).select(
        F.concat("l", "r").alias("_merge")
    )
    marker = "\x01"
    rewritten = wf.crossJoin(F.broadcast(best)).select(
        "f",
        "_merge",
        F.replace(F.col("w"), F.col("_merge"), F.lit(marker)).alias("w"),
    )
    disp = lambda c: F.when(c == marker, F.col("_merge")).otherwise(c)  # noqa: E731
    pairs2 = F.zip_with(
        F.slice(chars, 1, F.length("w") - 1),
        F.slice(chars, 2, F.length("w") - 1),
        lambda a, b: F.struct(disp(a).alias("l"), disp(b).alias("r")),
    )
    return (
        rewritten.where(F.length("w") >= 2)
        .select("f", F.explode(pairs2).alias("p"))
        .groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(F.sum("f").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(k)
    )


def bpe_merge_two_steps(
    docs: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """TWO chained BPE training rounds → the pair-count table after
    the second merge — the composed-fixture counterpart of
    ``bpe_merge_step`` (the ``bigclam_two_iterations`` /
    ``graph_louvain_two_levels`` pattern: the single round is
    oracle-green alone, the chain hash-checks that round 2 consumes
    round 1's REWRITTEN state, where drift would hide). Round 2's
    winning pair may itself contain round 1's merged symbol (that is
    the mechanism by which BPE grows multi-char tokens), so the
    display mapping expands markers recursively: \\x01 → merge-1
    text, \\x02 → merge-2's symbols with \\x01 expanded.

    Tie-breaks compare RAW symbol strings (markers sort below all
    printable chars — identical binary collation on both engines).

    Scale shape: unchanged from the one-round trainer — one corpus
    pass, then every rewrite/recount runs over the vocab-sized
    word-frequency relation with 1-row broadcast merge tables."""
    wf = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substring(F.col("w"), i, 1),
    )
    raw_pairs = F.zip_with(
        F.slice(chars, 1, F.length("w") - 1),
        F.slice(chars, 2, F.length("w") - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    counts0 = (
        wf.select("f", F.explode(raw_pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("f").alias("c"))
    )
    best1 = counts0.orderBy(F.col("c").desc(), "l", "r").limit(1).select(
        F.concat("l", "r").alias("_m1")
    )
    mk1, mk2 = "\x01", "\x02"
    rw1 = wf.crossJoin(F.broadcast(best1)).select(
        "f", "_m1", F.replace(F.col("w"), F.col("_m1"), F.lit(mk1)).alias("w")
    )
    counts1 = (
        rw1.where(F.length("w") >= 2)
        .select("f", "_m1", F.explode(raw_pairs).alias("p"))
        .groupBy("_m1", F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("f").alias("c"))
    )
    disp1 = lambda c: F.when(c == mk1, F.col("_m1")).otherwise(c)  # noqa: E731
    best2 = counts1.orderBy(F.col("c").desc(), "l", "r").limit(1).select(
        "_m1",
        F.concat("l", "r").alias("_m2raw"),
        F.concat(disp1(F.col("l")), disp1(F.col("r"))).alias("_m2disp"),
    )
    rw2 = rw1.drop("_m1").crossJoin(F.broadcast(best2)).select(
        "f",
        "_m1",
        "_m2disp",
        F.replace(F.col("w"), F.col("_m2raw"), F.lit(mk2)).alias("w"),
    )
    disp = lambda c: (  # noqa: E731
        F.when(c == mk1, F.col("_m1"))
        .when(c == mk2, F.col("_m2disp"))
        .otherwise(c)
    )
    pairs2 = F.zip_with(
        F.slice(chars, 1, F.length("w") - 1),
        F.slice(chars, 2, F.length("w") - 1),
        lambda a, b: F.struct(disp(a).alias("l"), disp(b).alias("r")),
    )
    return (
        rw2.where(F.length("w") >= 2)
        .select("f", F.explode(pairs2).alias("p"))
        .groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(F.sum("f").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(k)
    )


def token_frequency_spectrum(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Frequency-of-frequencies spectrum → ``(freq, n_terms,
    gt_adjusted)``: how many distinct terms occur exactly ``freq``
    times, plus the Good-Turing adjusted count r* = (r+1)·S(r+1)/S(r)
    (NULL where S(r+1) is empty) — the input to Good-Turing/Katz
    smoothing and the standard Zipf-fit diagnostic for corpus health
    (a training mix whose spectrum bends away from the Zipf line has
    dedup or boilerplate problems).

    All counting is integer-exact; the single r* division happens
    once per OUTPUT row on exact integers (deterministic double).

    Scale shape: corpus pass → vocabulary-sized term-count agg →
    spectrum agg whose cardinality is O(max term frequency) in the
    worst case and ~O(√total_tokens) under Zipf; the r+1 self-join
    runs on that tiny relation (AQE broadcasts it)."""
    tf = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("ctf"))
    )
    spec = tf.groupBy(F.col("ctf").alias("freq")).agg(
        F.count("*").alias("n_terms")
    )
    nxt = spec.select(
        (F.col("freq") - 1).alias("freq"), F.col("n_terms").alias("_n_next")
    )
    return (
        spec.join(nxt, "freq", "left")
        .select(
            "freq",
            "n_terms",
            F.round(
                (F.col("freq") + 1)
                * F.col("_n_next").cast("double")
                / F.col("n_terms").cast("double"),
                6,
            ).alias("gt_adjusted"),
        )
        .orderBy("freq")
    )


def heldout_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Held-out LM scoring with leakage discipline → per VAL doc
    ``(doc_id, n_bigrams, n_unseen, avg_logprob)``: an interpolated
    bigram model is fit on the TRAIN split ONLY (the same
    deterministic hash split as ``hash_split`` — counts never see
    the scored documents, the discipline every data-quality LM loop
    needs), then every val doc's transitions are scored under
    P = 0.9·P_bigram + 0.09·P_unigram + 0.01·P_uniform — the
    interpolation keeps P > 0 for unseen bigrams, and ``n_unseen``
    reports how often the backoff fired.

    Float discipline: P is ONE fixed-order expression over exact
    integer counts (each division correctly rounded, guarded CASE
    for unseen heads); ln appears only in the rounded OUTPUT mean,
    the same contract as ``unigram_logprob``/``bigram_logprob``.

    Scale shape: train counts are vocabulary-bounded hash aggs; the
    val pair relation is built narrowly by array self-slicing; the
    two scalar totals (T, V) broadcast. The expensive relation —
    val bigrams ⋈ count tables — is linear in val tokens."""
    bucket, split = _split_cols("doc_id", train_pct, val_pct)
    tagged = docs.select("doc_id", F.col(text_col).alias("_t"), split.alias("_sp"))
    tk = tokens("_t")
    pairs = F.zip_with(
        F.slice(tk, 1, F.size(tk) - 1),
        F.slice(tk, 2, F.size(tk) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pr = tagged.select("doc_id", "_sp", F.explode(pairs).alias("p")).select(
        "doc_id", "_sp", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    train_pr = pr.where(F.col("_sp") == "train")
    bf = train_pr.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    hf = train_pr.groupBy("w1").agg(F.count("*").alias("c1"))
    uni = (
        tagged.where(F.col("_sp") == "train")
        .select(F.explode(tokens("_t")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    totals = uni.agg(
        F.sum("cu").alias("t1"), F.count("*").alias("v")
    )
    val = pr.where(F.col("_sp") == "val")
    scored = (
        val.join(bf, ["w1", "w2"], "left")
        .join(hf, "w1", "left")
        .join(uni.select(F.col("w").alias("w2"), "cu"), "w2", "left")
        .crossJoin(F.broadcast(totals))
    )
    c2 = F.coalesce("c2", F.lit(0)).cast("double")
    c1 = F.coalesce("c1", F.lit(0)).cast("double")
    cu = F.coalesce("cu", F.lit(0)).cast("double")
    p_bi = F.when(c1 > 0, c2 / c1).otherwise(F.lit(0.0))
    p = (
        F.lit(0.9) * p_bi
        + F.lit(0.09) * (cu / F.col("t1").cast("double"))
        + F.lit(0.01) / F.col("v").cast("double")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum((F.coalesce("c2", F.lit(0)) == 0).cast("long")).alias(
                "n_unseen"
            ),
            F.round(F.avg(F.log(p)), 6).alias("avg_logprob"),
        )
    )


def split_repair(
    docs: DataFrame,
    text_col: str = "text",
    near_dup_threshold: float = 0.35,
    train_pct: int = 80,
    val_pct: int = 10,
    cache_handles: list | None = None,
) -> DataFrame:
    """Contamination REPAIR → ``(doc_id, bucket, split)``, the full
    corpus's final assignment: any eval (val/test) document that
    near-duplicates ANY train document is pulled INTO train — the
    standard decontamination direction (eval sets must be clean of
    training look-alikes; moving the training copy out instead
    would silently shrink the train corpus by the duplication
    rate). Non-leaked documents keep their ``hash_split``
    assignment, so the repair is a superset of the original split
    and deterministic: reassignment depends only on the leak-pair
    relation, never on iteration order.

    One-step repair by design: pulls resolve against the ORIGINAL
    split (an eval doc whose only near-dup is another eval doc
    stays put, even if that counterpart gets pulled) — iterating to
    the transitive fixpoint would drag whole duplicate clusters
    into train through chains of pairwise-dissimilar docs; cluster-
    level policy belongs to ``training_corpus``'s survivor
    election. Eval↔eval leak pairs are reported by
    ``split_leakage`` but never repaired here.

    Composition: ``split_leakage``'s pair relation (already
    cross-split-filtered) → the eval-side ids whose COUNTER-PARTY
    is train → one left join + CASE onto the split table. The
    repair join is leak-table-sized, not corpus-sized."""
    leaks = split_leakage(
        docs, text_col, near_dup_threshold, train_pct, val_pct,
        cache_handles=cache_handles,
    )
    pulled = (
        leaks.where(
            (F.col("split_a") == "train") | (F.col("split_b") == "train")
        )
        .select(
            F.when(F.col("split_a") == "train", F.col("b"))
            .otherwise(F.col("a"))
            .alias("doc_id")
        )
        .distinct()
    )
    base = hash_split(docs, train_pct=train_pct, val_pct=val_pct)
    return base.join(
        pulled.withColumn("_pulled", F.lit(1)), "doc_id", "left"
    ).select(
        "doc_id",
        "bucket",
        F.when(F.col("_pulled") == 1, F.lit("train"))
        .otherwise(F.col("split"))
        .alias("split"),
    )


def dataset_card(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus summary → the numbers every dataset card
    leads with: ``(n_docs, n_tokens, n_chars, n_sources, n_langs,
    n_distinct_texts, dup_pct)`` — sizes, provenance spread, and
    the exact-duplicate rate (1 − distinct normalized fingerprints
    / docs). All counts are integers; the one percentage is a
    single division, rounded.

    Scale shape: ONE scan; tokens/chars fold map-side; the three
    DISTINCTs are (tiny, tiny, fingerprint-wide) hash aggs —
    fingerprints are the only corpus-cardinality shuffle, on
    fixed-width int64."""
    fp = hash64(normalize_text(text_col))
    agg = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(text_col))).cast("long").alias("n_tokens"),
        F.sum(F.length(text_col)).cast("long").alias("n_chars"),
        F.count_distinct(F.col("source")).alias("n_sources"),
        F.count_distinct(F.col("lang")).alias("n_langs"),
        F.count_distinct(fp).alias("n_distinct_texts"),
    )
    return agg.select(
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_sources",
        "n_langs",
        "n_distinct_texts",
        F.round(
            F.lit(100.0)
            * (F.col("n_docs") - F.col("n_distinct_texts")).cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("dup_pct"),
    )


def tokenizer_fertility(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenizer fertility by language → ``(lang, n_docs, n_words,
    n_subtokens, fertility)``: subtokens-per-word under the BPE-ish
    subtoken regex — THE tokenizer-equity metric (a tokenizer with
    fertility 1.3 on English and 4.1 on Thai makes Thai documents
    3× as expensive per word, and multilingual mix weights must
    correct for it). Counts fold as integers in one scan; fertility
    is a single division per output row."""
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens(text_col))).cast("long").alias("n_words"),
            F.sum(
                F.regexp_count(F.lower(F.col(text_col)), F.lit(SUBTOKEN_RE))
            ).cast("long").alias("n_subtokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_subtokens",
            F.round(
                F.col("n_subtokens").cast("double")
                / F.col("n_words").cast("double"),
                6,
            ).alias("fertility"),
        )
    )


BM25_QUERY_TERMS: list[tuple[str, list[str]]] = [
    ("q_spark_window_agg", ["spark", "window", "agg"]),
    ("q_hash_join", ["hash", "join"]),
    ("q_stream_batch_merge", ["batch", "merge", "stream"]),
]


def bm25_topk(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_terms: list[tuple[str, list[str]]] | None = None,
) -> DataFrame:
    """BM25 ranked retrieval over the corpus → ``(q, doc_id, rank,
    n_terms_hit, score)``: top-k documents per keyword query under
    Robertson/Sparck-Jones BM25 (idf = ln(1 + (N − df + ½)/(df + ½)),
    tf saturation k1, length normalization b against the exact
    corpus-average document length).

    Cross-engine-stable ranking: each term's contribution is rounded
    to integer NANO units (×10⁹) BEFORE summing, so the per-document
    score is an exact int64 fold — associative, hence identical under
    any aggregation order on any engine — and the (score DESC,
    doc_id) order is exact integer comparison. Only idf's ``ln``
    touches a libm (last-ulp differences vanish in the nano
    rounding); the reported ``score`` divides the nano sum back once.

    Scale shape: tf is one hash agg over the exploded token table,
    df a second agg over tf's already-distinct (doc, term) rows; the
    query-term table and the 1-row (N, Σdl) totals broadcast onto the
    term join. The top-k head is a per-query ``orderBy().limit(k)``
    branch over the CACHED scored relation — each compiles to
    TakeOrderedAndProject (per-partition partial top-k + a k-row
    driver merge), so no single-partition global sort ever forms even
    with billions of matched documents; the branches union k rows
    each and the rank window runs over ≤k·|Q| rows."""
    from pyspark.sql import Window

    qt = query_terms or BM25_QUERY_TERMS
    spark = docs.sparkSession
    qdf = spark.createDataFrame(
        [(q, t) for q, ts in qt for t in ts], "q string, term string"
    )
    tok = docs.select("doc_id", F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    totals = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    contrib = (
        tf.join(F.broadcast(qdf), "term")
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .join(F.broadcast(totals))
        .select(
            "q",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (1.0 + k1))
                / (
                    F.col("tf")
                    + k1
                    * (
                        1.0
                        - b
                        + b
                        * (F.col("dl") * F.col("n_docs")).cast("double")
                        / F.col("sum_dl").cast("double")
                    )
                )
            ).alias("c"),
        )
        .select(
            "q",
            "doc_id",
            F.round(F.col("c") * 1e9, 0).cast("long").alias("c_nano"),
        )
    )
    scored = contrib.groupBy("q", "doc_id").agg(
        F.count("*").alias("n_terms_hit"),
        F.sum("c_nano").alias("score_nano"),
    )
    scored = scored.persist()
    heads = [
        scored.where(F.col("q") == q)
        .orderBy(F.col("score_nano").desc(), "doc_id")
        .limit(k)
        for q, _ in qt
    ]
    head = heads[0]
    for h in heads[1:]:
        head = head.unionByName(h)
    w = Window.partitionBy("q").orderBy(F.col("score_nano").desc(), "doc_id")
    out = (
        head.withColumn("rank", F.row_number().over(w))
        .select(
            "q",
            "doc_id",
            "rank",
            "n_terms_hit",
            F.round(F.col("score_nano").cast("double") / 1e9, 6).alias(
                "score"
            ),
        )
    )
    out._cache_handles = [scored]
    return out


def bpe_encode_corpus(
    docs: DataFrame, text_col: str = "text", k: int = 30
) -> DataFrame:
    """BPE ENCODE — the inference half of the tokenizer the merge
    trainers build: train two merges exactly as
    ``bpe_merge_two_steps`` does, apply them to EVERY corpus word
    (including the 1-char words the pair trainer never sees), and
    return the top-k trained-vocabulary token frequencies →
    ``(token, token_count, rank)``. Multi-char tokens surface with
    their merged text (round-2 merges expand round-1's marker
    recursively); the table is what a tokenizer ships as its vocab
    frequency prior, and Σ token_count is the corpus size in trained
    tokens — the fertility denominator under THIS vocab rather than
    the regex proxy.

    Same marker-replace mechanism as the trainers (greedy
    left-to-right non-overlapping merge ≡ string ``replace``); pair
    statistics for merge selection come from the length ≥ 2 words
    only (identical to the trainers — a post-rewrite word shorter
    than 2 symbols has no pairs, and rewriting never grows a word,
    so training over the unfiltered relation filtered post-rewrite
    is the same statistic).

    Scale shape: one corpus pass → vocabulary-sized word-frequency
    relation; both merge tables are 1-row broadcasts; the final
    count is a hash agg over exploded symbols of the vocab relation
    (≤ Σ|w| rows of it, not of the corpus); top-k via
    ``orderBy().limit`` = TakeOrderedAndProject."""
    from pyspark.sql import Window

    wf_all = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substring(F.col("w"), i, 1),
    )
    raw_pairs = F.zip_with(
        F.slice(chars, 1, F.length("w") - 1),
        F.slice(chars, 2, F.length("w") - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    counts0 = (
        wf_all.where(F.length("w") >= 2)
        .select("f", F.explode(raw_pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("f").alias("c"))
    )
    best1 = counts0.orderBy(F.col("c").desc(), "l", "r").limit(1).select(
        F.concat("l", "r").alias("_m1")
    )
    mk1, mk2 = "\x01", "\x02"
    rw1 = wf_all.crossJoin(F.broadcast(best1)).select(
        "f", "_m1", F.replace(F.col("w"), F.col("_m1"), F.lit(mk1)).alias("w")
    )
    counts1 = (
        rw1.where(F.length("w") >= 2)
        .select("f", "_m1", F.explode(raw_pairs).alias("p"))
        .groupBy("_m1", F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("f").alias("c"))
    )
    d1 = lambda c: F.when(c == mk1, F.col("_m1")).otherwise(c)  # noqa: E731
    best2 = counts1.orderBy(F.col("c").desc(), "l", "r").limit(1).select(
        "_m1",
        F.concat("l", "r").alias("_m2raw"),
        F.concat(d1(F.col("l")), d1(F.col("r"))).alias("_m2disp"),
    )
    rw2 = rw1.drop("_m1").crossJoin(F.broadcast(best2)).select(
        "f",
        "_m1",
        "_m2disp",
        F.replace(F.col("w"), F.col("_m2raw"), F.lit(mk2)).alias("w"),
    )
    disp = lambda c: (  # noqa: E731
        F.when(c == mk1, F.col("_m1"))
        .when(c == mk2, F.col("_m2disp"))
        .otherwise(c)
    )
    syms = rw2.select(
        "f", F.explode(F.transform(chars, disp)).alias("token")
    )
    top = (
        syms.groupBy("token")
        .agg(F.sum("f").alias("token_count"))
        .orderBy(F.col("token_count").desc(), "token")
        .limit(k)
    )
    w = Window.orderBy(F.col("token_count").desc(), "token")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "token_count", "rank"
    )


def weighted_sample(
    docs: DataFrame, n: int = 200, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES, IPL'06) → the ``n`` winners of ``(doc_id, weight, key_e12,
    rank)``: each document draws the deterministic md5 uniform
    u ∈ (0, 1] and competes with key u^(1/w) — one pass, no
    sequential state, inclusion probability ∝ token-count weight —
    the importance-sampling primitive a data-mixing pipeline uses to
    downsample a source while favoring long/high-value documents.

    Determinism contract: ranking uses ln(u)/w (monotone in
    u^(1/w), far better float spread near the top), rounded to an
    integer PICO key (×10¹²) so the comparator is exact int64 —
    cross-engine rank flips would need ln() to differ across libms
    by ≥ the pico grid, the same accepted boundary as the BM25 nano
    fold. Ties (same rounded key) break by id.

    Scale shape: a narrow per-row key computation + ONE
    ``orderBy().limit(n)`` = TakeOrderedAndProject (per-partition
    top-n, k-row driver merge) — no global sort, no shuffle of the
    corpus; the A-ES property that the top-n by key IS a weighted
    sample is what makes weighted sampling distributable in one
    pass."""
    from pyspark.sql import Window

    M = 1 << 40
    w = (F.size(tokens(text_col)) + 1).cast("long")
    u = (
        (hash64(F.concat(F.lit("ws:"), F.col(id_col).cast("string"))) % M)
        + 1
    ).cast("double") / float(M + 1)
    key = F.round(F.log(u) / w.cast("double") * 1e12, 0).cast("long")
    keyed = docs.select(
        id_col, w.alias("weight"), key.alias("key_e12")
    )
    top = keyed.orderBy(F.col("key_e12").desc(), id_col).limit(n)
    win = Window.orderBy(F.col("key_e12").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(win)).select(
        id_col, "weight", "key_e12", "rank"
    )


def distribution_drift(
    docs: DataFrame, text_col: str = "text", train_pct: int = 80, val_pct: int = 10
) -> DataFrame:
    """Token-distribution drift report → one row per comparison:
    ``(comparison, n_tokens_a, n_tokens_b, vocab_union, l1_micro)``
    where l1 = Σ_t |cₐ(t)/Nₐ − c_b(t)/N_b| ∈ [0, 2] — the corpus
    drift monitor a training pipeline runs between snapshots, splits,
    or slices (drift ≈ 0 between hash-split halves is the NULL
    CALIBRATION: the split is content-blind, so a large value there
    means the split itself is broken; drift between language slices
    is the positive control). The summand is computed as the exact
    integer cross-multiply |cₐ·N_b − c_b·Nₐ| in decimal(38,0)
    (int64-safe at any corpus size), summed associatively, and
    divided ONCE by Nₐ·N_b — so the reported micro-units are
    engine-exact, no float ever enters the sum.

    Scale shape: two vocabulary-sized count relations per comparison
    (one corpus pass each via the shared token explode), a full-outer
    vocab join, one decimal fold. Nothing row-level survives past
    the first agg."""
    # CACHED: four count branches (2 comparisons × 2 sides) would
    # otherwise re-scan and re-tokenize the corpus four times
    tok = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(tokens(text_col)).alias("t"),
        )
        .withColumn(
            "bucket",
            (hash64(F.col("doc_id").cast("string")) % 100).cast("int"),
        )
        .cache()
    )

    def counts(flt, side):
        return (
            tok.where(flt)
            .groupBy("t")
            .agg(F.count("*").alias(f"c_{side}"))
        )

    # the cross-multiply needs the totals INSIDE the sum — two-pass:
    # totals first (1-row broadcast), then the decimal fold
    def compare(name, flt_a, flt_b):
        ca, cb = counts(flt_a, "a"), counts(flt_b, "b")
        joined = ca.join(cb, "t", "full").select(
            F.coalesce("c_a", F.lit(0)).alias("ca"),
            F.coalesce("c_b", F.lit(0)).alias("cb"),
        )
        tot = joined.agg(
            F.sum("ca").cast("decimal(38,0)").alias("na"),
            F.sum("cb").cast("decimal(38,0)").alias("nb"),
            F.count("*").cast("long").alias("vocab_union"),
        )
        return (
            joined.join(F.broadcast(tot))
            .agg(
                F.lit(name).alias("comparison"),
                F.min(F.col("na").cast("long")).alias("n_tokens_a"),
                F.min(F.col("nb").cast("long")).alias("n_tokens_b"),
                F.min("vocab_union").alias("vocab_union"),
                # an EMPTY side has no distribution: l1 is NULL, not
                # a division-by-zero abort (ANSI) nor a fake maximum
                F.when(
                    (F.min("na") > 0) & (F.min("nb") > 0),
                    F.round(
                        F.sum(
                            F.abs(
                                F.col("ca").cast("decimal(38,0)") * F.col("nb")
                                - F.col("cb").cast("decimal(38,0)") * F.col("na")
                            )
                        ).cast("double")
                        / (
                            F.min("na").cast("double")
                            * F.min("nb").cast("double")
                        )
                        * 1e6,
                        6,
                    ),
                ).alias("l1_micro"),
            )
        )

    split_a = F.col("bucket") < train_pct
    split_b = (F.col("bucket") >= train_pct) & (
        F.col("bucket") < train_pct + val_pct
    )
    out = compare("train_vs_val", split_a, split_b).unionByName(
        compare("en_vs_rest", F.col("lang") == "en", F.col("lang") != "en")
    )
    out._cache_handles = [tok]
    return out


# ---------------------------------------------------------------------------
# word2vec over the documents token stream (the text-corpus twin of
# graph.sgns_step — Mikolov et al. NIPS'13 on the engine's own corpus)
# ---------------------------------------------------------------------------


def word2vec_vocab(toked: DataFrame, min_count: int = 5) -> DataFrame:
    """Frequency-filtered vocabulary → ``(term, cnt, vid)`` with the
    1-based dense rank vid ordered by (cnt DESC, term) — word2vec's
    min_count cut plus a deterministic integer id space that doubles
    as the negative-draw rank table. Input is the pre-tokenized
    ``(l array<string>)`` corpus (tokenize ONCE, share with the pair
    generation). The ranking goes through the bucketed two-stage
    exact-rank kernel, never a single-partition sort (vocabularies
    are V-sized at corpus scale)."""
    from bigclam_apachespark_spark.functions.ranks import bucketed_row_number

    counts = (
        toked.select(F.explode("l").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .withColumn("neg_cnt", -F.col("cnt"))
    )
    return (
        bucketed_row_number(counts, ["neg_cnt", "term"], out="vid")
        .select("term", "cnt", F.col("vid").cast("long").alias("vid"))
    )


def word2vec_pairs(
    toked: DataFrame,
    vocab: DataFrame,
    window: int = 2,
) -> DataFrame:
    """Skip-gram pair counts over the token stream → ``(u, v, c_uv)``
    in vid space: ordered (center, context) pairs at token distance
    1..window within one document, both directions, with both
    endpoints in-vocab (out-of-vocab tokens keep their slots — the
    window is over ORIGINAL positions, a documented deviation from
    word2vec's compact-then-window; it only matters next to rare
    words and keeps the pair generation one narrow slice-zip with no
    self-join). Scale shape: per-document arrays_zip of two slices —
    no shuffle until the final pair-count agg."""
    toks = F.col("l")
    parts = []
    for d in range(1, window + 1):
        n = F.size(toks)
        a = F.slice(toks, 1, F.greatest(n - d, F.lit(0)))
        b = F.slice(toks, 1 + d, F.greatest(n - d, F.lit(0)))
        z = toked.where(F.size(toks) > d).select(
            F.explode(F.arrays_zip(a.alias("l"), b.alias("r"))).alias("p")
        )
        parts.append(z.select(F.col("p.l").alias("tu"), F.col("p.r").alias("tv")))
        parts.append(z.select(F.col("p.r").alias("tu"), F.col("p.l").alias("tv")))
    raw = parts[0]
    for pt in parts[1:]:
        raw = raw.unionByName(pt)
    vu = vocab.select(F.col("term").alias("tu"), F.col("vid").alias("u"))
    vv = vocab.select(F.col("term").alias("tv"), F.col("vid").alias("v"))
    return (
        raw.join(vu, "tu")
        .join(vv, "tv")
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("c_uv"))
    )


def word2vec_step(
    docs: DataFrame,
    steps: int = 1,
    min_count: int = 5,
    window: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """``steps`` synchronous SGNS steps over the documents token
    corpus → ``(term, k, wv, cv)``: the LLM-pipeline stage that turns
    a cleaned corpus into token embeddings, sharing the exact-int64
    quantized kernel with the graph walks version
    (``graph.sgns_apply`` — init formula, σ flooring, negative-draw
    hash stream keyed ``w2v``, floored-division apply; see that
    docstring for the cross-engine exactness argument). Vocabulary
    ids are the (cnt DESC, term) dense ranks, so the init is
    deterministic in corpus statistics, not string hashes."""
    from bigclam_apachespark_spark.functions.hashing import tokens
    from bigclam_apachespark_spark.operators.graph import (
        sgns_apply,
        sgns_init,
    )

    # tokenize ONCE: vocabulary counting and the 2·window slice-zips
    # all read the checkpointed token arrays (5 full normalize+split
    # corpus scans otherwise)
    toked = docs.select(tokens(text_col).alias("l")).localCheckpoint(eager=True)
    vocab = word2vec_vocab(toked, min_count).localCheckpoint(eager=True)
    n_vocab = vocab.count()
    pairs = word2vec_pairs(toked, vocab, window).localCheckpoint(eager=True)
    id_rank = vocab.select(F.col("vid").alias("id"), F.col("vid").alias("rk"))
    emb = sgns_init(vocab.select(F.col("vid").alias("id")))
    for _ in range(steps):
        emb = sgns_apply(
            pairs, emb, id_rank, n_vocab, tag="w2v"
        ).localCheckpoint(eager=True)
    return emb.join(
        vocab.select(F.col("vid").alias("node_id"), "term"), "node_id"
    ).select("term", "k", "wv", "cv")


def dsir_weights(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS'23 «Data Selection
    for Language Models via Importance Resampling») →
    ``(doc_id, lang, n_tokens, lambda_micro)``: score every raw
    document by how much more likely its hashed-unigram profile is
    under the TARGET distribution (here: the ``target_lang`` slice —
    the in-domain corpus) than under the raw corpus itself,

        λ(doc) = Σ_tokens [ ln p̂_target(b(token)) − ln p̂_raw(b(token)) ]

    with b = hash64 mod ``n_buckets`` (the paper's hashed n-gram
    feature space — collisions are part of the method, not a bug: the
    bucket distribution is what's compared, never the raw vocabulary,
    so the feature space stays fixed-size at any corpus scale) and
    add-1 smoothed bucket probabilities.

    Exactness: bucket counts and totals are exact integer aggregates;
    each ln is a single transcendental over an exact rational and is
    floor-quantized to int64 micro-nats IMMEDIATELY (the
    ``_sgns_sigma_micro`` rule), so per-bucket weights and the
    per-doc sum are exact integer arithmetic afterwards — the ranking
    is bit-identical cross-engine.

    Scale shape: ONE exploded-token pass feeds both distributions
    (the target one via a filter — no second scan); the weight table
    is ``n_buckets`` rows (broadcast); totals are 1-row crossJoins;
    the per-doc score is one hash agg. Nothing driver-side."""
    from bigclam_apachespark_spark.functions.hashing import hash64, tokens

    b_col = F.pmod(
        hash64(F.concat(F.lit("dsir:"), F.col("term"))), F.lit(n_buckets)
    ).alias("b")
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens(text_col)).alias("term")
    ).select("doc_id", "lang", b_col)
    raw = tok.groupBy("b").agg(F.count("*").alias("cr"))
    tgt = tok.where(F.col("lang") == target_lang).groupBy("b").agg(
        F.count("*").alias("ct")
    )
    nr = raw.agg(F.sum("cr").alias("n_raw"))
    nt = tgt.agg(F.sum("ct").alias("n_tgt"))
    ln_micro = lambda num, den: F.floor(
        F.log(num.cast("double") / den.cast("double")) * F.lit(1.0e6)
    ).cast("long")
    w = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nt))
        .select(
            "b",
            (
                ln_micro(
                    F.coalesce("ct", F.lit(0)) + F.lit(1),
                    F.col("n_tgt") + F.lit(n_buckets),
                )
                - ln_micro(F.col("cr") + F.lit(1), F.col("n_raw") + F.lit(n_buckets))
            ).alias("w_micro"),
        )
    )
    return (
        tok.join(F.broadcast(w), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("w_micro").cast("long").alias("lambda_micro"),
        )
    )


def dsir_sample(
    docs: DataFrame,
    k: int = 64,
    target_lang: str = "en",
    n_buckets: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """DSIR resampling — the selection step → the ``k`` chosen docs
    ``(doc_id, lang, lambda_micro, key_micro)``: Gumbel-top-k over
    the importance weights (sampling WITHOUT replacement with
    probability ∝ exp(λ) is exactly top-k of λ + Gumbel noise —
    Kirsch et al.'s trick, the one the DSIR release uses). The noise
    is deterministic: u = (hash64('dsir-g:'+doc_id) mod 2²⁰ + 1) /
    (2²⁰ + 1) ∈ (0,1), g = −ln(−ln u), with the INNER log
    floor-quantized to nano-nats before the outer log sees it
    (v_nano = ⌊−ln(u)·1e9⌋, then g_micro = ⌊ln(1e9 / v_nano)·1e6⌋):
    a NESTED unquantized transcendental would compound cross-engine
    last-ulp drift (ADVICE r11), whereas after the intermediate
    quantization each ln is a single transcendental over an exact
    integer ratio — the same accepted last-ulp-at-floor-boundary
    class as every other ln-in-rank row in the repo (the 1e-9
    quantization of v distorts the Gumbel quantile by < 1 µnat).
    λ dominates the key for clearly in/out-of-domain docs (thousands
    of micro-nats per token); the Gumbel term decides only
    near-ties — the honest sampling behavior of the method.

    Scale shape: the weights pass (see ``dsir_weights``) + one
    ``orderBy().limit(k)`` head, which compiles to
    TakeOrderedAndProject — per-partition top-k + a k-row driver
    merge, never a global sort."""
    from bigclam_apachespark_spark.functions.hashing import hash64

    lam = dsir_weights(docs, target_lang, n_buckets, text_col)
    u = (
        F.pmod(
            hash64(F.concat(F.lit("dsir-g:"), F.col("doc_id").cast("string"))),
            F.lit(1 << 20),
        )
        + F.lit(1)
    ).cast("double") / F.lit(float((1 << 20) + 1))
    v_nano = F.floor(-F.log(u) * F.lit(1.0e9))  # ≥ 953 for u ≤ 2²⁰/(2²⁰+1)
    g_micro = F.floor(
        F.log(F.lit(1.0e9) / v_nano.cast("double")) * F.lit(1.0e6)
    ).cast("long")
    keyed = lam.select(
        "doc_id",
        "lang",
        "lambda_micro",
        (F.col("lambda_micro") + g_micro).alias("key_micro"),
    )
    return keyed.orderBy(F.col("key_micro").desc(), "doc_id").limit(k)


# ---------------------------------------------------------------------------
# Trained linear text classifier (VERDICT r11 ask #7) — fastText-style
# hashed-feature one-vs-rest logistic regression, trained with the same
# quantized exact-int64 full-batch update idiom as the SGNS family
# (graph.sgns_apply): weights are int64 micro-units, every dot product
# is an exact integer sum, each transcendental (σ, ln σ) is floored to
# a fixed grid immediately, and the update is one floored division —
# so two engines replaying the same steps produce bit-identical weight
# tables.
# ---------------------------------------------------------------------------

CLF_DIMS = 256       # hashed feature space (plus one bias dim at index CLF_DIMS)
CLF_SCALE_DEN = 8    # score = dot_int / (CLF_SCALE_DEN · 1e6)
CLF_LR_NUM = 64      # lr numerator over the MEAN gradient (see step docstring)


def classifier_features(
    docs: DataFrame, dims: int = CLF_DIMS, text_col: str = "text"
) -> DataFrame:
    """Hashing-trick BINARY presence features → long layout
    ``(doc_id, dim, x)`` with x = 1: dim = hash64(term) mod dims for
    every DISTINCT token, plus a bias feature at dim = ``dims`` on
    every doc. Binary presence (fastText's bag input without counts)
    because the langid-style targets this classifier serves are
    presence signals — token multiplicity carries topic, not
    language. Distinct()-deduped: two different terms colliding into
    one dim must still yield x = 1 (the documented hashing-trick
    merge), not x = 2. One explode + distinct; dims is a constant, so
    the key space is |docs|·dims like ``feature_hashing``."""
    from bigclam_apachespark_spark.functions.hashing import hash64, tokens

    feats = (
        docs.select(
            "doc_id", F.explode(F.array_distinct(tokens(text_col))).alias("term")
        )
        .select("doc_id", (hash64("term") % dims).cast("int").alias("dim"))
        .distinct()
    )
    bias = docs.select("doc_id", F.lit(dims).cast("int").alias("dim"))
    return feats.unionByName(bias).select(
        "doc_id", "dim", F.lit(1).cast("long").alias("x")
    )


def classifier_classes(labels: DataFrame, label_col: str = "label") -> DataFrame:
    """Class table → ``(label, ord)``: distinct labels with a dense
    0-based ordinal in lexicographic order. The ordinal is the
    deterministic argmax tie-breaker (lowest ord wins), the same move
    as ivf_assign's lowest-cell rule. Tiny relation (|classes| rows —
    the label cardinality, single digits by contract), so the global
    row_number window is over a handful of rows, the same bounded-
    relation exemption as walk_cooccurrence_pmi's rank window;
    broadcast by every consumer."""
    from pyspark.sql import Window

    distinct = labels.select(F.col(label_col).alias("label")).distinct()
    return distinct.select(
        "label",
        (F.row_number().over(Window.orderBy("label")) - 1)
        .cast("int")
        .alias("ord"),
    )


def classifier_init(
    labels: DataFrame,
    classes: DataFrame,
    n_docs: int,
    dims: int = CLF_DIMS,
    scale_den: int = CLF_SCALE_DEN,
) -> DataFrame:
    """Prior-logit-initialized weight table → ``(label, dim, wv)``
    int64 micro-units over dims+1 columns: content dims start at 0
    (convex objective, no symmetry to break), the bias dim starts at
    ⌊ln(c/(n−c))·scale_den·1e6⌋ so σ(bias-only score) equals each
    class's TRAIN prior — the textbook logistic init. This matters
    for the quantized full-batch regime: from a zero bias the first
    dozens of steps do nothing but re-learn the priors (and at a
    learning rate hot enough to rush them, the loss oscillates —
    measured on the lang target); starting at the prior lets every
    step attack the decision boundary instead. The logit is ONE ln
    over an exact int64 ratio, floored — the accepted exactness
    class.

    Degenerate single-class guard (ADVICE r12): a label covering
    EVERY doc (single-class corpus, or cardinality-1 label on a
    filtered slice) makes c = n_docs, and ln(c/0) = +Inf would flow
    through floor/cast into an undefined bias instead of failing —
    the prior logit of a class with no negative examples does not
    exist, so the init raises in-plan rather than corrupt the weight
    table."""
    counts = labels.groupBy("label").agg(F.count("*").alias("c"))
    bias = counts.select(
        "label",
        F.when(
            F.col("c") < F.lit(n_docs),
            F.floor(
                F.log(
                    F.col("c").cast("double")
                    / (F.lit(n_docs) - F.col("c")).cast("double")
                )
                * F.lit(float(scale_den) * 1.0e6)
            ).cast("long"),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("classifier_init: label "),
                    F.col("label").cast("string"),
                    F.lit(" covers every doc (c = n_docs = "),
                    F.col("c").cast("string"),
                    F.lit(") — prior logit undefined for a class with "
                          "no negative examples"),
                )
            ).cast("long")
        )
        .alias("bias_wv"),
    )
    ks = F.explode(F.sequence(F.lit(0), F.lit(dims))).alias("dim")
    return (
        classes.select("label", ks)
        .join(F.broadcast(bias), "label")
        .select(
            "label",
            F.col("dim").cast("int"),
            F.when(F.col("dim") == dims, F.col("bias_wv"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("wv"),
        )
    )


def classifier_scores(
    feats: DataFrame, weights: DataFrame, classes: DataFrame
) -> DataFrame:
    """Exact integer scores → ``(doc_id, label, ord, dot_int)``:
    dot_int = Σ_dim x·wv (exact int64; x is binary so this is a sum
    of ≤ dims+1 weight values). The bias feature guarantees every
    (doc, class) pair has a row even when no content dim overlaps.
    Real-valued score = dot_int / (CLF_SCALE_DEN·1e6) — ONE IEEE
    division, taken only where a σ needs it. The weight table is
    |classes|·(dims+1) rows — broadcast EXPLICITLY so the corpus
    never shuffles on the 257-key dim column even if a mid-loop
    generation's size estimate drifts (a dim-keyed exchange would
    funnel 100 TB of feature rows into ≤ dims+1 partitions)."""
    return (
        feats.join(F.broadcast(weights), "dim")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.col("x") * F.col("wv")).alias("dot_int"))
        .join(F.broadcast(classes), "label")
        .select("doc_id", "label", "ord", "dot_int")
    )


def _clf_sigma(dot_int, scale_den: int):
    """σ(dot_int / (scale_den·1e6)) — the one transcendental, consumed
    only through an immediate floor-quantization by callers."""
    return 1.0 / (
        1.0 + F.exp(-(dot_int.cast("double") / F.lit(float(scale_den) * 1.0e6)))
    )


def classifier_step_apply(
    feats: DataFrame,
    labels: DataFrame,
    weights: DataFrame,
    classes: DataFrame,
    n_docs: int,
    lr_num: int = CLF_LR_NUM,
    scale_den: int = CLF_SCALE_DEN,
) -> DataFrame:
    """One synchronous full-batch one-vs-rest logistic step →
    the next ``(label, dim, wv)`` table. Per (doc, class):
    coef = ⌊(y − σ(score))·1e9⌋ (int64 nano-units; y = 1 iff the doc
    carries that label) — the transcendental is quantized IMMEDIATELY,
    like ``_sgns_sigma_micro``. Per (class, dim):
    grad = Σ_docs ⌊coef·x / scale_den⌋ (x binary ⇒ ⌊coef/scale_den⌋
    per carrying doc — exact integer floor-div; the double division
    is exact because coef·x ≤ 1e9·1 ≪ 2^52/scale_den). Update:
    wv += ⌊grad·lr_num / (1000·n_docs)⌋ — the MEAN gradient (nano →
    micro is the /1000), so the effective learning rate is corpus-
    size-FREE: a summed gradient would make lr scale with |docs| and
    oscillate at any fixed lr once the corpus grows (measured: the
    summed form diverges at 500 docs already). Exactness headroom
    (ADVICE r12 correction — the first statement of this cap was
    ~10× too generous): grad·lr_num ≤ (1e9/scale_den)·n_docs·lr_num
    must stay ≤ 2^52 for the floored double division to be exact,
    i.e. n_docs ≤ 2^52·scale_den/(1e9·lr_num) — at the defaults
    (scale_den=8, lr_num=64) that caps n_docs ≈ 5.6e5; past that,
    raise the update to a decimal(38) grid (the sgns_apply headroom
    contract).

    Scale shape: scores are one feats⋈weights join keyed on the
    constant-sized dim space + a (doc, class) hash agg; coefs join
    back to feats on doc_id and aggregate to (class, dim) — the
    |corpus tokens|·|classes| bound of the SGNS assoc join, partial
    aggs throughout, no window, no driver data."""
    scores = classifier_scores(feats, weights, classes)
    y = F.when(F.col("label_true") == F.col("label"), 1.0).otherwise(0.0)
    coefs = (
        scores.join(
            labels.select("doc_id", F.col("label").alias("label_true")),
            "doc_id",
        )
        .select(
            "doc_id",
            "label",
            F.floor((y - _clf_sigma(F.col("dot_int"), scale_den)) * F.lit(1.0e9))
            .cast("long")
            .alias("coef"),
        )
    )
    grad = (
        coefs.join(feats, "doc_id")
        .groupBy("label", "dim")
        .agg(
            F.sum(
                F.floor(
                    (F.col("coef") * F.col("x")).cast("double")
                    / F.lit(float(scale_den))
                ).cast("long")
            ).alias("gsum")
        )
    )
    return (
        weights.join(grad, ["label", "dim"], "left")
        .select(
            "label",
            "dim",
            (
                F.col("wv")
                + F.floor(
                    (F.coalesce(F.col("gsum"), F.lit(0)) * F.lit(lr_num))
                    .cast("double")
                    / F.lit(float(1000 * n_docs))
                ).cast("long")
            ).cast("long").alias("wv"),
        )
    )


def classifier_step(
    docs: DataFrame,
    steps: int = 1,
    label_col: str = "lang",
    dims: int = CLF_DIMS,
    lr_num: int = CLF_LR_NUM,
    scale_den: int = CLF_SCALE_DEN,
    text_col: str = "text",
) -> DataFrame:
    """``steps`` synchronous steps from zero init over the documents
    corpus, labeled by ``label_col`` → the trained ``(label, dim,
    wv)`` table — the F5/word2vec_step-analog entry point (fixed-step
    unroll contract: the DuckDB twin replays the same bounded steps
    and must hash-match bit-for-bit)."""
    labels = docs.select("doc_id", F.col(label_col).alias("label"))
    classes = classifier_classes(labels).localCheckpoint(eager=True)
    feats = classifier_features(docs, dims, text_col).localCheckpoint(eager=True)
    n_docs = docs.count()
    w = classifier_init(labels, classes, n_docs, dims, scale_den)
    for _ in range(steps):
        w = classifier_step_apply(
            feats, labels, w, classes, n_docs, lr_num, scale_den
        ).localCheckpoint(eager=True)
    return w


def classifier_predict(
    feats: DataFrame, weights: DataFrame, classes: DataFrame
) -> DataFrame:
    """Argmax prediction → ``(doc_id, label_pred)``: highest exact
    integer score, ties to the lowest class ordinal — a max_by hash
    agg over the (score, −ord) key, so no window touches the
    corpus-sized relation and the argmax is cross-engine exact (the
    scores being compared are int64, not floats)."""
    return (
        classifier_scores(feats, weights, classes)
        .groupBy("doc_id")
        .agg(
            F.max_by(
                F.col("label"), F.struct(F.col("dot_int"), -F.col("ord"))
            ).alias("label_pred")
        )
    )


def classifier_loss_row(
    feats: DataFrame,
    labels: DataFrame,
    weights: DataFrame,
    classes: DataFrame,
    step: int,
    scale_den: int = CLF_SCALE_DEN,
) -> DataFrame:
    """One row ``(step, loss_micro)``: the one-vs-rest log-likelihood
    Σ_docs Σ_classes [y·ln σ(s) + (1−y)·ln σ(−s)], each term floored
    to int64 micro-nats before the order-free integer sum — the
    sgns_loss_row discipline, for the fit loop's plateau stop."""
    scores = classifier_scores(feats, weights, classes).join(
        labels.select("doc_id", F.col("label").alias("label_true")), "doc_id"
    )
    s = F.col("dot_int").cast("double") / F.lit(float(scale_den) * 1.0e6)
    pos = F.col("label_true") == F.col("label")
    sig = F.when(pos, 1.0 / (1.0 + F.exp(-s))).otherwise(
        1.0 / (1.0 + F.exp(s))
    )
    return (
        scores.select(
            F.floor(F.log(sig) * F.lit(1.0e6)).cast("long").alias("t")
        )
        .agg(F.sum("t").cast("long").alias("loss_micro"))
        .select(F.lit(step).alias("step"), "loss_micro")
    )


def classifier_fit(
    docs: DataFrame,
    label_col: str = "lang",
    max_steps: int = 250,
    plateau_frac: float = 0.02,
    dims: int = CLF_DIMS,
    lr_num: int = CLF_LR_NUM,
    scale_den: int = CLF_SCALE_DEN,
    text_col: str = "text",
) -> tuple[DataFrame, dict]:
    """Logistic regression trained to a LOSS PLATEAU — the
    ``sgns_fit``-analog convergence loop for the classifier →
    ``(weights, stats)`` with ``stats = {n_steps, converged,
    loss_init_micro, loss_final_micro, improvement_ppm, classes,
    feats}``. Same past-peak plateau rule and best-state-return
    contract as ``sgns_fit`` (a non-improving candidate generation is
    discarded; first-step worsening reports converged=False), same
    ``checkpoint_fresh`` cadence (the objective is full-batch and
    deterministic, so the loop maximizes one fixed function). Driver
    scalars per step: ONE loss row."""
    from bigclam_apachespark_spark.functions.checkpointing import (
        checkpoint_fresh,
        release_fresh_checkpoint,
    )

    labels = docs.select("doc_id", F.col(label_col).alias("label"))
    classes = checkpoint_fresh(classifier_classes(labels))
    feats = checkpoint_fresh(classifier_features(docs, dims, text_col))
    labels = checkpoint_fresh(labels)
    n_docs = docs.count()
    w = checkpoint_fresh(
        classifier_init(labels, classes, n_docs, dims, scale_den)
    )

    def loss_of(wt: DataFrame, step: int) -> int:
        return classifier_loss_row(
            feats, labels, wt, classes, step, scale_den
        ).collect()[0]["loss_micro"]

    loss_init = loss_of(w, 0)
    loss_prev = loss_init
    converged = False
    steps_run = 0
    best_improvement = 0
    for step in range(1, max_steps + 1):
        nxt = checkpoint_fresh(
            classifier_step_apply(
                feats, labels, w, classes, n_docs, lr_num, scale_den
            )
        )
        loss_cur = loss_of(nxt, step)
        improvement = loss_cur - loss_prev  # maximizing: ≥ 0 while working
        if improvement <= 0:
            release_fresh_checkpoint(nxt)
            converged = step > 1 or improvement == 0
            break
        release_fresh_checkpoint(w)
        w = nxt
        steps_run = step
        loss_prev = loss_cur
        best_improvement = max(best_improvement, improvement)
        if improvement < plateau_frac * best_improvement:
            converged = True
            break
    stats = {
        "n_steps": steps_run,
        "converged": converged,
        "loss_init_micro": loss_init,
        "loss_final_micro": loss_prev,
        "improvement_ppm": (
            (loss_prev - loss_init) * 1_000_000 // abs(loss_init)
            if loss_init
            else 0
        ),
        "classes": classes,
        "feats": feats,
    }
    return w, stats


def classifier_eval(
    docs: DataFrame,
    label_col: str = "lang",
    max_steps: int = 250,
    plateau_frac: float = 0.02,
    dims: int = CLF_DIMS,
    lr_num: int = CLF_LR_NUM,
    scale_den: int = CLF_SCALE_DEN,
    text_col: str = "text",
) -> DataFrame:
    """Held-out evaluation of the TRAINED classifier → ONE row
    ``(n_eval, n_trained_ok, n_prior_ok, n_steps, converged,
    improvement_ppm)``: fit to the loss plateau on the hash_split
    train slice (80%), predict on the DISJOINT held-out slice (the
    val+test 20% — both unseen by training; pooled so the
    trained-vs-baseline comparison has twice the sample), and
    count exact matches against the slice's ``label_col`` — next to
    the majority-class-of-train baseline (``n_prior_ok``), the floor
    any learned model must justify itself against. The split is the
    same deterministic ``hash_split`` the corpus-prep rows use, so
    train/test membership is replayable cross-engine.

    Scale shape: the fit loop's per-step cost (see
    ``classifier_step_apply``) over the train slice; the readout is
    two broadcast-class joins + three hash aggs. Driver scalars: one
    loss row per step + the final counters."""
    sp = hash_split(docs).localCheckpoint(eager=True)
    train_docs = docs.join(
        sp.where(F.col("split") == "train").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    test_docs = docs.join(
        sp.where(F.col("split") != "train").select("doc_id"),
        "doc_id",
        "left_semi",
    ).localCheckpoint(eager=True)
    w, stats = classifier_fit(
        train_docs, label_col, max_steps, plateau_frac, dims, lr_num,
        scale_den, text_col,
    )
    truth = test_docs.select("doc_id", F.col(label_col).alias("label_true"))
    pred = classifier_predict(
        classifier_features(test_docs, dims, text_col), w, stats["classes"]
    )
    # Majority label of the TRAIN slice (count desc, label asc — exact
    # integer argmax, deterministic): min_by on (−c, label).
    prior = (
        train_docs.groupBy(F.col(label_col).alias("label"))
        .agg(F.count("*").alias("c"))
        .agg(
            F.min_by(
                F.col("label"), F.struct(-F.col("c"), F.col("label"))
            ).alias("prior_label")
        )
    )
    joined = truth.join(pred, "doc_id", "left").crossJoin(F.broadcast(prior))
    counters = joined.agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum(
            F.when(F.col("label_pred") == F.col("label_true"), 1).otherwise(0)
        ).cast("long").alias("n_trained_ok"),
        F.sum(
            F.when(F.col("prior_label") == F.col("label_true"), 1).otherwise(0)
        ).cast("long").alias("n_prior_ok"),
    )
    fit_row = counters.sparkSession.createDataFrame(
        [
            (
                int(stats["n_steps"]),
                bool(stats["converged"]),
                int(stats["improvement_ppm"]),
            )
        ],
        "n_steps long, converged boolean, improvement_ppm long",
    )
    return counters.crossJoin(fit_row)


def classifier_calibration(
    feats: DataFrame,
    labels: DataFrame,
    weights: DataFrame,
    classes: DataFrame,
    n_buckets: int = 10,
    scale_den: int = CLF_SCALE_DEN,
) -> DataFrame:
    """Reliability counts for a trained one-vs-rest model →
    ``(bucket, n_pairs, n_pos, sum_sigma_micro)`` per predicted-
    probability decile: every (doc, class) score becomes p = σ(score)
    floored to int64 micro-units, bucketed by integer division
    (bucket = σ_micro·n_buckets div 1e6, the top edge closed into the
    last bucket), and counted against the 0/1 truth — the standard
    calibration diagram as exact integers (a well-calibrated model
    has n_pos/n_pairs ≈ sum_sigma_micro/(n_pairs·1e6) per bucket;
    reporting counts instead of the ratio keeps the row
    engine-exact). One broadcast-weights scoring pass + one hash agg
    over ≤ n_buckets keys."""
    scores = classifier_scores(feats, weights, classes).join(
        labels.select("doc_id", F.col("label").alias("label_true")), "doc_id"
    )
    sig_micro = F.floor(
        _clf_sigma(F.col("dot_int"), scale_den) * F.lit(1.0e6)
    ).cast("long")
    bucketed = scores.select(
        F.least(
            F.floor(
                (sig_micro * F.lit(n_buckets)).cast("double")
                / F.lit(1.0e6)
            ).cast("long"),
            F.lit(n_buckets - 1),
        ).cast("int").alias("bucket"),
        F.when(F.col("label_true") == F.col("label"), 1)
        .otherwise(0)
        .alias("y"),
        sig_micro.alias("s"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum("s").cast("long").alias("sum_sigma_micro"),
    )

def classifier_threshold_select(
    feats: DataFrame,
    labels: DataFrame,
    weights: DataFrame,
    classes: DataFrame,
    n_buckets: int = 10,
    scale_den: int = CLF_SCALE_DEN,
) -> DataFrame:
    """Calibrate → choose operating point → filter, in ONE plan
    (VERDICT r12 ask #5 — the pattern every production quality
    filter runs: CCNet/fastText pick a score cutoff from a
    calibration pass, not the argmax) → per SELECTED (doc, class)
    champion row ``(doc_id, label_sel, s_micro, thr_micro, f1_ppm)``:

    1. CALIBRATE: every (doc, class) score becomes σ floored to
       int64 micro-units and bucketed into ``n_buckets`` equal bins
       (the ``classifier_calibration`` kernel, shared σ/bucket
       arithmetic).
    2. CHOOSE: each bucket's LOWER EDGE t_b = b·(1e6/n_buckets) is a
       candidate threshold; predicted-positive set at t_b is exactly
       the buckets ≥ b (the bucketing is the integer floor of the
       same s_micro, so count equivalence is exact, not approximate).
       F1(t_b) = 2·TP_b/(P_b + T) is scored as ONE floored IEEE
       division of exact int64 products (f1_ppm — the accepted
       exactness class), and the champion is max_by (f1_ppm, bucket):
       ties go to the HIGHER threshold, i.e. the higher-precision
       operating point. Cumulative TP/P come from a window over the
       ≤ n_buckets calibration rows — the bounded-relation window
       exemption, never the corpus.
    3. FILTER: (doc, class) pairs with s_micro ≥ thr survive; each
       doc keeps its best passing class (max_by on the exact
       (s_micro, −ord) key). Docs passing for no class drop — this
       is a selection stage, abstention included.

    Scale shape: one broadcast-weights scoring pass (the corpus
    never shuffles on the dim key), one checkpoint of the scored
    relation (referenced by the calibration agg AND the filter), a
    ≤ n_buckets-row threshold derivation broadcast back, one
    per-doc hash agg."""
    assert 1_000_000 % n_buckets == 0, "bucket edges must be exact micro-units"
    scores = classifier_scores(feats, weights, classes).join(
        labels.select("doc_id", F.col("label").alias("label_true")), "doc_id"
    )
    sig_micro = F.floor(
        _clf_sigma(F.col("dot_int"), scale_den) * F.lit(1.0e6)
    ).cast("long")
    sig = scores.select(
        "doc_id",
        "label",
        "ord",
        sig_micro.alias("s_micro"),
        F.when(F.col("label_true") == F.col("label"), 1).otherwise(0).alias("y"),
    ).localCheckpoint(eager=True)

    width = 1_000_000 // n_buckets
    cal = (
        sig.select(
            F.least(
                F.floor(
                    (F.col("s_micro") * F.lit(n_buckets)).cast("double")
                    / F.lit(1.0e6)
                ).cast("long"),
                F.lit(n_buckets - 1),
            ).alias("bucket"),
            "y",
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_pairs"), F.sum("y").alias("n_pos"))
    )
    from pyspark.sql import Window

    wdesc = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = sig.agg(F.sum("y").alias("t_pos"))
    thr = (
        cal.select(
            "bucket",
            F.sum("n_pos").over(wdesc).alias("tp"),
            F.sum("n_pairs").over(wdesc).alias("p"),
        )
        .join(F.broadcast(tot))
        .select(
            "bucket",
            F.floor(
                (F.col("tp") * F.lit(2_000_000)).cast("double")
                / (F.col("p") + F.col("t_pos")).cast("double")
            ).cast("long").alias("f1_ppm"),
        )
        .agg(
            F.max(F.struct("f1_ppm", "bucket")).alias("m")
        )
        .select(
            (F.col("m.bucket") * F.lit(width)).cast("long").alias("thr_micro"),
            F.col("m.f1_ppm").alias("f1_ppm"),
        )
    )
    return (
        sig.join(F.broadcast(thr))
        .where(F.col("s_micro") >= F.col("thr_micro"))
        .groupBy("doc_id", "thr_micro", "f1_ppm")
        .agg(
            F.max_by(
                F.struct(F.col("label"), F.col("s_micro")),
                F.struct(F.col("s_micro"), (-F.col("ord")).alias("no")),
            ).alias("m")
        )
        .select(
            "doc_id",
            F.col("m.label").alias("label_sel"),
            F.col("m.s_micro").alias("s_micro"),
            "thr_micro",
            "f1_ppm",
        )
    )
