"""Registry part 2: north-star extension queries (text analysis,
dedup, similarity search, event windows, streaming) + their DuckDB
oracle SQL.

Cross-engine discipline:
- every hash is md5-derived (functions/hashing.py) so DuckDB
  reproduces it bit-for-bit;
- every float produced by a sum over variable-order rows is
  ``round(x, 6)`` on BOTH sides (float addition isn't associative;
  engine-order differences die at the 6th decimal);
- array outputs are stringified in deterministic order (the driver
  hashes scalar columns).
"""

from __future__ import annotations

import atexit as _atexit
import os as _os
import shutil as _shutil

from pyspark.sql import functions as F


def _scratch_path(prefix: str, sf: str) -> str:
    """pid-scoped scratch dir under /tmp for write-then-read-back
    queries, with best-effort ``atexit`` removal. The pid suffix keeps
    concurrent runs against the same sf from racing on the
    overwrite-then-read round trip; the atexit hook stops every new
    gate/bench process from leaking one more on-disk corpus/index
    copy (ADVICE r7: repeated invocations accumulated copies
    forever). Cleanup runs at interpreter exit — after the driver
    has collected any DataFrame still reading the path."""
    path = f"/tmp/{prefix}_{_os.path.basename(sf.rstrip('/'))}_{_os.getpid()}"
    _atexit.register(_shutil.rmtree, path, ignore_errors=True)
    return path

from bigclam_apachespark_spark.functions.hashing import (
    hash64,
    hash64_sql,
    normalize_text,
    normalize_text_sql,
    tokens_sql,
    char_shingles_sql,
    word_ngrams_sql,
)
from bigclam_apachespark_spark.operators import dedup as D
from bigclam_apachespark_spark.operators import events as E
from bigclam_apachespark_spark.operators import sketches as SK
from bigclam_apachespark_spark.sources import (
    read_documents_csv,
    read_documents_jsonl,
)
from bigclam_apachespark_spark.operators import similarity as S
from bigclam_apachespark_spark.operators import temporal as TJ
from bigclam_apachespark_spark.operators import text as X
from bigclam_apachespark_spark.operators.text import (
    EN_STOPWORDS,
    ES_STOPWORDS,
    FR_STOPWORDS,
    SUBTOKEN_RE,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark, sf_dir):
    """Read the events table. The driver's parquet stores ts as
    TIMESTAMP(NANOS), which Spark's vectorized reader rejects
    (PARQUET_TYPE_ILLEGAL); ``nanosAsLong`` surfaces it as a long we
    convert with integer division (``div`` — float division would lose
    precision above 2^53 ns). Set at call time because the driver may
    hand us a session our ``session.py`` did not build."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def _emb(spark, sf_dir):
    # float32 parquet column → double so Spark and DuckDB do identical
    # double arithmetic in identical fold order.
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

TOKENS = tokens_sql("text")


def _clean_ctes(quality_threshold: float = 0.5, lang: str = "en") -> str:
    """Corpus-cleaning CTE chain (quality + language filter → exact
    dedup, survivors in ``keep0``) — shared by text_clean_corpus and
    the end-to-end text_training_corpus pipeline oracle."""
    return f"""t AS (
          SELECT doc_id,
                 {hash64_sql(normalize_text_sql('text'))} AS content_fp,
                 {TOKENS} AS toks,
                 length(text) AS nc,
                 length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS punct,
                 length({normalize_text_sql('text')}) AS norm_len
          FROM documents
        ), m AS (
          SELECT doc_id, content_fp,
                 CAST(punct AS DOUBLE) / greatest(nc, 1) AS punct_ratio,
                 CAST(len(list_intersect(toks, {_sql_list(EN_STOPWORDS)})) AS DOUBLE)
                   / greatest(len(list_distinct(toks)), 1) AS stop_ratio,
                 CAST(norm_len AS DOUBLE) / greatest(len(toks), 1) AS mean_word_len,
                 least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS length_score,
                 CAST(len(list_intersect(toks, {_sql_list(EN_STOPWORDS)})) AS INT) AS en_hits,
                 CAST(len(list_intersect(toks, {_sql_list(ES_STOPWORDS)})) AS INT) AS es_hits,
                 CAST(len(list_intersect(toks, {_sql_list(FR_STOPWORDS)})) AS INT) AS fr_hits
          FROM t
        ), cscored AS (
          SELECT doc_id, content_fp,
                 round(0.3 * length_score
                     + 0.3 * (1.0 - least(punct_ratio * 5.0, 1.0))
                     + 0.2 * least(stop_ratio * 4.0, 1.0)
                     + 0.2 * (CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
                                   THEN 1.0 ELSE 0.5 END), 6) AS quality,
                 CASE WHEN greatest(en_hits, es_hits, fr_hits) = 0 THEN 'und'
                      WHEN en_hits = greatest(en_hits, es_hits, fr_hits) THEN 'en'
                      WHEN es_hits = greatest(en_hits, es_hits, fr_hits) THEN 'es'
                      ELSE 'fr' END AS lang_pred
          FROM m
        ), cf AS (
          SELECT * FROM cscored
          WHERE quality >= {quality_threshold} AND lang_pred = '{lang}'
        ), keep0 AS (
          SELECT doc_id, content_fp, quality, lang_pred FROM cf
          QUALIFY ROW_NUMBER() OVER (PARTITION BY content_fp ORDER BY doc_id) = 1
        )"""


TEXT_ORACLE = {
    # Fertility: integer folds, one division per lang.
    "text_tokenizer_fertility": f"""
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({TOKENS})) AS BIGINT) AS n_words,
               CAST(SUM(len(regexp_extract_all(lower(text), '{SUBTOKEN_RE}')))
                    AS BIGINT) AS n_subtokens,
               round(CAST(SUM(len(regexp_extract_all(lower(text), '{SUBTOKEN_RE}')))
                          AS DOUBLE)
                     / CAST(SUM(len({TOKENS})) AS DOUBLE), 6) AS fertility
        FROM documents GROUP BY lang
    """,
    # Dataset card: all integers + one division.
    "text_dataset_card": f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({TOKENS})) AS BIGINT) AS n_tokens,
               CAST(SUM(length(text)) AS BIGINT) AS n_chars,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(COUNT(DISTINCT {hash64_sql(normalize_text_sql('text'))}) AS BIGINT)
                 AS n_distinct_texts,
               round(100.0 * CAST(COUNT(*) - COUNT(DISTINCT
                       {hash64_sql(normalize_text_sql('text'))}) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS dup_pct
        FROM documents
    """,
    # Held-out LM: train counts from the train split only; P is one
    # fixed-order expression over exact integer counts; ln only in
    # the rounded output mean.
    "text_heldout_perplexity": f"""
        WITH tagged AS (
          SELECT doc_id, {TOKENS} AS l,
                 CASE WHEN CAST({hash64_sql("CAST(doc_id AS VARCHAR)")} % 100 AS INT) < 80
                      THEN 'train'
                      WHEN CAST({hash64_sql("CAST(doc_id AS VARCHAR)")} % 100 AS INT) < 90
                      THEN 'val' ELSE 'test' END AS sp
          FROM documents
        ),
        pr AS (
          SELECT doc_id, sp,
                 unnest(l[1:len(l)-1]) AS w1, unnest(l[2:len(l)]) AS w2
          FROM tagged WHERE len(l) >= 2
        ),
        bf AS (
          SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
          FROM pr WHERE sp = 'train' GROUP BY 1, 2
        ),
        hf AS (
          SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
          FROM pr WHERE sp = 'train' GROUP BY 1
        ),
        uni AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS cu
          FROM (SELECT unnest(l) AS w FROM tagged WHERE sp = 'train')
          GROUP BY w
        ),
        totals AS (
          SELECT CAST(SUM(cu) AS BIGINT) AS t1, CAST(COUNT(*) AS BIGINT) AS v
          FROM uni
        ),
        scored AS (
          SELECT p.doc_id,
                 COALESCE(bf.c2, 0) AS c2n,
                 0.9 * (CASE WHEN COALESCE(hf.c1, 0) > 0
                             THEN CAST(COALESCE(bf.c2, 0) AS DOUBLE)
                                  / CAST(COALESCE(hf.c1, 0) AS DOUBLE)
                             ELSE 0.0 END)
                 + 0.09 * (CAST(COALESCE(u.cu, 0) AS DOUBLE) / CAST(t.t1 AS DOUBLE))
                 + 0.01 / CAST(t.v AS DOUBLE) AS p
          FROM pr p
          LEFT JOIN bf ON bf.w1 = p.w1 AND bf.w2 = p.w2
          LEFT JOIN hf ON hf.w1 = p.w1
          LEFT JOIN uni u ON u.w = p.w2
          CROSS JOIN totals t
          WHERE p.sp = 'val'
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CASE WHEN c2n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
               round(AVG(ln(p)), 6) AS avg_logprob
        FROM scored GROUP BY doc_id
    """,
    # PMI ranking score: one division of two exact-integer products
    # (HUGEINT here, DECIMAL(38,0) on the Spark side) — bit-identical
    # doubles on both engines; ln only in the rounded output column.
    "text_pmi_topk": f"""
        WITH tk AS (SELECT {TOKENS} AS l FROM documents),
        pr AS (
          SELECT unnest(l[1:len(l)-1]) AS w1, unnest(l[2:len(l)]) AS w2
          FROM tk WHERE len(l) >= 2
          UNION ALL
          SELECT unnest(l[1:len(l)-2]), unnest(l[3:len(l)])
          FROM tk WHERE len(l) >= 3
        ),
        c12 AS (
          SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
          FROM pr GROUP BY 1, 2
        ),
        t12 AS MATERIALIZED (SELECT CAST(SUM(n_pair) AS BIGINT) AS t12 FROM c12),
        uni AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS cu
          FROM (SELECT unnest(l) AS w FROM tk) GROUP BY w
        ),
        t1 AS MATERIALIZED (SELECT CAST(SUM(cu) AS BIGINT) AS t1 FROM uni),
        sc AS (
          SELECT w1, w2, n_pair,
                 CAST(CAST(n_pair AS HUGEINT) * t1.t1 * t1.t1 AS DOUBLE)
                 / CAST(CAST(t12.t12 AS HUGEINT) * u1.cu * u2.cu AS DOUBLE) AS s
          FROM c12
          JOIN uni u1 ON u1.w = c12.w1
          JOIN uni u2 ON u2.w = c12.w2
          CROSS JOIN t12 CROSS JOIN t1
          WHERE n_pair >= 5
        )
        SELECT w1, w2, n_pair, round(ln(s), 6) AS pmi
        FROM sc ORDER BY s DESC, w1, w2 LIMIT 20
    """,
    # BPE merge candidates: all-integer weighted pair counts over the
    # vocabulary relation.
    "text_bpe_pair_counts": f"""
        WITH wf AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS f
          FROM (SELECT unnest({TOKENS}) AS w FROM documents)
          WHERE length(w) >= 2 GROUP BY w
        ),
        ch AS (
          SELECT f,
                 [substr(w, i, 1) for i in generate_series(1, length(w))] AS cs
          FROM wf
        ),
        pr AS (
          SELECT f, unnest(cs[1:len(cs)-1]) AS l, unnest(cs[2:len(cs)]) AS r
          FROM ch
        )
        SELECT l AS left_sym, r AS right_sym, CAST(SUM(f) AS BIGINT) AS pair_count
        FROM pr GROUP BY 1, 2
        ORDER BY pair_count DESC, left_sym, right_sym LIMIT 20
    """,
    # One full BPE training round (count -> merge best pair -> recount):
    # the greedy left-to-right non-overlapping merge is string replace
    # semantics with an out-of-alphabet marker (chr(1)); output symbols
    # map the marker back to the merged pair text. All-integer counts,
    # binary string tie-breaks — winner and ranking cross-engine stable.
    "text_bpe_merge_step": f"""
        WITH wf AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS f
          FROM (SELECT unnest({TOKENS}) AS w FROM documents)
          WHERE length(w) >= 2 GROUP BY w
        ),
        ch0 AS (
          SELECT f,
                 [substr(w, i, 1) for i in generate_series(1, length(w))] AS cs
          FROM wf
        ),
        pr0 AS (
          SELECT f, unnest(cs[1:len(cs)-1]) AS l, unnest(cs[2:len(cs)]) AS r
          FROM ch0
        ),
        c0 AS (SELECT l, r, SUM(f) AS c FROM pr0 GROUP BY 1, 2),
        best AS (SELECT l || r AS m FROM c0 ORDER BY c DESC, l, r LIMIT 1),
        rw AS (
          SELECT wf.f, best.m, replace(wf.w, best.m, chr(1)) AS w
          FROM wf CROSS JOIN best
        ),
        ch AS (
          SELECT f, m,
                 [substr(w, i, 1) for i in generate_series(1, length(w))] AS cs
          FROM rw WHERE length(w) >= 2
        ),
        pr AS (
          SELECT f, m, unnest(cs[1:len(cs)-1]) AS l, unnest(cs[2:len(cs)]) AS r
          FROM ch
        )
        SELECT CASE WHEN l = chr(1) THEN m ELSE l END AS left_sym,
               CASE WHEN r = chr(1) THEN m ELSE r END AS right_sym,
               CAST(SUM(f) AS BIGINT) AS pair_count
        FROM pr GROUP BY 1, 2
        ORDER BY pair_count DESC, left_sym, right_sym LIMIT 20
    """,
    # TWO chained BPE rounds: round 2 counts/merges over round 1's
    # REWRITTEN vocabulary (its winner may contain chr(1) — that is
    # how BPE grows multi-char tokens); display expands markers
    # recursively (chr(1) -> merge-1 text, chr(2) -> merge-2 display).
    "text_bpe_merge_two_steps": f"""
        WITH wf AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS f
          FROM (SELECT unnest({TOKENS}) AS w FROM documents)
          WHERE length(w) >= 2 GROUP BY w
        ),
        ch0 AS (
          SELECT f,
                 [substr(w, i, 1) for i in generate_series(1, length(w))] AS cs
          FROM wf
        ),
        pr0 AS (
          SELECT f, unnest(cs[1:len(cs)-1]) AS l, unnest(cs[2:len(cs)]) AS r
          FROM ch0
        ),
        c0 AS (SELECT l, r, SUM(f) AS c FROM pr0 GROUP BY 1, 2),
        best1 AS MATERIALIZED (SELECT l || r AS m1 FROM c0 ORDER BY c DESC, l, r LIMIT 1),
        rw1 AS MATERIALIZED (
          SELECT wf.f, best1.m1, replace(wf.w, best1.m1, chr(1)) AS w
          FROM wf CROSS JOIN best1
        ),
        ch1 AS (
          SELECT f, m1,
                 [substr(w, i, 1) for i in generate_series(1, length(w))] AS cs
          FROM rw1 WHERE length(w) >= 2
        ),
        pr1 AS (
          SELECT f, m1, unnest(cs[1:len(cs)-1]) AS l, unnest(cs[2:len(cs)]) AS r
          FROM ch1
        ),
        c1 AS (SELECT m1, l, r, SUM(f) AS c FROM pr1 GROUP BY 1, 2, 3),
        best2 AS (
          SELECT m1, l || r AS m2raw,
                 (CASE WHEN l = chr(1) THEN m1 ELSE l END)
                 || (CASE WHEN r = chr(1) THEN m1 ELSE r END) AS m2disp
          FROM c1 ORDER BY c DESC, l, r LIMIT 1
        ),
        rw2 AS (
          SELECT r1.f, b2.m1, b2.m2disp, replace(r1.w, b2.m2raw, chr(2)) AS w
          FROM rw1 r1 CROSS JOIN best2 b2
        ),
        ch2 AS (
          SELECT f, m1, m2disp,
                 [substr(w, i, 1) for i in generate_series(1, length(w))] AS cs
          FROM rw2 WHERE length(w) >= 2
        ),
        pr2 AS (
          SELECT f, m1, m2disp,
                 unnest(cs[1:len(cs)-1]) AS l, unnest(cs[2:len(cs)]) AS r
          FROM ch2
        )
        SELECT CASE WHEN l = chr(1) THEN m1
                    WHEN l = chr(2) THEN m2disp ELSE l END AS left_sym,
               CASE WHEN r = chr(1) THEN m1
                    WHEN r = chr(2) THEN m2disp ELSE r END AS right_sym,
               CAST(SUM(f) AS BIGINT) AS pair_count
        FROM pr2 GROUP BY 1, 2
        ORDER BY pair_count DESC, left_sym, right_sym LIMIT 20
    """,
    # BPE encode: the two-step trainer's CTE chain over the
    # UNFILTERED word relation (pair stats filtered to length>=2
    # post-rewrite — same statistic, see operator docstring), then
    # symbol explode + frequency top-k under the trained vocab.
    "text_bpe_encode": f"""
        WITH wf AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS f
          FROM (SELECT unnest({TOKENS}) AS w FROM documents)
          WHERE length(w) >= 1 GROUP BY w
        ),
        ch0 AS (
          SELECT f,
                 [substr(w, i, 1) for i in generate_series(1, length(w))] AS cs
          FROM wf WHERE length(w) >= 2
        ),
        pr0 AS (
          SELECT f, unnest(cs[1:len(cs)-1]) AS l, unnest(cs[2:len(cs)]) AS r
          FROM ch0
        ),
        c0 AS (SELECT l, r, SUM(f) AS c FROM pr0 GROUP BY 1, 2),
        best1 AS MATERIALIZED (SELECT l || r AS m1 FROM c0 ORDER BY c DESC, l, r LIMIT 1),
        rw1 AS MATERIALIZED (
          SELECT wf.f, best1.m1, replace(wf.w, best1.m1, chr(1)) AS w
          FROM wf CROSS JOIN best1
        ),
        ch1 AS (
          SELECT f, m1,
                 [substr(w, i, 1) for i in generate_series(1, length(w))] AS cs
          FROM rw1 WHERE length(w) >= 2
        ),
        pr1 AS (
          SELECT f, m1, unnest(cs[1:len(cs)-1]) AS l, unnest(cs[2:len(cs)]) AS r
          FROM ch1
        ),
        c1 AS (SELECT m1, l, r, SUM(f) AS c FROM pr1 GROUP BY 1, 2, 3),
        best2 AS (
          SELECT m1, l || r AS m2raw,
                 (CASE WHEN l = chr(1) THEN m1 ELSE l END)
                 || (CASE WHEN r = chr(1) THEN m1 ELSE r END) AS m2disp
          FROM c1 ORDER BY c DESC, l, r LIMIT 1
        ),
        rw2 AS (
          SELECT r1.f, b2.m1, b2.m2disp, replace(r1.w, b2.m2raw, chr(2)) AS w
          FROM rw1 r1 CROSS JOIN best2 b2
        ),
        syms AS (
          SELECT f,
                 unnest([CASE WHEN substr(w, i, 1) = chr(1) THEN m1
                              WHEN substr(w, i, 1) = chr(2) THEN m2disp
                              ELSE substr(w, i, 1) END
                         for i in generate_series(1, length(w))]) AS token
          FROM rw2
        ),
        top AS (
          SELECT token, CAST(SUM(f) AS BIGINT) AS token_count
          FROM syms GROUP BY token
          ORDER BY token_count DESC, token LIMIT 30
        )
        SELECT token, token_count,
               CAST(row_number() OVER (
                 ORDER BY token_count DESC, token) AS INT) AS rank
        FROM top
    """,
    # Good-Turing r*: single division on exact integers per output row.
    "text_freq_spectrum": f"""
        WITH tf AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS ctf
          FROM (SELECT unnest({TOKENS}) AS w FROM documents) GROUP BY w
        ),
        spec AS (
          SELECT ctf AS freq, CAST(COUNT(*) AS BIGINT) AS n_terms
          FROM tf GROUP BY 1
        )
        SELECT s.freq, s.n_terms,
               round((s.freq + 1) * CAST(n2.n_terms AS DOUBLE)
                     / CAST(s.n_terms AS DOUBLE), 6) AS gt_adjusted
        FROM spec s LEFT JOIN spec n2 ON n2.freq = s.freq + 1
        ORDER BY s.freq
    """,
    "text_token_stats": f"""
        SELECT doc_id,
               CAST(len({TOKENS}) AS INT) AS n_tokens,
               CAST(len(list_distinct({TOKENS})) AS INT) AS n_distinct_tokens,
               CAST(len(regexp_extract_all(lower(text), '{SUBTOKEN_RE}')) AS INT) AS n_subtokens,
               CAST(length(text) AS INT) AS n_chars
        FROM documents
    """,
    "text_quality": f"""
        WITH t AS (
          SELECT doc_id,
                 {TOKENS} AS toks,
                 length(text) AS nc,
                 length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS punct,
                 length({normalize_text_sql('text')}) AS norm_len
          FROM documents
        ), m AS (
          SELECT doc_id,
                 CAST(punct AS DOUBLE) / greatest(nc, 1) AS punct_ratio,
                 CAST(len(list_intersect(toks, {_sql_list(EN_STOPWORDS)})) AS DOUBLE)
                   / greatest(len(list_distinct(toks)), 1) AS stop_ratio,
                 CAST(norm_len AS DOUBLE) / greatest(len(toks), 1) AS mean_word_len,
                 least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS length_score
          FROM t
        )
        SELECT doc_id,
               round(punct_ratio, 6) AS punct_ratio,
               round(stop_ratio, 6) AS stop_ratio,
               round(mean_word_len, 6) AS mean_word_len,
               round(0.3 * length_score
                   + 0.3 * (1.0 - least(punct_ratio * 5.0, 1.0))
                   + 0.2 * least(stop_ratio * 4.0, 1.0)
                   + 0.2 * (CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
                                 THEN 1.0 ELSE 0.5 END), 6) AS quality
        FROM m
    """,
    "text_lang_id": f"""
        WITH t AS (
          SELECT doc_id, list_distinct({TOKENS}) AS toks FROM documents
        ), h AS (
          SELECT doc_id,
                 CAST(len(list_intersect(toks, {_sql_list(EN_STOPWORDS)})) AS INT) AS en_hits,
                 CAST(len(list_intersect(toks, {_sql_list(ES_STOPWORDS)})) AS INT) AS es_hits,
                 CAST(len(list_intersect(toks, {_sql_list(FR_STOPWORDS)})) AS INT) AS fr_hits
          FROM t
        )
        SELECT doc_id, en_hits, es_hits, fr_hits,
               CASE WHEN greatest(en_hits, es_hits, fr_hits) = 0 THEN 'und'
                    WHEN en_hits = greatest(en_hits, es_hits, fr_hits) THEN 'en'
                    WHEN es_hits = greatest(en_hits, es_hits, fr_hits) THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM h
    """,
    "text_fingerprints": f"""
        SELECT doc_id,
               {hash64_sql(normalize_text_sql('text'))} AS content_fp,
               list_min(list_transform({char_shingles_sql('text', 5)},
                        s -> {hash64_sql('s')})) AS min_shingle_fp
        FROM documents
    """,
    # Corpus-cleaning composition (operators/text.py clean_corpus):
    # quality >= 0.5 AND lang = 'en', then exact dedup among survivors
    # (min doc_id per content hash). Threshold compares the ROUNDED
    # score on both engines so the keep/drop decision is bit-exact.
    # Salient terms: ranking key is the exact rational tf/df — a
    # single IEEE division of exact integers is correctly rounded on
    # both engines, and distinct rationals with denominators ≤ 2^17
    # are ≥ 2^-34 apart (≫ double ulp), so the (salience DESC, term)
    # order can never flip cross-engine (ln-based tf·idf can: 2·ln 4 =
    # 4·ln 2 ties at the mercy of libm; see operators/text.py).
    "text_salient_terms": f"""
        WITH tok AS (SELECT doc_id, unnest({TOKENS}) AS term FROM documents),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM tok GROUP BY doc_id, term),
        dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, d.df,
                 CAST(tf.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS salience
          FROM tf JOIN dfreq d USING (term)
        )
        SELECT doc_id, term, tf, df, CAST(rank AS INT) AS rank,
               round(salience, 6) AS salience
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY salience DESC, term) AS rank
          FROM scored
        ) WHERE rank <= 5
    """,
    "text_vocab_topk": f"""
        WITH tok AS (
          SELECT doc_id, unnest(list_distinct({TOKENS})) AS term FROM documents
        ),
        dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY term)
        SELECT term, df, CAST(rank AS INT) AS rank FROM (
          SELECT term, df, ROW_NUMBER() OVER (ORDER BY df DESC, term) AS rank
          FROM dfreq
        ) WHERE rank <= 100
    """,
    "text_hash_split": f"""
        WITH b AS (
          SELECT doc_id,
                 CAST({hash64_sql("CAST(doc_id AS VARCHAR)")} % 100 AS INT) AS bucket
          FROM documents
        )
        SELECT doc_id, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    """,
    # Data-mixing ledger: token budget share per source.
    "text_source_ledger": f"""
        WITH per AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(len({TOKENS})) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source
        ),
        tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM per)
        SELECT source, n_docs, n_tokens,
               round(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS pct_tokens
        FROM per CROSS JOIN tot
    """,
    # Lang-ID confusion matrix vs the ground-truth lang column.
    "text_langid_eval": f"""
        WITH t AS (
          SELECT lang, list_distinct({TOKENS}) AS toks FROM documents
        ), h AS (
          SELECT lang,
                 CAST(len(list_intersect(toks, {_sql_list(EN_STOPWORDS)})) AS INT) AS en_hits,
                 CAST(len(list_intersect(toks, {_sql_list(ES_STOPWORDS)})) AS INT) AS es_hits,
                 CAST(len(list_intersect(toks, {_sql_list(FR_STOPWORDS)})) AS INT) AS fr_hits
          FROM t
        )
        SELECT lang,
               CASE WHEN greatest(en_hits, es_hits, fr_hits) = 0 THEN 'und'
                    WHEN en_hits = greatest(en_hits, es_hits, fr_hits) THEN 'en'
                    WHEN es_hits = greatest(en_hits, es_hits, fr_hits) THEN 'es'
                    ELSE 'fr' END AS lang_pred,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM h GROUP BY 1, 2
    """,
    # Balanced per-source downsample: lowest-hash docs per group.
    "text_balanced_sample": f"""
        SELECT doc_id, source, CAST(rank AS INT) AS rank FROM (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY {hash64_sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rank
          FROM documents
        ) WHERE rank <= 50
    """,
    # Token-window chunking: integer window geometry + exact token-
    # slice reassembly.
    "text_chunks": f"""
        WITH base AS (
          SELECT doc_id, {TOKENS} AS tk, len({TOKENS}) AS n,
                 greatest(CAST(ceil(CAST(len({TOKENS}) - 32 AS DOUBLE) / 24) AS INT) + 1, 1) AS c
          FROM documents
        ),
        ex AS (
          SELECT doc_id, tk, n, unnest(generate_series(0, c - 1)) AS chunk_idx
          FROM base
        )
        SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
               CAST(chunk_idx * 24 AS INT) AS start_token,
               CAST(least(32, n - chunk_idx * 24) AS INT) AS n_chunk_tokens,
               array_to_string(tk[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ') AS chunk_text
        FROM ex
    """,
    # Concat-then-split packing: pure integer cumulative arithmetic
    # over doc_id order.
    "text_pack_sequences": f"""
        WITH sized AS (
          SELECT doc_id, CAST(len({TOKENS}) AS INT) AS n_tokens FROM documents
        ),
        cum AS (
          SELECT doc_id, n_tokens,
                 CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
          FROM sized
        )
        SELECT doc_id, n_tokens,
               (cum_end - n_tokens) // 256 AS bin,
               (cum_end - n_tokens) % 256 AS bin_offset
        FROM cum
    """,
    # Exact inverse-CDF quantiles (integer outputs — approx sketches
    # are not cross-engine reproducible).
    "text_length_quantiles": f"""
        WITH lens AS (SELECT len({TOKENS}) AS v FROM documents),
        counts AS (SELECT v, COUNT(*) AS cnt FROM lens GROUP BY v),
        cum AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM counts),
        tot AS (SELECT COUNT(*) AS n FROM lens),
        ps AS (SELECT CAST(unnest([0.5, 0.9, 0.95, 0.99]) AS DOUBLE) AS p)
        SELECT p, CAST(MIN(v) AS INT) AS n_tokens_q
        FROM cum CROSS JOIN tot CROSS JOIN ps
        WHERE cum >= ceil(p * n)
        GROUP BY p
    """,
    "text_clean_corpus": f"""
        WITH {_clean_ctes(0.5, 'en')}
        SELECT doc_id, content_fp, quality, lang_pred FROM keep0
    """,
    # ln appears only in rounded OUTPUT values here (never a rank or
    # threshold), so the last-ulp libm hazard class does not apply.
    # DSIR (Xie et al. NeurIPS'23): hashed-unigram importance weights
    # — every ln is floor-quantized to micro-nats immediately (single
    # transcendental over an exact rational), so per-bucket weights,
    # per-doc sums, and the Gumbel-jittered top-k key are exact int64
    # cross-engine.
    "text_dsir_weights": f"""
        WITH tok AS MATERIALIZED (
          SELECT doc_id, lang,
                 CAST({hash64_sql("CONCAT('dsir:', term)")} % 1024 AS BIGINT) AS b
          FROM (SELECT doc_id, lang, unnest({TOKENS}) AS term FROM documents)
        ),
        raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM tok GROUP BY b),
        tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM tok
                WHERE lang = 'en' GROUP BY b),
        nr AS (SELECT CAST(SUM(cr) AS BIGINT) AS n_raw FROM raw),
        nt AS (SELECT CAST(SUM(ct) AS BIGINT) AS n_tgt FROM tgt),
        w AS (
          SELECT raw.b,
                 CAST(floor(ln(CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE)
                              / CAST(nt.n_tgt + 1024 AS DOUBLE)) * 1e6) AS BIGINT)
               - CAST(floor(ln(CAST(raw.cr + 1 AS DOUBLE)
                              / CAST(nr.n_raw + 1024 AS DOUBLE)) * 1e6) AS BIGINT)
                   AS w_micro
          FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN nr CROSS JOIN nt
        )
        SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(w_micro) AS BIGINT) AS lambda_micro
        FROM tok JOIN w ON w.b = tok.b
        GROUP BY doc_id, lang
    """,
    "text_dsir_sample": f"""
        WITH tok AS MATERIALIZED (
          SELECT doc_id, lang,
                 CAST({hash64_sql("CONCAT('dsir:', term)")} % 1024 AS BIGINT) AS b
          FROM (SELECT doc_id, lang, unnest({TOKENS}) AS term FROM documents)
        ),
        raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM tok GROUP BY b),
        tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM tok
                WHERE lang = 'en' GROUP BY b),
        nr AS (SELECT CAST(SUM(cr) AS BIGINT) AS n_raw FROM raw),
        nt AS (SELECT CAST(SUM(ct) AS BIGINT) AS n_tgt FROM tgt),
        w AS (
          SELECT raw.b,
                 CAST(floor(ln(CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE)
                              / CAST(nt.n_tgt + 1024 AS DOUBLE)) * 1e6) AS BIGINT)
               - CAST(floor(ln(CAST(raw.cr + 1 AS DOUBLE)
                              / CAST(nr.n_raw + 1024 AS DOUBLE)) * 1e6) AS BIGINT)
                   AS w_micro
          FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN nr CROSS JOIN nt
        ),
        lam AS (
          SELECT doc_id, lang, CAST(SUM(w_micro) AS BIGINT) AS lambda_micro
          FROM tok JOIN w ON w.b = tok.b
          GROUP BY doc_id, lang
        )
        SELECT doc_id, lang, lambda_micro,
               lambda_micro + CAST(floor(ln(1e9 / CAST(CAST(floor(-ln(
                   CAST(({hash64_sql("CONCAT('dsir-g:', CAST(doc_id AS VARCHAR))")} % 1048576) + 1 AS DOUBLE)
                   / 1048577.0) * 1e9) AS BIGINT) AS DOUBLE)) * 1e6) AS BIGINT) AS key_micro
        FROM lam
        ORDER BY key_micro DESC, doc_id
        LIMIT 64
    """,
    "text_unigram_logprob": f"""
        WITH tok AS (SELECT doc_id, unnest({TOKENS}) AS term FROM documents),
        tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS ctf FROM tok GROUP BY term),
        tot AS (SELECT CAST(SUM(ctf) AS BIGINT) AS ctot FROM tf)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               round(AVG(ln(CAST(ctf AS DOUBLE) / CAST(ctot AS DOUBLE))), 6) AS avg_logprob
        FROM tok JOIN tf USING (term) CROSS JOIN tot
        GROUP BY doc_id
    """,
    # Bigram conditional LM: adjacent token pairs via parallel
    # positional unnest of the two array slices (DuckDB zips
    # same-SELECT unnests positionally — the twin of Spark's
    # zip_with over the sliced token array). ln only in rounded
    # output values, same policy as the unigram LM.
    "text_bigram_logprob": f"""
        WITH tk AS (SELECT doc_id, {TOKENS} AS l FROM documents),
        pr AS (
          SELECT doc_id,
                 unnest(l[1:len(l)-1]) AS w1,
                 unnest(l[2:len(l)]) AS w2
          FROM tk WHERE len(l) >= 2
        ),
        bf AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM pr GROUP BY 1, 2),
        hf AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM pr GROUP BY 1)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               round(AVG(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))), 6) AS avg_logprob
        FROM pr JOIN bf USING (w1, w2) JOIN hf USING (w1)
        GROUP BY doc_id
    """,
    # T5 span-corruption prep: parallel positional unnests (term, i)
    # zip; string_agg ORDER BY i skips NULLs exactly like the Spark
    # side's filtered transform; empty target set -> NULL (the Spark
    # side nulls its empty concat to match).
    "text_span_corruption": f"""
        WITH tok AS (
          SELECT doc_id, unnest(l) AS term,
                 unnest(range(0, len(l))) AS i
          FROM (SELECT doc_id, {TOKENS} AS l FROM documents)
        )
        SELECT doc_id,
               CAST(SUM(CASE WHEN i % 7 IN (3, 4) THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_masked,
               string_agg(CASE WHEN i % 7 = 3
                                 THEN '<extra_id_' || CAST(i // 7 AS VARCHAR) || '>'
                               WHEN i % 7 = 4 THEN NULL
                               ELSE term END, ' ' ORDER BY i) AS input_text,
               string_agg(CASE WHEN i % 7 = 3
                                 THEN '<extra_id_' || CAST(i // 7 AS VARCHAR)
                                      || '> ' || term
                               WHEN i % 7 = 4 THEN term END,
                          ' ' ORDER BY i) AS target_text
        FROM tok GROUP BY doc_id
    """,
    # PII redaction: same five RE2/Java-portable patterns applied
    # sequentially (emails -> IPs -> phones -> SSNs -> secrets),
    # counts on each stage's residual text - mirroring
    # operators/text.py pii_scrub exactly. The synthetic corpus
    # contains no PII, so BOTH engines append deterministic PII tails
    # first - every 7th doc gets email/IP/phone, every 11th gets a
    # dashed SSN and an md5-tailed sk_ secret - so the gate genuinely
    # exercises the match/replace behavior cross-engine instead of
    # hashing identity text.
    "text_pii_scrub": f"""
        WITH seeded AS (
          SELECT doc_id,
                 text ||
                 CASE WHEN doc_id % 7 = 0 THEN
                   ' contact user' || doc_id ||
                   '@example.com at 10.0.' || (doc_id % 256) ||
                   '.1 or call 555-123-' || (1000 + doc_id % 9000)
                 ELSE '' END ||
                 CASE WHEN doc_id % 11 = 0 THEN
                   ' ssn ' || (100 + doc_id % 900) || '-' ||
                   (10 + doc_id % 90) || '-' || (1000 + doc_id % 9000) ||
                   ' auth sk_' || md5(CAST(doc_id AS VARCHAR))
                 ELSE '' END AS text
          FROM documents
        ),
        s1 AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '{X.PII_EMAIL}')) AS INT) AS n_emails,
                 regexp_replace(text, '{X.PII_EMAIL}', '<EMAIL>', 'g') AS t1
          FROM seeded
        ),
        s2 AS (
          SELECT doc_id, n_emails,
                 CAST(len(regexp_extract_all(t1, '{X.PII_IP}')) AS INT) AS n_ips,
                 regexp_replace(t1, '{X.PII_IP}', '<IP>', 'g') AS t2
          FROM s1
        ),
        s3 AS (
          SELECT doc_id, n_emails, n_ips,
                 CAST(len(regexp_extract_all(t2, '{X.PII_PHONE}')) AS INT) AS n_phones,
                 regexp_replace(t2, '{X.PII_PHONE}', '<PHONE>', 'g') AS t3
          FROM s2
        ),
        s4 AS (
          SELECT doc_id, n_emails, n_ips, n_phones,
                 CAST(len(regexp_extract_all(t3, '{X.PII_SSN}')) AS INT) AS n_ssns,
                 regexp_replace(t3, '{X.PII_SSN}', '<SSN>', 'g') AS t4
          FROM s3
        )
        SELECT doc_id,
               regexp_replace(t4, '{X.PII_SECRET}', '<SECRET>', 'g') AS clean_text,
               n_emails, n_ips, n_phones, n_ssns,
               CAST(len(regexp_extract_all(t4, '{X.PII_SECRET}')) AS INT) AS n_secrets
        FROM s4
    """,
    # Deterministic per-source cap: rank by (hash64(doc_id), doc_id)
    # inside each source - the anti-domination sampling rule.
    "text_cap_per_source": f"""
        SELECT doc_id, source, CAST(rk AS INT) AS rk,
               CAST(CASE WHEN rk <= 200 THEN 1 ELSE 0 END AS INT) AS kept
        FROM (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY {hash64_sql("CAST(doc_id AS VARCHAR)")}, doc_id
                 ) AS rk
          FROM documents
        )
    """,
    # Deterministic global training order: the oracle states the
    # single-sort definition; the Spark side computes the same rank
    # via the bucketed two-stage kernel (no one-task global sort).
    "text_global_shuffle": f"""
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                 ORDER BY {hash64_sql("CAST(doc_id AS VARCHAR)")}, doc_id
               ) AS BIGINT) AS rank
        FROM documents
    """,
    # Per-source duplication report: exact distinct fingerprints.
    "text_dup_rate": f"""
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT {hash64_sql(normalize_text_sql('text'))}) AS BIGINT)
                 AS n_unique,
               round(1.0 - CAST(COUNT(DISTINCT {hash64_sql(normalize_text_sql('text'))})
                               AS DOUBLE) / COUNT(*), 6) AS dup_rate
        FROM documents GROUP BY source
    """,
    # Hashing-trick features: md5-derived bucket, integer counts.
    "text_feature_hashing": f"""
        SELECT doc_id,
               CAST({hash64_sql('term')} % 64 AS INT) AS dim,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT doc_id, unnest({TOKENS}) AS term FROM documents)
        GROUP BY 1, 2
    """,
    # Temperature-flattened source sampling: p = min(1, c/sqrt(T_s))
    # touches one exact integer per source (no cross-source float
    # sum), so the keep threshold is bit-exact cross-engine.
    "text_mix_sample": f"""
        WITH nt AS (
          SELECT doc_id, source, CAST(len({TOKENS}) AS INT) AS n_tokens
          FROM documents
        ),
        per_s AS (
          SELECT source,
                 CAST(floor(least(1.0, 20.0 / sqrt(CAST(SUM(n_tokens) AS DOUBLE)))
                            * 1048576.0) AS BIGINT) AS thr
          FROM nt GROUP BY source
        )
        SELECT t.doc_id, t.source, t.n_tokens,
               ({hash64_sql("CAST(t.doc_id AS VARCHAR)")} % 1048576) < p.thr AS keep
        FROM nt t JOIN per_s p USING (source)
    """,
    # Gopher-style rule filter: every threshold compares an integer
    # or a ROUNDED ratio, so the bitmask (and keep/drop) is bit-exact
    # cross-engine — the clean_corpus discipline.
    "text_gopher_filter": f"""
        WITH tk AS (SELECT doc_id, {TOKENS} AS tk, text FROM documents),
        base AS (
          SELECT doc_id,
                 CAST(len(tk) AS INT) AS n_tokens,
                 round(CAST(length({normalize_text_sql('text')}) AS DOUBLE)
                       / greatest(len(tk), 1), 6) AS mwl,
                 CAST(len(list_intersect(list_distinct(tk), {_sql_list(EN_STOPWORDS)})) AS INT)
                   AS stop_hits
          FROM tk
        ),
        g AS (SELECT doc_id, unnest({word_ngrams_sql('tk', 2)}) AS g FROM tk),
        c AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY doc_id, g),
        pd AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
                 CAST(COUNT(*) AS BIGINT) AS dn, CAST(MAX(c) AS BIGINT) AS tc
          FROM c GROUP BY doc_id
        ),
        rep AS (
          SELECT b.doc_id,
                 round(CASE WHEN COALESCE(n_grams, 0) > 0
                            THEN CAST(n_grams - dn AS DOUBLE) / n_grams
                            ELSE 0.0 END, 6) AS dup2,
                 round(CASE WHEN COALESCE(n_grams, 0) > 0
                            THEN CAST(tc AS DOUBLE) / n_grams
                            ELSE 0.0 END, 6) AS top2
          FROM base b LEFT JOIN pd USING (doc_id)
        ),
        flagged AS (
          SELECT b.doc_id, b.n_tokens,
                 CAST((CASE WHEN b.n_tokens < 30 OR b.n_tokens > 10000 THEN 1 ELSE 0 END)
                    + (CASE WHEN b.mwl < 2.0 OR b.mwl > 12.0 THEN 2 ELSE 0 END)
                    + (CASE WHEN b.stop_hits < 1 THEN 4 ELSE 0 END)
                    + (CASE WHEN r.dup2 > 0.05 THEN 8 ELSE 0 END)
                    + (CASE WHEN r.top2 > 0.06 THEN 16 ELSE 0 END) AS INT) AS flags
          FROM base b JOIN rep r USING (doc_id)
        )
        SELECT doc_id, n_tokens, flags, flags = 0 AS keep FROM flagged
    """,
    # Repetition signals (Gopher/MassiveText family): every ratio is
    # one IEEE division of two exact integers, rounded at 6 — the
    # same bit-stability class as salient_terms.
    "text_repetition": f"""
        WITH tk AS (SELECT doc_id, {TOKENS} AS tk FROM documents),
        g AS (
          SELECT doc_id, 2 AS gram_n, unnest({word_ngrams_sql('tk', 2)}) AS g FROM tk
          UNION ALL
          SELECT doc_id, 3 AS gram_n, unnest({word_ngrams_sql('tk', 3)}) AS g FROM tk
        ),
        c AS (
          SELECT doc_id, gram_n, g, CAST(COUNT(*) AS BIGINT) AS c
          FROM g GROUP BY doc_id, gram_n, g
        ),
        pd AS (
          SELECT doc_id, gram_n,
                 CAST(SUM(c) AS BIGINT) AS n_grams,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
                 CAST(MAX(c) AS BIGINT) AS top_count
          FROM c GROUP BY doc_id, gram_n
        ),
        base AS (SELECT doc_id, unnest([2, 3]) AS gram_n FROM documents)
        SELECT b.doc_id, CAST(b.gram_n AS INT) AS gram_n,
               COALESCE(n_grams, 0) AS n_grams,
               COALESCE(n_distinct_grams, 0) AS n_distinct_grams,
               COALESCE(top_count, 0) AS top_count,
               round(CASE WHEN COALESCE(n_grams, 0) > 0
                          THEN CAST(n_grams - n_distinct_grams AS DOUBLE) / n_grams
                          ELSE 0.0 END, 6) AS dup_gram_frac,
               round(CASE WHEN COALESCE(n_grams, 0) > 0
                          THEN CAST(top_count AS DOUBLE) / n_grams
                          ELSE 0.0 END, 6) AS top_gram_frac
        FROM base b LEFT JOIN pd USING (doc_id, gram_n)
    """,
}

# Repo-shipped JSONL corpus fixture (sources/docs.py): scanned by
# both engines from the same file, so the source FORMAT itself is
# oracle-checked (parse fidelity incl. JSON string escapes), not just
# downstream operators. Path resolved relative to the repo root so
# any checkout location works (same convention as bench.py).
from pathlib import Path as _Path  # noqa: E402

DOCS_JSONL = str(
    _Path(__file__).resolve().parent.parent / "data" / "sample_docs.jsonl"
)
DOCS_CSV = str(
    _Path(__file__).resolve().parent.parent / "data" / "sample_docs.csv"
)

def _cms_sql(k: int = 20, d: int = 4, w: int = 1024) -> str:
    """Count-min sketch twin (operators/sketches.py cms_topk_estimates)
    — all-integer, so exact by construction."""
    buckets = [
        "CAST(" + hash64_sql(f"'cms{r}:' || term") + f" % {w} AS INT)"
        for r in range(d)
    ]
    counter_rows = "\n    UNION ALL ".join(
        f"SELECT {r} AS r, {buckets[r]} AS bucket FROM tok" for r in range(d)
    )
    probe_rows = "\n    UNION ALL ".join(
        f"SELECT term, n_exact, {r} AS r, {buckets[r]} AS bucket FROM top"
        for r in range(d)
    )
    return f"""
        WITH tok AS (SELECT unnest({TOKENS}) AS term FROM documents),
        counters AS (
          SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM (
            {counter_rows}
          ) GROUP BY r, bucket
        ),
        top AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS n_exact FROM tok GROUP BY term
          ORDER BY n_exact DESC, term LIMIT {k}
        ),
        probes AS (
          {probe_rows}
        )
        SELECT term, n_exact, MIN(c) AS n_cms
        FROM probes JOIN counters USING (r, bucket)
        GROUP BY term, n_exact
    """


TEXT_ORACLE["text_cms_token_counts"] = _cms_sql(20, 4, 1024)


TEXT_ORACLE["docs_jsonl_scan"] = f"""
    SELECT doc_id, text, source
    FROM read_json('{DOCS_JSONL}', format='newline_delimited',
      columns={{'doc_id': 'BIGINT', 'text': 'VARCHAR', 'source': 'VARCHAR'}})
"""

# CSV parse fidelity on the same shipped fixture: RFC-4180 quoting
# (embedded commas, doubled quotes), empty trailing field -> NULL,
# and the malformed-doc_id row dropped — all_varchar + try_cast
# mirrors Spark's PERMISSIVE-nulls-then-drop policy exactly.
TEXT_ORACLE["docs_csv_scan"] = f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, text, source
    FROM read_csv('{DOCS_CSV}', header=true, all_varchar=true)
    WHERE try_cast(doc_id AS BIGINT) IS NOT NULL
"""

# ORC round-trip: write the documents table as ORC, re-read, and
# aggregate over every column class (count, text length fold, id
# range) — the oracle computes the same aggregate straight from
# parquet, so a hash match attests the round-trip is lossless.
TEXT_ORACLE["docs_partitioned_roundtrip"] = """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS sum_text_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM documents WHERE source IN ('src3', 'src7') GROUP BY source
"""

TEXT_ORACLE["docs_orc_roundtrip"] = """
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS sum_text_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM documents GROUP BY lang, source
"""


# Schema-evolution merge read: the legacy generation (even doc_ids)
# lacks source/n_chars; the oracle replays the generation boundary by
# doc_id parity on the original table — NULL-column semantics must
# match exactly.
TEXT_ORACLE["docs_schema_evolution"] = """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_legacy,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
             AS sum_n_chars_current
    FROM documents GROUP BY lang
"""


def _q_docs_schema_evolution(spark, sf):
    import os

    from bigclam_apachespark_spark.sources.docs import (
        roundtrip_schema_evolution,
    )

    path = _scratch_path("spark_graft_schema_evo", sf)
    merged = roundtrip_schema_evolution(
        spark.read.parquet(f"{sf}/documents.parquet"), path
    )
    return merged.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("source").isNull().cast("long"))
        .cast("long")
        .alias("n_legacy"),
        F.sum("n_chars").cast("long").alias("sum_n_chars_current"),
    )


def _q_docs_partitioned_roundtrip(spark, sf):
    """Hive-layout sink + PRUNED serving read, oracle-checked: the
    corpus writes partitioned by ``source`` (write_corpus_
    partitioned — the standard training-corpus output layout), and
    the read-back filters two sources, which Spark satisfies from
    PartitionFilters alone — directories for the other 18 sources
    contribute ZERO bytes read (the plan assertion lives in
    tests/test_plans.py::test_partitioned_roundtrip_prunes). The
    oracle computes the same per-source aggregate straight from the
    unpartitioned table: a lost row, a partition-column type flip
    (partition values round-trip as strings), or a wrong directory
    split all hash-mismatch."""
    import os

    from bigclam_apachespark_spark.sources.docs import write_corpus_partitioned

    path = _scratch_path("spark_graft_part_docs", sf)
    write_corpus_partitioned(
        spark.read.parquet(f"{sf}/documents.parquet"), path, by="source"
    )
    back = spark.read.parquet(path).where(
        F.col("source").isin("src3", "src7")
    )
    return back.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("sum_text_chars"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )


def _q_docs_orc_roundtrip(spark, sf):
    import os

    from bigclam_apachespark_spark.sources.docs import roundtrip_orc

    path = _scratch_path("spark_graft_orc_docs", sf)
    back = roundtrip_orc(spark.read.parquet(f"{sf}/documents.parquet"), path)
    return back.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("sum_text_chars"),
        F.sum("n_chars").cast("long").alias("sum_n_chars"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )


def _q_docs_text_scan(spark, sf):
    """Plain-text (<doc_id>\\t<text> lines) round trip: write the
    corpus as splittable raw text, re-read with the bad-line-drop
    parser, and prove losslessness on identity aggregates — format
    coverage alongside JSONL/CSV/ORC/parquet."""
    from bigclam_apachespark_spark.sources.docs import (
        read_documents_text,
        write_documents_text,
    )

    path = _scratch_path("spark_graft_text_docs", sf)
    write_documents_text(spark.read.parquet(f"{sf}/documents.parquet"), path)
    back = read_documents_text(spark, path)
    return back.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
        F.sum(F.length("text")).cast("long").alias("sum_text_chars"),
        F.count_distinct(hash64(normalize_text("text"))).cast("long").alias(
            "n_distinct_texts"
        ),
    )


TEXT_ORACLE["docs_text_scan"] = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(length(text)) AS BIGINT) AS sum_text_chars,
           CAST(COUNT(DISTINCT {hash64_sql(normalize_text_sql('text'))}) AS BIGINT)
             AS n_distinct_texts
    FROM documents
"""


def _q_docs_compaction(spark, sf):
    """Small-file compaction round trip: the corpus is deliberately
    fragmented (repartition(64) → 64 tiny files, the one-file-per-
    upstream-task pathology), then rewritten through the REBALANCE
    compacting sink (AQE coalesces and splits shuffle output toward
    the advisory partition size — the idiomatic small-files fix that
    needs no row count in advance and still splits skew). The query
    returns the per-source identity summary read from the COMPACTED
    copy; the oracle computes it from the source table, so the gate
    proves compaction is a pure layout change — zero rows, chars, or
    ids gained or lost. File-count reduction itself is asserted by
    tests/test_text_dedup.py::test_write_compacted_merges_small_partitions."""
    from bigclam_apachespark_spark.sources import write_compacted

    path = _scratch_path("spark_graft_compact_docs", sf)
    src = spark.read.parquet(f"{sf}/documents.parquet")
    src.repartition(64).write.mode("overwrite").parquet(f"{path}/frag")
    write_compacted(spark.read.parquet(f"{path}/frag"), f"{path}/compact")
    back = spark.read.parquet(f"{path}/compact")
    return back.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
        F.sum(F.length("text")).cast("long").alias("sum_text_chars"),
        F.count_distinct(hash64(normalize_text("text"))).cast("long").alias(
            "n_distinct_texts"
        ),
    )


TEXT_ORACLE["docs_compaction"] = f"""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(length(text)) AS BIGINT) AS sum_text_chars,
           CAST(COUNT(DISTINCT {hash64_sql(normalize_text_sql('text'))}) AS BIGINT)
             AS n_distinct_texts
    FROM documents GROUP BY source
"""


TEXT_QUERIES = {
    "docs_compaction": _q_docs_compaction,
    "docs_text_scan": _q_docs_text_scan,
    "docs_jsonl_scan": lambda spark, sf: read_documents_jsonl(spark, DOCS_JSONL),
    "docs_csv_scan": lambda spark, sf: read_documents_csv(spark, DOCS_CSV),
    "docs_orc_roundtrip": _q_docs_orc_roundtrip,
    "docs_partitioned_roundtrip": _q_docs_partitioned_roundtrip,
    "docs_schema_evolution": _q_docs_schema_evolution,
    "text_token_stats": lambda spark, sf: X.token_stats(_docs(spark, sf)),
    "text_quality": lambda spark, sf: X.quality_score(_docs(spark, sf)),
    "text_lang_id": lambda spark, sf: X.lang_id(_docs(spark, sf)),
    "text_fingerprints": lambda spark, sf: X.fingerprints(_docs(spark, sf)),
    "text_clean_corpus": lambda spark, sf: X.clean_corpus(
        _docs(spark, sf), quality_threshold=0.5, lang="en"
    ),
    "text_salient_terms": lambda spark, sf: X.salient_terms(_docs(spark, sf), k=5),
    "text_vocab_topk": lambda spark, sf: X.vocab_topk(_docs(spark, sf), k=100),
    "text_hash_split": lambda spark, sf: X.hash_split(_docs(spark, sf)),
    "text_source_ledger": lambda spark, sf: X.source_token_ledger(_docs(spark, sf)),
    "text_langid_eval": lambda spark, sf: X.langid_confusion(_docs(spark, sf)),
    "text_balanced_sample": lambda spark, sf: X.balanced_sample(
        _docs(spark, sf), per_group=50
    ),
    "text_chunks": lambda spark, sf: X.chunk_plan(_docs(spark, sf), window=32, stride=24),
    "text_pack_sequences": lambda spark, sf: X.pack_sequences(_docs(spark, sf), budget=256),
    "text_length_quantiles": lambda spark, sf: X.token_length_quantiles(_docs(spark, sf)),
    "text_unigram_logprob": lambda spark, sf: X.unigram_logprob(_docs(spark, sf)),
    "text_dsir_weights": lambda spark, sf: X.dsir_weights(_docs(spark, sf)),
    "text_dsir_sample": lambda spark, sf: X.dsir_sample(_docs(spark, sf), k=64),
    "text_bigram_logprob": lambda spark, sf: X.bigram_logprob(_docs(spark, sf)),
    "text_heldout_perplexity": lambda spark, sf: X.heldout_perplexity(
        _docs(spark, sf)
    ),
    "text_dataset_card": lambda spark, sf: X.dataset_card(_docs(spark, sf)),
    "text_tokenizer_fertility": lambda spark, sf: X.tokenizer_fertility(
        _docs(spark, sf)
    ),
    "text_pmi_topk": lambda spark, sf: X.pmi_topk(
        _docs(spark, sf), window=3, min_count=5, k=20
    ),
    "text_bpe_pair_counts": lambda spark, sf: X.bpe_pair_counts(
        _docs(spark, sf), k=20
    ),
    "text_bpe_merge_step": lambda spark, sf: X.bpe_merge_step(
        _docs(spark, sf), k=20
    ),
    "text_bpe_merge_two_steps": lambda spark, sf: X.bpe_merge_two_steps(
        _docs(spark, sf), k=20
    ),
    "text_freq_spectrum": lambda spark, sf: X.token_frequency_spectrum(
        _docs(spark, sf)
    ),
    "text_span_corruption": lambda spark, sf: X.span_corruption(_docs(spark, sf)),
    "text_cms_token_counts": lambda spark, sf: SK.cms_topk_estimates(
        _docs(spark, sf), k=20, d=4, w=1024
    ),
    "text_split_leakage": lambda spark, sf: _with_handles(
        lambda h: X.split_leakage(
            _docs(spark, sf), near_dup_threshold=0.35, cache_handles=h
        )
    ),
    "text_repetition": lambda spark, sf: X.repetition_signals(_docs(spark, sf)),
    "text_gopher_filter": lambda spark, sf: X.gopher_filter(_docs(spark, sf)),
    "text_mix_sample": lambda spark, sf: X.mix_sample(_docs(spark, sf)),
    "text_feature_hashing": lambda spark, sf: X.feature_hashing(_docs(spark, sf)),
    "text_dup_rate": lambda spark, sf: X.dup_rate_by_source(_docs(spark, sf)),
    "text_pii_scrub": lambda spark, sf: X.pii_scrub(
        _docs(spark, sf).select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.concat(
                        F.lit(" contact user"), F.col("doc_id").cast("string"),
                        F.lit("@example.com at 10.0."),
                        (F.col("doc_id") % 256).cast("string"),
                        F.lit(".1 or call 555-123-"),
                        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
                    ),
                ).otherwise(F.lit("")),
                F.when(
                    F.col("doc_id") % 11 == 0,
                    F.concat(
                        F.lit(" ssn "),
                        (F.lit(100) + F.col("doc_id") % 900).cast("string"),
                        F.lit("-"),
                        (F.lit(10) + F.col("doc_id") % 90).cast("string"),
                        F.lit("-"),
                        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
                        F.lit(" auth sk_"),
                        F.md5(F.col("doc_id").cast("string")),
                    ),
                ).otherwise(F.lit("")).alias("text"),
            ).alias("text"),
        )
    ),
    "text_cap_per_source": lambda spark, sf: X.cap_per_source(_docs(spark, sf), cap=200),
    "text_global_shuffle": lambda spark, sf: X.global_shuffle_order(_docs(spark, sf)),
    "text_bm25_topk": lambda spark, sf: X.bm25_topk(_docs(spark, sf), k=10),
    "text_bpe_encode": lambda spark, sf: X.bpe_encode_corpus(
        _docs(spark, sf), k=30
    ),
    "text_weighted_sample": lambda spark, sf: X.weighted_sample(
        _docs(spark, sf), n=100
    ),
    "text_distribution_drift": lambda spark, sf: X.distribution_drift(
        _docs(spark, sf)
    ),
}


def _drift_block_sql(name: str, flt_a: str, flt_b: str, sfx: str) -> str:
    """One drift comparison's CTE chain + SELECT (decimal/HUGEINT
    cross-multiplied L1, totals folded once)."""
    return f"""
    ca{sfx} AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM dtok
                WHERE {flt_a} GROUP BY t),
    cb{sfx} AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM dtok
                WHERE {flt_b} GROUP BY t),
    j{sfx} AS (
      SELECT COALESCE(a.c, 0) AS ca, COALESCE(b.c, 0) AS cb
      FROM ca{sfx} a FULL JOIN cb{sfx} b USING (t)
    ),
    t{sfx} AS (
      SELECT CAST(SUM(ca) AS HUGEINT) AS na, CAST(SUM(cb) AS HUGEINT) AS nb,
             CAST(COUNT(*) AS BIGINT) AS vocab_union
      FROM j{sfx}
    ),
    r{sfx} AS (
      SELECT '{name}' AS comparison,
             CAST(MIN(t.na) AS BIGINT) AS n_tokens_a,
             CAST(MIN(t.nb) AS BIGINT) AS n_tokens_b,
             MIN(t.vocab_union) AS vocab_union,
             CASE WHEN MIN(t.na) > 0 AND MIN(t.nb) > 0 THEN
               round(CAST(SUM(abs(CAST(j.ca AS HUGEINT) * t.nb
                                  - CAST(j.cb AS HUGEINT) * t.na)) AS DOUBLE)
                     / (CAST(MIN(t.na) AS DOUBLE) * CAST(MIN(t.nb) AS DOUBLE))
                     * 1e6, 6)
             END AS l1_micro
      FROM j{sfx} j CROSS JOIN t{sfx} t
    )"""


TEXT_ORACLE["text_distribution_drift"] = f"""
    WITH dtok AS (
      SELECT d.doc_id, d.lang, unnest({TOKENS}) AS t,
             CAST({hash64_sql("CAST(doc_id AS VARCHAR)")} % 100 AS INT)
               AS bucket
      FROM documents d
    ),
    {_drift_block_sql("train_vs_val", "bucket < 80",
                      "bucket >= 80 AND bucket < 90", "s")},
    {_drift_block_sql("en_vs_rest", "lang = 'en'", "lang <> 'en'", "l")}
    SELECT * FROM rs UNION ALL SELECT * FROM rl
"""

# A-ES twin: same md5 uniform, same pico-integer ln(u)/w key, same
# (key DESC, id) order.
TEXT_ORACLE["text_weighted_sample"] = f"""
    WITH keyed AS (
      SELECT doc_id,
             CAST(len({TOKENS}) + 1 AS BIGINT) AS weight,
             CAST(round(
               ln((CAST(({hash64_sql("CONCAT('ws:', CAST(doc_id AS VARCHAR))")})
                        % 1099511627776 AS DOUBLE) + 1) / 1099511627777.0)
               / CAST(len({TOKENS}) + 1 AS DOUBLE) * 1e12) AS BIGINT) AS key_e12
      FROM documents
    )
    SELECT doc_id, weight, key_e12,
           CAST(row_number() OVER (ORDER BY key_e12 DESC, doc_id) AS INT) AS rank
    FROM keyed
    ORDER BY key_e12 DESC, doc_id LIMIT 100
"""

# BM25 oracle twin: identical nano-integer contribution rounding
# (ln only inside the rounded term), exact int64 score fold, same
# (score DESC, doc_id) integer ranking. Query terms injected from the
# SAME Python constant the operator defaults to, so the two engines
# can never rank different queries.
_BM25_QT = ", ".join(
    f"('{q}', '{t}')" for q, ts in X.BM25_QUERY_TERMS for t in ts
)
TEXT_ORACLE["text_bm25_topk"] = f"""
    WITH tok AS (SELECT doc_id, unnest({TOKENS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    totals AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
    qt(q, term) AS (VALUES {{_BM25_QT}}),
    contrib AS (
      SELECT qt.q, tf.doc_id,
             CAST(round(
               ln(1.0 + (t.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75
                    * CAST(dl.dl * t.n_docs AS DOUBLE)
                    / CAST(t.sum_dl AS DOUBLE)))
               * 1e9) AS BIGINT) AS c_nano
      FROM tf
      JOIN qt USING (term)
      JOIN dfreq d USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN totals t
    ),
    scored AS (
      SELECT q, doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
             CAST(SUM(c_nano) AS BIGINT) AS score_nano
      FROM contrib GROUP BY q, doc_id
    )
    SELECT q, doc_id, CAST(rank AS INT) AS rank, n_terms_hit,
           round(CAST(score_nano AS DOUBLE) / 1e9, 6) AS score
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY q ORDER BY score_nano DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= 10
""".replace("{_BM25_QT}", _BM25_QT)

# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

# Shared CTEs for minhash (16 perms over distinct 5-char shingles).
# Permutations are the affine family over a single md5 per shingle —
# constants generated by the SAME Python helper the Spark side uses
# (functions/hashing.py minhash_perm_constants), so parity cannot
# drift.
from bigclam_apachespark_spark.functions.hashing import (  # noqa: E402
    MINHASH_P,
    minhash_perm_constants,
)

_PERM_VALUES = ", ".join(f"({p}, {a}, {b})" for p, a, b in minhash_perm_constants(16))

def _minhash_sql(src: str = "documents") -> str:
    """MinHash CTE chain over any (doc_id, text) source relation —
    the training-corpus pipeline oracle shingles only the cleaned
    survivor subset, everything else the full table.

    ``sh`` and ``sig`` are MATERIALIZED: DuckDB inlines CTEs by
    default, so the verify chain's three references to ``sh`` (sizes
    + both intersection sides) re-ran the md5 shingle scan three
    times — materializing cut the cluster/pipeline oracles 25 s →
    3 s at sf0.01 (the driver's gate pays these oracle costs too)."""
    return f"""
sh AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct({char_shingles_sql('text', 5)})) AS s
  FROM {src}
),
perms(perm, a, b) AS (SELECT * FROM (VALUES {_PERM_VALUES})),
sh_h AS (
  SELECT doc_id, {hash64_sql('s')} % {MINHASH_P} AS h0 FROM sh
),
sig AS MATERIALIZED (
  SELECT doc_id, perm,
         min((a * h0 + b) % {MINHASH_P}) AS minhash
  FROM sh_h CROSS JOIN perms
  GROUP BY doc_id, perm
)"""


MINHASH_SQL = _minhash_sql()


def _bloom_consts_sql(k: int, sfx: str) -> str:
    """Bloom affine constants as a VALUES CTE — the SAME md5-salted
    (j, a, b) triples sketches.bloom_constants emits, injected
    literally so the two engines hash to identical bit positions."""
    rows = ", ".join(f"({j}, {a}, {b})" for j, a, b in SK.bloom_constants(k))
    return f"bc{sfx}(j, a, b) AS (VALUES {rows})"


def _bloom_block_sql(m_bits: int, k: int, sfx: str) -> str:
    """One Bloom config's CTE chain (suffix-namespaced) + its summary
    SELECT (twin of sketches.bloom_bitmap/bloom_probe/report)."""
    ctes = f"""{_bloom_consts_sql(k, sfx)},
        bpos{sfx} AS (
          SELECT ((c.a * (({hash64_sql('CAST(b.fp AS VARCHAR)')}) % 2147483647)
                   + c.b) % 2147483647) % {m_bits} AS pos
          FROM bench b CROSS JOIN bc{sfx} c
        ),
        bmap{sfx} AS (
          SELECT pos // 32 AS word_idx,
                 CAST(bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS BIGINT) AS bits
          FROM bpos{sfx} GROUP BY 1
        ),
        ppos{sfx} AS (
          SELECT p.doc_id,
                 ((c.a * (({hash64_sql('CAST(p.fp AS VARCHAR)')}) % 2147483647)
                   + c.b) % 2147483647) % {m_bits} AS pos
          FROM probe p CROSS JOIN bc{sfx} c
        ),
        pflag{sfx} AS (
          SELECT pp.doc_id,
                 bool_and((COALESCE(m.bits, 0)
                           & (1::BIGINT << CAST(pp.pos % 32 AS INT))) <> 0) AS b
          FROM ppos{sfx} pp LEFT JOIN bmap{sfx} m ON m.word_idx = pp.pos // 32
          GROUP BY pp.doc_id
        ),
        v{sfx} AS (
          SELECT COALESCE(f.b, FALSE) AS b, COALESCE(x.e, FALSE) AS e
          FROM probe p
          LEFT JOIN pflag{sfx} f USING (doc_id)
          LEFT JOIN pexact x USING (doc_id)
        )"""
    sel = f"""SELECT CAST({m_bits} AS BIGINT) AS m_bits,
               CAST({k} AS BIGINT) AS k_hashes,
               CAST(COUNT(*) AS BIGINT) AS n_probed,
               CAST(SUM(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_hits,
               CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
               CAST(SUM(CASE WHEN b AND NOT e THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_false_positives,
               CAST(SUM(CASE WHEN e AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_missed,
               round(CAST(SUM(CASE WHEN b AND NOT e THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(*) - SUM(CASE WHEN e THEN 1 ELSE 0 END) AS DOUBLE),
                     6) AS false_positive_rate
        FROM v{sfx}"""
    return ctes, sel


def _lsh_verify_ctes(threshold: float) -> str:
    """est → cand2 → sizes → inter → vpairs: the signature-estimate
    prefilter + exact-Jaccard verify chain shared by the pair,
    cluster, and pipeline oracles (assumes sig/cand/sh CTEs in
    scope). The prefilter cut is threshold-scaled through the SAME
    ``prefilter_min_matches`` the Spark side uses (5 at j = 0.35,
    6 at j = 0.5 — miss probability ≤ 1% at the caller's verify
    threshold), so both engines filter identically by construction."""
    min_matches = D.prefilter_min_matches(threshold)
    return f"""est AS (
          SELECT c.a, c.b, COUNT(*) AS n_match
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.a
          JOIN sig sb ON sb.doc_id = c.b AND sb.perm = sa.perm
          WHERE sa.minhash = sb.minhash
          GROUP BY c.a, c.b
        ),
        cand2 AS (SELECT a, b FROM est WHERE n_match >= {min_matches}),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.a, c.b, COUNT(*) AS n_inter
          FROM cand2 c JOIN sh sa ON sa.doc_id = c.a
                       JOIN sh sb ON sb.doc_id = c.b AND sb.s = sa.s
          GROUP BY c.a, c.b
        ),
        vpairs AS (
          SELECT i.a, i.b
          FROM inter i JOIN sizes za ON za.doc_id = i.a
                       JOIN sizes zb ON zb.doc_id = i.b
          WHERE round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) >= {threshold}
        )"""


# Connected components over vpairs as a recursive fixpoint: label =
# MIN reachable id over the symmetrized pair graph (assumes vpairs in
# scope; the enclosing WITH must be RECURSIVE).
_CC_CTES = """csym AS (SELECT a AS u, b AS v FROM vpairs
                 UNION ALL SELECT b, a FROM vpairs),
        reach(u, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM csym)
          UNION
          SELECT s.u, reach.r FROM csym s JOIN reach ON reach.u = s.v
        ),
        lbl AS (SELECT u AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY u)"""

BUCKETS_SQL = f"""
buckets AS (
  SELECT doc_id, CAST(perm // 4 AS INT) AS band,
         {hash64_sql("array_to_string(list(CAST(minhash AS VARCHAR) ORDER BY perm), ',')")} AS bucket
  FROM sig
  GROUP BY doc_id, CAST(perm // 4 AS INT)
)"""

# Hot-bucket cap mirrors dedup.LSH_MAX_BUCKET (r13): buckets larger
# than the cap are excluded from pair generation on BOTH engines.
# Not binding at the verified scales (max bucket 17 at sf0.01, 195
# at sf0.1 — hashes unchanged); at the 10× scale corpus it bounds
# the boilerplate-shingle quadratic term (24.0M → 3.3M candidates).
CAND_SQL = f"""
okb AS (
  SELECT band, bucket FROM buckets
  GROUP BY band, bucket HAVING count(*) <= {D.LSH_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM buckets a
  JOIN okb USING (band, bucket)
  JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
)"""

SIMHASH_SQL = f"""
tok AS (
  SELECT doc_id, {hash64_sql('t')} AS h
  FROM (SELECT doc_id, unnest(list_distinct({tokens_sql('text')})) AS t FROM documents)
),
bits AS (SELECT unnest(generate_series(0, 31)) AS b),
votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM tok CROSS JOIN bits GROUP BY doc_id, b
),
sim AS (
  -- CAST: SUM over BIGINT yields HUGEINT, which pandas/arrow surface
  -- as float64/decimal — the driver's value hash then sees x.0 vs
  -- Spark's LONG x (the r1/r2 dedup_simhash hash-FAIL root cause).
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)"""

def _minhash_named(where: str, sfx: str) -> str:
    """Suffixed minhash+band CTE chain over a filtered documents
    subset (cross-corpus oracle needs TWO independent signature
    pipelines; ``perms`` is shared and must be defined once)."""
    return f"""
sh{sfx} AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct({char_shingles_sql('text', 5)})) AS s
  FROM documents WHERE {where}
),
shh{sfx} AS (
  SELECT doc_id, {hash64_sql('s')} % {MINHASH_P} AS h0 FROM sh{sfx}
),
sig{sfx} AS MATERIALIZED (
  SELECT doc_id, perm, min((a * h0 + b) % {MINHASH_P}) AS minhash
  FROM shh{sfx} CROSS JOIN perms
  GROUP BY doc_id, perm
),
bk{sfx} AS (
  SELECT doc_id, CAST(perm // 4 AS INT) AS band,
         {hash64_sql("array_to_string(list(CAST(minhash AS VARCHAR) ORDER BY perm), ',')")} AS bucket
  FROM sig{sfx}
  GROUP BY doc_id, CAST(perm // 4 AS INT)
)"""


DEDUP_ORACLE = {
    # Exact word-4-gram decontamination: train (doc_id % 10 != 0) vs
    # the benchmark slice (doc_id % 10 = 0); integer-exact shared-gram
    # counts over md5-hashed grams, min_shared = 2 cuts single-gram
    # chance collisions.
    "dedup_ngram_decontam": f"""
        WITH tk AS (SELECT doc_id, {tokens_sql('text')} AS tk FROM documents),
        gr AS (
          SELECT doc_id, {hash64_sql('g')} AS g FROM (
            SELECT doc_id, unnest(list_distinct({word_ngrams_sql('tk', 4)})) AS g
            FROM tk
          )
        ),
        tr AS (SELECT doc_id, g FROM gr WHERE doc_id % 10 != 0),
        be AS (SELECT doc_id AS bench_id, g FROM gr WHERE doc_id % 10 = 0),
        sz AS (SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS sz_b FROM be GROUP BY bench_id),
        sh AS (
          SELECT t.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
          FROM tr t JOIN be b USING (g)
          GROUP BY t.doc_id, b.bench_id
          HAVING COUNT(*) >= 2
        )
        SELECT s.doc_id, s.bench_id, s.n_shared,
               round(CAST(s.n_shared AS DOUBLE) / z.sz_b, 6) AS bench_frac
        FROM sh s JOIN sz z USING (bench_id)
    """,
    # Exact shared-SPAN decontamination: positional 4-gram anchors on
    # matching diagonals (pos_t - pos_b constant) merged by the
    # gaps-and-islands trick; span_tokens = run + k - 1. Integer-exact
    # both engines; mirrors operators/dedup.py ngram_span_decontam.
    # Within-corpus duplicated-span scrubbing: every non-canonical
    # occurrence of a duplicated 8-gram drops its [pos, pos+8)
    # window; survivors rejoin in order. Parallel unnest zips the
    # gram list with its 0-based positions (same trick as the span
    # decontam twin); canonical = ROW_NUMBER 1 over (doc_id, pos).
    "dedup_span_scrub": f"""
        WITH tk AS (SELECT doc_id, {tokens_sql('text')} AS tk FROM documents),
        gr AS (SELECT doc_id, {word_ngrams_sql('tk', 8)} AS grams FROM tk),
        occ0 AS (SELECT doc_id, unnest(range(len(grams))) AS pos,
                        unnest(grams) AS gram FROM gr),
        occ AS (SELECT doc_id, pos, {hash64_sql('gram')} AS g FROM occ0),
        marked AS (
          SELECT doc_id, pos,
                 ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
                 COUNT(*) OVER (PARTITION BY g) AS n
          FROM occ
        ),
        dup AS (SELECT doc_id, pos FROM marked WHERE n >= 2 AND rn > 1),
        drop_pos AS (
          SELECT DISTINCT doc_id, pos + d AS p
          FROM dup CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS d) dd
        ),
        tp0 AS (SELECT doc_id, unnest(range(len(tk))) AS p,
                       unnest(tk) AS tok FROM tk),
        kept AS (
          SELECT t.doc_id, t.p, t.tok FROM tp0 t
          LEFT JOIN drop_pos d ON d.doc_id = t.doc_id AND d.p = t.p
          WHERE d.doc_id IS NULL
        ),
        reb AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens_kept,
                 array_to_string(list(tok ORDER BY p), ' ') AS text_scrubbed
          FROM kept GROUP BY doc_id
        ),
        base AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM tk)
        SELECT b.doc_id, b.n_tokens,
               CAST(COALESCE(r.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
               CAST(b.n_tokens - COALESCE(r.n_tokens_kept, 0) AS BIGINT)
                 AS n_tokens_removed,
               COALESCE(r.text_scrubbed, '') AS text_scrubbed
        FROM base b LEFT JOIN reb r USING (doc_id)
    """,
    "dedup_span_decontam": f"""
        WITH tk_all AS (SELECT doc_id, {tokens_sql('text')} AS tk FROM documents),
        tt AS (SELECT doc_id, {word_ngrams_sql('tk', 4)} AS grams FROM tk_all WHERE doc_id % 10 != 0),
        bt AS (SELECT doc_id, {word_ngrams_sql('tk', 4)} AS grams FROM tk_all WHERE doc_id % 10 = 0),
        tp0 AS (SELECT doc_id, unnest(range(len(grams))) AS pos, unnest(grams) AS gram FROM tt),
        bp0 AS (SELECT doc_id AS bench_id, unnest(range(len(grams))) AS pos_b, unnest(grams) AS gram FROM bt),
        tp AS (SELECT doc_id, pos, {hash64_sql('gram')} AS g FROM tp0),
        bp AS (SELECT bench_id, pos_b, {hash64_sql('gram')} AS g FROM bp0),
        m AS (SELECT t.doc_id, b.bench_id, t.pos - b.pos_b AS diag, t.pos
              FROM tp t JOIN bp b USING (g)),
        runs AS (
          SELECT doc_id, bench_id, COUNT(*) + 3 AS span_tokens
          FROM (SELECT doc_id, bench_id, diag, pos,
                       pos - ROW_NUMBER() OVER (
                         PARTITION BY doc_id, bench_id, diag ORDER BY pos) AS isl
                FROM m)
          GROUP BY doc_id, bench_id, diag, isl
          HAVING COUNT(*) + 3 >= 8
        )
        SELECT doc_id, bench_id, CAST(MAX(span_tokens) AS INT) AS max_span_tokens,
               CAST(COUNT(*) AS INT) AS n_spans
        FROM runs GROUP BY doc_id, bench_id
    """,
    # Cross-corpus decontamination: train (doc_id % 100 != 0) near-
    # dups against the held-out "benchmark" slice (doc_id % 100 = 0);
    # only cross pairs are formed.
    "dedup_cross_corpus": f"""
        WITH perms(perm, a, b) AS (SELECT * FROM (VALUES {_PERM_VALUES})),
        {_minhash_named('doc_id % 100 != 0', 'a').strip()},
        {_minhash_named('doc_id % 100 = 0', 'b').strip()},
        cand AS (
          SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS bench_id
          FROM bka x JOIN bkb y ON x.band = y.band AND x.bucket = y.bucket
        ),
        sizesa AS (SELECT doc_id, COUNT(*) AS sz_a FROM sha GROUP BY doc_id),
        sizesb AS (SELECT doc_id, COUNT(*) AS sz_b FROM shb GROUP BY doc_id),
        inter AS (
          SELECT c.doc_id, c.bench_id, COUNT(*) AS n_inter
          FROM cand c JOIN sha ON sha.doc_id = c.doc_id
                      JOIN shb ON shb.doc_id = c.bench_id AND shb.s = sha.s
          GROUP BY c.doc_id, c.bench_id
        )
        SELECT i.doc_id, i.bench_id,
               round(CAST(n_inter AS DOUBLE) / (za.sz_a + zb.sz_b - n_inter), 6) AS jaccard
        FROM inter i JOIN sizesa za ON za.doc_id = i.doc_id
                     JOIN sizesb zb ON zb.doc_id = i.bench_id
        WHERE round(CAST(n_inter AS DOUBLE) / (za.sz_a + zb.sz_b - n_inter), 6) >= 0.5
    """,
    "dedup_exact": f"""
        SELECT min(doc_id) AS doc_id, content_fp FROM (
          SELECT doc_id, {hash64_sql(normalize_text_sql('text'))} AS content_fp
          FROM documents
        ) GROUP BY content_fp
    """,
    # Bloom decontamination twin: same md5-affine bit positions
    # (salted constants injected literally), 32-bit bit_or words,
    # ALL-k bool_and probe, compared to exact fingerprint membership.
    # Two configs (design-sized + deliberately undersized) — see the
    # operator docstring; n_missed = 0 is the no-false-negatives
    # proof in both.
    "dedup_bloom_decontam": f"""
        WITH fp AS (
          SELECT doc_id, {hash64_sql(normalize_text_sql('text'))} AS fp
          FROM documents
        ),
        bench AS (SELECT doc_id, fp FROM fp WHERE doc_id % 13 = 0),
        probe AS (SELECT doc_id, fp FROM fp WHERE doc_id % 13 <> 0),
        pexact AS (
          SELECT p.doc_id, TRUE AS e FROM probe p
          WHERE p.fp IN (SELECT fp FROM bench)
        ),
        {_bloom_block_sql(65536, 7, "a")[0]},
        {_bloom_block_sql(256, 2, "b")[0]}
        {_bloom_block_sql(65536, 7, "a")[1]}
        UNION ALL
        {_bloom_block_sql(256, 2, "b")[1]}
    """,
    "dedup_minhash_signatures": f"WITH {MINHASH_SQL} SELECT doc_id, CAST(perm AS INT) AS perm, minhash FROM sig",
    "dedup_lsh_buckets": f"WITH {MINHASH_SQL}, {BUCKETS_SQL} SELECT doc_id, band, bucket FROM buckets",
    "dedup_minhash_lsh_pairs": f"""
        WITH {MINHASH_SQL}, {BUCKETS_SQL}, {CAND_SQL},
        -- signature-estimate prefilter, threshold-scaled via the
        -- SAME prefilter_min_matches(0.35) = 5 the Spark side uses
        -- (candidates share a band so 4 matches are guaranteed; one
        -- corroborating perm keeps the boundary miss prob <= 1%),
        -- mirroring operators/dedup.py signature_estimate_filter
        est AS (
          SELECT c.a, c.b, COUNT(*) AS n_match
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.a
          JOIN sig sb ON sb.doc_id = c.b AND sb.perm = sa.perm
          WHERE sa.minhash = sb.minhash
          GROUP BY c.a, c.b
        ),
        cand2 AS (SELECT a, b FROM est WHERE n_match >= {D.prefilter_min_matches(0.35)}),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.a, c.b, COUNT(*) AS n_inter
          FROM cand2 c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b AND sb.s = sa.s
          GROUP BY c.a, c.b
        )
        SELECT i.a, i.b,
               round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) AS jaccard
        FROM inter i JOIN sizes za ON za.doc_id = i.a JOIN sizes zb ON zb.doc_id = i.b
        WHERE round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) >= 0.35
    """,
    "dedup_simhash": f"WITH {SIMHASH_SQL} SELECT doc_id, simhash FROM sim",
    "dedup_simhash_pairs": f"""
        WITH {SIMHASH_SQL},
        blocks AS (
          SELECT doc_id, simhash, blk, (simhash >> (blk * 8)) & 255 AS key
          FROM sim CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS blk)
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
                 bit_count(xor(a.simhash, b.simhash)) AS hamming
          FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.key = b.key
          WHERE a.doc_id < b.doc_id
        )
        SELECT a, b, CAST(hamming AS INT) AS hamming FROM pairs WHERE hamming <= 2
    """,
    # Streaming replay of exact dedup: the watermark-free
    # dropDuplicates stream must emit exactly the distinct
    # fingerprint set the batch computes.
    "dedup_stream_exact": f"""
        SELECT DISTINCT {hash64_sql(normalize_text_sql('text'))} AS content_fp
        FROM documents
    """,
    # Streaming MinHash/LSH twin: the stream's first-occupancy rows
    # are the distinct band-bucket set of the batch LSH banding
    # (which doc occupies first is scheduling; the SET is exact).
    "dedup_stream_minhash": f"""
        WITH {MINHASH_SQL}, {BUCKETS_SQL}
        SELECT DISTINCT band, bucket FROM buckets
    """,
    # Watermarked twin: identical bounded-replay answer (nothing is
    # evicted inside one AvailableNow batch); the state bound is the
    # production property.
    "dedup_stream_minhash_watermark": f"""
        WITH {MINHASH_SQL}, {BUCKETS_SQL}
        SELECT DISTINCT band, bucket FROM buckets
    """,
    # Word-BIGRAM Jaccard: order-sensitive near-dup (a token-shuffled
    # copy keeps unigram Jaccard ~1 but loses its bigrams). Same
    # inverted-index shape as dedup_token_jaccard, WITH the hot-gram
    # df cap live (df ≤ 50): candidate generation from the capped
    # index (Σ df² stays linear in corpus size), exact intersection
    # recount over the FULL gram sets — the 100-TB configuration
    # (this query measured 38 s uncapped at sf0.1 vs 15 s capped,
    # with zero pair loss at either oracle SF).
    "dedup_ngram_jaccard": f"""
        WITH tk AS (SELECT doc_id, {tokens_sql('text')} AS tk FROM documents),
        tok AS (
          SELECT doc_id, unnest(list_distinct({word_ngrams_sql('tk', 2)})) AS t
          FROM tk
        ),
        dfreq AS (SELECT t, COUNT(*) AS df FROM tok GROUP BY t),
        idx AS (
          SELECT tok.doc_id, tok.t FROM tok JOIN dfreq USING (t) WHERE df <= 50
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM idx a JOIN idx b ON a.t = b.t AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
        inter AS (
          SELECT c.a, c.b, COUNT(*) AS n_inter
          FROM cand c
          JOIN tok ta ON ta.doc_id = c.a
          JOIN tok tb ON tb.doc_id = c.b AND tb.t = ta.t
          GROUP BY c.a, c.b
        )
        SELECT i.a, i.b,
               round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) AS jaccard
        FROM inter i JOIN sizes za ON za.doc_id = i.a JOIN sizes zb ON zb.doc_id = i.b
        WHERE round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) >= 0.6
    """,
    # Connected components over the verified LSH pair set + survivor
    # election. The oracle states the fixpoint declaratively (DuckDB
    # recursive CTE: transitive closure of the pair graph, label =
    # MIN reachable id); the Spark side computes the same fixpoint
    # iteratively (min-label propagation + pointer jumping,
    # operators/dedup.py near_dup_clusters). keep = (doc_id ==
    # cluster_id) because min-labels make the survivor the label.
    # Streaming Bloom admission twin: the emitted (admitted) id set
    # equals the batch Bloom verdict — same md5-affine bit chain as
    # dedup_bloom_decontam's undersized config, per-doc instead of
    # summarized. Bounded replay evicts nothing, so stream = batch.
    "dedup_stream_bloom": f"""
        WITH fp AS (
          SELECT doc_id, {hash64_sql(normalize_text_sql('text'))} AS fp
          FROM documents
        ),
        bench AS (SELECT fp FROM fp WHERE doc_id % 13 = 0),
        probe AS (SELECT doc_id, fp FROM fp WHERE doc_id % 13 <> 0),
        {_bloom_consts_sql(2, "s")},
        bpos AS (
          SELECT ((c.a * (({hash64_sql('CAST(b.fp AS VARCHAR)')}) % 2147483647)
                   + c.b) % 2147483647) % 256 AS pos
          FROM bench b CROSS JOIN bcs c
        ),
        bmap AS (
          SELECT pos // 32 AS word_idx,
                 CAST(bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS BIGINT) AS bits
          FROM bpos GROUP BY 1
        ),
        ppos AS (
          SELECT p.doc_id,
                 ((c.a * (({hash64_sql('CAST(p.fp AS VARCHAR)')}) % 2147483647)
                   + c.b) % 2147483647) % 256 AS pos
          FROM probe p CROSS JOIN bcs c
        ),
        verdict AS (
          SELECT pp.doc_id,
                 bool_and((COALESCE(m.bits, 0)
                           & (1::BIGINT << CAST(pp.pos % 32 AS INT))) <> 0) AS allset
          FROM ppos pp LEFT JOIN bmap m ON m.word_idx = pp.pos // 32
          GROUP BY pp.doc_id
        )
        SELECT doc_id FROM verdict WHERE NOT allset
    """,
    "dedup_cluster_survivors": f"""
        WITH RECURSIVE {MINHASH_SQL.strip().lstrip()}, {BUCKETS_SQL.strip()}, {CAND_SQL.strip()},
        {_lsh_verify_ctes(0.35)},
        {_CC_CTES}
        SELECT d.doc_id,
               COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
               CAST(CASE WHEN COALESCE(l.cluster_id, d.doc_id) = d.doc_id
                         THEN 1 ELSE 0 END AS INT) AS keep
        FROM documents d LEFT JOIN lbl l USING (doc_id)
    """,
    # PPJoin oracle = the UNPRUNED all-pairs tau-join: a hash match
    # certifies the prefix filter is lossless, not merely mirrored.
    "dedup_ppjoin": f"""
        WITH tk AS (SELECT doc_id, {tokens_sql('text')} AS tk FROM documents),
        tok AS (
          SELECT doc_id, unnest(list_distinct({word_ngrams_sql('tk', 3)})) AS t
          FROM tk
        ),
        sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
                  FROM tok GROUP BY doc_id),
        inter AS (
          SELECT ta.doc_id AS a, tb.doc_id AS b,
                 CAST(COUNT(*) AS BIGINT) AS inter
          FROM tok ta JOIN tok tb ON ta.t = tb.t AND ta.doc_id < tb.doc_id
          GROUP BY ta.doc_id, tb.doc_id
        )
        SELECT i.a, i.b, i.inter, sa.sz AS sz_a, sb.sz AS sz_b,
               round(CAST(i.inter AS DOUBLE)
                     / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), 6) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.a
        JOIN sizes sb ON sb.doc_id = i.b
        WHERE 2 * i.inter >= 1 * (sa.sz + sb.sz - i.inter)
    """,
    # Containment oracle = the UNPRUNED all-pairs directed join: the
    # hash match certifies the one-sided prefix filter lossless.
    "dedup_containment": f"""
        WITH tk AS (SELECT doc_id, {tokens_sql('text')} AS tk FROM documents),
        tok AS (
          SELECT doc_id, unnest(list_distinct({word_ngrams_sql('tk', 3)})) AS t
          FROM tk
        ),
        sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
                  FROM tok GROUP BY doc_id),
        inter AS (
          SELECT ta.doc_id AS a, tb.doc_id AS b,
                 CAST(COUNT(*) AS BIGINT) AS inter
          FROM tok ta JOIN tok tb
            ON ta.t = tb.t AND ta.doc_id <> tb.doc_id
          GROUP BY ta.doc_id, tb.doc_id
        )
        SELECT i.a, i.b, i.inter, sa.sz AS sz_a, sb.sz AS sz_b,
               round(CAST(i.inter AS DOUBLE) / CAST(sa.sz AS DOUBLE), 6)
                 AS containment
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.a
        JOIN sizes sb ON sb.doc_id = i.b
        WHERE 5 * i.inter >= 4 * sa.sz
    """,
    "dedup_token_jaccard": f"""
        WITH tok AS (
          SELECT doc_id, unnest(list_distinct({tokens_sql('text')})) AS t FROM documents
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS n_inter
          FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT i.a, i.b,
               round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) AS jaccard
        FROM inter i JOIN sizes za ON za.doc_id = i.a JOIN sizes zb ON zb.doc_id = i.b
        WHERE round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) >= 0.8
    """,
}

# End-to-end training-corpus pipeline: clean (quality/lang filter +
# exact dedup) → MinHash-LSH near-dup pairs over the survivors →
# connected-component survivor election → deterministic hash split.
# Every stage is also oracle-checked standalone; this entry pins the
# COMPOSITION (stage wiring, survivor semantics, split stability)
# end-to-end. Registered here (not in the TEXT_ORACLE literal)
# because it composes the minhash/CC fragments defined above.


# ---------------------------------------------------------------------------
# Trained linear classifier (VERDICT r11 ask #7): two unrolled
# full-batch one-vs-rest logistic steps, bit-identical to
# text.classifier_step — zero init, binary hashed features + bias,
# coef = floor((y - sigma)*1e9), grad = SUM(floor(coef*x/8)),
# wv += floor(grad*64/(1000*N)) with the MEAN-gradient update.
# ---------------------------------------------------------------------------


def _clf_step_sql(i: int) -> str:
    return f"""score{i} AS MATERIALIZED (
      SELECT f.doc_id, w.label, CAST(SUM(f.x * w.wv) AS BIGINT) AS dot_int
      FROM cfeats f JOIN cw{i - 1} w ON w.dim = f.dim
      GROUP BY 1, 2
    ),
    coef{i} AS MATERIALIZED (
      SELECT s.doc_id, s.label,
             CAST(FLOOR(((CASE WHEN l.label = s.label THEN 1.0 ELSE 0.0 END)
                - 1.0 / (1.0 + exp(-(CAST(s.dot_int AS DOUBLE) / 8000000.0))))
               * 1000000000.0) AS BIGINT) AS coef
      FROM score{i} s JOIN clabels l ON l.doc_id = s.doc_id
    ),
    grad{i} AS MATERIALIZED (
      SELECT c.label, f.dim,
             CAST(SUM(CAST(FLOOR(CAST(c.coef * f.x AS DOUBLE) / 8.0) AS BIGINT)) AS BIGINT) AS gsum
      FROM coef{i} c JOIN cfeats f ON f.doc_id = c.doc_id
      GROUP BY 1, 2
    ),
    cw{i} AS MATERIALIZED (
      SELECT w.label, w.dim,
             CAST(w.wv + CAST(FLOOR(CAST(COALESCE(g.gsum, 0) * 64 AS DOUBLE)
                                    / (1000.0 * nd.n)) AS BIGINT) AS BIGINT) AS wv
      FROM cw{i - 1} w
      CROSS JOIN ndocs nd
      LEFT JOIN grad{i} g ON g.label = w.label AND g.dim = w.dim
    )"""


_CLF_PRELUDE = f"""tokfeat AS (
  SELECT DISTINCT doc_id, CAST({hash64_sql("term")} % 256 AS INT) AS dim
  FROM (SELECT doc_id, unnest(list_distinct({TOKENS})) AS term FROM documents)
),
cfeats AS MATERIALIZED (
  SELECT doc_id, dim, CAST(1 AS BIGINT) AS x FROM tokfeat
  UNION ALL
  SELECT doc_id, CAST(256 AS INT), CAST(1 AS BIGINT) FROM documents
),
cclasses AS MATERIALIZED (
  SELECT label, CAST(ROW_NUMBER() OVER (ORDER BY label) - 1 AS INT) AS ord
  FROM (SELECT DISTINCT lang AS label FROM documents)
),
clabels AS MATERIALIZED (SELECT doc_id, lang AS label FROM documents),
ndocs AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
cbias AS MATERIALIZED (
  SELECT label,
         CAST(FLOOR(ln(CAST(COUNT(*) AS DOUBLE)
                       / CAST(nd.n - COUNT(*) AS DOUBLE)) * 8000000.0)
              AS BIGINT) AS bias_wv
  FROM clabels CROSS JOIN ndocs nd GROUP BY label, nd.n
),
cw0 AS MATERIALIZED (
  SELECT c.label, CAST(d.dim AS INT) AS dim,
         CASE WHEN d.dim = 256 THEN b.bias_wv ELSE CAST(0 AS BIGINT) END AS wv
  FROM cclasses c
  CROSS JOIN (SELECT unnest(generate_series(0, 256)) AS dim) d
  JOIN cbias b ON b.label = c.label
)"""

TEXT_ORACLE["text_classifier_step"] = f"""
    WITH {_CLF_PRELUDE},
    {_clf_step_sql(1)},
    {_clf_step_sql(2)}
    SELECT label, dim, wv FROM cw2
"""


def _q_classifier_step(spark, sf):
    """Two unrolled quantized logistic steps over the documents
    corpus labeled by ``lang`` → the (label, dim, wv) weight table —
    the trained-classifier analog of text_word2vec_step's fixed-step
    contract (hash-checked against the DuckDB unroll)."""
    return X.classifier_step(_docs(spark, sf), steps=2, label_col="lang")


def _q_classifier_eval(spark, sf):
    """Trained-vs-baseline held-out eval on the corpus ``lang``
    labels (rows-only: plateau-stop driver loop) → ONE row. HONESTY
    NOTE, measured: this fixture's lang labels are statistically
    independent of the text (chi-square 130 at 120 dof over the
    lang × token contingency at sf0.1 — p ≈ 0.25), so NO classifier
    can beat the majority prior here; the correct trained outcome is
    prior-parity, which the prior-logit init reaches in 1-3 steps.
    The gate therefore pins convergence and prior-parity (trained
    within 5 of the prior baseline, both directions observed ±0 in
    calibration) — the learnability certificate for the SAME trainer
    on a signal-bearing target is text_classifier_distill. The
    stopword-heuristic lang_id is NOT a column here because on this
    vocab it reduces to the same majority call (only 'the'/'a' from
    its lists occur)."""
    row = X.classifier_eval(_docs(spark, sf), label_col="lang")
    ok = (
        F.col("converged")
        & (F.col("n_eval") > 0)
        & (F.col("n_trained_ok") >= F.col("n_prior_ok") - 5)
    )
    return row.where(
        F.when(ok, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("classifier_eval invariant violated: converged="),
                    F.col("converged").cast("string"),
                    F.lit(" trained="),
                    F.col("n_trained_ok").cast("string"),
                    F.lit(" prior="),
                    F.col("n_prior_ok").cast("string"),
                )
            )
        )
    )


def _q_classifier_distill(spark, sf):
    """Heuristic-distillation learnability certificate (rows-only:
    plateau-stop driver loop) → ONE row: train the SAME quantized
    logistic trainer on labels produced by the lang_id stopword
    heuristic — a target that IS a function of the text — and gate
    that the trained model beats the majority-prior baseline on the
    held-out 20% STRICTLY (measured at the registry lr/plateau: 89 vs
    85 of 92 at sf0.01, 89 vs 86 at sf0.001, 968 vs 895 of 969 at
    sf0.1; train accuracy 0.99+ at the plateau). This is the
    CCNet/fastText industry pattern (distill a rule-based filter into
    a cheap hashed-linear model) and the proof the trainer learns
    when there is something to learn — the complement of
    text_classifier_eval's honest no-signal row."""
    docs = _docs(spark, sf)
    heur = X.lang_id(docs).select("doc_id", "lang_pred")
    ddocs = docs.join(heur, "doc_id")
    # lr 96 / plateau 0.05: calibrated so the plateau fires in 68-93
    # steps with the held-out margin intact (sf0.01: 89 vs 85 of 92;
    # sf0.001: 89 vs 86; sf0.1: 968 vs 895 of 969) — lr 128 is past
    # the stability edge at sf0.01 (stops at step 2, margin 0).
    row = X.classifier_eval(
        ddocs, label_col="lang_pred", plateau_frac=0.05, lr_num=96
    )
    ok = (
        F.col("converged")
        & (F.col("n_trained_ok") > F.col("n_prior_ok"))
        & (F.col("improvement_ppm") > 0)
    )
    return row.where(
        F.when(ok, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("classifier_distill invariant violated: converged="),
                    F.col("converged").cast("string"),
                    F.lit(" trained="),
                    F.col("n_trained_ok").cast("string"),
                    F.lit(" prior="),
                    F.col("n_prior_ok").cast("string"),
                )
            )
        )
    )


TEXT_QUERIES["text_classifier_step"] = _q_classifier_step
TEXT_QUERIES["text_classifier_eval"] = _q_classifier_eval
TEXT_QUERIES["text_classifier_distill"] = _q_classifier_distill


def _q_classifier_filter(spark, sf):
    """Model APPLICATION as a pipeline stage → per-doc
    ``(doc_id, lang, label_pred, match)``: score every document with
    the deterministic 2-step-trained classifier (broadcast weight
    table joined on the constant dim space — the corpus never
    shuffles for inference) and argmax by exact integer score, ties
    to the lowest class ordinal. The selection-stage shape a trained
    quality/lang filter runs at 100 TB: one narrow feature explode +
    one broadcast join + one max_by hash agg per doc."""
    docs = _docs(spark, sf)
    w = X.classifier_step(docs, steps=2, label_col="lang")
    labels = docs.select("doc_id", F.col("lang").alias("label"))
    classes = X.classifier_classes(labels)
    pred = X.classifier_predict(X.classifier_features(docs), w, classes)
    return pred.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "lang",
        "label_pred",
        (F.col("label_pred") == F.col("lang")).alias("match"),
    )


TEXT_ORACLE["text_classifier_filter"] = f"""
    WITH {_CLF_PRELUDE},
    {_clf_step_sql(1)},
    {_clf_step_sql(2)},
    fscore AS MATERIALIZED (
      SELECT f.doc_id, w.label, CAST(SUM(f.x * w.wv) AS BIGINT) AS dot_int
      FROM cfeats f JOIN cw2 w ON w.dim = f.dim
      GROUP BY 1, 2
    ),
    pred AS (
      SELECT doc_id, label AS label_pred FROM (
        SELECT s.doc_id, s.label,
               ROW_NUMBER() OVER (PARTITION BY s.doc_id
                                  ORDER BY s.dot_int DESC, c.ord) AS rn
        FROM fscore s JOIN cclasses c ON c.label = s.label
      ) WHERE rn = 1
    )
    SELECT d.doc_id, d.lang, p.label_pred, (p.label_pred = d.lang) AS match
    FROM documents d JOIN pred p ON p.doc_id = d.doc_id
"""

TEXT_QUERIES["text_classifier_filter"] = _q_classifier_filter


def _q_classifier_calibration(spark, sf):
    """Reliability diagram of the 2-step-trained model as exact
    integer counts per predicted-probability decile — the standard
    trained-model calibration eval, cross-engine exact because σ is
    floored to micro-units BEFORE bucketing and only counts/integer
    sums are reported."""
    docs = _docs(spark, sf)
    w = X.classifier_step(docs, steps=2, label_col="lang")
    labels = docs.select("doc_id", F.col("lang").alias("label"))
    classes = X.classifier_classes(labels)
    return X.classifier_calibration(
        X.classifier_features(docs), labels, w, classes
    )


TEXT_ORACLE["text_classifier_calibration"] = f"""
    WITH {_CLF_PRELUDE},
    {_clf_step_sql(1)},
    {_clf_step_sql(2)},
    fscore AS MATERIALIZED (
      SELECT f.doc_id, w.label, CAST(SUM(f.x * w.wv) AS BIGINT) AS dot_int
      FROM cfeats f JOIN cw2 w ON w.dim = f.dim
      GROUP BY 1, 2
    ),
    sig AS (
      SELECT s.doc_id, s.label,
             CAST(FLOOR((1.0
               / (1.0 + exp(-(CAST(s.dot_int AS DOUBLE) / 8000000.0))))
               * 1000000.0) AS BIGINT) AS s_micro,
             CASE WHEN l.label = s.label THEN 1 ELSE 0 END AS y
      FROM fscore s JOIN clabels l ON l.doc_id = s.doc_id
    )
    SELECT CAST(LEAST(CAST(FLOOR(CAST(s_micro * 10 AS DOUBLE) / 1000000.0)
                           AS BIGINT), 9) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(s_micro) AS BIGINT) AS sum_sigma_micro
    FROM sig GROUP BY 1
"""

TEXT_QUERIES["text_classifier_calibration"] = _q_classifier_calibration


def _q_classifier_threshold(spark, sf):
    """Calibrate → choose the F1-max decile threshold → filter, in
    one plan (VERDICT r12 ask #5): the 2-step-trained model's
    (doc, class) σ scores are decile-bucketed, each bucket's lower
    edge is scored as a candidate threshold by exact-integer F1
    (f1_ppm, one floored division; ties to the higher-precision
    edge), and the winning cutoff is applied as the selection stage —
    per selected doc, its best passing class. The champion threshold
    and its f1_ppm ride along as constant columns, so the oracle
    hash pins the CHOICE as well as the application."""
    docs = _docs(spark, sf)
    w = X.classifier_step(docs, steps=2, label_col="lang")
    labels = docs.select("doc_id", F.col("lang").alias("label"))
    classes = X.classifier_classes(labels)
    return X.classifier_threshold_select(
        X.classifier_features(docs), labels, w, classes
    )


TEXT_ORACLE["text_classifier_threshold"] = f"""
    WITH {_CLF_PRELUDE},
    {_clf_step_sql(1)},
    {_clf_step_sql(2)},
    fscore AS MATERIALIZED (
      SELECT f.doc_id, w.label, CAST(SUM(f.x * w.wv) AS BIGINT) AS dot_int
      FROM cfeats f JOIN cw2 w ON w.dim = f.dim
      GROUP BY 1, 2
    ),
    sig AS MATERIALIZED (
      SELECT s.doc_id, s.label, c.ord,
             CAST(FLOOR((1.0
               / (1.0 + exp(-(CAST(s.dot_int AS DOUBLE) / 8000000.0))))
               * 1000000.0) AS BIGINT) AS s_micro,
             CASE WHEN l.label = s.label THEN 1 ELSE 0 END AS y
      FROM fscore s
      JOIN clabels l ON l.doc_id = s.doc_id
      JOIN cclasses c ON c.label = s.label
    ),
    cal AS (
      SELECT CAST(LEAST(CAST(FLOOR(CAST(s_micro * 10 AS DOUBLE) / 1000000.0)
                             AS BIGINT), 9) AS BIGINT) AS bucket,
             COUNT(*) AS n_pairs, SUM(y) AS n_pos
      FROM sig GROUP BY 1
    ),
    tot AS (SELECT SUM(y) AS t_pos FROM sig),
    cand AS (
      SELECT bucket,
             CAST(FLOOR(CAST(2000000 * SUM(n_pos) OVER w AS DOUBLE)
                        / (SUM(n_pairs) OVER w + t.t_pos)) AS BIGINT) AS f1_ppm
      FROM cal CROSS JOIN tot t
      WINDOW w AS (ORDER BY bucket DESC ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    thr AS (
      SELECT CAST(bucket * 100000 AS BIGINT) AS thr_micro, f1_ppm
      FROM cand ORDER BY f1_ppm DESC, bucket DESC LIMIT 1
    ),
    sel AS (
      SELECT s.doc_id, s.label, s.ord, s.s_micro, t.thr_micro, t.f1_ppm
      FROM sig s CROSS JOIN thr t
      WHERE s.s_micro >= t.thr_micro
    )
    SELECT doc_id, label AS label_sel, s_micro, thr_micro, f1_ppm
    FROM (
      SELECT doc_id, label, s_micro, thr_micro, f1_ppm,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY s_micro DESC, ord) AS rn
      FROM sel
    ) WHERE rn = 1
"""

TEXT_QUERIES["text_classifier_threshold"] = _q_classifier_threshold


TEXT_ORACLE["text_training_corpus"] = f"""
    WITH RECURSIVE {_clean_ctes(0.5, 'en')},
    cdocs AS (
      SELECT d.doc_id, d.text FROM documents d
      WHERE d.doc_id IN (SELECT doc_id FROM keep0)
    ),
    {_minhash_sql('cdocs').strip().lstrip()}, {BUCKETS_SQL.strip()}, {CAND_SQL.strip()},
    {_lsh_verify_ctes(0.35)},
    {_CC_CTES},
    final AS (
      SELECT k.doc_id, k.content_fp, k.quality
      FROM keep0 k LEFT JOIN lbl l USING (doc_id)
      WHERE COALESCE(l.cluster_id, k.doc_id) = k.doc_id
    )
    SELECT doc_id, content_fp, quality,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT *, CAST({hash64_sql("CAST(doc_id AS VARCHAR)")} % 100 AS INT) AS bucket
      FROM final
    )
"""
TEXT_QUERIES["text_training_corpus"] = lambda spark, sf: _with_handles(
    lambda h: X.training_corpus(
        _docs(spark, sf), quality_threshold=0.5, lang="en",
        near_dup_threshold=0.35, cache_handles=h,
    )
)

# Contamination report: near-dup pairs straddling split boundaries
# (composes the minhash verify chain with the hash-split assignment).
# Reuses the SHARED minhash + verify fragments (the est/cand2/sizes/
# inter chain lives in _lsh_verify_ctes, same as the pair/cluster/
# pipeline oracles) — only the jaccard-select tail and the split
# assignment are specific to this query, so a change to the shared
# chain (prefilter constant, MATERIALIZED hints) cannot drift here.
TEXT_ORACLE["text_split_leakage"] = f"""
    WITH {MINHASH_SQL.strip().lstrip()}, {BUCKETS_SQL.strip()}, {CAND_SQL.strip()},
    {_lsh_verify_ctes(0.35)},
    jp AS (
      SELECT i.a, i.b,
             round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) AS jaccard
      FROM inter i JOIN sizes za ON za.doc_id = i.a
                   JOIN sizes zb ON zb.doc_id = i.b
      WHERE round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) >= 0.35
    ),
    sp AS (
      SELECT doc_id,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id,
                   CAST({hash64_sql("CAST(doc_id AS VARCHAR)")} % 100 AS INT) AS bucket
            FROM documents)
    )
    SELECT jp.a, jp.b, jp.jaccard, pa.split AS split_a, pb.split AS split_b
    FROM jp JOIN sp pa ON pa.doc_id = jp.a JOIN sp pb ON pb.doc_id = jp.b
    WHERE pa.split <> pb.split
"""


# Contamination REPAIR: leaked eval docs pulled INTO train; everyone
# else keeps the hash-split assignment. Composes the SAME leak-pair
# chain as text_split_leakage, so the two can't drift apart.
TEXT_ORACLE["text_split_repair"] = f"""
    WITH {MINHASH_SQL.strip().lstrip()}, {BUCKETS_SQL.strip()}, {CAND_SQL.strip()},
    {_lsh_verify_ctes(0.35)},
    jp AS (
      SELECT i.a, i.b
      FROM inter i JOIN sizes za ON za.doc_id = i.a
                   JOIN sizes zb ON zb.doc_id = i.b
      WHERE round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) >= 0.35
    ),
    sp AS (
      SELECT doc_id, bucket,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id,
                   CAST({hash64_sql("CAST(doc_id AS VARCHAR)")} % 100 AS INT) AS bucket
            FROM documents)
    ),
    pulled AS (
      SELECT DISTINCT CASE WHEN pa.split = 'train' THEN jp.b ELSE jp.a END AS doc_id
      FROM jp JOIN sp pa ON pa.doc_id = jp.a JOIN sp pb ON pb.doc_id = jp.b
      WHERE pa.split <> pb.split
        AND (pa.split = 'train' OR pb.split = 'train')
    )
    SELECT s.doc_id, s.bucket,
           CASE WHEN p.doc_id IS NOT NULL THEN 'train' ELSE s.split END AS split
    FROM sp s LEFT JOIN pulled p USING (doc_id)
"""
TEXT_QUERIES["text_split_repair"] = lambda spark, sf: _with_handles(
    lambda h: X.split_repair(
        _docs(spark, sf), near_dup_threshold=0.35, cache_handles=h
    )
)


def _q_dedup_stream_bloom(spark, sf):
    """Streaming Bloom admission replay: the benchmark cohort
    (doc_id % 13 = 0) builds the filter batch-side (m/32-word dense
    collect — bounded by construction); the full stream probes it as
    a plan-literal narrow filter, and the appended admitted ids must
    equal the batch Bloom verdict — emitted set = every probed doc
    with at least one unset bit position, which the oracle computes
    with the identical md5-affine chain. Deliberately undersized
    (m=2⁸, k=2) so false-positive REJECTIONS demonstrably occur and
    the oracle proves the stream reproduces them exactly."""
    from bigclam_apachespark_spark.operators.sketches import bloom_bitmap
    from bigclam_apachespark_spark.streaming import (
        bloom_decontam_stream,
        dense_bloom_words,
        read_documents_stream,
        run_stream_to_memory,
    )

    m_bits, k = 1 << 8, 2
    bench = (
        _docs(spark, sf)
        .where(F.col("doc_id") % 13 == 0)
        .select(
            hash64(normalize_text("text")).cast("string").alias("key")
        )
    )
    words = dense_bloom_words(bloom_bitmap(bench, "key", m_bits, k), m_bits)
    stream = read_documents_stream(spark, f"{sf}/documents.parquet")
    admitted = bloom_decontam_stream(
        stream.where(F.col("doc_id") % 13 != 0), words, m_bits=m_bits, k=k
    )
    return run_stream_to_memory(
        admitted, "dedup_stream_bloom_sink", "append", strict=True
    )


def _q_dedup_stream(spark, sf):
    from bigclam_apachespark_spark.streaming import (
        dedup_stream,
        read_documents_stream,
        run_stream_to_memory,
    )

    stream = read_documents_stream(spark, f"{sf}/documents.parquet")
    return run_stream_to_memory(
        dedup_stream(stream), "dedup_stream_exact_sink", "append", strict=True
    )


def _q_dedup_stream_minhash(spark, sf):
    """Streaming MinHash/LSH bucket-occupancy replay: the appended
    first-occupancy rows across all micro-batches must equal the
    batch DISTINCT (band, bucket) set — the bounded-replay oracle
    stated exactly like dedup_stream_exact's."""
    from bigclam_apachespark_spark.streaming import (
        minhash_band_stream,
        read_documents_stream,
        run_stream_to_memory,
    )

    stream = read_documents_stream(spark, f"{sf}/documents.parquet")
    return run_stream_to_memory(
        minhash_band_stream(stream), "dedup_stream_minhash_sink", "append", strict=True
    )


def _q_dedup_stream_minhash_watermark(spark, sf):
    """Watermark-bounded streaming near-dup replay: on the bounded
    AvailableNow replay nothing is evicted, so the emitted set equals
    the batch DISTINCT (band, bucket) — same oracle as the unbounded
    twin; what this row additionally verifies is that the event-time
    staging + dropDuplicatesWithinWatermark path emits the identical
    set (the state BOUND is the production property, covered by the
    operator docstring and tests)."""
    from bigclam_apachespark_spark.streaming import (
        minhash_band_stream_watermark,
        read_documents_stream,
        run_stream_to_memory,
        with_arrival_time,
    )

    stream = with_arrival_time(
        read_documents_stream(spark, f"{sf}/documents.parquet")
    )
    return run_stream_to_memory(
        minhash_band_stream_watermark(stream),
        "dedup_stream_minhash_wm_sink",
        "append",
        strict=True,
    )


def _with_handles(make):
    """Run ``make(handles)`` and attach the operator's internal cache
    handles to the returned DataFrame as ``_cache_handles`` — gate
    runners (scripts/check_correctness.py, bench.py) unpersist them
    after collecting, so back-to-back registry sweeps release caches
    deterministically instead of leaning on LRU eviction."""
    handles: list = []
    df = make(handles)
    df._cache_handles = handles
    return df


DEDUP_QUERIES = {
    "dedup_ngram_decontam": lambda spark, sf: D.ngram_decontamination(
        _docs(spark, sf).where("doc_id % 10 != 0"),
        _docs(spark, sf).where("doc_id % 10 = 0"),
        n=4,
        min_shared=2,
    ),
    "dedup_cross_corpus": lambda spark, sf: D.cross_corpus_contamination(
        _docs(spark, sf).where("doc_id % 100 != 0"),
        _docs(spark, sf).where("doc_id % 100 = 0"),
        threshold=0.5,
    ),
    "dedup_span_decontam": lambda spark, sf: D.ngram_span_decontam(
        _docs(spark, sf).where("doc_id % 10 != 0"),
        _docs(spark, sf).where("doc_id % 10 = 0"),
        k=4,
        min_span_tokens=8,
    ),
    "dedup_span_scrub": lambda spark, sf: D.scrub_duplicate_spans(
        _docs(spark, sf), k=8
    ),
    "dedup_exact": lambda spark, sf: D.exact_dedup(_docs(spark, sf)),
    "dedup_bloom_decontam": lambda spark, sf: (
        SK.bloom_decontam_report(_docs(spark, sf), m_bits=1 << 16, k=7)
        .select(
            F.lit(65536).cast("long").alias("m_bits"),
            F.lit(7).cast("long").alias("k_hashes"),
            "*",
        )
        .unionByName(
            SK.bloom_decontam_report(_docs(spark, sf), m_bits=1 << 8, k=2).select(
                F.lit(256).cast("long").alias("m_bits"),
                F.lit(2).cast("long").alias("k_hashes"),
                "*",
            )
        )
    ),
    "dedup_ppjoin": lambda spark, sf: D.ppjoin_pairs(
        _docs(spark, sf), threshold_num=1, threshold_den=2, ngram=3
    ),
    "dedup_containment": lambda spark, sf: D.containment_pairs(
        _docs(spark, sf), threshold_num=4, threshold_den=5, ngram=3
    ),
    "dedup_stream_bloom": _q_dedup_stream_bloom,
    "dedup_stream_exact": _q_dedup_stream,
    "dedup_stream_minhash": _q_dedup_stream_minhash,
    "dedup_stream_minhash_watermark": _q_dedup_stream_minhash_watermark,
    "dedup_minhash_signatures": lambda spark, sf: D.minhash_signatures(_docs(spark, sf)),
    "dedup_lsh_buckets": lambda spark, sf: D.lsh_buckets(D.minhash_signatures(_docs(spark, sf))),
    "dedup_minhash_lsh_pairs": lambda spark, sf: _with_handles(
        lambda h: D.minhash_lsh_dups(_docs(spark, sf), threshold=0.35, cache_handles=h)
    ),
    "dedup_simhash": lambda spark, sf: D.simhash(_docs(spark, sf)),
    "dedup_simhash_pairs": lambda spark, sf: D.simhash_near_dups(_docs(spark, sf), max_hamming=2),
    "dedup_cluster_survivors": lambda spark, sf: _with_handles(
        lambda h: D.cluster_survivors(
            _docs(spark, sf),
            D.minhash_lsh_dups(_docs(spark, sf), threshold=0.35, cache_handles=h),
        )
    ),
    "dedup_token_jaccard": lambda spark, sf: D.token_jaccard_pairs(_docs(spark, sf), threshold=0.8),
    "dedup_ngram_jaccard": lambda spark, sf: D.token_jaccard_pairs(
        _docs(spark, sf), threshold=0.6, ngram=2, max_df=50
    ),
}

# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def _queries_subset(spark, sf):
    return _emb(spark, sf).where(F.col("vec_id") < 10)


def _q_ivf_topk_persisted(spark, sf):
    """The IVF SERVING path, oracle-checked: build + persist the
    cell-partitioned index (write_ivf_index), then answer the same
    query batch from the persisted index with dynamic partition
    pruning on the probed cells. Results are identical to the inline
    sim_ivf_topk by construction, so the oracle SQL is shared — what
    this row additionally verifies is the round trip through the
    partitioned parquet layout."""
    import os

    from bigclam_apachespark_spark.operators import similarity as S

    path = _scratch_path("spark_graft_ivf_index", sf)
    S.write_ivf_index(_emb(spark, sf), path, n_cells=16)
    return S.ivf_topk_persisted(
        spark, path, _queries_subset(spark, sf), k=5, nprobe=4
    )


def _q_ivf_index_upsert(spark, sf):
    """Incremental index maintenance, oracle-checked end to end: the
    index is BUILT from the base corpus (vec_id % 10 != 0 — centroids
    sampled from base only), then the remaining 10% arrives as a
    delta and is UPSERTED via ``append_ivf_index`` (assign against
    the frozen centroids, append into the cell partitions; existing
    files untouched). Serving then answers the standard query batch
    from the merged index. The oracle restates exactly that
    composition — centroids from the base subset, assignment over
    the FULL corpus — so a wrong append (lost delta rows, moved
    centroids, re-assigned base vectors) hash-mismatches. This is
    the O(delta)-not-O(corpus) daily-ingest path an embedding index
    needs at 100 TB."""
    from bigclam_apachespark_spark.operators import similarity as S

    emb = _emb(spark, sf)
    base = emb.where(F.col("vec_id") % 10 != 0)
    delta = emb.where(F.col("vec_id") % 10 == 0)
    path = _scratch_path("spark_graft_ivf_upsert", sf)
    S.write_ivf_index(base, path, n_cells=16)
    S.append_ivf_index(spark, delta, path)
    return S.ivf_topk_persisted(
        spark, path, _queries_subset(spark, sf), k=5, nprobe=4
    )


def _q_ivfpq_topk(spark, sf):
    """The IVF-PQ SERVING path, oracle-checked: build + persist the
    compressed cell-partitioned index (write_ivfpq_index), then
    answer the query batch from it — probed-cell partition pruning
    over m-code packed rows. Results are identical to the inline
    ivfpq_topk by construction, so the oracle verifies BOTH the
    composition arithmetic and the packed-parquet round trip."""
    import os

    from bigclam_apachespark_spark.operators import similarity as S

    path = _scratch_path("spark_graft_ivfpq_index", sf)
    S.write_ivfpq_index(_emb(spark, sf), path, n_cells=16, m=16, ksub=64)
    return S.ivfpq_topk_persisted(
        spark, path, _queries_subset(spark, sf), k=5, nprobe=4, m=16
    )


def _planes_sql(n_planes: int, dim: int = 64, seed: int = 42) -> str:
    """Hyperplane literals as a DuckDB CTE (plane, qvec) — the SAME
    integer micro-unit components the Spark side uses
    (similarity._hyperplane_q), so the sign test is exact on both."""
    rows = []
    for p in range(n_planes):
        vec = S._hyperplane_q(dim, p, seed)
        rows.append(f"({p}, [{', '.join(str(v) for v in vec)}]::BIGINT[])")
    return "planes(plane, qvec) AS (VALUES " + ", ".join(rows) + ")"


def _planes_multi_sql(n_planes: int, n_tables: int, dim: int = 64, seed: int = 42) -> str:
    """(tbl, plane, qvec) hyperplane literals for the multi-table LSH
    oracle — same seed-disjoint plane sets as
    similarity._multi_bucket_expr (seed + 1000·t)."""
    rows = []
    for t in range(n_tables):
        for p in range(n_planes):
            vec = S._hyperplane_q(dim, p, seed + 1000 * t)
            rows.append(f"({t}, {p}, [{', '.join(str(v) for v in vec)}]::BIGINT[])")
    return "planes_m(tbl, plane, qvec) AS (VALUES " + ", ".join(rows) + ")"


def _jl_proj_sql(k_dim: int = 16, dim: int = 64, seed: int = 7) -> str:
    """JL projection as a DuckDB CTE (vec_id, pqv, pnrm) — the SAME
    sparse ±1 literals as similarity._jl_signs, all-integer sums, so
    the projected vectors are bit-identical. Quantization happens
    per referenced element (round(x·10⁶), the _qvec rule) exactly
    as on the Spark side."""
    comps = []
    for row in S._jl_signs(k_dim, dim, seed):
        terms = [
            f"{'+' if s > 0 else '-'} qv[{d + 1}]"
            for d, s in enumerate(row)
            if s
        ]
        comps.append(
            "CAST(0 AS BIGINT) " + " ".join(terms) if terms else "CAST(0 AS BIGINT)"
        )
    arr = "[" + ", ".join(f"({c})" for c in comps) + "]"
    return f"""pemb AS (
  SELECT vec_id, {arr} AS pqv FROM emb
),
pembn AS (
  SELECT vec_id, pqv,
         sqrt(CAST(list_sum([v * v for v in pqv]) AS DOUBLE)) AS pnrm
  FROM pemb
)"""


def _dotq_sql(a: str, b: str) -> str:
    """Exact integer dot of two quantized BIGINT lists (DuckDB twin of
    similarity._dot_long)."""
    return f"list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i]))"


def _cosq_sql(aq: str, an: str, bq: str, bn: str) -> str:
    """Cosine from quantized vectors + precomputed norms — every op
    from exact integers (dot < 2^53, so the DOUBLE cast is exact),
    bit-identical to the Spark side."""
    return f"(CAST({_dotq_sql(aq, bq)} AS DOUBLE) / ({an} * {bn}))"


# Quantized embeddings (twin of similarity.quantized): micro-unit
# BIGINT vectors + the L2 norm derived from the exact self-dot.
# round(x·10⁶) is a single IEEE multiply+round of the same double on
# both engines → identical integers; no float ever reaches a discrete
# decision (sign bit, argmax, threshold) downstream.
EMB_SQL = """emb0 AS (
  SELECT vec_id,
         [CAST(round(x * 1000000.0) AS BIGINT) for x in embedding::DOUBLE[]] AS qv
  FROM embeddings
),
emb AS (
  SELECT vec_id, qv,
         sqrt(CAST(list_sum([v * v for v in qv]) AS DOUBLE)) AS nrm
  FROM emb0
)"""

_PAIR_COS = _cosq_sql("ea.qv", "ea.nrm", "eb.qv", "eb.nrm")

# CAST(... AS BIGINT): SUM over integers yields HUGEINT in DuckDB,
# which pandas/arrow surface as float64/decimal — the driver's value
# hash then sees 3.0 vs Spark's 3. Every integer aggregate that
# REACHES AN OUTPUT COLUMN must be cast back to BIGINT.
BUCKETS64_SQL = f"""
vb AS (
  SELECT e.vec_id,
         CAST(SUM(CASE WHEN {_dotq_sql('e.qv', 'p.qvec')} > 0
                  THEN (1::BIGINT << p.plane) ELSE 0 END) AS BIGINT) AS bucket
  FROM emb e CROSS JOIN planes p
  GROUP BY e.vec_id
)"""

# IVF fragments: deterministic md5-sample centroids → nearest-cell
# assignment → nprobe probing. Constants (16 cells, 4 probes, top-5,
# queries vec_id < 10) mirror SIM_QUERIES["sim_ivf_topk"].
_IVF_COS_EC = f"round({_cosq_sql('e.qv', 'e.nrm', 'c.cqv', 'c.cnrm')}, 6)"

IVF_SQL = f"""
keyed AS (
  SELECT vec_id, qv, nrm, {hash64_sql('CAST(vec_id AS VARCHAR)')} AS skey FROM emb
),
cent AS (
  SELECT rn - 1 AS cell, qv AS cqv, nrm AS cnrm FROM (
    SELECT qv, nrm, ROW_NUMBER() OVER (ORDER BY skey, vec_id) AS rn FROM keyed
  ) WHERE rn <= 16
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_IVF_COS_EC} DESC, c.cell) AS rn
    FROM emb e CROSS JOIN cent c
  ) WHERE rn = 1
),
probes AS (
  SELECT q, cell FROM (
    SELECT e.vec_id AS q, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_IVF_COS_EC} DESC, c.cell) AS rn
    FROM emb e CROSS JOIN cent c WHERE e.vec_id < 10
  ) WHERE rn <= 4
)"""

# Product-quantization fragments: deterministic md5-sample codebooks
# (same rule as IVF centroids) → exact-integer nearest-codeword
# encoding → ADC scoring as a SUM of integer partial dots. Constants
# (m=16 subspaces of 4 dims, ksub=64 codes, queries vec_id < 10)
# mirror SIM_QUERIES["sim_pq_topk"].
_PQ_M, _PQ_KSUB, _PQ_SUBD = 16, 64, 4

PQ_SQL = f"""
psubs AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS sub),
pseed AS (
  SELECT qv,
         ROW_NUMBER() OVER (
           ORDER BY {hash64_sql('CAST(vec_id AS VARCHAR)')}, vec_id) AS rn
  FROM emb
  QUALIFY rn <= {_PQ_KSUB}
),
pcb AS (
  SELECT s.sub, CAST(p.rn - 1 AS INT) AS code,
         p.qv[s.sub * {_PQ_SUBD} + 1 : s.sub * {_PQ_SUBD} + {_PQ_SUBD}] AS cqv
  FROM pseed p CROSS JOIN psubs s
),
psv AS (
  SELECT e.vec_id, s.sub,
         e.qv[s.sub * {_PQ_SUBD} + 1 : s.sub * {_PQ_SUBD} + {_PQ_SUBD}] AS sv
  FROM emb e CROSS JOIN psubs s
),
pdist AS (
  SELECT v.vec_id, v.sub, c.code,
         list_sum([(v.sv[i] - c.cqv[i]) * (v.sv[i] - c.cqv[i])
                   for i in generate_series(1, {_PQ_SUBD})]) AS d2
  FROM psv v JOIN pcb c ON c.sub = v.sub
),
pcodes AS MATERIALIZED (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
    FROM pdist
  ) WHERE rn = 1
),
plut AS (
  SELECT e.vec_id AS q, e.nrm AS qnrm, c.sub, c.code,
         list_sum([e.qv[c.sub * {_PQ_SUBD} + i] * c.cqv[i]
                   for i in generate_series(1, {_PQ_SUBD})]) AS part,
         list_sum([c.cqv[i] * c.cqv[i]
                   for i in generate_series(1, {_PQ_SUBD})]) AS cn2
  FROM emb e CROSS JOIN pcb c
  WHERE e.vec_id < 10
),
padc AS (
  SELECT l.q, c.vec_id, SUM(l.part) AS dot, SUM(l.cn2) AS rn2,
         MIN(l.qnrm) AS qnrm
  FROM pcodes c JOIN plut l ON l.sub = c.sub AND l.code = c.code
  WHERE l.q <> c.vec_id
  GROUP BY l.q, c.vec_id
),
pnn AS (
  SELECT q, vec_id, adc_cos, rank FROM (
    SELECT q, vec_id, adc_cos,
           ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY adc_cos DESC, vec_id) AS rank
    FROM (
      SELECT q, vec_id,
             round(CAST(dot AS DOUBLE) / (qnrm * sqrt(CAST(rn2 AS DOUBLE))), 6)
               AS adc_cos
      FROM padc
    )
  ) WHERE rank <= 5
)"""

SIM_ORACLE = {
    # SemDeDup (Abbas et al. 2303.09540): the IVF coarse quantizer is
    # the blocker; within-cell triangular dominance sweep ordered by
    # (cent_cos ASC, vec_id ASC) — the keep-farthest-from-centroid
    # rule. Cosines rounded to 6 dp BEFORE comparison on both engines.
    "sim_semdedup": f"""
        WITH {EMB_SQL}, {IVF_SQL},
        cellv AS MATERIALIZED (
          SELECT a.vec_id, a.cell, e.qv, e.nrm,
                 round({_cosq_sql('e.qv', 'e.nrm', 'c.cqv', 'c.cnrm')}, 6) AS cent_cos
          FROM assign a
          JOIN emb e ON e.vec_id = a.vec_id
          JOIN cent c ON c.cell = a.cell
        ),
        dom AS MATERIALIZED (
          SELECT DISTINCT x.vec_id
          FROM cellv x JOIN cellv y
            ON y.cell = x.cell AND y.vec_id <> x.vec_id
          WHERE (y.cent_cos < x.cent_cos
                 OR (y.cent_cos = x.cent_cos AND y.vec_id < x.vec_id))
            AND round({_cosq_sql('x.qv', 'x.nrm', 'y.qv', 'y.nrm')}, 6) >= 0.4
        )
        SELECT c.vec_id, c.cell, c.cent_cos,
               (d.vec_id IS NULL) AS kept
        FROM cellv c LEFT JOIN dom d ON d.vec_id = c.vec_id
    """,
    # SemDeDup cost certificate (VERDICT r11 ask #5): the measured
    # within-cell quadratic term — max/total ordered-pair counts the
    # dominance join materializes, per the hot-bucket-cap discipline.
    "sim_semdedup_cell_stats": f"""
        WITH {EMB_SQL}, {IVF_SQL},
        sizes AS (
          SELECT cell, CAST(COUNT(*) AS BIGINT) AS sz FROM assign GROUP BY cell
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells_used,
               CAST(SUM(sz) AS BIGINT) AS n_rows,
               CAST(MAX(sz) AS BIGINT) AS max_cell_size,
               CAST(MAX(sz * (sz - 1)) AS BIGINT) AS max_cell_pairs,
               CAST(SUM(sz * (sz - 1)) AS BIGINT) AS total_cell_pairs
        FROM sizes
    """,
    "sim_pq_topk": f"""
        WITH {EMB_SQL}, {PQ_SQL}
        SELECT q, vec_id, CAST(rank AS INT) AS rank, adc_cos FROM pnn
    """,
    "sim_pq_recall": f"""
        WITH {EMB_SQL}, {PQ_SQL},
        bscored AS (
          SELECT eb.vec_id AS q, ea.vec_id,
                 round({_PAIR_COS}, 6) AS cos_sim
          FROM emb ea CROSS JOIN emb eb
          WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
        ),
        bnn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
            FROM bscored
          ) WHERE rank <= 5
        ),
        hits AS (
          SELECT b.q, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM bnn b JOIN pnn i ON i.q = b.q AND i.vec_id = b.vec_id
          GROUP BY b.q
        ),
        ret AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n_retrieved FROM pnn GROUP BY q),
        qspine AS (SELECT DISTINCT q FROM bnn)
        SELECT s.q,
               CAST(COALESCE(r.n_retrieved, 0) AS BIGINT) AS n_retrieved,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 6) AS recall
        FROM qspine s LEFT JOIN ret r USING (q) LEFT JOIN hits h USING (q)
    """,
    "sim_ivf_topk": f"""
        WITH {EMB_SQL}, {IVF_SQL},
        scored AS (
          SELECT p.q, ea.vec_id,
                 round({_cosq_sql('eb.qv', 'eb.nrm', 'ea.qv', 'ea.nrm')}, 6) AS cos_sim
          FROM probes p
          JOIN assign s ON s.cell = p.cell
          JOIN emb ea ON ea.vec_id = s.vec_id
          JOIN emb eb ON eb.vec_id = p.q
          WHERE ea.vec_id <> p.q
        )
        SELECT q, vec_id, CAST(rank AS INT) AS rank, cos_sim FROM (
          SELECT q, vec_id, cos_sim,
                 ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos_sim DESC, vec_id) AS rank
          FROM scored
        ) WHERE rank <= 5
    """,
    # JL search: projection components are exact int64 sums of the
    # same ±1 literals; the only floats are the final cosine's
    # correctly-rounded sqrt/mul/div — bit-identical cross-engine.
    "sim_jl_topk": f"""
        WITH {EMB_SQL}, {_jl_proj_sql(16, 64, 7)},
        scored AS (
          SELECT pb.vec_id AS q, pa.vec_id,
                 round(CAST({_dotq_sql('pa.pqv', 'pb.pqv')} AS DOUBLE)
                       / (pa.pnrm * pb.pnrm), 6) AS cos_sim
          FROM pembn pa CROSS JOIN pembn pb
          WHERE pb.vec_id < 10 AND pa.vec_id <> pb.vec_id
        )
        SELECT q, vec_id, CAST(rank AS INT) AS rank, cos_sim FROM (
          SELECT q, vec_id, cos_sim,
                 ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos_sim DESC, vec_id) AS rank
          FROM scored
        ) WHERE rank <= 5
    """,
    "sim_jl_recall": f"""
        WITH {EMB_SQL}, {_jl_proj_sql(16, 64, 7)},
        bscored AS (
          SELECT eb.vec_id AS q, ea.vec_id,
                 round({_PAIR_COS}, 6) AS cos_sim
          FROM emb ea CROSS JOIN emb eb
          WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
        ),
        bnn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
            FROM bscored
          ) WHERE rank <= 5
        ),
        jscored AS (
          SELECT pb.vec_id AS q, pa.vec_id,
                 round(CAST({_dotq_sql('pa.pqv', 'pb.pqv')} AS DOUBLE)
                       / (pa.pnrm * pb.pnrm), 6) AS cos_sim
          FROM pembn pa CROSS JOIN pembn pb
          WHERE pb.vec_id < 10 AND pa.vec_id <> pb.vec_id
        ),
        jnn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
            FROM jscored
          ) WHERE rank <= 5
        ),
        hits AS (
          SELECT b.q, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM bnn b JOIN jnn j ON j.q = b.q AND j.vec_id = b.vec_id
          GROUP BY b.q
        ),
        ret AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n_retrieved FROM jnn GROUP BY q),
        qspine AS (SELECT DISTINCT q FROM bnn)
        SELECT s.q,
               CAST(COALESCE(r.n_retrieved, 0) AS BIGINT) AS n_retrieved,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 6) AS recall
        FROM qspine s LEFT JOIN ret r USING (q) LEFT JOIN hits h USING (q)
    """,
    "sim_topk_brute": f"""
        WITH {EMB_SQL},
        scored AS (
          SELECT eb.vec_id AS q, ea.vec_id,
                 round({_PAIR_COS}, 6) AS cos_sim
          FROM emb ea CROSS JOIN emb eb
          WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
        )
        SELECT q, vec_id, CAST(rank AS INT) AS rank, cos_sim FROM (
          SELECT q, vec_id, cos_sim,
                 ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos_sim DESC, vec_id) AS rank
          FROM scored
        ) WHERE rank <= 5
    """,
    "sim_hyperplane_buckets": f"""
        WITH {EMB_SQL}, {_planes_sql(8)}, {BUCKETS64_SQL}
        SELECT vec_id, bucket FROM vb
    """,
    "sim_lsh_topk": f"""
        WITH {EMB_SQL}, {_planes_sql(8)}, {BUCKETS64_SQL},
        scored AS (
          SELECT qb.vec_id AS q, cb.vec_id,
                 round({_PAIR_COS.replace('ea.', 'ec.').replace('eb.', 'eq.')}, 6)
                   AS cos_sim
          FROM vb qb
          JOIN vb cb ON cb.bucket = qb.bucket AND cb.vec_id <> qb.vec_id
          JOIN emb ec ON ec.vec_id = cb.vec_id
          JOIN emb eq ON eq.vec_id = qb.vec_id
          WHERE qb.vec_id < 10
        )
        SELECT q, vec_id, CAST(rank AS INT) AS rank, cos_sim FROM (
          SELECT q, vec_id, cos_sim,
                 ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos_sim DESC, vec_id) AS rank
          FROM scored
        ) WHERE rank <= 5
    """,
    "sim_cosine_near_dups": f"""
        WITH {EMB_SQL}, {_planes_sql(4)}, {BUCKETS64_SQL},
        joined AS (
          SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb2
          FROM vb a JOIN vb b ON a.bucket = b.bucket
          WHERE a.vec_id < b.vec_id
        )
        SELECT va AS a, vb2 AS b, round({_PAIR_COS}, 6) AS cos_sim
        FROM joined j JOIN emb ea ON ea.vec_id = j.va JOIN emb eb ON eb.vec_id = j.vb2
        WHERE round({_PAIR_COS}, 6) >= 0.35
    """,
    # The full serving ladder vs ONE shared brute truth — every
    # fragment reused verbatim from the per-method oracles; micro
    # recall is one division of exact integers.
    "sim_ann_ladder": f"""
        WITH {EMB_SQL}, {_planes_sql(8)}, {BUCKETS64_SQL}, {IVF_SQL}, {PQ_SQL},
        {_jl_proj_sql(16, 64, 7)},
        bscored AS (
          SELECT eb.vec_id AS q, ea.vec_id,
                 round({_PAIR_COS}, 6) AS cos_sim
          FROM emb ea CROSS JOIN emb eb
          WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
        ),
        bnn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
            FROM bscored
          ) WHERE rank <= 5
        ),
        lscored AS (
          SELECT qb.vec_id AS q, cb.vec_id,
                 round({_PAIR_COS.replace('ea.', 'ec.').replace('eb.', 'eq.')}, 6)
                   AS cos_sim
          FROM vb qb
          JOIN vb cb ON cb.bucket = qb.bucket AND cb.vec_id <> qb.vec_id
          JOIN emb ec ON ec.vec_id = cb.vec_id
          JOIN emb eq ON eq.vec_id = qb.vec_id
          WHERE qb.vec_id < 10
        ),
        lnn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
            FROM lscored
          ) WHERE rank <= 5
        ),
        iscored AS (
          SELECT p.q, ea.vec_id,
                 round({_cosq_sql('eb.qv', 'eb.nrm', 'ea.qv', 'ea.nrm')}, 6) AS cos_sim
          FROM probes p
          JOIN assign s ON s.cell = p.cell
          JOIN emb ea ON ea.vec_id = s.vec_id
          JOIN emb eb ON eb.vec_id = p.q
          WHERE ea.vec_id <> p.q
        ),
        inn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
            FROM iscored
          ) WHERE rank <= 5
        ),
        jscored AS (
          SELECT pb.vec_id AS q, pa.vec_id,
                 round(CAST({_dotq_sql('pa.pqv', 'pb.pqv')} AS DOUBLE)
                       / (pa.pnrm * pb.pnrm), 6) AS cos_sim
          FROM pembn pa CROSS JOIN pembn pb
          WHERE pb.vec_id < 10 AND pa.vec_id <> pb.vec_id
        ),
        jnn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
            FROM jscored
          ) WHERE rank <= 5
        ),
        nq AS (SELECT CAST(COUNT(DISTINCT q) AS BIGINT) AS n FROM bnn),
        per AS (
          SELECT 'ivf16x4' AS method,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM bnn b
                  JOIN inn m ON m.q = b.q AND m.vec_id = b.vec_id) AS total_hits
          UNION ALL
          SELECT 'jl16',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM bnn b
                  JOIN jnn m ON m.q = b.q AND m.vec_id = b.vec_id)
          UNION ALL
          SELECT 'lsh8',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM bnn b
                  JOIN lnn m ON m.q = b.q AND m.vec_id = b.vec_id)
          UNION ALL
          SELECT 'pq16x64',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM bnn b
                  JOIN pnn m ON m.q = b.q AND m.vec_id = b.vec_id)
        )
        SELECT method, nq.n AS n_queries, total_hits,
               round(CAST(total_hits AS DOUBLE)
                     / (5.0 * CAST(nq.n AS DOUBLE)), 6) AS recall_at_k
        FROM per CROSS JOIN nq
    """,
    # Similarity-graph components: same pair derivation as
    # sim_cosine_near_dups, closure as a recursive fixpoint with
    # label = MIN reachable id (the Spark side reaches the same
    # fixpoint via the shared pointer-jumping kernel).
    "sim_embedding_components": f"""
        WITH RECURSIVE emb0 AS (
          SELECT vec_id,
                 [CAST(round(x * 1000000.0) AS BIGINT) for x in embedding::DOUBLE[]] AS qv
          FROM embeddings
        ),
        emb AS (
          SELECT vec_id, qv,
                 sqrt(CAST(list_sum([v * v for v in qv]) AS DOUBLE)) AS nrm
          FROM emb0
        ),
        {_planes_sql(4)},
        {BUCKETS64_SQL.lstrip()},
        pairs AS (
          SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb2
          FROM vb a JOIN vb b ON a.bucket = b.bucket
          WHERE a.vec_id < b.vec_id
        ),
        edges_e AS (
          SELECT va AS a, vb2 AS b
          FROM pairs j JOIN emb ea ON ea.vec_id = j.va
                       JOIN emb eb ON eb.vec_id = j.vb2
          WHERE round({_PAIR_COS}, 6) >= 0.35
        ),
        sym_e AS (
          SELECT a AS u, b AS v FROM edges_e
          UNION SELECT b, a FROM edges_e
        ),
        reach(u, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM sym_e)
          UNION
          SELECT s.u, reach.r FROM sym_e s JOIN reach ON reach.u = s.v
        ),
        cc AS (SELECT u AS vec_id, MIN(r) AS component FROM reach GROUP BY u),
        sizes AS (
          SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM cc GROUP BY component
        )
        SELECT cc.vec_id, cc.component, s.n_members
        FROM cc JOIN sizes s USING (component)
    """,
    # Multi-table LSH top-k (OR-amplification, b=4 planes × L=4
    # tables): per-table bucket join, candidates deduped, scored once.
    "sim_lsh_topk_multi": f"""
        WITH {EMB_SQL}, {_planes_multi_sql(4, 4)},
        vbm AS (
          SELECT e.vec_id, p.tbl,
                 CAST(SUM(CASE WHEN {_dotq_sql('e.qv', 'p.qvec')} > 0
                          THEN (1::BIGINT << p.plane) ELSE 0 END) AS BIGINT) AS bucket
          FROM emb e CROSS JOIN planes_m p
          GROUP BY e.vec_id, p.tbl
        ),
        cand AS (
          SELECT DISTINCT qb.vec_id AS q, cb.vec_id
          FROM vbm qb
          JOIN vbm cb ON cb.tbl = qb.tbl AND cb.bucket = qb.bucket
                     AND cb.vec_id <> qb.vec_id
          WHERE qb.vec_id < 10
        ),
        scored AS (
          SELECT c.q, c.vec_id,
                 round({_cosq_sql('ec.qv', 'ec.nrm', 'eq.qv', 'eq.nrm')}, 6) AS cos_sim
          FROM cand c JOIN emb ec ON ec.vec_id = c.vec_id
                      JOIN emb eq ON eq.vec_id = c.q
        )
        SELECT q, vec_id, CAST(rank AS INT) AS rank, cos_sim FROM (
          SELECT q, vec_id, cos_sim,
                 ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos_sim DESC, vec_id) AS rank
          FROM scored
        ) WHERE rank <= 5
    """,
    # ANN recall@5: LSH top-k vs exact brute-force ground truth.
    "sim_lsh_recall": f"""
        WITH {EMB_SQL}, {_planes_sql(8)}, {BUCKETS64_SQL},
        bscored AS (
          SELECT eb.vec_id AS q, ea.vec_id,
                 round({_PAIR_COS}, 6) AS cos_sim
          FROM emb ea CROSS JOIN emb eb
          WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
        ),
        bnn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
            FROM bscored
          ) WHERE rank <= 5
        ),
        lscored AS (
          SELECT qb.vec_id AS q, cb.vec_id,
                 round({_PAIR_COS.replace('ea.', 'ec.').replace('eb.', 'eq.')}, 6)
                   AS cos_sim
          FROM vb qb
          JOIN vb cb ON cb.bucket = qb.bucket AND cb.vec_id <> qb.vec_id
          JOIN emb ec ON ec.vec_id = cb.vec_id
          JOIN emb eq ON eq.vec_id = qb.vec_id
          WHERE qb.vec_id < 10
        ),
        lnn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
            FROM lscored
          ) WHERE rank <= 5
        ),
        hits AS (
          SELECT b.q, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM bnn b JOIN lnn l ON l.q = b.q AND l.vec_id = b.vec_id
          GROUP BY b.q
        ),
        ret AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n_retrieved FROM lnn GROUP BY q),
        qspine AS (SELECT DISTINCT q FROM bnn)
        SELECT s.q,
               CAST(COALESCE(r.n_retrieved, 0) AS BIGINT) AS n_retrieved,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 6) AS recall
        FROM qspine s LEFT JOIN ret r USING (q) LEFT JOIN hits h USING (q)
    """,
    # One Lloyd refinement step: integer micro-unit sums per
    # (cell, dim) are aggregation-order-exact, so the mean is a
    # single identical IEEE division on both engines.
    "sim_kmeans_iteration": f"""
        WITH {EMB_SQL}, {IVF_SQL},
        member AS (
          SELECT a.cell, dim_i AS d, e.qv[dim_i + 1] AS qval
          FROM assign a JOIN emb e USING (vec_id)
          CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim_i)
        )
        SELECT CAST(cell AS INT) AS cell, CAST(d AS INT) AS d,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               round(CAST(SUM(qval) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_q
        FROM member GROUP BY cell, d
    """,
    # Embedding-cluster topic labels: k-means cell assignment joined
    # to document tokens; per-cluster top terms by the exact-rational
    # cluster-tf / corpus-df salience (same libm-free key as
    # text_salient_terms).
    "sim_cluster_topics": f"""
        WITH {EMB_SQL}, {IVF_SQL},
        tok AS (SELECT doc_id, unnest({TOKENS}) AS term FROM documents),
        tfd AS (SELECT doc_id, term, COUNT(*) AS tf_d FROM tok GROUP BY doc_id, term),
        dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfd GROUP BY term),
        ctf AS (
          SELECT a.cell, t.term, CAST(SUM(t.tf_d) AS BIGINT) AS tf
          FROM tfd t JOIN assign a ON a.vec_id = t.doc_id
          GROUP BY a.cell, t.term
        ),
        scored AS (
          SELECT cell, term, tf, df,
                 CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS salience
          FROM ctf JOIN dfreq USING (term)
        )
        SELECT CAST(cell AS INT) AS cell, term, tf, df,
               CAST(rank AS INT) AS rank, round(salience, 6) AS salience
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY cell
                                       ORDER BY salience DESC, term) AS rank
          FROM scored
        ) WHERE rank <= 5
    """,
    # TWO full Lloyd rounds, centroids fed back between them: the
    # round-1 means re-quantize to integer micro-units (one identical
    # half-away round on both engines), so round 2's cosine argmax is
    # again exact-integer — the whole refinement unrolls in SQL.
    "sim_kmeans_refined": f"""
        WITH {EMB_SQL}, {IVF_SQL},
        mem1 AS (
          SELECT a.cell, dim_i AS d, e.qv[dim_i + 1] AS qval
          FROM assign a JOIN emb e USING (vec_id)
          CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim_i)
        ),
        m1 AS (
          SELECT cell, d,
                 round(CAST(SUM(qval) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mq
          FROM mem1 GROUP BY cell, d
        ),
        cent1a AS (
          SELECT cell, list(CAST(round(mq) AS BIGINT) ORDER BY d) AS cqv
          FROM m1 GROUP BY cell
        ),
        cent1 AS (
          SELECT cell, cqv,
                 sqrt(CAST(list_sum([v * v for v in cqv]) AS DOUBLE)) AS cnrm
          FROM cent1a
        ),
        a1 AS (
          SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_IVF_COS_EC} DESC, c.cell) AS rn
            FROM emb e CROSS JOIN cent1 c
          ) WHERE rn = 1
        ),
        mem2 AS (
          SELECT a.cell, dim_i AS d, e.qv[dim_i + 1] AS qval
          FROM a1 a JOIN emb e USING (vec_id)
          CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim_i)
        )
        SELECT CAST(cell AS INT) AS cell, CAST(d AS INT) AS d,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               round(CAST(SUM(qval) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_q
        FROM mem2 GROUP BY cell, d
    """,
    # ANN recall@5 for the IVF index: same brute-force ground truth,
    # approximate side = the sim_ivf_topk candidate pipeline.
    "sim_ivf_recall": f"""
        WITH {EMB_SQL}, {IVF_SQL},
        bscored AS (
          SELECT eb.vec_id AS q, ea.vec_id,
                 round({_PAIR_COS}, 6) AS cos_sim
          FROM emb ea CROSS JOIN emb eb
          WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
        ),
        bnn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
            FROM bscored
          ) WHERE rank <= 5
        ),
        iscored AS (
          SELECT p.q, ea.vec_id,
                 round({_cosq_sql('eb.qv', 'eb.nrm', 'ea.qv', 'ea.nrm')}, 6) AS cos_sim
          FROM probes p
          JOIN assign s ON s.cell = p.cell
          JOIN emb ea ON ea.vec_id = s.vec_id
          JOIN emb eb ON eb.vec_id = p.q
          WHERE ea.vec_id <> p.q
        ),
        inn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
            FROM iscored
          ) WHERE rank <= 5
        ),
        hits AS (
          SELECT b.q, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM bnn b JOIN inn i ON i.q = b.q AND i.vec_id = b.vec_id
          GROUP BY b.q
        ),
        ret AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n_retrieved FROM inn GROUP BY q),
        qspine AS (SELECT DISTINCT q FROM bnn)
        SELECT s.q,
               CAST(COALESCE(r.n_retrieved, 0) AS BIGINT) AS n_retrieved,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 6) AS recall
        FROM qspine s LEFT JOIN ret r USING (q) LEFT JOIN hits h USING (q)
    """,
    # kNN label-prediction eval: majority vote among the exact top-5
    # neighbors (tie → smallest label) vs ground truth.
    "sim_knn_label_eval": f"""
        WITH {EMB_SQL},
        scored AS (
          SELECT eb.vec_id AS q, ea.vec_id,
                 round({_PAIR_COS}, 6) AS cos_sim
          FROM emb ea CROSS JOIN emb eb
          WHERE eb.vec_id < 50 AND ea.vec_id <> eb.vec_id
        ),
        nn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q
                                      ORDER BY cos_sim DESC, vec_id) AS rank
            FROM scored
          ) WHERE rank <= 5
        ),
        votes AS (
          SELECT nn.q, e.label, CAST(COUNT(*) AS BIGINT) AS n_votes
          FROM nn JOIN embeddings e ON e.vec_id = nn.vec_id
          GROUP BY 1, 2
        ),
        pred AS (
          SELECT q, label AS label_pred, n_votes FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q
                                         ORDER BY n_votes DESC, label) AS rn
            FROM votes
          ) WHERE rn = 1
        )
        SELECT p.q, e.label, p.label_pred, p.n_votes,
               CAST(CASE WHEN e.label = p.label_pred THEN 1 ELSE 0 END AS INT) AS correct
        FROM pred p JOIN embeddings e ON e.vec_id = p.q
    """,
    # Embedding-side survivor election: connected components over the
    # cosine near-dup pair set (same recursive-CTE fixpoint as the
    # document-side dedup_cluster_survivors; Spark side reuses
    # operators/dedup.py near_dup_clusters — the CC kernel is
    # id-domain agnostic).
    "sim_dedup_survivors": f"""
        WITH RECURSIVE {EMB_SQL.strip()}, {_planes_sql(4)}, {BUCKETS64_SQL.strip()},
        joined AS (
          SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb2
          FROM vb a JOIN vb b ON a.bucket = b.bucket
          WHERE a.vec_id < b.vec_id
        ),
        vpairs AS (
          SELECT va AS a, vb2 AS b
          FROM joined j JOIN emb ea ON ea.vec_id = j.va
                        JOIN emb eb ON eb.vec_id = j.vb2
          WHERE round({_PAIR_COS}, 6) >= 0.35
        ),
        csym AS (SELECT a AS u, b AS v FROM vpairs
                 UNION ALL SELECT b, a FROM vpairs),
        reach(u, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM csym)
          UNION
          SELECT s.u, reach.r FROM csym s JOIN reach ON reach.u = s.v
        ),
        lbl AS (SELECT u AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY u)
        SELECT e.vec_id,
               COALESCE(l.cluster_id, e.vec_id) AS cluster_id,
               CAST(CASE WHEN COALESCE(l.cluster_id, e.vec_id) = e.vec_id
                         THEN 1 ELSE 0 END AS INT) AS keep
        FROM embeddings e LEFT JOIN lbl l USING (vec_id)
    """,
}

# The persisted-index serving path returns IDENTICAL results to the
# inline IVF pipeline (same centroids, same assignment, same probes —
# only the storage layout differs), so it shares the oracle.
SIM_ORACLE["sim_ivf_topk_persisted"] = SIM_ORACLE["sim_ivf_topk"]

# Upsert serving: centroids sampled from the BASE subset only
# (vec_id % 10 != 0 — the corpus at build time), assignment over the
# FULL corpus (base written at build + delta appended with frozen
# centroids; both reduce to nearest-frozen-centroid, which is what
# makes the incremental add exact). Probe/scoring tail identical to
# sim_ivf_topk.
SIM_ORACLE["sim_ivf_index_upsert"] = f"""
    WITH {EMB_SQL},
    keyed_base AS (
      SELECT vec_id, qv, nrm, {hash64_sql('CAST(vec_id AS VARCHAR)')} AS skey
      FROM emb WHERE vec_id % 10 <> 0
    ),
    cent AS (
      SELECT rn - 1 AS cell, qv AS cqv, nrm AS cnrm FROM (
        SELECT qv, nrm, ROW_NUMBER() OVER (ORDER BY skey, vec_id) AS rn
        FROM keyed_base
      ) WHERE rn <= 16
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_IVF_COS_EC} DESC, c.cell) AS rn
        FROM emb e CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT q, cell FROM (
        SELECT e.vec_id AS q, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_IVF_COS_EC} DESC, c.cell) AS rn
        FROM emb e CROSS JOIN cent c WHERE e.vec_id < 10
      ) WHERE rn <= 4
    ),
    scored AS (
      SELECT p.q, ea.vec_id,
             round({_cosq_sql('eb.qv', 'eb.nrm', 'ea.qv', 'ea.nrm')}, 6) AS cos_sim
      FROM probes p
      JOIN assign s ON s.cell = p.cell
      JOIN emb ea ON ea.vec_id = s.vec_id
      JOIN emb eb ON eb.vec_id = p.q
      WHERE ea.vec_id <> p.q
    )
    SELECT q, vec_id, CAST(rank AS INT) AS rank, cos_sim FROM (
      SELECT q, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 5
"""

def _kmeans_chain_sql(rounds: int) -> str:
    """CTE chain for ``rounds`` Lloyd steps from the sampled seeds
    (expects ``emb`` + IVF_SQL's ``assign`` in scope): per round r,
    mem{r} (member components of the previous assignment), m{r}
    (exact-integer means), cent{r} (re-quantized centroids — the
    oracle-exactness barrier, twin of _centroids_from_means), a{r}
    (assignment to cent{r}). ``cent{rounds}``/``a{rounds}`` are the
    refined quantizer and its corpus assignment
    (similarity.ivf_centroids_kmeans / ivf_topk_kmeans)."""
    parts = []
    prev = "assign"
    for r in range(1, rounds + 1):
        parts.append(f"""mem{r} AS (
  SELECT a.cell, dim_i AS d, e.qv[dim_i + 1] AS qval
  FROM {prev} a JOIN emb e USING (vec_id)
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim_i)
),
m{r} AS (
  SELECT cell, d,
         round(CAST(SUM(qval) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mq
  FROM mem{r} GROUP BY cell, d
),
cent{r}a AS (
  SELECT cell, list(CAST(round(mq) AS BIGINT) ORDER BY d) AS cqv
  FROM m{r} GROUP BY cell
),
cent{r} AS MATERIALIZED (
  SELECT cell, cqv,
         sqrt(CAST(list_sum([v * v for v in cqv]) AS DOUBLE)) AS cnrm
  FROM cent{r}a
),
a{r} AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_IVF_COS_EC} DESC, c.cell) AS rn
    FROM emb e CROSS JOIN cent{r} c
  ) WHERE rn = 1
)""")
        prev = f"a{r}"
    return ",\n".join(parts)


# Probe + score tail against the round-2 refined quantizer — same
# shape as IVF_SQL's probes / sim_ivf_topk's scored, swapping in
# cent2/a2. Constants mirror SIM_QUERIES (16 cells, 4 probes, top-5,
# 2 Lloyd rounds, queries vec_id < 10).
_KM_IVF_SQL = f"""
kprobes AS (
  SELECT q, cell FROM (
    SELECT e.vec_id AS q, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_IVF_COS_EC} DESC, c.cell) AS rn
    FROM emb e CROSS JOIN cent2 c WHERE e.vec_id < 10
  ) WHERE rn <= 4
),
kscored AS (
  SELECT p.q, ea.vec_id,
         round({_cosq_sql('eb.qv', 'eb.nrm', 'ea.qv', 'ea.nrm')}, 6) AS cos_sim
  FROM kprobes p
  JOIN a2 s ON s.cell = p.cell
  JOIN emb ea ON ea.vec_id = s.vec_id
  JOIN emb eb ON eb.vec_id = p.q
  WHERE ea.vec_id <> p.q
),
knn AS (
  SELECT q, vec_id, cos_sim, rank FROM (
    SELECT q, vec_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
    FROM kscored
  ) WHERE rank <= 5
)"""

SIM_ORACLE["sim_ivf_topk_kmeans"] = f"""
    WITH {EMB_SQL}, {IVF_SQL}, {_kmeans_chain_sql(2)}, {_KM_IVF_SQL}
    SELECT q, vec_id, CAST(rank AS INT) AS rank, cos_sim FROM knn
"""

SIM_ORACLE["sim_ivf_kmeans_recall"] = f"""
    WITH {EMB_SQL}, {IVF_SQL}, {_kmeans_chain_sql(2)}, {_KM_IVF_SQL},
    bscored AS (
      SELECT eb.vec_id AS q, ea.vec_id,
             round({_PAIR_COS}, 6) AS cos_sim
      FROM emb ea CROSS JOIN emb eb
      WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
    ),
    bnn AS (
      SELECT q, vec_id FROM (
        SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                          ORDER BY cos_sim DESC, vec_id) AS rank
        FROM bscored
      ) WHERE rank <= 5
    ),
    iscored AS (
      SELECT p.q, ea.vec_id,
             round({_cosq_sql('eb.qv', 'eb.nrm', 'ea.qv', 'ea.nrm')}, 6) AS cos_sim
      FROM probes p
      JOIN assign s ON s.cell = p.cell
      JOIN emb ea ON ea.vec_id = s.vec_id
      JOIN emb eb ON eb.vec_id = p.q
      WHERE ea.vec_id <> p.q
    ),
    inn AS (
      SELECT q, vec_id FROM (
        SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                          ORDER BY cos_sim DESC, vec_id) AS rank
        FROM iscored
      ) WHERE rank <= 5
    ),
    shits AS (
      SELECT b.q, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM bnn b JOIN inn i ON i.q = b.q AND i.vec_id = b.vec_id
      GROUP BY b.q
    ),
    sret AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n FROM inn GROUP BY q),
    khits AS (
      SELECT b.q, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM bnn b JOIN knn k ON k.q = b.q AND k.vec_id = b.vec_id
      GROUP BY b.q
    ),
    kret AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n FROM knn GROUP BY q),
    qspine AS (SELECT DISTINCT q FROM bnn)
    SELECT s.q,
           CAST(COALESCE(sr.n, 0) AS BIGINT) AS n_retrieved_sampled,
           CAST(COALESCE(sh.n_hits, 0) AS BIGINT) AS n_hits_sampled,
           round(CAST(COALESCE(sh.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 6)
             AS recall_sampled,
           CAST(COALESCE(kr.n, 0) AS BIGINT) AS n_retrieved_kmeans,
           CAST(COALESCE(kh.n_hits, 0) AS BIGINT) AS n_hits_kmeans,
           round(CAST(COALESCE(kh.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 6)
             AS recall_kmeans
    FROM qspine s
    LEFT JOIN sret sr USING (q) LEFT JOIN shits sh USING (q)
    LEFT JOIN kret kr USING (q) LEFT JOIN khits kh USING (q)
"""

def _pq_kmeans_chain_sql(rounds: int) -> str:
    """Per-subspace Lloyd chain (expects PQ_SQL's ``psv``/``pcb`` in
    scope): pc0 aliases the sampled seed codebooks; per round r,
    kpa{r} assigns every (vec, sub) to its nearest pc{r-1} codeword
    by exact integer squared-L2 (ties → lowest code), kpm{r} takes
    per-component integer means, pc{r} re-quantizes them — the twin
    of similarity.pq_codebooks_kmeans."""
    d2 = (
        f"list_sum([(v.sv[i] - c.cqv[i]) * (v.sv[i] - c.cqv[i]) "
        f"for i in generate_series(1, {_PQ_SUBD})])"
    )
    parts = ["pc0 AS (SELECT sub, code, cqv FROM pcb)"]
    for r in range(1, rounds + 1):
        parts.append(f"""kpa{r} AS (
  SELECT vec_id, sub, code FROM (
    SELECT v.vec_id, v.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub
                              ORDER BY {d2}, c.code) AS rn
    FROM psv v JOIN pc{r - 1} c ON c.sub = v.sub
  ) WHERE rn = 1
),
kpm{r} AS (
  SELECT a.sub, a.code, di AS d,
         round(CAST(SUM(v.sv[di]) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mq
  FROM kpa{r} a JOIN psv v ON v.vec_id = a.vec_id AND v.sub = a.sub
  CROSS JOIN (SELECT unnest(generate_series(1, {_PQ_SUBD})) AS di)
  GROUP BY a.sub, a.code, di
),
pc{r} AS MATERIALIZED (
  SELECT sub, code, list(CAST(round(mq) AS BIGINT) ORDER BY d) AS cqv
  FROM kpm{r} GROUP BY sub, code
)""")
    return ",\n".join(parts)


# Encode/LUT/ADC/rank tail against the round-2 refined codebooks —
# PQ_SQL's pcodes/plut/padc/pnn with pc2 swapped in for pcb.
_KM_PQ_SQL = f"""
kpdist AS (
  SELECT v.vec_id, v.sub, c.code,
         list_sum([(v.sv[i] - c.cqv[i]) * (v.sv[i] - c.cqv[i])
                   for i in generate_series(1, {_PQ_SUBD})]) AS d2
  FROM psv v JOIN pc2 c ON c.sub = v.sub
),
kpcodes AS MATERIALIZED (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
    FROM kpdist
  ) WHERE rn = 1
),
kplut AS (
  SELECT e.vec_id AS q, e.nrm AS qnrm, c.sub, c.code,
         list_sum([e.qv[c.sub * {_PQ_SUBD} + i] * c.cqv[i]
                   for i in generate_series(1, {_PQ_SUBD})]) AS part,
         list_sum([c.cqv[i] * c.cqv[i]
                   for i in generate_series(1, {_PQ_SUBD})]) AS cn2
  FROM emb e JOIN pc2 c ON TRUE
  WHERE e.vec_id < 10
),
kpadc AS (
  SELECT l.q, c.vec_id, SUM(l.part) AS dot, SUM(l.cn2) AS rn2,
         MIN(l.qnrm) AS qnrm
  FROM kpcodes c JOIN kplut l ON l.sub = c.sub AND l.code = c.code
  WHERE l.q <> c.vec_id
  GROUP BY l.q, c.vec_id
),
kpnn AS (
  SELECT q, vec_id, adc_cos, rank FROM (
    SELECT q, vec_id, adc_cos,
           ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY adc_cos DESC, vec_id) AS rank
    FROM (
      SELECT q, vec_id,
             round(CAST(dot AS DOUBLE) / (qnrm * sqrt(CAST(rn2 AS DOUBLE))), 6)
               AS adc_cos
      FROM kpadc
    )
  ) WHERE rank <= 5
)"""

# SQ8 scalar-quantization fragments (twin of similarity.sq8_*): the
# per-dim min/range "training" pass over the micro-unit grid, exact
# round-half-up integer codes ((2·255·(v−mn)+rng) // (2·rng) — no
# float reaches a code), and reconstruction scaled through 255
# (y_d = 255·mn_d + code_d·rng_d) so dot and norm² stay exact int64
# and the final cosine is the same correctly-rounded IEEE division.
SQ8_CORE_SQL = """
sdims AS (SELECT unnest(generate_series(1, 64)) AS d),
sprm AS MATERIALIZED (
  SELECT d, MIN(qv[d]) AS mn, MAX(qv[d]) - MIN(qv[d]) AS rng
  FROM emb CROSS JOIN sdims GROUP BY d
),
scodes AS MATERIALIZED (
  SELECT e.vec_id, p.d,
         CASE WHEN p.rng = 0 THEN 0
              ELSE (2 * 255 * (e.qv[p.d] - p.mn) + p.rng) // (2 * p.rng)
         END AS code
  FROM emb e CROSS JOIN sprm p
),
srec AS MATERIALIZED (
  SELECT c.vec_id, c.d, 255 * p.mn + c.code * p.rng AS y
  FROM scodes c JOIN sprm p USING (d)
),
srn AS (SELECT vec_id, SUM(y * y) AS rn2 FROM srec GROUP BY vec_id)"""

SQ8_SQL = SQ8_CORE_SQL + """,
sdot AS (
  SELECT e.vec_id AS q, r.vec_id, e.nrm AS qnrm, SUM(e.qv[r.d] * r.y) AS dot
  FROM emb e JOIN srec r ON r.vec_id <> e.vec_id
  WHERE e.vec_id < 10
  GROUP BY e.vec_id, r.vec_id, e.nrm
),
snn AS (
  SELECT q, vec_id, sq_cos, rank FROM (
    SELECT q, vec_id, sq_cos,
           ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY sq_cos DESC, vec_id) AS rank
    FROM (
      SELECT d.q, d.vec_id,
             round(CAST(d.dot AS DOUBLE)
                   / (d.qnrm * sqrt(CAST(n.rn2 AS DOUBLE))), 6) AS sq_cos
      FROM sdot d JOIN srn n ON n.vec_id = d.vec_id
    )
  ) WHERE rank <= 5
)"""

SIM_ORACLE_SQ8 = {
    "sim_sq8_topk": f"""
        WITH {EMB_SQL}, {SQ8_SQL}
        SELECT q, vec_id, CAST(rank AS INT) AS rank, sq_cos FROM snn
    """,
    "sim_sq8_recall": f"""
        WITH {EMB_SQL}, {SQ8_SQL},
        bscored AS (
          SELECT eb.vec_id AS q, ea.vec_id,
                 round({_PAIR_COS}, 6) AS cos_sim
          FROM emb ea CROSS JOIN emb eb
          WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
        ),
        bnn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
            FROM bscored
          ) WHERE rank <= 5
        ),
        hits AS (
          SELECT b.q, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM bnn b JOIN snn i ON i.q = b.q AND i.vec_id = b.vec_id
          GROUP BY b.q
        ),
        ret AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n_retrieved FROM snn GROUP BY q),
        qspine AS (SELECT DISTINCT q FROM bnn)
        SELECT s.q,
               CAST(COALESCE(r.n_retrieved, 0) AS BIGINT) AS n_retrieved,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 6) AS recall
        FROM qspine s LEFT JOIN ret r USING (q) LEFT JOIN hits h USING (q)
    """,
    # IVF-SQ8 composition: the IVF fragments' probe list prunes the
    # SQ8 reconstruction to the probed cells, then the same exact
    # int64 reconstructed cosine ranks the survivors.
    "sim_ivfsq8_topk": f"""
        WITH {EMB_SQL}, {IVF_SQL}, {SQ8_CORE_SQL},
        ivdot AS (
          SELECT p.q, r.vec_id, eq.nrm AS qnrm, SUM(eq.qv[r.d] * r.y) AS dot
          FROM probes p
          JOIN assign a ON a.cell = p.cell
          JOIN srec r ON r.vec_id = a.vec_id AND r.vec_id <> p.q
          JOIN emb eq ON eq.vec_id = p.q
          GROUP BY p.q, r.vec_id, eq.nrm
        ),
        ivnn AS (
          SELECT q, vec_id, sq_cos, rank FROM (
            SELECT q, vec_id, sq_cos,
                   ROW_NUMBER() OVER (PARTITION BY q
                                      ORDER BY sq_cos DESC, vec_id) AS rank
            FROM (
              SELECT d.q, d.vec_id,
                     round(CAST(d.dot AS DOUBLE)
                           / (d.qnrm * sqrt(CAST(n.rn2 AS DOUBLE))), 6) AS sq_cos
              FROM ivdot d JOIN srn n ON n.vec_id = d.vec_id
            )
          ) WHERE rank <= 5
        )
        SELECT q, vec_id, CAST(rank AS INT) AS rank, sq_cos FROM ivnn
    """,
    "sim_ivfsq8_recall": f"""
        WITH {EMB_SQL}, {IVF_SQL}, {SQ8_CORE_SQL},
        ivdot AS (
          SELECT p.q, r.vec_id, eq.nrm AS qnrm, SUM(eq.qv[r.d] * r.y) AS dot
          FROM probes p
          JOIN assign a ON a.cell = p.cell
          JOIN srec r ON r.vec_id = a.vec_id AND r.vec_id <> p.q
          JOIN emb eq ON eq.vec_id = p.q
          GROUP BY p.q, r.vec_id, eq.nrm
        ),
        ivnn AS (
          SELECT q, vec_id FROM (
            SELECT d.q, d.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY d.q
                       ORDER BY round(CAST(d.dot AS DOUBLE)
                           / (d.qnrm * sqrt(CAST(n.rn2 AS DOUBLE))), 6) DESC,
                           d.vec_id) AS rank
            FROM ivdot d JOIN srn n ON n.vec_id = d.vec_id
          ) WHERE rank <= 5
        ),
        bscored AS (
          SELECT eb.vec_id AS q, ea.vec_id,
                 round({_PAIR_COS}, 6) AS cos_sim
          FROM emb ea CROSS JOIN emb eb
          WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
        ),
        bnn AS (
          SELECT q, vec_id FROM (
            SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY cos_sim DESC, vec_id) AS rank
            FROM bscored
          ) WHERE rank <= 5
        ),
        hits AS (
          SELECT b.q, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM bnn b JOIN ivnn i ON i.q = b.q AND i.vec_id = b.vec_id
          GROUP BY b.q
        ),
        ret AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n_retrieved FROM ivnn GROUP BY q),
        qspine AS (SELECT DISTINCT q FROM bnn)
        SELECT s.q,
               CAST(COALESCE(r.n_retrieved, 0) AS BIGINT) AS n_retrieved,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 6) AS recall
        FROM qspine s LEFT JOIN ret r USING (q) LEFT JOIN hits h USING (q)
    """,
}
SIM_ORACLE.update(SIM_ORACLE_SQ8)

SIM_ORACLE["sim_pq_topk_kmeans"] = f"""
    WITH {EMB_SQL}, {PQ_SQL}, {_pq_kmeans_chain_sql(2)}, {_KM_PQ_SQL}
    SELECT q, vec_id, CAST(rank AS INT) AS rank, adc_cos FROM kpnn
"""

SIM_ORACLE["sim_pq_kmeans_recall"] = f"""
    WITH {EMB_SQL}, {PQ_SQL}, {_pq_kmeans_chain_sql(2)}, {_KM_PQ_SQL},
    bscored AS (
      SELECT eb.vec_id AS q, ea.vec_id,
             round({_PAIR_COS}, 6) AS cos_sim
      FROM emb ea CROSS JOIN emb eb
      WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
    ),
    bnn AS (
      SELECT q, vec_id FROM (
        SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                          ORDER BY cos_sim DESC, vec_id) AS rank
        FROM bscored
      ) WHERE rank <= 5
    ),
    shits AS (
      SELECT b.q, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM bnn b JOIN pnn i ON i.q = b.q AND i.vec_id = b.vec_id
      GROUP BY b.q
    ),
    sret AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n FROM pnn GROUP BY q),
    khits AS (
      SELECT b.q, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM bnn b JOIN kpnn k ON k.q = b.q AND k.vec_id = b.vec_id
      GROUP BY b.q
    ),
    kret AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n FROM kpnn GROUP BY q),
    qspine AS (SELECT DISTINCT q FROM bnn)
    SELECT s.q,
           CAST(COALESCE(sr.n, 0) AS BIGINT) AS n_retrieved_sampled,
           CAST(COALESCE(sh.n_hits, 0) AS BIGINT) AS n_hits_sampled,
           round(CAST(COALESCE(sh.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 6)
             AS recall_sampled,
           CAST(COALESCE(kr.n, 0) AS BIGINT) AS n_retrieved_kmeans,
           CAST(COALESCE(kh.n_hits, 0) AS BIGINT) AS n_hits_kmeans,
           round(CAST(COALESCE(kh.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 6)
             AS recall_kmeans
    FROM qspine s
    LEFT JOIN sret sr USING (q) LEFT JOIN shits sh USING (q)
    LEFT JOIN kret kr USING (q) LEFT JOIN khits kh USING (q)
"""

# IVF-PQ composition: the IVF probe list (probes/assign from IVF_SQL)
# restricts the PQ code table (pcodes from PQ_SQL); ADC scoring then
# runs only over the probed cells' codes. Same constants as the
# component queries (16 cells, 4 probes, m=16, ksub=64, top-5,
# queries vec_id < 10).
_IVFPQ_NN_SQL = """
ppadc AS (
  SELECT l.q, c.vec_id, SUM(l.part) AS dot, SUM(l.cn2) AS rn2,
         MIN(l.qnrm) AS qnrm
  FROM pcodes c
  JOIN assign s ON s.vec_id = c.vec_id
  JOIN probes pr ON pr.cell = s.cell
  JOIN plut l ON l.q = pr.q AND l.sub = c.sub AND l.code = c.code
  WHERE pr.q <> c.vec_id
  GROUP BY l.q, c.vec_id
),
ppnn AS (
  SELECT q, vec_id, adc_cos, rank FROM (
    SELECT q, vec_id, adc_cos,
           ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY adc_cos DESC, vec_id) AS rank
    FROM (
      SELECT q, vec_id,
             round(CAST(dot AS DOUBLE) / (qnrm * sqrt(CAST(rn2 AS DOUBLE))), 6)
               AS adc_cos
      FROM ppadc
    )
  ) WHERE rank <= 5
)"""

SIM_ORACLE["sim_ivfpq_topk"] = f"""
    WITH {EMB_SQL}, {IVF_SQL}, {PQ_SQL}, {_IVFPQ_NN_SQL}
    SELECT q, vec_id, CAST(rank AS INT) AS rank, adc_cos FROM ppnn
"""

# Residual IVF-PQ twin (operators/similarity.ivfpq_residual_topk):
# residual = qv − assigned centroid (exact integers), codebooks =
# seed vectors' residuals, ADC assembled from the base dot +
# query-residual LUT + centroid-residual cross table — every fold an
# exact int64 sum, same constants as the raw-vector IVF-PQ chain.
_RPQ_SQL = f"""
rsubs AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS sub),
rres AS MATERIALIZED (
  SELECT a.vec_id, a.cell,
         [e.qv[i] - c.cqv[i] for i in generate_series(1, 64)] AS rv
  FROM assign a JOIN emb e USING (vec_id) JOIN cent c USING (cell)
),
rseed AS (
  SELECT vec_id,
         ROW_NUMBER() OVER (
           ORDER BY {hash64_sql('CAST(vec_id AS VARCHAR)')}, vec_id) AS rn
  FROM emb
  QUALIFY rn <= {_PQ_KSUB}
),
rcb AS MATERIALIZED (
  SELECT s.sub, CAST(p.rn - 1 AS INT) AS code,
         r.rv[s.sub * {_PQ_SUBD} + 1 : s.sub * {_PQ_SUBD} + {_PQ_SUBD}] AS rcq
  FROM rseed p JOIN rres r USING (vec_id) CROSS JOIN rsubs s
),
rdist AS (
  SELECT r.vec_id, r.cell, s.sub, c.code,
         list_sum([(r.rv[s.sub * {_PQ_SUBD} + i] - c.rcq[i])
                   * (r.rv[s.sub * {_PQ_SUBD} + i] - c.rcq[i])
                   for i in generate_series(1, {_PQ_SUBD})]) AS d2
  FROM rres r CROSS JOIN rsubs s JOIN rcb c ON c.sub = s.sub
),
rcodes AS MATERIALIZED (
  SELECT vec_id, cell, sub, code FROM (
    SELECT vec_id, cell, sub, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
    FROM rdist
  ) WHERE rn = 1
),
rqlut AS (
  SELECT e.vec_id AS q, c.sub, c.code,
         list_sum([e.qv[c.sub * {_PQ_SUBD} + i] * c.rcq[i]
                   for i in generate_series(1, {_PQ_SUBD})]) AS part
  FROM emb e CROSS JOIN rcb c
  WHERE e.vec_id < 10
),
rcross AS (
  SELECT ce.cell, b.sub, b.code,
         2 * list_sum([ce.cqv[b.sub * {_PQ_SUBD} + i] * b.rcq[i]
                       for i in generate_series(1, {_PQ_SUBD})])
         + list_sum([b.rcq[i] * b.rcq[i]
                     for i in generate_series(1, {_PQ_SUBD})]) AS rn2part
  FROM cent ce CROSS JOIN rcb b
),
rbase AS (
  SELECT p.q, e.nrm AS qnrm, p.cell,
         list_sum([e.qv[i] * c.cqv[i]
                   for i in generate_series(1, 64)]) AS qc,
         list_sum([c.cqv[i] * c.cqv[i]
                   for i in generate_series(1, 64)]) AS cn2
  FROM probes p JOIN cent c USING (cell) JOIN emb e ON e.vec_id = p.q
),
radc AS (
  SELECT b.q, cd.vec_id,
         MIN(b.qc) + SUM(l.part) AS dot,
         MIN(b.cn2) + SUM(x.rn2part) AS rn2,
         MIN(b.qnrm) AS qnrm
  FROM rcodes cd
  JOIN rbase b ON b.cell = cd.cell
  JOIN rqlut l ON l.q = b.q AND l.sub = cd.sub AND l.code = cd.code
  JOIN rcross x ON x.cell = cd.cell AND x.sub = cd.sub AND x.code = cd.code
  WHERE b.q <> cd.vec_id
  GROUP BY b.q, cd.vec_id
),
rnn AS (
  SELECT q, vec_id, adc_cos, rank FROM (
    SELECT q, vec_id, adc_cos,
           ROW_NUMBER() OVER (PARTITION BY q
                              ORDER BY adc_cos DESC, vec_id) AS rank
    FROM (
      SELECT q, vec_id,
             round(CAST(dot AS DOUBLE) / (qnrm * sqrt(CAST(rn2 AS DOUBLE))), 6)
               AS adc_cos
      FROM radc
    )
  ) WHERE rank <= 5
)"""

def _kmpp_sql(rounds: int = 3, oversample: int = 32, k: int = 16) -> str:
    """Unrolled k-means|| CTE chain — identical integer Bernoulli
    draw (hash40·Σd² < l·d²·2⁴⁰, HUGEINT twin of Spark's
    decimal(38,0)) and the same weight-DESC reduction."""
    _l2 = (
        "list_sum([(e.qv[i] - c.cqv[i]) * (e.qv[i] - c.cqv[i]) "
        "for i in generate_series(1, 64)])"
    )
    ctes = [
        f"""kcand0 AS MATERIALIZED (
      SELECT vec_id AS cand_id, qv AS cqv FROM emb
      ORDER BY {hash64_sql("CONCAT('kmpp:0:', CAST(vec_id AS VARCHAR))")}, vec_id
      LIMIT 1
    )"""
    ]
    for r in range(1, rounds + 1):
        h = hash64_sql(f"CONCAT('kmpp:{r}:', CAST(d.vec_id AS VARCHAR))")
        ctes += [
            f"""kd{r} AS MATERIALIZED (
      SELECT e.vec_id, e.qv, MIN({_l2}) AS d2
      FROM emb e CROSS JOIN kcand{r - 1} c GROUP BY e.vec_id, e.qv
    )""",
            f"kt{r} AS (SELECT SUM(CAST(d2 AS HUGEINT)) AS tot FROM kd{r})",
            f"""ksel{r} AS (
      SELECT d.vec_id AS cand_id, d.qv AS cqv
      FROM kd{r} d CROSS JOIN kt{r}
      WHERE CAST(({h}) % 1099511627776 AS HUGEINT) * tot
            < CAST({oversample} AS HUGEINT) * CAST(d.d2 AS HUGEINT)
              * CAST(1099511627776 AS HUGEINT)
    )""",
            f"""kcand{r} AS MATERIALIZED (
      SELECT DISTINCT cand_id, cqv FROM (
        SELECT cand_id, cqv FROM kcand{r - 1}
        UNION ALL SELECT cand_id, cqv FROM ksel{r}
      )
    )""",
        ]
    ctes.append(
        f"""kassign AS (
      SELECT e.vec_id,
             (MIN(struct_pack(d := {_l2}, c := c.cand_id))).c AS cand_id
      FROM emb e CROSS JOIN kcand{rounds} c GROUP BY e.vec_id
    )"""
    )
    ctes.append(
        "kw AS (SELECT cand_id, COUNT(*) AS weight FROM kassign GROUP BY 1)"
    )
    ctes.append(
        f"""ktop AS (
      SELECT cand_id, weight,
             ROW_NUMBER() OVER (ORDER BY weight DESC, cand_id) AS rn
      FROM kw QUALIFY rn <= {k}
    )"""
    )
    return ",\n    ".join(ctes)


SIM_ORACLE["sim_range_search"] = f"""
    WITH {EMB_SQL}
    SELECT eb.vec_id AS q, ea.vec_id,
           round({_PAIR_COS}, 6) AS cos_sim
    FROM emb ea CROSS JOIN emb eb
    WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
      AND round({_PAIR_COS}, 6) >= 0.35
"""

SIM_ORACLE["sim_range_search_ivf"] = f"""
    WITH {EMB_SQL}, {IVF_SQL},
    rexact AS (
      SELECT eb.vec_id AS q, ea.vec_id AS nn
      FROM emb ea CROSS JOIN emb eb
      WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
        AND round({_PAIR_COS}, 6) >= 0.35
    ),
    rivf AS (
      SELECT p.q, ea.vec_id AS nn
      FROM probes p
      JOIN assign s ON s.cell = p.cell
      JOIN emb ea ON ea.vec_id = s.vec_id
      JOIN emb eb ON eb.vec_id = p.q
      WHERE ea.vec_id <> p.q
        AND round({_cosq_sql('eb.qv', 'eb.nrm', 'ea.qv', 'ea.nrm')}, 6) >= 0.35
    ),
    rqs AS (SELECT DISTINCT vec_id AS q FROM emb WHERE vec_id < 10),
    rne AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n_exact FROM rexact GROUP BY q),
    rni AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n_ivf FROM rivf GROUP BY q),
    rnh AS (
      SELECT e.q, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM rexact e SEMI JOIN rivf i ON i.q = e.q AND i.nn = e.nn
      GROUP BY e.q
    )
    SELECT s.q,
           CAST(COALESCE(e.n_exact, 0) AS BIGINT) AS n_exact,
           CAST(COALESCE(i.n_ivf, 0) AS BIGINT) AS n_ivf,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CASE WHEN COALESCE(e.n_exact, 0) = 0 THEN 1.0
                ELSE round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
                           / CAST(e.n_exact AS DOUBLE), 6) END AS recall
    FROM rqs s
    LEFT JOIN rne e USING (q)
    LEFT JOIN rni i USING (q)
    LEFT JOIN rnh h USING (q)
"""

SIM_ORACLE["sim_kmeanspp_init"] = f"""
    WITH {EMB_SQL}, {_kmpp_sql()}
    SELECT CAST(rn - 1 AS INT) AS cell, cand_id AS vec_id,
           CAST(weight AS BIGINT) AS weight
    FROM ktop
"""

SIM_ORACLE["sim_kmeanspp_inertia"] = f"""
    WITH {EMB_SQL}, {IVF_SQL}, {_kmpp_sql()},
    kcv AS (
      SELECT e.qv AS cqv FROM ktop t JOIN emb e ON e.vec_id = t.cand_id
    ),
    m1 AS (
      SELECT e.vec_id,
             MIN(list_sum([(e.qv[i] - c.cqv[i]) * (e.qv[i] - c.cqv[i])
                           for i in generate_series(1, 64)])) AS d2
      FROM emb e CROSS JOIN cent c GROUP BY e.vec_id
    ),
    m2 AS (
      SELECT e.vec_id,
             MIN(list_sum([(e.qv[i] - c.cqv[i]) * (e.qv[i] - c.cqv[i])
                           for i in generate_series(1, 64)])) AS d2
      FROM emb e CROSS JOIN kcv c GROUP BY e.vec_id
    )
    SELECT 'md5_sample' AS method, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(d2) AS BIGINT) AS inertia FROM m1
    UNION ALL
    SELECT 'kmeanspp' AS method, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(d2) AS BIGINT) AS inertia FROM m2
"""

SIM_ORACLE["sim_ivfpq_residual_topk"] = f"""
    WITH {EMB_SQL}, {IVF_SQL}, {_RPQ_SQL}
    SELECT q, vec_id, CAST(rank AS INT) AS rank, adc_cos FROM rnn
"""

SIM_ORACLE["sim_ivfpq_residual_recall"] = f"""
    WITH {EMB_SQL}, {IVF_SQL}, {_RPQ_SQL},
    bscored AS (
      SELECT eb.vec_id AS q, ea.vec_id,
             round({_PAIR_COS}, 6) AS cos_sim
      FROM emb ea CROSS JOIN emb eb
      WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
    ),
    bnn AS (
      SELECT q, vec_id FROM (
        SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                          ORDER BY cos_sim DESC, vec_id) AS rank
        FROM bscored
      ) WHERE rank <= 5
    ),
    hits AS (
      SELECT b.q, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM bnn b JOIN rnn i ON i.q = b.q AND i.vec_id = b.vec_id
      GROUP BY b.q
    ),
    ret AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n_retrieved FROM rnn GROUP BY q),
    qspine AS (SELECT DISTINCT q FROM bnn)
    SELECT s.q,
           CAST(COALESCE(r.n_retrieved, 0) AS BIGINT) AS n_retrieved,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 6) AS recall
    FROM qspine s LEFT JOIN ret r USING (q) LEFT JOIN hits h USING (q)
"""

SIM_ORACLE["sim_ivfpq_recall"] = f"""
    WITH {EMB_SQL}, {IVF_SQL}, {PQ_SQL}, {_IVFPQ_NN_SQL},
    bscored AS (
      SELECT eb.vec_id AS q, ea.vec_id,
             round({_PAIR_COS}, 6) AS cos_sim
      FROM emb ea CROSS JOIN emb eb
      WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
    ),
    bnn AS (
      SELECT q, vec_id FROM (
        SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                          ORDER BY cos_sim DESC, vec_id) AS rank
        FROM bscored
      ) WHERE rank <= 5
    ),
    iscored AS (
      SELECT p.q, ea.vec_id,
             round({_cosq_sql('eb.qv', 'eb.nrm', 'ea.qv', 'ea.nrm')}, 6) AS cos_sim
      FROM probes p
      JOIN assign s ON s.cell = p.cell
      JOIN emb ea ON ea.vec_id = s.vec_id
      JOIN emb eb ON eb.vec_id = p.q
      WHERE ea.vec_id <> p.q
    ),
    inn AS (
      SELECT q, vec_id FROM (
        SELECT q, vec_id, ROW_NUMBER() OVER (PARTITION BY q
                          ORDER BY cos_sim DESC, vec_id) AS rank
        FROM iscored
      ) WHERE rank <= 5
    ),
    ihits AS (
      SELECT b.q, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM bnn b JOIN inn i ON i.q = b.q AND i.vec_id = b.vec_id
      GROUP BY b.q
    ),
    iret AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n FROM inn GROUP BY q),
    phits AS (
      SELECT b.q, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM bnn b JOIN ppnn p ON p.q = b.q AND p.vec_id = b.vec_id
      GROUP BY b.q
    ),
    pret AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n FROM ppnn GROUP BY q),
    qspine AS (SELECT DISTINCT q FROM bnn)
    SELECT s.q,
           CAST(COALESCE(ir.n, 0) AS BIGINT) AS n_retrieved_ivf,
           CAST(COALESCE(ih.n_hits, 0) AS BIGINT) AS n_hits_ivf,
           round(CAST(COALESCE(ih.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 6)
             AS recall_ivf,
           CAST(COALESCE(pr.n, 0) AS BIGINT) AS n_retrieved_ivfpq,
           CAST(COALESCE(ph.n_hits, 0) AS BIGINT) AS n_hits_ivfpq,
           round(CAST(COALESCE(ph.n_hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE), 6)
             AS recall_ivfpq
    FROM qspine s
    LEFT JOIN iret ir USING (q) LEFT JOIN ihits ih USING (q)
    LEFT JOIN pret pr USING (q) LEFT JOIN phits ph USING (q)
"""


def _q_sim_dedup_survivors(spark, sf):
    from bigclam_apachespark_spark.operators import dedup as DD

    emb = _emb(spark, sf)
    pairs = S.cosine_near_dup_pairs(emb, threshold=0.35, n_planes=4)
    out = DD.cluster_survivors(
        emb.select(F.col("vec_id").alias("doc_id")), pairs
    )
    return out.select(
        F.col("doc_id").alias("vec_id"), "cluster_id", "keep"
    )

SIM_ORACLE["sim_pair_hist"] = f"""
    WITH {EMB_SQL},
    samp AS (
      SELECT vec_id, qv, nrm FROM emb
      WHERE {hash64_sql("CAST(vec_id AS VARCHAR)")} % 5 = 0
    ),
    pairs AS (
      SELECT {_cosq_sql('a.qv', 'a.nrm', 'b.qv', 'b.nrm')} AS cos
      FROM samp a JOIN samp b ON a.vec_id < b.vec_id
    )
    SELECT CAST(greatest(least(floor((cos + 1.0) * 10.0), 19), 0) AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY 1
"""

def _mmr_sql(k: int = 4, n_cand: int = 16, lam: float = 0.5) -> str:
    """Unrolled greedy MMR twin of similarity.mmr_rerank: the k−1
    selection steps become chained CTEs (DuckDB has no iterative
    argmax); rel and pairwise sims are the same 6-dp quantized
    cosines, lam = 0.5 keeps every score exactly representable."""
    steps = []
    prev = "sel1"
    for i in range(2, k + 1):
        steps.append(f"""
        rem{i} AS (
          SELECT cand.* FROM cand
          WHERE NOT EXISTS (SELECT 1 FROM {prev} s
                            WHERE s.q = cand.q AND s.c = cand.c)
        ),
        ms{i} AS (
          SELECT pw.q, pw.a AS c, MAX(pw.s) AS maxsim
          FROM pw JOIN {prev} s ON s.q = pw.q AND s.c = pw.b
          GROUP BY pw.q, pw.a
        ),
        pick{i} AS (
          SELECT q, c, CAST({i} AS INT) AS sel_rank,
                 round({lam} * rel - {1.0 - lam} * maxsim, 6) AS mmr_score
          FROM (
            SELECT r.q, r.c, r.rel, m.maxsim,
                   ROW_NUMBER() OVER (
                     PARTITION BY r.q
                     ORDER BY ({lam} * r.rel - {1.0 - lam} * m.maxsim) DESC, r.c
                   ) AS rn
            FROM rem{i} r JOIN ms{i} m ON m.q = r.q AND m.c = r.c
          ) WHERE rn = 1
        ),
        sel{i} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{i})""")
        prev = f"sel{i}"
    return f"""
        WITH {EMB_SQL},
        cand AS (
          SELECT q, c, rel FROM (
            SELECT eb.vec_id AS q, ea.vec_id AS c,
                   round({_PAIR_COS}, 6) AS rel,
                   ROW_NUMBER() OVER (
                     PARTITION BY eb.vec_id
                     ORDER BY round({_PAIR_COS}, 6) DESC, ea.vec_id
                   ) AS rank
            FROM emb ea CROSS JOIN emb eb
            WHERE eb.vec_id < 10 AND ea.vec_id <> eb.vec_id
          ) WHERE rank <= {n_cand}
        ),
        pw AS (
          SELECT ca.q, ca.c AS a, cb.c AS b,
                 round({_cosq_sql('ea.qv', 'ea.nrm', 'eb.qv', 'eb.nrm')}, 6) AS s
          FROM cand ca
          JOIN cand cb ON cb.q = ca.q AND cb.c <> ca.c
          JOIN emb ea ON ea.vec_id = ca.c
          JOIN emb eb ON eb.vec_id = cb.c
        ),
        sel1 AS MATERIALIZED (
          SELECT q, c, CAST(1 AS INT) AS sel_rank,
                 round(rel, 6) AS mmr_score
          FROM (
            SELECT q, c, rel,
                   ROW_NUMBER() OVER (PARTITION BY q
                                      ORDER BY rel DESC, c) AS rn
            FROM cand
          ) WHERE rn = 1
        ),{','.join(steps)}
        SELECT q, c AS vec_id, sel_rank, mmr_score FROM {prev}
    """


SIM_ORACLE["sim_mmr_topk"] = _mmr_sql(4, 16, 0.5)

SIM_QUERIES = {
    "sim_jl_topk": lambda spark, sf: S.jl_topk(
        _emb(spark, sf), _queries_subset(spark, sf), k=5, k_dim=16
    ),
    "sim_jl_recall": lambda spark, sf: S.jl_recall_eval(
        _emb(spark, sf), _queries_subset(spark, sf), k=5, k_dim=16
    ),
    "sim_mmr_topk": lambda spark, sf: S.mmr_rerank(
        _emb(spark, sf), _queries_subset(spark, sf), k=4, n_cand=16, lam=0.5
    ),
    "sim_pair_hist": lambda spark, sf: S.cosine_histogram(_emb(spark, sf)),
    # SemDeDup at eps=0.4: the synthetic fixture has NO true near-dups
    # (measured max pairwise cosine 0.513 at sf0.01), so the query
    # runs at a threshold where the dominance sweep demonstrably
    # fires (18/500 dropped at sf0.01, 172/2000 at sf0.1); 0.95 is
    # the production default parameter, not the fixture's.
    "sim_semdedup": lambda spark, sf: S.semdedup(
        _emb(spark, sf), n_cells=16, eps=0.4
    ),
    "sim_semdedup_cell_stats": lambda spark, sf: S.semdedup_cell_stats(
        _emb(spark, sf), n_cells=16
    ),
    "sim_ivf_topk": lambda spark, sf: S.ivf_topk(
        _emb(spark, sf), _queries_subset(spark, sf), k=5, n_cells=16, nprobe=4
    ),
    "sim_ivf_topk_persisted": lambda spark, sf: _q_ivf_topk_persisted(spark, sf),
    "sim_ivf_index_upsert": lambda spark, sf: _q_ivf_index_upsert(spark, sf),
    "sim_ivfpq_topk": lambda spark, sf: _q_ivfpq_topk(spark, sf),
    "sim_pq_topk_kmeans": lambda spark, sf: S.pq_topk_kmeans(
        _emb(spark, sf), _queries_subset(spark, sf),
        k=5, m=16, ksub=64, rounds=2,
    ),
    "sim_pq_kmeans_recall": lambda spark, sf: S.pq_recall_compare_kmeans(
        _emb(spark, sf), _queries_subset(spark, sf),
        k=5, m=16, ksub=64, rounds=2,
    ),
    "sim_ivf_topk_kmeans": lambda spark, sf: S.ivf_topk_kmeans(
        _emb(spark, sf), _queries_subset(spark, sf),
        k=5, n_cells=16, nprobe=4, rounds=2,
    ),
    "sim_ivf_kmeans_recall": lambda spark, sf: S.ivf_recall_compare_kmeans(
        _emb(spark, sf), _queries_subset(spark, sf),
        k=5, n_cells=16, nprobe=4, rounds=2,
    ),
    "sim_ivfpq_recall": lambda spark, sf: S.ivfpq_recall_eval(
        _emb(spark, sf), _queries_subset(spark, sf),
        k=5, n_cells=16, nprobe=4, m=16, ksub=64,
    ),
    "sim_kmeanspp_init": lambda spark, sf: S.kmeanspp_candidates(
        _emb(spark, sf), k=16, oversample=32, rounds=3
    ),
    "sim_kmeanspp_inertia": lambda spark, sf: S.kmeanspp_inertia_compare(
        _emb(spark, sf), k=16, oversample=32, rounds=3
    ),
    "sim_ivfpq_residual_topk": lambda spark, sf: S.ivfpq_residual_topk(
        _emb(spark, sf), _queries_subset(spark, sf),
        k=5, n_cells=16, nprobe=4, m=16, ksub=64,
    ),
    "sim_ivfpq_residual_recall": lambda spark, sf: S.ivfpq_residual_recall_eval(
        _emb(spark, sf), _queries_subset(spark, sf),
        k=5, n_cells=16, nprobe=4, m=16, ksub=64,
    ),
    "sim_pq_topk": lambda spark, sf: S.pq_topk(
        _emb(spark, sf), _queries_subset(spark, sf), k=5, m=16, ksub=64
    ),
    "sim_pq_recall": lambda spark, sf: S.pq_recall_eval(
        _emb(spark, sf), _queries_subset(spark, sf), k=5, m=16, ksub=64
    ),
    "sim_sq8_topk": lambda spark, sf: S.sq8_topk(
        _emb(spark, sf), _queries_subset(spark, sf), k=5
    ),
    "sim_sq8_recall": lambda spark, sf: S.sq8_recall_eval(
        _emb(spark, sf), _queries_subset(spark, sf), k=5
    ),
    "sim_ivfsq8_topk": lambda spark, sf: S.ivfsq8_topk(
        _emb(spark, sf), _queries_subset(spark, sf), k=5, n_cells=16, nprobe=4
    ),
    "sim_ivfsq8_recall": lambda spark, sf: S.ivfsq8_recall_eval(
        _emb(spark, sf), _queries_subset(spark, sf), k=5, n_cells=16, nprobe=4
    ),
    "sim_range_search": lambda spark, sf: S.range_search(
        _emb(spark, sf), _queries_subset(spark, sf), min_cos=0.35
    ),
    "sim_range_search_ivf": lambda spark, sf: S.range_search_ivf_eval(
        _emb(spark, sf), _queries_subset(spark, sf),
        min_cos=0.35, n_cells=16, nprobe=4,
    ),
    "sim_topk_brute": lambda spark, sf: S.brute_force_topk(
        _emb(spark, sf), _queries_subset(spark, sf), k=5
    ),
    "sim_hyperplane_buckets": lambda spark, sf: S.hyperplane_buckets(_emb(spark, sf)),
    "sim_lsh_topk": lambda spark, sf: S.lsh_topk(
        _emb(spark, sf), _queries_subset(spark, sf), k=5, n_planes=8
    ),
    "sim_cosine_near_dups": lambda spark, sf: S.cosine_near_dup_pairs(
        _emb(spark, sf), threshold=0.35, n_planes=4
    ),
    "sim_embedding_components": lambda spark, sf: S.embedding_components(
        _emb(spark, sf), threshold=0.35, n_planes=4
    ),
    "sim_ann_ladder": lambda spark, sf: S.ann_recall_ladder(
        _emb(spark, sf), _queries_subset(spark, sf), k=5
    ),
    "sim_dedup_survivors": _q_sim_dedup_survivors,
    "sim_knn_label_eval": lambda spark, sf: S.knn_label_eval(
        _emb(spark, sf), k=5, n_queries=50
    ),
    "sim_lsh_recall": lambda spark, sf: S.lsh_recall_eval(
        _emb(spark, sf), _queries_subset(spark, sf), k=5, n_planes=8
    ),
    "sim_ivf_recall": lambda spark, sf: S.ivf_recall_eval(
        _emb(spark, sf), _queries_subset(spark, sf), k=5, n_cells=16, nprobe=4
    ),
    "sim_kmeans_iteration": lambda spark, sf: S.kmeans_iteration(
        _emb(spark, sf), n_cells=16
    ),
    "sim_kmeans_refined": lambda spark, sf: S.kmeans_refined(
        _emb(spark, sf), n_cells=16, rounds=2
    ),
    "sim_cluster_topics": lambda spark, sf: S.cluster_topics(
        _emb(spark, sf), _docs(spark, sf), n_cells=16, k_terms=5
    ),
    "sim_lsh_topk_multi": lambda spark, sf: S.lsh_topk_multi(
        _emb(spark, sf), _queries_subset(spark, sf), k=5, n_planes=4, n_tables=4
    ),
}

# ---------------------------------------------------------------------------
# Events (batch + one streaming replay)
# ---------------------------------------------------------------------------

EVENT_ORACLE = {
    "events_topk_window": """
        SELECT window_start, user_id, n_events, CAST(rank AS INT) AS rank
        FROM (
          SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                 user_id, COUNT(*) AS n_events,
                 ROW_NUMBER() OVER (
                   PARTITION BY time_bucket(INTERVAL '1 hour', ts)
                   ORDER BY COUNT(*) DESC, user_id
                 ) AS rank
          FROM events GROUP BY 1, 2
        ) WHERE rank <= 3
    """,
    "events_tumbling": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               round(SUM(value), 6) AS sum_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2
    """,
    "events_sliding": """
        WITH expanded AS (
          SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                         time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
                   AS window_start,
                 value
          FROM events
        )
        SELECT window_start, COUNT(*) AS n_events, round(AVG(value), 6) AS avg_value
        FROM expanded GROUP BY 1
    """,
    "events_sessionize": """
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          -- CAST: the running SUM over INTEGER yields HUGEINT →
          -- float64 through pandas — the r2 events_sessionize
          -- hash-FAIL root cause (Spark emits LONG).
          SELECT user_id, ts, value,
                 CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM flagged
        )
        SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
               COUNT(*) AS n_events, round(SUM(value), 6) AS sum_value
        FROM sess GROUP BY user_id, session_id
    """,
    # Window anomaly z-scores: Σx and Σx² are exact INTEGER window
    # sums on both engines, and the mean/var/z arithmetic mirrors the
    # Spark expression tree op-for-op — identical IEEE inputs and
    # order, so the doubles match bit-for-bit before the round.
    "events_anomaly": """
        WITH counts AS (
          SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1, 2
        ),
        stats AS (
          SELECT window_start, event_type, n_events,
                 CAST(SUM(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS sx,
                 CAST(SUM(n_events * n_events) OVER (PARTITION BY event_type) AS BIGINT) AS sxx,
                 COUNT(*) OVER (PARTITION BY event_type) AS cnt
          FROM counts
        )
        SELECT window_start, event_type, n_events,
               round(CASE WHEN cnt >= 2
                          AND (CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE))
                              / CAST(cnt - 1 AS DOUBLE) > 0
                     THEN (CAST(n_events AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE))
                          / sqrt((CAST(sxx AS DOUBLE)
                                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE))
                                 / CAST(cnt - 1 AS DOUBLE))
                     ELSE 0.0 END, 6) AS z_score
        FROM stats
    """,
    # ROLLUP subtotal report (grouping level disambiguates subtotal
    # NULLs). GROUPING() bit order matches Spark's grouping_id for
    # (event_type, day): bit 1 = event_type, bit 0 = day.
    "events_rollup": """
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(GROUPING(event_type) * 2 + GROUPING(
                    CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS INT) AS lvl
        FROM events
        GROUP BY ROLLUP (event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400)
    """,
    # First-order type-transition counts: LAG over the (ts, event_id)
    # deterministic per-user order — all integer outputs.
    "events_transitions": """
        WITH seq AS (
          SELECT event_type,
                 LAG(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM events
        )
        SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    """,
    # PIVOT surface: conditional-aggregation twin of the Spark
    # groupBy().pivot() with the explicit value list.
    "events_pivot": """
        SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
               CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
               CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
               CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
               CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
        FROM events GROUP BY 1
    """,
    # DAU/WAU stickiness: trailing 7-day distinct via bounded 7x
    # fan-out of the (user, day) table.
    "events_dau_wau": """
        WITH ud AS (
          SELECT DISTINCT user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
          FROM events
        ),
        dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
                FROM ud GROUP BY day),
        contrib AS (
          SELECT user_id, day + d AS day
          FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS d)
        ),
        wau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
                FROM contrib GROUP BY day)
        SELECT d.day, d.dau, w.wau,
               round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
        FROM dau d JOIN wau w USING (day)
    """,
    # Exact per-type value quantiles: q is a selected input value;
    # the rank threshold ceil(p*n) is one identical double product.
    "events_value_quantiles": """
        WITH ev AS (
          SELECT event_type, event_id, value FROM events
          WHERE value IS NOT NULL
        ),
        ranked AS (
          SELECT event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS r
          FROM ev
        ),
        n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
              FROM ev GROUP BY event_type),
        probes AS (
          SELECT event_type, n, unnest([0.5, 0.9, 0.99]::DOUBLE[]) AS p FROM n
        )
        SELECT rk.event_type, pr.p, MIN(rk.value) AS q
        FROM ranked rk JOIN probes pr USING (event_type)
        WHERE rk.r >= ceil(pr.p * pr.n)
        GROUP BY rk.event_type, pr.p
    """,
    # Power/MDE twin: same HUGEINT moments, identical IEEE chain.
    "events_ab_power": f"""
        WITH ev AS (
          SELECT user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                 CAST(round(value * 100) AS BIGINT) AS vc
          FROM events WHERE value IS NOT NULL
        ),
        span AS (
          SELECT CAST(floor((MIN(day) + MAX(day)) / 2.0) AS BIGINT) AS mid
          FROM ev
        ),
        pu AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN day <= s.mid THEN vc ELSE 0 END)
                      AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN day > s.mid THEN vc ELSE 0 END)
                      AS BIGINT) AS y
          FROM ev CROSS JOIN span s GROUP BY user_id
        ),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                 CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT)
                   AS sxy,
                 CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT)
                   AS sxx,
                 CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT)
                   AS syy
          FROM pu
        ),
        calc AS (
          SELECT n,
                 (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                    / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS var_y,
                 (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                    / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS var_x,
                 (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                    / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS cov
          FROM mom
        ),
        rho AS (
          SELECT n, var_y,
                 CASE WHEN var_x > 0.0 AND var_y > 0.0
                      THEN cov * cov / (var_x * var_y) ELSE 0.0 END AS rho2
          FROM calc
        )
        SELECT n AS n_users,
               round(var_y / 100.0, 6) AS var_y_milli,
               round(rho2 * 1000.0, 6) AS rho2_milli,
               round((1.0 - rho2) * 1000.0, 6) AS vr_factor_milli,
               round(2.8 * sqrt(var_y) * sqrt(2.0 / (CAST(n AS DOUBLE) / 2.0))
                     * 10.0, 6) AS mde_milli,
               round(2.8 * sqrt(var_y * (1.0 - rho2))
                     * sqrt(2.0 / (CAST(n AS DOUBLE) / 2.0)) * 10.0, 6)
                 AS mde_cuped_milli
        FROM rho
    """,
    # CUPED twin: decimal moments, the identical fixed IEEE chain for
    # theta and the adjusted means, zero-variance degeneracy to 0.
    "events_ab_cuped": f"""
        WITH ev AS (
          SELECT user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                 CAST(round(value * 100) AS BIGINT) AS vc
          FROM events WHERE value IS NOT NULL
        ),
        span AS (
          SELECT CAST(floor((MIN(day) + MAX(day)) / 2.0) AS BIGINT) AS mid
          FROM ev
        ),
        pu AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN day <= s.mid THEN vc ELSE 0 END)
                      AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN day > s.mid THEN vc ELSE 0 END)
                      AS BIGINT) AS y,
                 CASE WHEN ({hash64_sql('CAST(user_id AS VARCHAR)')}) % 2 = 0
                      THEN 'control' ELSE 'treatment' END AS arm
          FROM ev CROSS JOIN span s
          GROUP BY user_id, arm
        ),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                 CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT)
                   AS sxy,
                 CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT)
                   AS sxx
          FROM pu
        ),
        th AS (
          SELECT n, sx,
                 CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
                      THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      ELSE 0.0 END AS theta
          FROM mom
        ),
        arms AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS ax,
                 CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS ay
          FROM pu GROUP BY arm
        )
        SELECT a.arm, a.n_users,
               round(CAST(a.ay AS DOUBLE) / CAST(a.n_users AS DOUBLE) * 10.0,
                     6) AS mean_y_milli,
               round((CAST(a.ay AS DOUBLE) / CAST(a.n_users AS DOUBLE)
                      - t.theta * (CAST(a.ax AS DOUBLE)
                                   / CAST(a.n_users AS DOUBLE)
                                   - CAST(t.sx AS DOUBLE)
                                   / CAST(t.n AS DOUBLE))) * 10.0,
                     6) AS mean_adj_milli
        FROM arms a CROSS JOIN th t
    """,
    # Seasonal-naive backtest twin: lag-7 self-join on the day
    # relation, exact-integer error sums, one division to milli.
    "events_forecast_backtest": """
        WITH daily AS (
          SELECT event_type,
                 CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        scored AS (
          SELECT a.event_type, a.c, p.c AS pred
          FROM daily a JOIN daily p
            ON p.event_type = a.event_type AND p.day = a.day - 7
        )
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_scored_days,
               round(CAST(SUM(abs(c - pred)) AS DOUBLE) * 1000.0
                     / CAST(COUNT(*) AS DOUBLE), 6) AS mae_milli,
               round(CAST(SUM(c - pred) AS DOUBLE) * 1000.0
                     / CAST(COUNT(*) AS DOUBLE), 6) AS bias_milli
        FROM scored GROUP BY event_type
    """,
    # Changepoint twin: all-integer cross-multiplied CUSUM/KS
    # deviation, argmax with earlier-day tie-break.
    "events_changepoint": """
        WITH daily AS (
          SELECT event_type,
                 CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        cum AS (
          SELECT event_type, day,
                 SUM(c) OVER (PARTITION BY event_type ORDER BY day) AS s_i,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
          FROM daily
        ),
        tot AS (
          SELECT event_type, CAST(MAX(i) AS BIGINT) AS n_days,
                 CAST(MAX(s_i) AS BIGINT) AS n_total
          FROM cum GROUP BY event_type
        ),
        dev AS (
          SELECT c.event_type, c.day, t.n_days, t.n_total,
                 abs(t.n_days * c.s_i - c.i * t.n_total) AS dev
          FROM cum c JOIN tot t USING (event_type)
        )
        SELECT event_type,
               (min(struct_pack(d := -dev, day := day, v := dev))).day AS cp_day,
               CAST(MIN(n_days) AS BIGINT) AS n_days,
               CAST(MIN(n_total) AS BIGINT) AS n_total,
               CAST((min(struct_pack(d := -dev, day := day, v := dev))).v
                    AS BIGINT) AS dev_num
        FROM dev GROUP BY event_type
    """,
    # Equi-depth binning twin: exact order-statistic boundaries at
    # k/10, bin = count of boundaries strictly below the cent value
    # (the deterministic tie rule — NTILE's within-tie split can
    # never hash-match).
    "events_equidepth_bins": """
        WITH ev AS (
          SELECT event_type, event_id,
                 CAST(round(value * 100) AS BIGINT) AS vc
          FROM events WHERE value IS NOT NULL
        ),
        ranked AS (
          SELECT event_type, vc,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY vc, event_id) AS r
          FROM ev
        ),
        n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
              FROM ev GROUP BY event_type),
        probes AS (
          SELECT event_type, n, unnest(generate_series(1, 9)) AS k FROM n
        ),
        bounds AS (
          SELECT rk.event_type, pr.k, MIN(rk.vc) AS b
          FROM ranked rk JOIN probes pr USING (event_type)
          WHERE rk.r >= ceil(CAST(pr.k AS DOUBLE) * pr.n / 10)
          GROUP BY rk.event_type, pr.k
        ),
        assigned AS (
          SELECT e.event_type, e.event_id, e.vc,
                 CAST(SUM(CASE WHEN bo.b < e.vc THEN 1 ELSE 0 END) AS INT)
                   AS bin
          FROM ev e JOIN bounds bo USING (event_type)
          GROUP BY e.event_type, e.event_id, e.vc
        )
        SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(vc) AS lo_cents, MAX(vc) AS hi_cents
        FROM assigned GROUP BY event_type, bin
    """,
    # CUBE: rollup's lattice plus the per-day cross-type slice.
    "events_cube": """
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(GROUPING(event_type) * 2 + GROUPING(
                    CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS INT) AS lvl
        FROM events
        GROUP BY CUBE (event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400)
    """,
    # Set EXCEPT: click users who never purchased.
    "events_click_no_purchase": """
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """,
    # Set INTERSECT: users who both clicked and purchased.
    "events_click_and_purchase": """
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """,
    # OHLC resample: every output is a SELECTED input value (no
    # arithmetic) — bit-exact without rounding.
    "events_ohlc": """
        WITH base AS (
          SELECT event_type,
                 (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS slot,
                 ts, event_id, value,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type,
                     (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600
                   ORDER BY ts, event_id) AS rn_a,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type,
                     (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600
                   ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events
        )
        SELECT event_type,
               make_timestamp(slot * 1000000) AS window_start,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM base GROUP BY event_type, slot
    """,
    # Gap-filled rollup + locf: slots from integer epoch-hour math;
    # the fill copies the already-rounded aggregate.
    "events_gapfill": """
        WITH agg AS (
          SELECT event_type,
                 (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS slot,
                 round(SUM(value), 6) AS sum_value
          FROM events GROUP BY 1, 2
        ),
        spans AS (
          SELECT event_type, MIN(slot) AS lo, MAX(slot) AS hi
          FROM agg GROUP BY event_type
        ),
        grid AS (
          SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS slot
          FROM spans
        ),
        j AS (
          SELECT g.event_type, g.slot, a.sum_value
          FROM grid g LEFT JOIN agg a USING (event_type, slot)
        )
        SELECT event_type,
               make_timestamp(slot * 1000000) AS window_start,
               last_value(sum_value IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY slot
                 ROWS UNBOUNDED PRECEDING
               ) AS sum_value,
               CAST(CASE WHEN sum_value IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
        FROM j
    """,
    # (events_hll_users — the deterministic-HLL oracle — is appended
    # below the literal; it needs the Python-computed α·m² constants.)
    # Weekly cohort retention — pure integer week arithmetic
    # (floor-seconds // 604800), cross-engine exact.
    "events_retention": """
        WITH uw AS (
          SELECT DISTINCT user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
          FROM events
        ),
        c AS (SELECT user_id, MIN(wk) AS cwk FROM uw GROUP BY user_id)
        SELECT c.cwk AS cohort_week, uw.wk - c.cwk AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM uw JOIN c USING (user_id)
        GROUP BY 1, 2
    """,
    # Time-to-convert: all-integer latencies, selected order
    # statistics under the shared ceil(p·n) convention.
    "events_time_to_convert": """
        WITH keyed AS (
          SELECT user_id, event_type,
                 CAST(floor(epoch(ts)) AS BIGINT) AS s, event_id AS e
          FROM events
        ),
        fc AS (
          SELECT user_id, MIN({'s': s, 'e': e}) AS ck
          FROM keyed WHERE event_type = 'click' GROUP BY user_id
        ),
        conv AS (
          SELECT k.user_id,
                 MIN({'s': k.s, 'e': k.e}) AS pk, MIN(fc.ck) AS ck
          FROM keyed k JOIN fc USING (user_id)
          WHERE k.event_type = 'purchase' AND {'s': k.s, 'e': k.e} > fc.ck
          GROUP BY k.user_id
        ),
        lat AS (
          SELECT user_id, CAST(pk.s - ck.s AS BIGINT) AS lat FROM conv
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lat),
        ranked AS (
          SELECT lat, ROW_NUMBER() OVER (ORDER BY lat, user_id) AS r FROM lat
        )
        SELECT p, MIN(lat) AS latency_sec, MIN(n.n) AS n_converted
        FROM ranked CROSS JOIN n
        CROSS JOIN (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS p) ps
        WHERE r >= ceil(p * n.n)
        GROUP BY p ORDER BY p
    """,
    # KMV: k-th smallest hash is a SELECTED integer; the estimate is
    # one division — the deterministic-sketch contract, third family.
    # Histogram quantile sketch vs exact: all arithmetic (bin width,
    # bin index, rank threshold, in-bin interpolation) is integer over
    # cents; the per-type cumulative window runs over <= 64 bins. The
    # exact twin ranks the SAME cents domain (ties by event_id) so
    # abs_err_cents is the sketch's true measured price.
    "events_quantile_sketch": """
        WITH ev AS (
          SELECT event_type, event_id,
                 CAST(round(value * 100) AS BIGINT) AS vc
          FROM events WHERE value IS NOT NULL
        ),
        rng AS (
          SELECT event_type, MIN(vc) AS mn, MAX(vc) AS mx,
                 COUNT(*) AS n
          FROM ev GROUP BY event_type
        ),
        rw AS (SELECT event_type, mn, n, (mx - mn) // 64 + 1 AS width FROM rng),
        hist AS (
          SELECT e.event_type, (e.vc - r.mn) // r.width AS bin, COUNT(*) AS cnt
          FROM ev e JOIN rw r USING (event_type) GROUP BY 1, 2
        ),
        cum AS (
          SELECT event_type, bin, cnt,
                 SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum
          FROM hist
        ),
        probes AS (
          SELECT r.event_type, r.n, r.mn, r.width, p,
                 CAST(ceil(p * r.n) AS BIGINT) AS t
          FROM rw r
          CROSS JOIN (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS p)
        ),
        pick AS (
          SELECT c.event_type, pr.p, pr.n, pr.mn, pr.width, pr.t,
                 MIN(c.bin) AS bin
          FROM cum c JOIN probes pr USING (event_type)
          WHERE c.cum >= pr.t
          GROUP BY 1, 2, 3, 4, 5, 6
        ),
        est AS (
          SELECT p.event_type, p.p, p.n,
                 p.mn + p.bin * p.width
                   + ((p.t - (c.cum - c.cnt)) * p.width) // c.cnt AS est_c
          FROM pick p
          JOIN cum c ON c.event_type = p.event_type AND c.bin = p.bin
        ),
        ranked AS (
          SELECT event_type, vc,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY vc, event_id) AS r
          FROM ev
        ),
        ex AS (
          SELECT rk.event_type, pr.p, MIN(rk.vc) AS exact_c
          FROM ranked rk JOIN probes pr USING (event_type)
          WHERE rk.r >= pr.t
          GROUP BY 1, 2
        )
        SELECT e.event_type, e.p, CAST(e.n AS BIGINT) AS n,
               round(CAST(e.est_c AS DOUBLE) / 100.0, 6) AS est,
               round(CAST(x.exact_c AS DOUBLE) / 100.0, 6) AS exact,
               CAST(abs(e.est_c - x.exact_c) AS BIGINT) AS abs_err_cents
        FROM est e JOIN ex x USING (event_type, p)
    """,
    "events_kmv_users": f"""
        WITH hashed AS (
          SELECT DISTINCT event_type AS grp,
                 {hash64_sql('CAST(user_id AS VARCHAR)')} AS h
          FROM events
        ),
        nd AS (
          SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_exact
          FROM hashed GROUP BY grp
        ),
        kth AS (
          SELECT grp, h AS hk FROM (
            SELECT grp, h,
                   ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS r
            FROM hashed
          ) WHERE r = 64
        ),
        est AS (
          SELECT nd.grp, n_exact,
                 CASE WHEN n_exact < 64 THEN CAST(n_exact AS DOUBLE)
                      ELSE 63.0 / (CAST(hk AS DOUBLE) / 1152921504606846976.0)
                 END AS e
          FROM nd LEFT JOIN kth ON kth.grp = nd.grp
        )
        SELECT grp AS event_type, n_exact, round(e, 6) AS n_kmv,
               round(abs(e - CAST(n_exact AS DOUBLE))
                     / CAST(n_exact AS DOUBLE), 6) AS rel_err
        FROM est
    """,
    # Median/MAD: both medians are SELECTED values under the shared
    # ceil(p·n) convention; the k·MAD compare is on identical doubles.
    "events_robust_outliers": """
        WITH ev AS (
          SELECT event_type, event_id, value FROM events
          WHERE value IS NOT NULL
        ),
        n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1),
        r1 AS MATERIALIZED (
          SELECT event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS r
          FROM ev
        ),
        med AS (
          SELECT r1.event_type, MIN(value) AS med
          FROM r1 JOIN n USING (event_type)
          WHERE r >= ceil(0.5 * n) GROUP BY r1.event_type
        ),
        dev AS (
          SELECT ev.event_type, ev.event_id, abs(ev.value - med.med) AS dev
          FROM ev JOIN med USING (event_type)
        ),
        r2 AS MATERIALIZED (
          SELECT event_type, dev,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY dev, event_id) AS r
          FROM dev
        ),
        mad AS (
          SELECT r2.event_type, MIN(dev) AS mad
          FROM r2 JOIN n USING (event_type)
          WHERE r >= ceil(0.5 * n) GROUP BY r2.event_type
        ),
        fl AS (
          SELECT dev.event_type,
                 CAST(SUM(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers
          FROM dev JOIN mad USING (event_type) GROUP BY dev.event_type
        )
        SELECT event_type, round(med, 6) AS med, round(mad, 6) AS mad,
               n_outliers
        FROM med JOIN mad USING (event_type) JOIN fl USING (event_type)
    """,
    # In-session funnel: same lag+cumsum session ids as sessionize;
    # the order test is a (floor-seconds, event_id) tuple compare and
    # converted ⟺ max(purchase key) > min(click key).
    "events_session_funnel": """
        WITH flagged AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR CAST(floor(epoch(ts)) AS BIGINT)
                           - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT user_id, ts, event_id, event_type,
                 CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                 CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM flagged
        ),
        per AS (
          SELECT user_id, session_id,
                 CAST(MIN(ts) AS DATE) AS day,
                 MIN(CASE WHEN event_type = 'click'
                          THEN ROW(sec, event_id) END) AS ck,
                 MAX(CASE WHEN event_type = 'purchase'
                          THEN ROW(sec, event_id) END) AS pk
          FROM sess GROUP BY user_id, session_id
        ),
        cls AS (
          SELECT day,
                 CASE WHEN ck IS NOT NULL THEN 1 ELSE 0 END AS clicked,
                 CASE WHEN ck IS NOT NULL AND pk IS NOT NULL AND pk > ck
                      THEN 1 ELSE 0 END AS converted
          FROM per
        ),
        agg AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS n_sessions,
                 CAST(SUM(clicked) AS BIGINT) AS n_with_click,
                 CAST(SUM(converted) AS BIGINT) AS n_converted
          FROM cls GROUP BY day
        )
        SELECT day, n_sessions, n_with_click, n_converted,
               CASE WHEN n_with_click > 0
                    THEN round(CAST(n_converted AS DOUBLE)
                               / CAST(n_with_click AS DOUBLE), 6)
               END AS conv_rate
        FROM agg
    """,
    # Salted-kernel result identity: the oracle is the PLAIN
    # COUNT(DISTINCT) the skew-safe plan claims to reproduce.
    "events_salted_distinct": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
        FROM events GROUP BY event_type
    """,
    # Cohort LTV: integer-cents revenue, integer cumsum, one
    # fixed-order division chain per output row.
    "events_cohort_ltv": """
        WITH uw AS (
          SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
          FROM events
        ),
        first AS (SELECT user_id, MIN(wk) AS cwk FROM uw GROUP BY user_id),
        sizes AS (
          SELECT cwk, CAST(COUNT(*) AS BIGINT) AS cohort_size
          FROM first GROUP BY cwk
        ),
        rev AS (
          SELECT f.cwk AS cohort_week,
                 (CAST(floor(epoch(e.ts)) AS BIGINT) // 604800) - f.cwk AS week_offset,
                 CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS wk_cents
          FROM events e JOIN first f USING (user_id)
          WHERE e.event_type = 'purchase'
          GROUP BY 1, 2
        ),
        cum AS (
          SELECT cohort_week, week_offset, wk_cents,
                 CAST(SUM(wk_cents) OVER (PARTITION BY cohort_week
                      ORDER BY week_offset
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_cents
          FROM rev
        )
        SELECT cohort_week, week_offset, s.cohort_size,
               round(CAST(wk_cents AS DOUBLE) / 100.0, 6) AS wk_revenue,
               round(CAST(cum_cents AS DOUBLE) / 100.0
                     / CAST(s.cohort_size AS DOUBLE), 6) AS cum_ltv_per_user
        FROM cum JOIN sizes s ON s.cwk = cum.cohort_week
    """,
    # Daily DAU decomposition into new vs returning users.
    "events_growth_accounting": """
        WITH ud AS (
          SELECT DISTINCT user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
          FROM events
        ),
        f AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id)
        SELECT ud.day,
               CAST(SUM(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN ud.day <> f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_returning
        FROM ud JOIN f USING (user_id)
        GROUP BY ud.day
    """,
    "events_props": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events
    """,
    # Variant path access must agree with the string-walk extraction
    # value-for-value; only the Spark-side access path differs.
    "events_props_variant": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events
    """,
    # Built-in session_window twin: the merge boundary is INCLUSIVE
    # (an event at exactly prev+gap EXTENDS the session — unit-tested
    # against the operator, it is the same strict-> rule as the
    # islands sessionize); session_end = last event + gap.
    "events_session_window": """
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR CAST(floor(epoch(ts)) AS BIGINT)
                           - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT user_id, ts, value,
                 CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
          FROM flagged
        )
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               round(SUM(value), 6) AS sum_value
        FROM sess GROUP BY user_id, sid
    """,
    # Strict-order funnel: first view → first click ≥ view → first
    # purchase ≥ click. Exact timestamps only.
    "events_ordered_funnel": """
        WITH v AS (
          SELECT user_id, MIN(ts) AS view_ts FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS click_ts
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts >= v.view_ts
          GROUP BY e.user_id
        ),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS purchase_ts
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
          GROUP BY e.user_id
        ),
        u AS (SELECT DISTINCT user_id FROM events)
        SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
               CAST(CASE WHEN p.purchase_ts IS NOT NULL THEN 3
                         WHEN c.click_ts IS NOT NULL THEN 2
                         WHEN v.view_ts IS NOT NULL THEN 1
                         ELSE 0 END AS INT) AS stage
        FROM u LEFT JOIN v USING (user_id)
               LEFT JOIN c USING (user_id)
               LEFT JOIN p USING (user_id)
    """,
    "events_funnel": """
        SELECT user_id,
               COUNT(*) FILTER (event_type = 'view') AS view,
               COUNT(*) FILTER (event_type = 'click') AS click,
               COUNT(*) FILTER (event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (event_type = 'signup') AS signup,
               COUNT(*) FILTER (event_type = 'error') AS error
        FROM events GROUP BY user_id
    """,
    # As-of join (operators/temporal.py): the oracle states the same
    # semantics relationally — max prior click ts per purchase, then
    # max click_id at that ts (the deterministic tie-break the Spark
    # union-sort applies via its (ts, tie) ordering).
    # FORWARD as-of: next purchase at-or-after each click; ties at
    # the matched timestamp -> smallest purchase id (forward rule).
    "events_asof_forward": """
        WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             best AS (
               SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
                      min(p.ts) AS purchase_ts
               FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts
               GROUP BY 1, 2, 3
             )
        SELECT b.click_id, b.user_id, b.click_ts, b.purchase_ts,
               min(p2.event_id) AS purchase_id,
               CASE WHEN b.purchase_ts IS NULL THEN NULL
                    ELSE epoch_us(b.purchase_ts) - epoch_us(b.click_ts) END AS lag_us
        FROM best b LEFT JOIN p p2
          ON p2.user_id = b.user_id AND p2.ts = b.purchase_ts
        GROUP BY 1, 2, 3, 4
    """,
    # NEAREST as-of: closest click either side of each purchase;
    # exact-distance ties resolve backward; click-id tie rule follows
    # the winning side (backward -> max id, forward -> min id).
    "events_asof_nearest": """
        WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             bk AS (
               SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
                      max(c.ts) AS bts
               FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
               GROUP BY 1, 2, 3
             ),
             fw AS (
               SELECT p.event_id AS purchase_id, min(c.ts) AS fts
               FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts >= p.ts
               GROUP BY 1
             ),
             pick AS (
               SELECT b.purchase_id, b.user_id, b.purchase_ts,
                      CASE WHEN b.bts IS NOT NULL AND (f.fts IS NULL
                                 OR epoch_us(b.purchase_ts) - epoch_us(b.bts)
                                    <= epoch_us(f.fts) - epoch_us(b.purchase_ts))
                           THEN b.bts ELSE f.fts END AS click_ts,
                      CASE WHEN b.bts IS NOT NULL AND (f.fts IS NULL
                                 OR epoch_us(b.purchase_ts) - epoch_us(b.bts)
                                    <= epoch_us(f.fts) - epoch_us(b.purchase_ts))
                           THEN 1 ELSE 0 END AS took_backward
               FROM bk b JOIN fw f USING (purchase_id)
             )
        SELECT k.purchase_id, k.user_id, k.purchase_ts, k.click_ts,
               CASE WHEN k.took_backward = 1 THEN max(c2.event_id)
                    ELSE min(c2.event_id) END AS click_id,
               CASE WHEN k.click_ts IS NULL THEN NULL
                    ELSE epoch_us(k.click_ts) - epoch_us(k.purchase_ts) END AS gap_us
        FROM pick k LEFT JOIN c c2
          ON c2.user_id = k.user_id AND c2.ts = k.click_ts
        GROUP BY 1, 2, 3, 4, k.took_backward
    """,
    "events_asof_attribution": """
        WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             best AS (
               SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
                      max(c.ts) AS click_ts
               FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
               GROUP BY 1, 2, 3
             )
        SELECT b.purchase_id, b.user_id, b.purchase_ts, b.click_ts,
               max(c2.event_id) AS click_id,
               CASE WHEN b.click_ts IS NULL THEN NULL
                    ELSE epoch_us(b.purchase_ts) - epoch_us(b.click_ts) END AS gap_us
        FROM best b LEFT JOIN c c2
          ON c2.user_id = b.user_id AND c2.ts = b.click_ts
        GROUP BY 1, 2, 3, 4
    """,
    # Range join: closed attribution window [purchase_ts - 1h, purchase_ts].
    "events_range_attribution": """
        WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
        SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
               COUNT(c.ts) AS n_clicks,
               round(COALESCE(SUM(c.value), 0), 6) AS sum_click_value
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id
         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '60 minutes'
        GROUP BY 1, 2, 3
    """,
    # Stateful streaming sessionize replay (timeout="none", bounded
    # AvailableNow): emits exactly the gap-closed sessions — the
    # batch sessionization minus each user's final session (which
    # stays open in the state store).
    "events_stream_sessionize": """
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT user_id, ts, value,
                 CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM flagged
        ),
        agg AS (
          SELECT user_id, session_id,
                 min(ts) AS session_start, max(ts) AS session_end,
                 COUNT(*) AS n_events, round(SUM(value), 6) AS sum_value
          FROM sess GROUP BY user_id, session_id
        ),
        last_s AS (
          SELECT user_id, MAX(session_id) AS last_id FROM agg GROUP BY user_id
        )
        SELECT a.user_id, a.session_start, a.session_end, a.n_events, a.sum_value
        FROM agg a JOIN last_s l USING (user_id)
        WHERE a.session_id < l.last_id
    """,
    # Stream-stream interval join replay: INNER results emit as
    # matches arrive (no watermark wait), so the bounded AvailableNow
    # replay equals the batch relational answer exactly.
    "events_stream_interval_join": """
        SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
               c.ts AS click_ts, c.value AS click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '60 minutes'
    """,
    # LEFT OUTER stream-stream interval join replay: matched rows
    # emit eagerly (same as the inner twin); a purchase with NO
    # qualifying click emits one null row iff the final global
    # watermark W = least(max purchase ts, max click ts) - 2h passes
    # it (p_ts < W) — tail purchases are still buffered in the join
    # state when the bounded replay stops, so the oracle states the
    # bounded-replay answer exactly, not the infinite-stream one.
    # Rule pinned by tests/test_similarity_events.py
    # (test_stream_interval_join_left_outer_watermark_rule).
    "events_stream_interval_left": """
        WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
             c AS (SELECT * FROM events WHERE event_type = 'click'),
             wm AS (
               SELECT least((SELECT max(ts) FROM p), (SELECT max(ts) FROM c))
                      - INTERVAL '2 hours' AS w
             ),
             j AS (
               SELECT p.event_id AS purchase_id, p.user_id,
                      p.ts AS purchase_ts, c.ts AS click_ts,
                      c.value AS click_value
               FROM p LEFT JOIN c
                 ON c.user_id = p.user_id
                AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '60 minutes'
             )
        SELECT purchase_id, user_id, purchase_ts, click_ts, click_value
        FROM j WHERE click_ts IS NOT NULL
        UNION ALL
        SELECT purchase_id, user_id, purchase_ts, click_ts, click_value
        FROM j, wm WHERE click_ts IS NULL AND purchase_ts < wm.w
    """,
    # Streaming replay of the same tumbling agg — watermarked
    # Structured Streaming run must equal the batch/DuckDB answer.
    "events_stream_tumbling": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               round(SUM(value), 6) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    # Stream-static dimension join replay: enrich each event with the
    # customer market segment (broadcast per micro-batch, zero join
    # state), then the watermarked tumbling agg — must equal the plain
    # batch join+agg.
    "events_stream_enrich": """
        SELECT time_bucket(INTERVAL '1 hour', e.ts) AS window_start,
               c.c_mktsegment AS segment,
               COUNT(*) AS n_events,
               round(SUM(e.value), 6) AS sum_value
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY 1, 2
    """,
}


def _q_stream_tumbling(spark, sf):
    from bigclam_apachespark_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        windowed_counts_stream,
    )

    stream = read_events_stream(spark, f"{sf}/events.parquet")
    name = "stream_tumbling_oracle"
    return run_stream_to_memory(
        windowed_counts_stream(stream, "1 hour"), name, "complete", strict=True
    )


def _q_stream_enrich(spark, sf):
    from bigclam_apachespark_spark.streaming import (
        enriched_counts_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, f"{sf}/events.parquet")
    dims = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    return run_stream_to_memory(
        enriched_counts_stream(stream, dims),
        "stream_enrich_oracle",
        "complete",
        strict=True,
    )


def _q_stream_dedup_watermark(spark, sf):
    """Watermark-bounded streaming retry-dedup, ORACLE-CHECKED: on a
    bounded AvailableNow replay every row lands in one batch (nothing
    evicted yet), so dropDuplicatesWithinWatermark emits exactly the
    batch DISTINCT (user, type, floor-second) set; the state bound is
    the production property (see operator docstring)."""
    from bigclam_apachespark_spark.streaming import (
        dedup_within_watermark_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, f"{sf}/events.parquet")
    return run_stream_to_memory(
        dedup_within_watermark_stream(stream),
        "events_stream_dedup_wm_sink",
        "append",
        strict=True,
    )


def _q_stream_sessionize(spark, sf):
    """Custom stateful streaming sessionization, ORACLE-CHECKED: with
    ``timeout="none"`` on a bounded AvailableNow replay the emitted
    set is a pure function of the data — every session closed by an
    in-stream gap, i.e. the batch sessionization MINUS each user's
    final (still-open-in-state) session; the SQL twin states exactly
    that. Output normalized to the NTZ sink contract; sum_value is
    rounded here (the pandas kernel's sequential float sum vs the
    oracle's unordered SUM differ in fold order — same 6dp policy as
    the batch query). Production runs use timeout="event" (watermark
    flush) — covered by tests, not replayable deterministically into
    a finite gate query."""
    from bigclam_apachespark_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        sessionize_stream,
    )

    stream = read_events_stream(spark, f"{sf}/events.parquet")
    return run_stream_to_memory(
        # timeout="none" + AvailableNow: the query stops itself right
        # after the replay batch (~5 s at sf0.01) instead of idling on
        # 30-min processing-time timers until a watchdog kills it (the
        # r2 gate-truncation suspect). strict: a watchdog-truncated
        # sink must RAISE here, not hash-compare partial data.
        sessionize_stream(stream, gap_minutes=30, timeout="none"),
        "stream_sessionize_oracle",
        "append",
        timeout_sec=45.0,
        strict=True,
    )


def _hll_sql(b: int = 8) -> str:
    """DuckDB twin of sketches.hll_count_distinct over events.user_id.
    Constants (α·m², thresholds) are computed by the SAME Python
    expressions the Spark side uses, injected as repr'd doubles —
    literal parity by construction."""
    from bigclam_apachespark_spark.operators.sketches import _alpha

    m = 1 << b
    width = 60 - b
    am2 = _alpha(m) * m * m
    h = hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
        WITH hv AS (
          SELECT CAST({h} % {m} AS INT) AS bucket, ({h} >> {b}) AS w
          FROM events
        ),
        r AS (
          SELECT bucket,
                 MAX({width} + 1 - length(ltrim(bin(w), '0'))) AS register
          FROM hv GROUP BY bucket
        ),
        allb AS (
          SELECT d.bucket, COALESCE(r.register, 0) AS register
          FROM (SELECT unnest(generate_series(0, {m - 1})) AS bucket) d
          LEFT JOIN r USING (bucket)
        ),
        agg AS (
          SELECT SUM(power(2.0, -register)) AS s,
                 SUM(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS v
          FROM allb
        ),
        ex AS (SELECT COUNT(DISTINCT user_id) AS n_exact FROM events),
        est AS (
          SELECT CASE WHEN ({am2!r} / s) <= {2.5 * m!r} AND v > 0
                      THEN {float(m)!r} * ln({float(m)!r} / v)
                      ELSE {am2!r} / s END AS e, n_exact
          FROM agg CROSS JOIN ex
        )
        SELECT {m} AS m, n_exact, round(e, 6) AS n_hll,
               round(abs(e - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 6) AS rel_err
        FROM est
    """


EVENT_ORACLE["events_stream_dedup_watermark"] = """
    SELECT DISTINCT user_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS sec
    FROM events
"""
EVENT_ORACLE["events_hll_users"] = _hll_sql(8)


def _hll_by_type_sql(b: int = 8) -> str:
    """Per-group HLL twin (group = event_type)."""
    from bigclam_apachespark_spark.operators.sketches import _alpha

    m = 1 << b
    width = 60 - b
    am2 = _alpha(m) * m * m
    h = hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
        WITH hv AS (
          SELECT event_type, CAST({h} % {m} AS INT) AS bucket, ({h} >> {b}) AS w
          FROM events
        ),
        r AS (
          SELECT event_type, bucket,
                 MAX({width} + 1 - length(ltrim(bin(w), '0'))) AS register
          FROM hv GROUP BY event_type, bucket
        ),
        spine AS (
          SELECT g.event_type, d.bucket
          FROM (SELECT DISTINCT event_type FROM events) g
          CROSS JOIN (SELECT unnest(generate_series(0, {m - 1})) AS bucket) d
        ),
        allb AS (
          SELECT s.event_type, s.bucket, COALESCE(r.register, 0) AS register
          FROM spine s LEFT JOIN r USING (event_type, bucket)
        ),
        agg AS (
          SELECT event_type,
                 SUM(power(2.0, -register)) AS s,
                 SUM(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS v
          FROM allb GROUP BY event_type
        ),
        ex AS (
          SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
          FROM events GROUP BY event_type
        )
        SELECT a.event_type, ex.n_exact,
               round(CASE WHEN ({am2!r} / s) <= {2.5 * m!r} AND v > 0
                          THEN {float(m)!r} * ln({float(m)!r} / v)
                          ELSE {am2!r} / s END, 6) AS n_hll
        FROM agg a JOIN ex USING (event_type)
    """


EVENT_ORACLE["events_hll_users_by_type"] = _hll_by_type_sql(8)


def _hll_by_window_sql(b: int = 8) -> str:
    """Per-hour-window HLL twin — the batch restatement of the
    streamed registers-then-finalize pipeline."""
    from bigclam_apachespark_spark.operators.sketches import _alpha

    m = 1 << b
    width = 60 - b
    am2 = _alpha(m) * m * m
    h = hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
        WITH hv AS (
          SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                 CAST({h} % {m} AS INT) AS bucket, ({h} >> {b}) AS w
          FROM events
        ),
        r AS (
          SELECT window_start, bucket,
                 MAX({width} + 1 - length(ltrim(bin(w), '0'))) AS register
          FROM hv GROUP BY window_start, bucket
        ),
        spine AS (
          SELECT g.window_start, d.bucket
          FROM (SELECT DISTINCT window_start FROM hv) g
          CROSS JOIN (SELECT unnest(generate_series(0, {m - 1})) AS bucket) d
        ),
        allb AS (
          SELECT s.window_start, s.bucket, COALESCE(r.register, 0) AS register
          FROM spine s LEFT JOIN r USING (window_start, bucket)
        ),
        agg AS (
          SELECT window_start,
                 SUM(power(2.0, -register)) AS s,
                 SUM(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS v
          FROM allb GROUP BY window_start
        )
        SELECT window_start,
               round(CASE WHEN ({am2!r} / s) <= {2.5 * m!r} AND v > 0
                          THEN {float(m)!r} * ln({float(m)!r} / v)
                          ELSE {am2!r} / s END, 6) AS n_hll
        FROM agg
    """


def _hll_sliding_sql(hours: int = 3, b: int = 8) -> str:
    """Trailing-window HLL merge twin: hourly registers restated,
    then per-bucket MAX over each target hour's covered range —
    identical estimator tail to _hll_by_window_sql."""
    from bigclam_apachespark_spark.operators.sketches import _alpha

    m = 1 << b
    width = 60 - b
    am2 = _alpha(m) * m * m
    h = hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
        WITH hv AS (
          SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                 CAST({h} % {m} AS INT) AS bucket, ({h} >> {b}) AS w
          FROM events
        ),
        r AS (
          SELECT window_start, bucket,
                 MAX({width} + 1 - length(ltrim(bin(w), '0'))) AS register
          FROM hv GROUP BY window_start, bucket
        ),
        t AS (SELECT DISTINCT window_start FROM hv),
        mg AS (
          SELECT t.window_start, r.bucket, MAX(r.register) AS register
          FROM t JOIN r
            ON r.window_start <= t.window_start
           AND r.window_start > t.window_start - INTERVAL {hours} HOUR
          GROUP BY t.window_start, r.bucket
        ),
        spine AS (
          SELECT t.window_start, d.bucket
          FROM t CROSS JOIN
               (SELECT unnest(generate_series(0, {m - 1})) AS bucket) d
        ),
        allb AS (
          SELECT s.window_start, s.bucket, COALESCE(mg.register, 0) AS register
          FROM spine s LEFT JOIN mg USING (window_start, bucket)
        ),
        agg AS (
          SELECT window_start,
                 SUM(power(2.0, -register)) AS s,
                 SUM(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS v
          FROM allb GROUP BY window_start
        )
        SELECT window_start,
               round(CASE WHEN ({am2!r} / s) <= {2.5 * m!r} AND v > 0
                          THEN {float(m)!r} * ln({float(m)!r} / v)
                          ELSE {am2!r} / s END, 6) AS n_hll_trailing
        FROM agg
    """


EVENT_ORACLE["events_hll_sliding"] = _hll_sliding_sql(3, 8)


def _q_hll_sliding(spark, sf):
    from bigclam_apachespark_spark.operators.sketches import (
        hll_sliding_estimate,
    )

    return hll_sliding_estimate(_events(spark, sf), hours=3, b=8)


# Streaming CMS twin: per-window counter table restated in batch —
# same hash64("cms{r}:" + user) bucketing, so counts are exact.
EVENT_ORACLE["events_stream_cms_windows"] = f"""
    WITH pr AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             CAST(rr.r AS INT) AS r,
             CAST({hash64_sql("'cms' || CAST(rr.r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")} % 1024 AS INT) AS bucket
      FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) rr
    )
    SELECT window_start, r, bucket, CAST(COUNT(*) AS BIGINT) AS c
    FROM pr GROUP BY 1, 2, 3
"""


def _q_stream_cms_windows(spark, sf):
    """Streaming sketch replay: watermarked per-window CMS counter
    agg (state = d*w integers per window) -> complete-mode sink.
    Counters hash-match the batch DuckDB twin exactly."""
    from bigclam_apachespark_spark.streaming import (
        cms_users_windowed_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, f"{sf}/events.parquet")
    return run_stream_to_memory(
        cms_users_windowed_stream(stream, "1 hour", d=4, w=1024),
        "stream_cms_windows_oracle",
        "complete",
        timeout_sec=90.0,
        strict=True,
    )


EVENT_ORACLE["events_stream_hll_windows"] = _hll_by_window_sql(8)


def _hll_union_sql(b: int = 8) -> str:
    """Union-merge HLL twin: the SQL UNION of the two keyed columns
    fed through the identical register/estimator chain — what the
    Spark side computes by MERGING two independent register tables
    (per-bucket max), exercising sketch mergeability."""
    from bigclam_apachespark_spark.operators.sketches import _alpha

    m = 1 << b
    width = 60 - b
    am2 = _alpha(m) * m * m
    h = hash64_sql("v")
    return f"""
        WITH src AS (
          SELECT CAST(user_id AS VARCHAR) AS v FROM events
          UNION ALL
          SELECT CAST(o_custkey AS VARCHAR) FROM orders
        ),
        hv AS (SELECT CAST({h} % {m} AS INT) AS bucket, ({h} >> {b}) AS w FROM src),
        r AS (
          SELECT bucket, MAX({width} + 1 - length(ltrim(bin(w), '0'))) AS register
          FROM hv GROUP BY bucket
        ),
        allb AS (
          SELECT d.bucket, COALESCE(r.register, 0) AS register
          FROM (SELECT unnest(generate_series(0, {m - 1})) AS bucket) d
          LEFT JOIN r USING (bucket)
        ),
        agg AS (
          SELECT SUM(power(2.0, -register)) AS s,
                 SUM(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS v
          FROM allb
        )
        SELECT {m} AS m,
               round(CASE WHEN ({am2!r} / s) <= {2.5 * m!r} AND v > 0
                          THEN {float(m)!r} * ln({float(m)!r} / v)
                          ELSE {am2!r} / s END, 6) AS n_hll
        FROM agg
    """


EVENT_ORACLE["events_hll_union"] = _hll_union_sql(8)


def _q_hll_union(spark, sf):
    """Sketch mergeability: HLL registers built independently over
    events.user_id and orders.o_custkey, merged by per-bucket max —
    must equal the sketch of the SQL UNION exactly."""
    from bigclam_apachespark_spark.operators.sketches import hll_union_estimate

    orders = spark.read.parquet(f"{sf}/orders.parquet")
    return hll_union_estimate(
        [(_events(spark, sf), "user_id"), (orders, "o_custkey")], b=8
    )


def _q_stream_session_window(spark, sf):
    """Built-in session_window streaming replay: watermarked
    state-store session merge → append-mode sink. Bounded-replay
    emission: sessions whose end ≤ max(ts) − 2 h (boundary
    INCLUSIVE, probed) — the oracle restates exactly that set."""
    from bigclam_apachespark_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        session_window_stream,
    )

    stream = read_events_stream(spark, f"{sf}/events.parquet")
    return run_stream_to_memory(
        session_window_stream(stream, "30 minutes", "2 hours"),
        "stream_session_window_oracle",
        "append",
        timeout_sec=90.0,
        strict=True,
    )


EVENT_ORACLE["events_stream_session_window"] = """
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM flagged
    ),
    built AS (
      SELECT user_id, MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             round(SUM(value), 6) AS sum_value
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id, session_start, session_end, n_events, sum_value
    FROM built
    WHERE session_end <= (SELECT MAX(ts) FROM events) - INTERVAL 2 HOUR
"""


def _q_stream_session_funnel(spark, sf):
    """Streaming in-session funnel: the batch order test carried by
    the built-in session_window state store; same pinned inclusive
    emission boundary as events_stream_session_window."""
    from bigclam_apachespark_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        session_funnel_stream,
    )

    stream = read_events_stream(spark, f"{sf}/events.parquet")
    return run_stream_to_memory(
        session_funnel_stream(stream, "30 minutes", "2 hours"),
        "stream_session_funnel_oracle",
        "append",
        timeout_sec=90.0,
        strict=True,
    )


EVENT_ORACLE["events_stream_session_funnel"] = """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM flagged
    ),
    built AS (
      SELECT user_id, MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             MIN(CASE WHEN event_type = 'click'
                      THEN ROW(sec, event_id) END) AS ck,
             MAX(CASE WHEN event_type = 'purchase'
                      THEN ROW(sec, event_id) END) AS pk
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id, session_start, session_end,
           CAST(CASE WHEN ck IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS clicked,
           CAST(CASE WHEN ck IS NOT NULL AND pk IS NOT NULL AND pk > ck
                THEN 1 ELSE 0 END AS BIGINT) AS converted
    FROM built
    WHERE session_end <= (SELECT MAX(ts) FROM events) - INTERVAL 2 HOUR
"""


def _q_stream_hll_windows(spark, sf):
    """Streaming sketch replay: watermarked per-window HLL register
    agg (state = m integers per window) → complete-mode sink →
    batch finalize. The estimates hash-match the batch DuckDB twin
    because registers are integer functions of the shared hash."""
    from bigclam_apachespark_spark.operators.sketches import finalize_windowed_hll
    from bigclam_apachespark_spark.streaming import (
        hll_users_windowed_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, f"{sf}/events.parquet")
    regs = run_stream_to_memory(
        hll_users_windowed_stream(stream, "1 hour", b=8),
        "stream_hll_windows_oracle",
        "complete",
        timeout_sec=90.0,
        strict=True,
    )
    # The finalize spine self-joins the sink; a MemorySink view
    # self-join trips a conflicting-references INTERNAL_ERROR in
    # Spark 4 — localCheckpoint re-roots the lineage with fresh
    # attribute ids (the register table is m·windows rows, tiny).
    return finalize_windowed_hll(regs.localCheckpoint(eager=True), b=8)


def _q_hll_users_by_type(spark, sf):
    from bigclam_apachespark_spark.operators.sketches import hll_count_distinct_by

    return hll_count_distinct_by(_events(spark, sf), "event_type", "user_id", b=8)


def _q_hll_users(spark, sf):
    from bigclam_apachespark_spark.operators.sketches import hll_count_distinct

    return hll_count_distinct(_events(spark, sf), "user_id", b=8)


def _q_stream_interval_left(spark, sf):
    from bigclam_apachespark_spark.streaming import (
        click_attribution_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, f"{sf}/events.parquet")
    return run_stream_to_memory(
        click_attribution_stream(stream, window_minutes=60, how="left_outer"),
        "stream_interval_left_oracle",
        "append",
        timeout_sec=90.0,
        strict=True,
    )


def _q_stream_interval_join(spark, sf):
    from bigclam_apachespark_spark.streaming import (
        click_attribution_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, f"{sf}/events.parquet")
    return run_stream_to_memory(
        click_attribution_stream(stream, window_minutes=60),
        "stream_interval_join_oracle",
        "append",
        timeout_sec=60.0,
        strict=True,
    )


EVENT_QUERIES = {
    "events_tumbling": lambda spark, sf: E.tumbling_window_agg(_events(spark, sf)),
    "events_topk_window": lambda spark, sf: E.topk_per_window(_events(spark, sf)),
    "events_sliding": lambda spark, sf: E.sliding_window_agg(_events(spark, sf)),
    "events_sessionize": lambda spark, sf: E.sessionize(_events(spark, sf)),
    "events_session_window": lambda spark, sf: E.session_window_agg(_events(spark, sf)),
    "events_hll_users": _q_hll_users,
    "events_hll_users_by_type": _q_hll_users_by_type,
    "events_anomaly": lambda spark, sf: E.window_anomaly_scores(_events(spark, sf)),
    "events_gapfill": lambda spark, sf: E.gapfill_locf(_events(spark, sf)),
    "events_ohlc": lambda spark, sf: E.resample_ohlc(_events(spark, sf)),
    "events_rollup": lambda spark, sf: E.rollup_counts(_events(spark, sf)),
    "events_cube": lambda spark, sf: E.cube_counts(_events(spark, sf)),
    "events_value_quantiles": lambda spark, sf: E.value_quantiles(_events(spark, sf)),
    "events_equidepth_bins": lambda spark, sf: E.equidepth_bins(
        _events(spark, sf), n_bins=10
    ),
    "events_changepoint": lambda spark, sf: E.changepoint_scan(
        _events(spark, sf)
    ),
    "events_forecast_backtest": lambda spark, sf: E.seasonal_naive_backtest(
        _events(spark, sf), lag_days=7
    ),
    "events_ab_cuped": lambda spark, sf: E.ab_cuped_readout(_events(spark, sf)),
    "events_ab_power": lambda spark, sf: E.ab_power_readout(_events(spark, sf)),
    "events_dau_wau": lambda spark, sf: E.dau_wau(_events(spark, sf)),
    "events_pivot": lambda spark, sf: E.type_pivot(_events(spark, sf)),
    "events_transitions": lambda spark, sf: E.type_transitions(_events(spark, sf)),
    "events_click_no_purchase": lambda spark, sf: E.clicked_never_purchased(
        _events(spark, sf)
    ),
    "events_click_and_purchase": lambda spark, sf: E.clicked_and_purchased(
        _events(spark, sf)
    ),
    "events_retention": lambda spark, sf: E.cohort_retention(_events(spark, sf)),
    "events_cohort_ltv": lambda spark, sf: E.cohort_ltv(_events(spark, sf)),
    "events_session_funnel": lambda spark, sf: E.session_funnel(_events(spark, sf)),
    "events_robust_outliers": lambda spark, sf: E.robust_outliers(_events(spark, sf)),
    "events_quantile_sketch": lambda spark, sf: SK.histogram_quantile_sketch(
        _events(spark, sf)
    ),
    "events_kmv_users": lambda spark, sf: SK.kmv_count_distinct_by(
        _events(spark, sf), "event_type", "user_id", k=64
    ),
    "events_time_to_convert": lambda spark, sf: E.time_to_convert(
        _events(spark, sf)
    ),
    # The skew kernel under the gate: 5 event types × ~all users is
    # the canonical hot-key COUNT(DISTINCT); the oracle is the plain
    # aggregation — the salted plan's result-identity claim.
    "events_salted_distinct": lambda spark, sf: _q_salted_distinct(spark, sf),
    "events_growth_accounting": lambda spark, sf: E.growth_accounting(_events(spark, sf)),
    "events_props": lambda spark, sf: E.extract_props(_events(spark, sf)),
    "events_props_variant": lambda spark, sf: E.extract_props_variant(_events(spark, sf)),
    "events_funnel": lambda spark, sf: E.event_type_funnel(_events(spark, sf)),
    "events_ordered_funnel": lambda spark, sf: E.ordered_funnel(_events(spark, sf)),
    "events_asof_attribution": lambda spark, sf: TJ.click_attribution(_events(spark, sf)),
    "events_asof_forward": lambda spark, sf: TJ.click_to_next_purchase(_events(spark, sf)),
    "events_asof_nearest": lambda spark, sf: TJ.nearest_click_attribution(_events(spark, sf)),
    "events_range_attribution": lambda spark, sf: TJ.click_window_stats(
        _events(spark, sf), window_minutes=60
    ),
    "events_stream_interval_join": _q_stream_interval_join,
    "events_stream_interval_left": _q_stream_interval_left,
    "events_stream_hll_windows": _q_stream_hll_windows,
    "events_stream_session_window": _q_stream_session_window,
    "events_stream_session_funnel": _q_stream_session_funnel,
    "events_stream_cms_windows": _q_stream_cms_windows,
    "events_hll_union": _q_hll_union,
    "events_hll_sliding": _q_hll_sliding,
    "events_stream_tumbling": _q_stream_tumbling,
    "events_stream_enrich": _q_stream_enrich,
    "events_stream_sessionize": _q_stream_sessionize,
    "events_stream_dedup_watermark": _q_stream_dedup_watermark,
}

# ---------------------------------------------------------------------------
# Multimodal (no SQL oracle — binary plumbing; rows-only check)
# ---------------------------------------------------------------------------


def _q_media_features(spark, sf):
    from bigclam_apachespark_spark.operators.multimodal import (
        media_features,
        synthetic_media,
    )

    feats = media_features(synthetic_media(spark, n=64), dim=8)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 6).alias("feat_sum"),
    )


def _q_media_stats(spark, sf):
    """Binary-column metadata stats, ORACLE-CHECKED: Spark measures
    the ACTUAL payload byte length (length() on the binary column);
    the DuckDB twin derives the expected sizes independently from the
    synthetic generator's closed form (payload = 32-byte sha256 digest
    × (4 + i%7) repeats; kind cycles image/audio/video) — a genuine
    cross-check that binary payloads survive the Arrow/JVM boundary
    intact."""
    from bigclam_apachespark_spark.operators.multimodal import synthetic_media

    media = synthetic_media(spark, n=64)
    return media.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.sum(F.coalesce(F.col("width") * F.col("height"), F.lit(0))).alias("total_px"),
    )


def _q_frame_sample(spark, sf):
    """Video frame-sampling fan-out (explode over typed metadata),
    ORACLE-CHECKED against an independent generate_series formulation."""
    from bigclam_apachespark_spark.operators.multimodal import (
        frame_sample_plan,
        synthetic_media,
    )

    return frame_sample_plan(synthetic_media(spark, n=64), every_n=4)


MULTIMODAL_ORACLE = {
    # Cross-modal pairing: media generator closed form (n_bytes =
    # 32·(4 + i%7)) joined to the caption docs' token counts.
    "multimodal_caption_join": f"""
        SELECT m.media_id, m.kind, CAST(32 * m.k AS INT) AS n_bytes,
               CAST(len({TOKENS}) AS INT) AS caption_tokens
        FROM (SELECT i AS media_id,
                     CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                     4 + i % 7 AS k
              FROM generate_series(0, 63) t(i)) m
        JOIN documents d ON d.doc_id = m.media_id
    """,
    # Oracle for the Arrow mapInPandas feature path itself: the fake
    # extractor's closed form — byte-stride sums of the sha256-derived
    # payload — restated in SQL. Because 32 ≡ 0 (mod 8), stride-d
    # positions across the k digest repeats hit the same digest
    # offsets, so S_d = k · Σ_{r<4} digest[d + 8r]. The 8 per-feature
    # float32 values sum EXACTLY in double (≤27-bit significand), so
    # the SUM is fold-order-independent and the hash cannot drift.
    "multimodal_media_features": """
        WITH m AS (
          SELECT i AS media_id,
                 CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                 4 + i % 7 AS k,
                 sha256('42:' || i) AS hx
          FROM generate_series(0, 63) t(i)
        ),
        b AS (
          SELECT media_id, kind, k, d,
                 k * list_sum([CAST(CONCAT('0x', substr(hx, (d + 8 * r) * 2 + 1, 2)) AS INT)
                               for r in [0, 1, 2, 3]]) AS s
          FROM m CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS d)
        ),
        f AS (
          SELECT media_id, kind, k,
                 CAST(CAST(s % 10000 AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS REAL) AS fv
          FROM b
        )
        SELECT media_id, kind, CAST(32 * k AS INT) AS n_bytes,
               round(SUM(CAST(fv AS DOUBLE)), 6) AS feat_sum
        FROM f GROUP BY media_id, kind, k
    """,
    # Generator closed form: i in 0..63; kind = [image,audio,video][i%3];
    # payload bytes = 32·(4 + i%7); width×height = 32·24 for image/video.
    "multimodal_media_stats": """
        SELECT CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               COUNT(*) AS n_media,
               CAST(SUM(32 * (4 + i % 7)) AS BIGINT) AS total_bytes,
               CAST(SUM(CASE WHEN i % 3 IN (0, 2) THEN 32 * 24 ELSE 0 END) AS BIGINT) AS total_px
        FROM generate_series(0, 63) t(i)
        GROUP BY 1
    """,
    "multimodal_frame_sample": """
        SELECT media_id, CAST(frame_idx AS INT) AS frame_idx
        FROM (SELECT i AS media_id FROM generate_series(0, 63) t(i) WHERE i % 3 = 2)
        CROSS JOIN (SELECT unnest([0, 4, 8]) AS frame_idx)
    """,
    # ViT patch grid: every image/video is 32×24 in the generator, so
    # with patch=8 the grid is exactly 3 rows × 4 cols per media row.
    "multimodal_patch_grid": """
        SELECT media_id, kind, CAST(patch_row AS INT) AS patch_row,
               CAST(patch_col AS INT) AS patch_col
        FROM (SELECT i AS media_id,
                     CASE i % 3 WHEN 0 THEN 'image' ELSE 'video' END AS kind
              FROM generate_series(0, 63) t(i) WHERE i % 3 IN (0, 2))
        CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS patch_row)
        CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS patch_col)
    """,
    # Audio chunking: payload = 32·(4 + i%7) bytes of 16-bit PCM →
    # 16·(4 + i%7) samples, windows of 32 with a short tail chunk.
    "multimodal_audio_chunks": """
        WITH a AS (
          SELECT i AS media_id, 16 * (4 + i % 7) AS ns
          FROM generate_series(0, 63) t(i) WHERE i % 3 = 1
        ),
        c AS (
          SELECT media_id, ns,
                 unnest(generate_series(0, CAST(ceil(ns / 32.0) AS INT) - 1)) AS chunk_idx
          FROM a
        )
        SELECT media_id, CAST(chunk_idx AS INT) AS chunk_idx,
               CAST(chunk_idx * 32 AS BIGINT) AS start_sample,
               CAST(least(32, ns - chunk_idx * 32) AS BIGINT) AS n_samples
        FROM c
    """,
    # Closed form of synthetic_wav_media: clip i = PCM16 mono @8kHz,
    # n_frames = 64 + 16*i, constant sample 512*(i%9). rms = peak =
    # (i%9)/64 and duration = n_frames/8000 — all terminate within 6
    # decimals, so round(x, 6) is exact on both engines.
    # Shot-detection closed form: wrap frame + exact luma delta.
    "multimodal_video_shots": """
        SELECT i AS media_id, 16 AS n_frames,
               CAST(CASE WHEN i % 9 = 0 THEN 9 ELSE 9 - (i % 9) END AS INT)
                 AS shot_frame,
               CAST(48960 AS BIGINT) AS delta
        FROM generate_series(0, 23) t(i)
    """,
    # FFT closed form: one full window of k = 3 + i%13 integer
    # cycles -> ALL tone energy in bin k; 8000/256 = 31.25 exact in
    # binary so the rounded hz is lossless.
    "multimodal_wav_spectral": """
        SELECT i AS media_id, CAST(256 AS BIGINT) AS n_frames,
               8000 AS sample_rate,
               CAST(3 + i % 13 AS INT) AS dominant_bin,
               round((3 + i % 13) * CAST(31.25 AS DOUBLE), 6) AS dominant_hz
        FROM generate_series(0, 47) t(i)
    """,
    "multimodal_wav_stats": """
        SELECT i AS media_id, 1 AS n_channels, 8000 AS sample_rate,
               CAST(64 + 16 * i AS BIGINT) AS n_frames,
               round((64 + 16 * i) / 8000.0, 6) AS duration_s,
               round((i % 9) / 64.0, 6) AS rms,
               round((i % 9) / 64.0, 6) AS peak
        FROM generate_series(0, 47) t(i)
    """,
    # Closed form of synthetic_ppm_media: 8x8 P6 image i with the
    # left s = i%9 columns black, rest white → channel means are
    # exact eighths and the pool=4 2x2 grayscale grid cells are exact
    # quarters: per row [(4-min(s,4))/4, (4-max(s-4,0))/4].
    "multimodal_ppm_features": """
        WITH m AS (SELECT i, i % 9 AS s FROM generate_series(0, 47) t(i))
        SELECT i AS media_id, 8 AS width, 8 AS height,
               round((8 - s) / 8.0, 6) AS mean_r,
               round((8 - s) / 8.0, 6) AS mean_g,
               round((8 - s) / 8.0, 6) AS mean_b,
               round(2 * ((4 - least(s, 4)) / 4.0
                          + (4 - greatest(s - 4, 0)) / 4.0), 6) AS feat_sum
        FROM m
    """,
    # Same split-pattern closed form as the PPM twin (the pixel
    # CONTENT is identical by construction); what this row verifies
    # is the whole zlib/IHDR/IDAT/un-filter decode chain — the
    # fixture cycles color type RGB/gray/RGBA and all five PNG row
    # filters, and one wrong reconstructed byte anywhere moves a
    # mean off its exact eighth.
    "multimodal_png_features": """
        WITH m AS (SELECT i, i % 9 AS s FROM generate_series(0, 47) t(i))
        SELECT i AS media_id, 8 AS width, 8 AS height,
               round((8 - s) / 8.0, 6) AS mean_r,
               round((8 - s) / 8.0, 6) AS mean_g,
               round((8 - s) / 8.0, 6) AS mean_b,
               round(2 * ((4 - least(s, 4)) / 4.0
                          + (4 - greatest(s - 4, 0)) / 4.0), 6) AS feat_sum,
               CAST(0 AS BIGINT) AS had_error
        FROM m
    """,
}

def _q_patch_grid(spark, sf):
    from bigclam_apachespark_spark.operators.multimodal import (
        patch_grid_plan,
        synthetic_media,
    )

    return patch_grid_plan(synthetic_media(spark, n=64), patch=8)


def _q_audio_chunks(spark, sf):
    from bigclam_apachespark_spark.operators.multimodal import (
        audio_chunk_plan,
        synthetic_media,
    )

    return audio_chunk_plan(synthetic_media(spark, n=64), chunk_samples=32)


def _q_caption_join(spark, sf):
    from bigclam_apachespark_spark.operators import multimodal as MM

    return MM.caption_join(MM.synthetic_media(spark, 64), _docs(spark, sf))


def _q_video_shots(spark, sf):
    """Shot detection, ORACLE-CHECKED via the pan fixture's closed
    form: the 8→0 wrap at frame 9 − i%9 (9 when i%9 = 0) flips 8
    columns — integer luma delta 8·8·765 = 48960 vs the 1-column pan
    step's 6120; ties across the second wrap break to the earlier
    frame."""
    from bigclam_apachespark_spark.operators.multimodal import (
        synthetic_video_media,
        video_shot_detection,
    )

    return video_shot_detection(synthetic_video_media(spark, n=24))


def _q_wav_spectral(spark, sf):
    """REAL FFT path, ORACLE-CHECKED via the integer-cycle sine
    fixture's closed form: the dominant bin of clip i MUST be
    3 + i % 13 (all tone energy in one bin, quantization noise
    ~-90 dB below), and dominant_hz = bin · 31.25 exactly."""
    from bigclam_apachespark_spark.operators.multimodal import (
        synthetic_sine_media,
        wav_spectral,
    )

    return wav_spectral(synthetic_sine_media(spark, n=48)).select(
        "media_id", "n_frames", "sample_rate", "dominant_bin", "dominant_hz"
    )


def _q_wav_stats(spark, sf):
    """REAL RIFF/WAV decode, ORACLE-CHECKED: the fixture's closed
    form (constant-sample PCM16 clips — see synthetic_wav_media) is
    restated in DuckDB, so header parsing, PCM normalization, and the
    rms/peak arithmetic are all cross-engine-verified. A decode
    failure surfaces as NULL stats → hash mismatch."""
    from bigclam_apachespark_spark.operators.multimodal import (
        synthetic_wav_media,
        wav_stats,
    )

    return wav_stats(synthetic_wav_media(spark, n=48)).select(
        "media_id", "n_channels", "sample_rate", "n_frames",
        "duration_s", "rms", "peak",
    )


def _q_ppm_features(spark, sf):
    """REAL binary-PPM decode, ORACLE-CHECKED: half-split images with
    exact channel means (eighths) and exact pooled-thumbnail cells
    (quarters) — see synthetic_ppm_media. The pooled 2x2 grid is
    collapsed to an exact sum so the array never crosses the
    engine-comparison boundary."""
    from bigclam_apachespark_spark.operators.multimodal import (
        ppm_features,
        synthetic_ppm_media,
    )

    feats = ppm_features(synthetic_ppm_media(spark, n=48), pool=4)
    return feats.select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b",
        F.round(
            F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 6
        ).alias("feat_sum"),
    )


def _q_png_features(spark, sf):
    """REAL baseline-PNG decode (stdlib zlib), ORACLE-CHECKED: the
    fixture's closed form (split-column images — see
    synthetic_png_media) is restated in DuckDB, cross-verifying the
    zlib inflate, chunk walk, and all five filter reconstructions.
    had_error makes a silent decode failure (which would NULL the
    means) a hash mismatch rather than an invisible row."""
    from bigclam_apachespark_spark.operators.multimodal import (
        png_features,
        synthetic_png_media,
    )

    feats = png_features(synthetic_png_media(spark, n=48), pool=4)
    return feats.select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b",
        F.round(
            F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 6
        ).alias("feat_sum"),
        F.col("decode_error").isNotNull().cast("long").alias("had_error"),
    )


def _q_phash_pairs(spark, sf):
    """Perceptual-hash image near-dup, ORACLE-CHECKED end to end:
    REAL PPM decode → 8×8 aHash → 16-bit band blocking → Hamming
    verify. The oracle restates the fixture's CLOSED-FORM hashes
    (split image s has columns x ≥ s above the mean for 1 ≤ s ≤ 7 →
    hash = colmask(s)·0x0101…01; the all-white s=0 and all-black
    s=8 images hash to 0 under the strict > threshold) and replays
    the same band join + bit_count(xor) verify in SQL — one wrong
    decoded byte flips thumbnail bits and the pair set."""
    from bigclam_apachespark_spark.operators.multimodal import (
        phash_near_dup,
        synthetic_ppm_media,
    )

    return phash_near_dup(
        synthetic_ppm_media(spark, n=48), bands=4, max_hamming=3
    )


def _phash_oracle_sql(n: int = 48, bands: int = 4, max_hamming: int = 3) -> str:
    """Closed-form aHash literals per split s, derived from the
    synthetic_ppm_media construction formula (NOT from the Spark
    decode path), then the same band-block + Hamming-verify chain.
    Arithmetic-vs-logical shift is irrelevant under the & 65535
    mask, so `>>` matches Spark's shiftright bit for bit."""
    rep = 0x0101010101010101
    rows = []
    for s in range(9):
        if s in (0, 8):
            h = 0
        else:
            h = (((0xFF << s) & 0xFF) * rep)
            if h >= 1 << 63:
                h -= 1 << 64
        rows.append(f"({s}, CAST({h} AS BIGINT))")
    bandlist = ", ".join(str(b) for b in range(bands))
    return f"""
        WITH hs(s, h) AS (VALUES {", ".join(rows)}),
        img AS (
          SELECT t.i AS media_id, hs.h
          FROM generate_series(0, {n - 1}) t(i) JOIN hs ON hs.s = t.i % 9
        ),
        bands AS (
          SELECT media_id, h, bb.b AS band, (h >> (16 * bb.b)) & 65535 AS key
          FROM img CROSS JOIN (SELECT unnest([{bandlist}]) AS b) bb
        ),
        cand AS (
          SELECT DISTINCT l.media_id AS a, r.media_id AS b,
                          l.h AS ha, r.h AS hb
          FROM bands l JOIN bands r
            ON l.band = r.band AND l.key = r.key AND l.media_id < r.media_id
        )
        SELECT a, b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}
    """


MULTIMODAL_ORACLE["multimodal_phash_pairs"] = _phash_oracle_sql(48, 4, 3)


def _q_video_near_dup(spark, sf):
    """Video near-dup via sampled frame-hash signature overlap,
    oracle-checked: the container parse, keyframe sampling, per-
    frame aHash, and the distinct-intersection join all replay in
    SQL from the fixture's (i + f) % 9 pan formula and the same
    closed-form hash literals as multimodal_phash_pairs."""
    from bigclam_apachespark_spark.operators.multimodal import (
        synthetic_video_media,
        video_near_dup,
    )

    return video_near_dup(
        synthetic_video_media(spark, n=24, n_frames=16),
        every_n=4,
        min_matching=2,
    )


def _video_near_dup_oracle_sql(
    n: int = 24, n_frames: int = 16, every_n: int = 4, min_matching: int = 2
) -> str:
    """Frame hash per (video, sampled frame) from the pan formula
    s = (i + f) % 9 and the closed-form split-image aHash (same
    derivation as _phash_oracle_sql), then distinct signature sets,
    hash-equality join, intersection count."""
    rep = 0x0101010101010101
    rows = []
    for s in range(9):
        if s in (0, 8):
            h = 0
        else:
            h = ((0xFF << s) & 0xFF) * rep
            if h >= 1 << 63:
                h -= 1 << 64
        rows.append(f"({s}, CAST({h} AS BIGINT))")
    frames = ", ".join(str(f) for f in range(0, n_frames, every_n))
    return f"""
        WITH hs(s, h) AS (VALUES {", ".join(rows)}),
        sig AS (
          SELECT DISTINCT t.i AS media_id, hs.h AS phash
          FROM generate_series(0, {n - 1}) t(i)
          CROSS JOIN (SELECT unnest([{frames}]) AS f) fr
          JOIN hs ON hs.s = (t.i + fr.f) % 9
        )
        SELECT l.media_id AS a, r.media_id AS b,
               CAST(COUNT(*) AS BIGINT) AS n_matching
        FROM sig l JOIN sig r ON l.phash = r.phash AND l.media_id < r.media_id
        GROUP BY 1, 2 HAVING COUNT(*) >= {min_matching}
    """


MULTIMODAL_ORACLE["multimodal_video_near_dup"] = _video_near_dup_oracle_sql()

MULTIMODAL_QUERIES = {
    "multimodal_phash_pairs": _q_phash_pairs,
    "multimodal_video_near_dup": _q_video_near_dup,
    "multimodal_caption_join": _q_caption_join,
    "multimodal_media_features": _q_media_features,
    "multimodal_media_stats": _q_media_stats,
    "multimodal_frame_sample": _q_frame_sample,
    "multimodal_patch_grid": _q_patch_grid,
    "multimodal_audio_chunks": _q_audio_chunks,
    "multimodal_wav_stats": _q_wav_stats,
    "multimodal_wav_spectral": _q_wav_spectral,
    "multimodal_video_shots": _q_video_shots,
    "multimodal_ppm_features": _q_ppm_features,
    "multimodal_png_features": _q_png_features,
}

# Registration order = driver execution order. The cheap oracle-
# checked MULTIMODAL queries run BEFORE the events group (whose tail
# holds the two streaming replays) so a budget/timeout hit on the
# streaming tail can never silently drop oracle-checkable entries —
# the r2 gate recorded nothing after events_range_attribution.
# ---------------------------------------------------------------------------
# Relational warehouse surface (data-quality + classic report shapes)
# ---------------------------------------------------------------------------


def _rel_tables(spark, sf):
    return (
        spark.read.parquet(f"{sf}/orders.parquet"),
        spark.read.parquet(f"{sf}/customer.parquet"),
        spark.read.parquet(f"{sf}/lineitem.parquet"),
    )


def _q_salted_distinct(spark, sf):
    """salted_count_distinct under the gate: the deterministic
    content-hash salt splits each hot event_type's distinct-user set
    across 8 reducers; the two disjoint-by-construction stages must
    reproduce the plain COUNT(DISTINCT) exactly."""
    from bigclam_apachespark_spark.functions.skew import salted_count_distinct

    return salted_count_distinct(
        _events(spark, sf), "event_type", "user_id", n_salts=8
    )


def _q_dq_report(spark, sf):
    from bigclam_apachespark_spark.operators.relational import dq_report

    return dq_report(*_rel_tables(spark, sf))


def _q_dq_quarantine(spark, sf):
    from bigclam_apachespark_spark.operators.relational import dq_quarantine

    return dq_quarantine(_rel_tables(spark, sf)[0])


def _q_nullsafe_join(spark, sf):
    from bigclam_apachespark_spark.operators.relational import (
        nullsafe_join_counts,
    )

    return nullsafe_join_counts(_rel_tables(spark, sf)[0])


def _q_fk_profile(spark, sf):
    from bigclam_apachespark_spark.operators.relational import fk_profile

    o, c, li = _rel_tables(spark, sf)
    return fk_profile(o, c, li)


def _q_pricing(spark, sf):
    from bigclam_apachespark_spark.operators.relational import pricing_summary

    return pricing_summary(_rel_tables(spark, sf)[2])


def _q_top_orders(spark, sf):
    from bigclam_apachespark_spark.operators.relational import top_revenue_orders

    return top_revenue_orders(*_rel_tables(spark, sf))


def _q_upsert(spark, sf):
    """CDC apply: deterministic synthesized changefeed — every
    orderkey % 10 = 0 row updated (+1.00 to total), every % 1000 = 0
    row re-inserted under a shifted key with status 'N' — merged into
    the snapshot. Both engines derive the same feed from the same
    table, so the merge semantics (replace / insert / carry-over)
    hash-check exactly."""
    from bigclam_apachespark_spark.operators.relational import upsert_merge

    orders = _rel_tables(spark, sf)[0]
    cols = orders.columns
    updated = orders.where(F.col("o_orderkey") % 10 == 0).select(
        *[
            (F.col("o_totalprice") + 1.0).alias("o_totalprice")
            if c == "o_totalprice"
            else F.col(c)
            for c in cols
        ]
    )
    inserted = orders.where(F.col("o_orderkey") % 1000 == 0).select(
        *[
            (F.col("o_orderkey") + 900000000).alias("o_orderkey")
            if c == "o_orderkey"
            else (F.lit("N").alias("o_orderstatus") if c == "o_orderstatus" else F.col(c))
            for c in cols
        ]
    )
    return upsert_merge(orders, updated.unionByName(inserted))


def _q_merge_deletes(spark, sf):
    """Full MERGE: the upsert changefeed (%10 updates, %1000
    re-inserts under shifted keys) plus DELETES for the %7 keys NOT
    already updated (at-most-one-change-per-key contract). Both
    engines derive the same feed, so update-precedence, insert, and
    delete semantics all hash-check."""
    from bigclam_apachespark_spark.operators.relational import merge_with_deletes

    orders = _rel_tables(spark, sf)[0]
    cols = orders.columns
    updated = orders.where(F.col("o_orderkey") % 10 == 0).select(
        *[
            (F.col("o_totalprice") + 1.0).alias("o_totalprice")
            if c == "o_totalprice"
            else F.col(c)
            for c in cols
        ]
    ).withColumn("op", F.lit("U"))
    inserted = orders.where(F.col("o_orderkey") % 1000 == 0).select(
        *[
            (F.col("o_orderkey") + 900000000).alias("o_orderkey")
            if c == "o_orderkey"
            else (F.lit("N").alias("o_orderstatus") if c == "o_orderstatus" else F.col(c))
            for c in cols
        ]
    ).withColumn("op", F.lit("I"))
    deleted = orders.where(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 10 != 0)
    ).select(*cols).withColumn("op", F.lit("D"))
    changes = updated.unionByName(inserted).unionByName(deleted)
    return merge_with_deletes(orders, changes)


def _q_events_stream_topk(spark, sf):
    """Streaming global heavy hitters: the events feed replays as
    micro-batches whose counts merge additively into a persisted
    state table (foreachBatch); count-merge is associative AND
    commutative, so any batch split yields the identical final top-k
    — the oracle is the plain batch count head."""
    from bigclam_apachespark_spark.streaming import read_events_stream
    from bigclam_apachespark_spark.streaming.cdc_stream import (
        counting_topk_stream,
    )

    stream = read_events_stream(spark, f"{sf}/events.parquet").select("user_id")
    target = _scratch_path("spark_graft_stream_topk", sf)
    return counting_topk_stream(spark, stream, "user_id", target, k=20)


def _q_events_stream_topk_cms(spark, sf):
    """CMS-backed streaming heavy hitters (VERDICT r11 ask #8): same
    replayed feed, but the persisted state is the FIXED-size d·w
    count-min counter table plus a bounded candidate set instead of
    one row per distinct key — the documented swap-in for unbounded
    key cardinality, now a query. Head ranked by CMS estimate; the
    oracle recomputes the estimates exactly (all-integer md5 bucket
    sums)."""
    from bigclam_apachespark_spark.streaming import read_events_stream
    from bigclam_apachespark_spark.streaming.cdc_stream import (
        cms_topk_stream,
    )

    stream = read_events_stream(spark, f"{sf}/events.parquet").select("user_id")
    target = _scratch_path("spark_graft_stream_topk_cms", sf)
    return cms_topk_stream(spark, stream, "user_id", target, k=20)


def _q_upsert_stream(spark, sf):
    """Streaming twin of rel_upsert_merge: the SAME deterministic
    changefeed, staged to parquet and replayed as a file-source
    stream whose micro-batches foreachBatch-MERGE into the snapshot
    — the warehouse CDC-apply sink. Feed keys are unique, so any
    batch split commutes to one merge and the ORACLE IS SHARED with
    the batch query (stated there). pid-scoped staging/target dirs,
    same discipline as the persisted IVF index."""
    import os

    from bigclam_apachespark_spark.streaming import cdc_upsert_stream

    orders = _rel_tables(spark, sf)[0]
    cols = orders.columns
    updated = orders.where(F.col("o_orderkey") % 10 == 0).select(
        *[
            (F.col("o_totalprice") + 1.0).alias("o_totalprice")
            if c == "o_totalprice"
            else F.col(c)
            for c in cols
        ]
    )
    inserted = orders.where(F.col("o_orderkey") % 1000 == 0).select(
        *[
            (F.col("o_orderkey") + 900000000).alias("o_orderkey")
            if c == "o_orderkey"
            else (F.lit("N").alias("o_orderstatus") if c == "o_orderstatus" else F.col(c))
            for c in cols
        ]
    )
    feed = updated.unionByName(inserted)
    feed_dir = _scratch_path("spark_graft_cdc_feed", sf)
    target_dir = _scratch_path("spark_graft_cdc_target", sf)
    feed.write.mode("overwrite").parquet(feed_dir)
    stream = spark.readStream.schema(feed.schema).parquet(feed_dir)
    return cdc_upsert_stream(spark, orders, stream, target_dir)


def _q_zorder_key(spark, sf):
    from bigclam_apachespark_spark.operators.relational import zorder_key

    return zorder_key(spark.read.parquet(f"{sf}/orders.parquet"), bits=16)


def _q_snapshot_diff(spark, sf):
    """Reconciliation report over the SAME deterministic delta the
    retraction query applies (%37 upsert with price+100, %41 delete,
    %1000 insert with shifted keys): the diff counts must foot
    against the delta's own arithmetic, which the oracle states in
    closed form."""
    from bigclam_apachespark_spark.operators.relational import snapshot_diff

    orders = _rel_tables(spark, sf)[0]
    cols = orders.columns
    upserted = orders.where(F.col("o_orderkey") % 37 == 0).select(
        *[
            (F.col("o_totalprice") + 100.0).alias("o_totalprice")
            if c == "o_totalprice"
            else F.col(c)
            for c in cols
        ]
    )
    new = (
        orders.where(
            (F.col("o_orderkey") % 37 != 0) & (F.col("o_orderkey") % 41 != 0)
        )
        .unionByName(upserted.where(F.col("o_orderkey") % 41 != 0))
    )
    return snapshot_diff(orders, new)


def _q_incremental_agg_retract(spark, sf):
    """Deterministic delta: o_orderkey % 37 = 0 rows are UPSERTED
    with price + 100, % 41 = 0 rows are DELETED (delete wins for
    keys in both). The retraction merge must equal the oracle's
    full recompute over the post-delta table — self-maintainability
    under deletes is what's checked."""
    from bigclam_apachespark_spark.operators.relational import (
        incremental_agg_retract,
    )

    orders = _rel_tables(spark, sf)[0]
    ups = orders.where(F.col("o_orderkey") % 37 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 100.0
    )
    dels = orders.where(F.col("o_orderkey") % 41 == 0).select("o_orderkey")
    return incremental_agg_retract(orders, ups, dels)


def _q_incremental_agg(spark, sf):
    """Base/delta split is deterministic (orderkey % 50): the
    incremental merge must equal the oracle's FULL recompute —
    the self-maintainability property itself is what's checked."""
    from bigclam_apachespark_spark.operators.relational import (
        incremental_agg_merge,
    )

    orders = _rel_tables(spark, sf)[0]
    return incremental_agg_merge(
        orders.where(F.col("o_orderkey") % 50 != 0),
        orders.where(F.col("o_orderkey") % 50 == 0),
    )


def _q_table_stats(spark, sf):
    from bigclam_apachespark_spark.operators.relational import table_stats

    return table_stats(spark.read.parquet(f"{sf}/lineitem.parquet"))


def _zorder_oracle_sql(bits: int = 16) -> str:
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"(((cust_dim >> {i}) & 1) << {2 * i})")
        terms.append(f"(((day_dim >> {i}) & 1) << {2 * i + 1})")
    expr = " | ".join(terms)
    return f"""
        WITH base AS (
          SELECT o_orderkey,
                 o_custkey & {mask} AS cust_dim,
                 CAST(datediff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS BIGINT)
                   & {mask} AS day_dim
          FROM orders
        )
        SELECT o_orderkey, CAST(cust_dim AS BIGINT) AS cust_dim,
               CAST(day_dim AS BIGINT) AS day_dim,
               CAST({expr} AS BIGINT) AS zkey
        FROM base
    """


def _table_stats_oracle_sql() -> str:
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_returnflag"]
    parts = [
        f"""SELECT '{c}' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
               CAST(MIN({c}) AS VARCHAR) AS min_str,
               CAST(MAX({c}) AS VARCHAR) AS max_str
        FROM lineitem"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


def _q_running_totals(spark, sf):
    from bigclam_apachespark_spark.operators.relational import running_totals

    return running_totals(_rel_tables(spark, sf)[0])


def _q_rolling_avg(spark, sf):
    from bigclam_apachespark_spark.operators.relational import rolling_order_stats

    return rolling_order_stats(_rel_tables(spark, sf)[0], frame=3)


def _q_local_supplier_volume(spark, sf):
    from bigclam_apachespark_spark.operators.relational import local_supplier_volume

    return local_supplier_volume(
        spark.read.parquet(f"{sf}/region.parquet"),
        spark.read.parquet(f"{sf}/nation.parquet"),
        spark.read.parquet(f"{sf}/customer.parquet"),
        spark.read.parquet(f"{sf}/supplier.parquet"),
        spark.read.parquet(f"{sf}/orders.parquet"),
        spark.read.parquet(f"{sf}/lineitem.parquet"),
    )


def _q_market_share(spark, sf):
    from bigclam_apachespark_spark.operators.relational import market_share

    return market_share(
        spark.read.parquet(f"{sf}/region.parquet"),
        spark.read.parquet(f"{sf}/nation.parquet"),
        spark.read.parquet(f"{sf}/customer.parquet"),
        spark.read.parquet(f"{sf}/supplier.parquet"),
        spark.read.parquet(f"{sf}/orders.parquet"),
        spark.read.parquet(f"{sf}/lineitem.parquet"),
        spark.read.parquet(f"{sf}/part.parquet"),
    )


def _q_scd2(spark, sf):
    from bigclam_apachespark_spark.operators.relational import scd2_intervals

    return scd2_intervals(spark.read.parquet(f"{sf}/orders.parquet"))


def _q_pit_dimension_join(spark, sf):
    """Point-in-time-correct dimension join — the feature-store
    leakage guard: each order picks up the SCD2 priority interval of
    its customer that was VALID AT the order date, via a backward
    as-of join on (custkey, valid_from). Composing the SCD2 build
    with the union-sort as-of kernel gives the PIT lookup as ONE
    key-partitioned sort — never an interval×fact range join, and
    never the future-leaking plain join a naive feature pipeline
    writes. Ties (two islands starting the same date) resolve to the
    greatest (valid_from, priority), deterministic cross-engine."""
    from bigclam_apachespark_spark.operators.relational import scd2_intervals
    from bigclam_apachespark_spark.operators.temporal import as_of_join

    orders = spark.read.parquet(f"{sf}/orders.parquet")
    dim = scd2_intervals(orders).select(
        "o_custkey",
        "valid_from",
        F.col("o_orderpriority").alias("prio_pit"),
    )
    return as_of_join(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        dim,
        on=["o_custkey"],
        left_ts="o_orderdate",
        right_ts="valid_from",
        payload=["prio_pit"],
        direction="backward",
    )


def _q_disjunctive_revenue(spark, sf):
    from bigclam_apachespark_spark.operators.relational import (
        disjunctive_filter_revenue,
    )

    return disjunctive_filter_revenue(
        spark.read.parquet(f"{sf}/part.parquet"),
        spark.read.parquet(f"{sf}/lineitem.parquet"),
    )


def _q_late_supplier_blame(spark, sf):
    from bigclam_apachespark_spark.operators.relational import (
        sole_late_supplier_blame,
    )

    return sole_late_supplier_blame(
        spark.read.parquet(f"{sf}/orders.parquet"),
        spark.read.parquet(f"{sf}/supplier.parquet"),
        spark.read.parquet(f"{sf}/lineitem.parquet"),
    )


def _q_supplier_diversity(spark, sf):
    from bigclam_apachespark_spark.operators.relational import supplier_diversity

    return supplier_diversity(
        spark.read.parquet(f"{sf}/part.parquet"),
        spark.read.parquet(f"{sf}/lineitem.parquet"),
    )


def _q_big_orders(spark, sf):
    from bigclam_apachespark_spark.operators.relational import big_quantity_orders

    return big_quantity_orders(
        spark.read.parquet(f"{sf}/orders.parquet"),
        spark.read.parquet(f"{sf}/customer.parquet"),
        spark.read.parquet(f"{sf}/lineitem.parquet"),
    )


def _q_small_qty_revenue(spark, sf):
    from bigclam_apachespark_spark.operators.relational import small_quantity_revenue

    return small_quantity_revenue(
        spark.read.parquet(f"{sf}/part.parquet"),
        spark.read.parquet(f"{sf}/lineitem.parquet"),
    )


def _q_bucketed_join(spark, sf):
    """Run-unique table prefix (pid-scoped, same discipline as the
    persisted IVF index path) so concurrent runs against the same sf
    never clobber each other's bucketed tables. The two warehouse
    table dirs are atexit-removed like every other scratch artifact
    (VERDICT r7 #8: repeated runs accumulated bkt_* dirs under
    spark-warehouse/ forever)."""
    import os

    from bigclam_apachespark_spark.operators.relational import bucketed_segment_spend

    prefix = (
        f"bkt_{os.path.basename(sf.rstrip('/')).replace('.', '_')}_{os.getpid()}"
    )
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for scheme in ("file://", "file:"):
        if wh.startswith(scheme):
            wh = wh[len(scheme):]
            break
    for t in ("orders", "customer"):
        _atexit.register(
            _shutil.rmtree, _os.path.join(wh, f"{prefix}_{t}"), ignore_errors=True
        )
    return bucketed_segment_spend(
        spark,
        spark.read.parquet(f"{sf}/orders.parquet"),
        spark.read.parquet(f"{sf}/customer.parquet"),
        prefix,
        n_buckets=8,
    )


def _q_window_suite(spark, sf):
    from bigclam_apachespark_spark.operators.relational import order_window_suite

    return order_window_suite(_rel_tables(spark, sf)[0])


def _q_conditional_revenue(spark, sf):
    from bigclam_apachespark_spark.operators.relational import conditional_revenue

    return conditional_revenue(_rel_tables(spark, sf)[2])


def _q_nation_volume(spark, sf):
    from bigclam_apachespark_spark.operators.relational import (
        nation_volume_shipping,
    )

    o, c, li = _rel_tables(spark, sf)
    return nation_volume_shipping(
        c, o, li,
        spark.read.parquet(f"{sf}/supplier.parquet"),
        spark.read.parquet(f"{sf}/nation.parquet"),
    )


def _q_product_profit(spark, sf):
    from bigclam_apachespark_spark.operators.relational import product_profit

    o, _, li = _rel_tables(spark, sf)
    return product_profit(
        li, o,
        spark.read.parquet(f"{sf}/supplier.parquet"),
        spark.read.parquet(f"{sf}/nation.parquet"),
        spark.read.parquet(f"{sf}/part.parquet"),
    )


def _q_returned_items(spark, sf):
    from bigclam_apachespark_spark.operators.relational import (
        returned_item_report,
    )

    o, c, li = _rel_tables(spark, sf)
    return returned_item_report(
        c, o, li, spark.read.parquet(f"{sf}/nation.parquet")
    )


def _q_important_stock(spark, sf):
    from bigclam_apachespark_spark.operators.relational import important_stock

    return important_stock(
        _rel_tables(spark, sf)[2],
        spark.read.parquet(f"{sf}/supplier.parquet"),
        spark.read.parquet(f"{sf}/part.parquet"),
    )


def _q_promo_pct(spark, sf):
    from bigclam_apachespark_spark.operators.relational import promo_revenue_pct

    return promo_revenue_pct(
        _rel_tables(spark, sf)[2], spark.read.parquet(f"{sf}/part.parquet")
    )


def _q_min_cost_supplier(spark, sf):
    from bigclam_apachespark_spark.operators.relational import min_cost_supplier

    return min_cost_supplier(
        spark.read.parquet(f"{sf}/part.parquet"),
        spark.read.parquet(f"{sf}/supplier.parquet"),
        spark.read.parquet(f"{sf}/nation.parquet"),
        _rel_tables(spark, sf)[2],
    )


def _q_excess_suppliers(spark, sf):
    from bigclam_apachespark_spark.operators.relational import excess_suppliers

    return excess_suppliers(
        _rel_tables(spark, sf)[2],
        spark.read.parquet(f"{sf}/supplier.parquet"),
    )


def _q_order_priority(spark, sf):
    from bigclam_apachespark_spark.operators.relational import order_priority_check

    o, _, li = _rel_tables(spark, sf)
    return order_priority_check(o, li)


def _q_late_priority(spark, sf):
    from bigclam_apachespark_spark.operators.relational import late_priority_matrix

    o, _, li = _rel_tables(spark, sf)
    return late_priority_matrix(o, li)


def _q_order_distribution(spark, sf):
    from bigclam_apachespark_spark.operators.relational import (
        customer_order_distribution,
    )

    o, c, _ = _rel_tables(spark, sf)
    return customer_order_distribution(c, o)


def _q_top_supplier(spark, sf):
    from bigclam_apachespark_spark.operators.relational import top_revenue_supplier

    return top_revenue_supplier(
        spark.read.parquet(f"{sf}/supplier.parquet"),
        _rel_tables(spark, sf)[2],
    )


def _q_idle_rich(spark, sf):
    from bigclam_apachespark_spark.operators.relational import idle_rich_customers

    o, c, _ = _rel_tables(spark, sf)
    return idle_rich_customers(c, o)


REL_QUERIES = {
    "rel_dq_report": _q_dq_report,
    "rel_dq_quarantine": _q_dq_quarantine,
    "rel_nullsafe_join": _q_nullsafe_join,
    "rel_fk_profile": _q_fk_profile,
    "rel_order_priority": _q_order_priority,
    "rel_window_suite": _q_window_suite,
    "rel_conditional_revenue": _q_conditional_revenue,
    "rel_nation_volume": _q_nation_volume,
    "rel_product_profit": _q_product_profit,
    "rel_returned_items": _q_returned_items,
    "rel_important_stock": _q_important_stock,
    "rel_promo_pct": _q_promo_pct,
    "rel_min_cost_supplier": _q_min_cost_supplier,
    "rel_excess_suppliers": _q_excess_suppliers,
    "rel_late_priority": _q_late_priority,
    "rel_order_distribution": _q_order_distribution,
    "rel_top_supplier": _q_top_supplier,
    "rel_idle_rich": _q_idle_rich,
    "rel_big_orders": _q_big_orders,
    "rel_small_qty_revenue": _q_small_qty_revenue,
    "rel_bucketed_join": _q_bucketed_join,
    "rel_local_supplier_volume": _q_local_supplier_volume,
    "rel_market_share": _q_market_share,
    "rel_scd2_intervals": _q_scd2,
    "rel_pit_dimension_join": _q_pit_dimension_join,
    "rel_disjunctive_revenue": _q_disjunctive_revenue,
    "rel_late_supplier_blame": _q_late_supplier_blame,
    "rel_supplier_diversity": _q_supplier_diversity,
    "rel_pricing_summary": _q_pricing,
    "rel_top_orders": _q_top_orders,
    "rel_upsert_merge": _q_upsert,
    "rel_merge_deletes": _q_merge_deletes,
    "rel_upsert_stream": _q_upsert_stream,
    "events_stream_topk": _q_events_stream_topk,
    "events_stream_topk_cms": _q_events_stream_topk_cms,
    "rel_zorder_key": _q_zorder_key,
    "rel_incremental_agg": _q_incremental_agg,
    "rel_incremental_agg_retract": _q_incremental_agg_retract,
    "rel_snapshot_diff": _q_snapshot_diff,
    "rel_table_stats": _q_table_stats,
    "rel_running_totals": _q_running_totals,
    "rel_rolling_avg": _q_rolling_avg,
}

REL_ORACLE = {
    # Analytic-function parity: one partition+sort spec shared by all
    # six functions; percent_rank/cume_dist are single divisions of
    # exact integer ranks under identical definitions.
    "rel_window_suite": """
        SELECT o_orderkey, o_custkey,
               CAST(ROW_NUMBER() OVER w AS INT) AS rn,
               round(CAST(LAG(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
                     AS DOUBLE) / 100.0, 6) AS prev_total,
               round(CAST(LEAD(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
                     AS DOUBLE) / 100.0, 6) AS next_total,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               round(PERCENT_RANK() OVER w, 6) AS pct_rank,
               round(CUME_DIST() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    # Q6-shape: all-predicate pushdown; exact cents·pp fold.
    "rel_conditional_revenue": """
        SELECT round(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                              * CAST(round(l_discount * 100) AS BIGINT))
                     AS DOUBLE) / 10000.0, 6) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
          AND CAST(round(l_quantity * 100) AS BIGINT) < 2400
    """,
    # Q7-shape: one join tree, direction pair as a disjunction.
    "rel_nation_volume": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               round(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     AS DOUBLE) / 10000.0, 6) AS revenue
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        WHERE (c_nationkey = 1 AND s_nationkey = 2)
           OR (c_nationkey = 2 AND s_nationkey = 1)
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    # Q9-shape: revenue and cost folded in the shared 1e-4-dollar
    # integer domain; retailprice is the documented supplycost
    # substitute.
    "rel_product_profit": """
        SELECT n.n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               round(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(round(l_discount * 100) AS BIGINT))
                              - CAST(round(l_quantity * 100) AS BIGINT)
                                * CAST(round(p_retailprice * 100) AS BIGINT))
                     AS DOUBLE) / 10000.0, 6) AS sum_profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
        JOIN orders ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n ON n.n_nationkey = s_nationkey
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    # Q10-shape: fact collapses per customer first; exact-integer
    # top-k frontier.
    "rel_returned_items": """
        WITH per AS (
          SELECT o_custkey AS c_custkey,
                 CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                      AS BIGINT) AS rc
          FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          WHERE l_returnflag = 'R'
            AND o_orderdate >= TIMESTAMP '1997-07-01'
            AND o_orderdate <  TIMESTAMP '1997-10-01'
          GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name, n.n_name,
               round(CAST(rc AS DOUBLE) / 10000.0, 6) AS revenue
        FROM per JOIN customer c USING (c_custkey)
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        ORDER BY rc DESC, c.c_custkey LIMIT 20
    """,
    # Q11-shape: exact integer cross-multiplied HAVING.
    "rel_important_stock": """
        WITH base AS (
          SELECT l_partkey AS p_partkey,
                 CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)
                          * CAST(round(p_retailprice * 100) AS BIGINT))
                      AS HUGEINT) AS v
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = 5
          JOIN part ON p_partkey = l_partkey
          GROUP BY l_partkey
        ),
        total AS (SELECT CAST(SUM(v) AS HUGEINT) AS t FROM base)
        SELECT p_partkey, round(CAST(v AS DOUBLE) / 10000.0, 6) AS value
        FROM base CROSS JOIN total
        WHERE v * 1000000 > t * 1000
        ORDER BY v DESC, p_partkey
    """,
    # Q14-shape: both sums in ONE agg; one division.
    "rel_promo_pct": """
        SELECT round(100.0
               * CAST(SUM(CASE WHEN p_type = 'PROMO'
                          THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                               * (100 - CAST(round(l_discount * 100) AS BIGINT))
                          ELSE 0 END) AS DOUBLE)
               / CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                 AS DOUBLE), 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-06-01'
          AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
    # Q2-shape: correlated MIN decorrelated; exact-integer
    # min-equality surfaces all ties.
    "rel_min_cost_supplier": """
        WITH per AS (
          SELECT l_partkey AS p_partkey, s.s_suppkey, s.s_name, n.n_name,
                 CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                      AS HUGEINT) AS v
          FROM lineitem
          JOIN part p ON p.p_partkey = l_partkey AND p.p_size = 15
          JOIN supplier s ON s.s_suppkey = l_suppkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey
                       AND n.n_nationkey IN (0, 1, 2, 3, 4)
          GROUP BY 1, 2, 3, 4
        ),
        mn AS (SELECT p_partkey, MIN(v) AS m FROM per GROUP BY p_partkey)
        SELECT per.p_partkey, s_suppkey, s_name, n_name,
               round(CAST(v AS DOUBLE) / 10000.0, 6) AS supply_value
        FROM per JOIN mn ON mn.p_partkey = per.p_partkey AND per.v = mn.m
        ORDER BY per.p_partkey, s_suppkey
    """,
    # Q20-shape: nested agg reusing one partitioning; integer
    # cross-multiplied dominance threshold.
    "rel_excess_suppliers": """
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qps
          FROM lineitem GROUP BY 1, 2
        ),
        p AS (SELECT l_partkey, CAST(SUM(qps) AS BIGINT) AS qp FROM ps GROUP BY 1)
        SELECT s.s_suppkey, s.s_name,
               CAST(COUNT(*) AS BIGINT) AS n_parts_dominated
        FROM ps JOIN p USING (l_partkey)
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        WHERE qps * 100 > qp * 50
        GROUP BY 1, 2
        ORDER BY n_parts_dominated DESC, s.s_suppkey
    """,
    # Q4-shape: the correlated EXISTS decorrelates to a semi-join;
    # both engines count each qualifying order exactly once.
    "rel_order_priority": """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    # Q12-shape: one pass, both priority classes as conditional sums.
    "rel_late_priority": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAYS
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    # Q13-shape: LEFT join keeps zero-order customers; COUNT on the
    # right-side key is NULL-safe so they land in the c_count=0 bin.
    "rel_order_distribution": """
        WITH per_cust AS (
          SELECT c.c_custkey,
                 CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus <> 'P') o
            ON o.o_custkey = c.c_custkey
          GROUP BY c.c_custkey
        )
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM per_cust GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    # Q15-shape: integer cents×bps revenue, so the =max comparison
    # is exact and genuinely tied suppliers all surface.
    "rel_top_supplier": """
        WITH per_supp AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                      AS HUGEINT) AS rv
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               round(CAST(rv AS DOUBLE) / 10000.0, 6) AS total_revenue
        FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
        WHERE rv = (SELECT MAX(rv) FROM per_supp)
        ORDER BY s_suppkey
    """,
    # Q22-shape: bal*n > sum is the exact-integer form of
    # bal > avg — identical row sets on both engines.
    "rel_idle_rich": """
        WITH cohort AS (
          SELECT c_custkey, c_nationkey,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
          FROM customer WHERE c_nationkey IN (0,1,2,3,4,5,6)
        ),
        pos AS (
          SELECT CAST(SUM(bal_c) AS HUGEINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM cohort WHERE bal_c > 0
        )
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               round(CAST(SUM(bal_c) AS DOUBLE) / 100.0, 6) AS totacctbal
        FROM cohort, pos
        WHERE bal_c * n > s
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = cohort.c_custkey)
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    # Q18-shape: HAVING on the lineitem aggregate BEFORE any join;
    # deterministic top-k tie-break on the order key.
    "rel_big_orders": """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
          FROM lineitem GROUP BY 1
          HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
        )
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, big.total_qty
        FROM big
        JOIN orders o ON o.o_orderkey = big.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    # Q17-shape: the correlated average decorrelated into a per-part
    # aggregate; the 20%-of-average comparison is exact integer
    # arithmetic (5*qty*n < sum_qty), so the row set is bit-identical.
    "rel_small_qty_revenue": """
        WITH pk AS (
          SELECT p_partkey FROM part
          WHERE p_brand = 'Brand#23' AND p_size < 10
        ),
        li AS (
          SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
          FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM pk)
        ),
        st AS (
          SELECT l_partkey, SUM(qty) AS sum_qty, COUNT(*) AS n_li
          FROM li GROUP BY 1
        )
        SELECT round(CAST(SUM(price_c) AS DOUBLE) / 700.0, 6) AS avg_yearly
        FROM li JOIN st USING (l_partkey)
        WHERE qty * 5 * n_li < sum_qty
    """,
    # Bucketed co-located join: the RESULT is layout-independent (the
    # bucketing only removes the join exchanges — plan-asserted in
    # tests/test_plans.py), so the oracle is the plain join.
    "rel_bucketed_join": """
        SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
               round(CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                     AS DOUBLE) / 100.0, 6) AS total_spend
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1
    """,
    # Q16-shape: the exclusion list anti-joins before the part join;
    # COUNT(DISTINCT) is exact on both engines.
    "rel_supplier_diversity": """
        SELECT p.p_brand, p.p_type,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_suppkey NOT IN (
          SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
        )
        GROUP BY p.p_brand, p.p_type
    """,
    # Q8-shape: numerator and denominator are exact integer folds in
    # the SAME aggregate; the share is one double division rounded
    # once — identical quantization on both engines.
    "rel_market_share": """
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               round(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                 THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                 ELSE 0 END) AS DOUBLE) / 10000.0, 6) AS nation_revenue,
               round(CAST(SUM(
                 CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               ) AS DOUBLE) / 10000.0, 6) AS total_revenue,
               round(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                 THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                 ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(
                     CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                   ) AS DOUBLE), 6) AS mkt_share
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
                     AND r.r_name = 'AMERICA'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    # Q19-shape: the OR-of-conjunctions predicate verbatim; exact
    # integer-cents revenue fold.
    "rel_disjunctive_revenue": """
        SELECT round(CAST(SUM(
                 CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               ) AS DOUBLE) / 10000.0, 6) AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12'
               AND CAST(l.l_quantity AS BIGINT) BETWEEN 1 AND 11
               AND p.p_size BETWEEN 1 AND 5)
           OR (p.p_brand = 'Brand#23'
               AND CAST(l.l_quantity AS BIGINT) BETWEEN 10 AND 20
               AND p.p_size BETWEEN 1 AND 10)
           OR (p.p_brand = 'Brand#15'
               AND CAST(l.l_quantity AS BIGINT) BETWEEN 20 AND 30
               AND p.p_size BETWEEN 1 AND 15)
    """,
    # Q21-intent: both correlated quantifiers decorrelated into one
    # aggregation cascade (per-(order,supplier) late fold, per-order
    # supplier/late counts, blame filter) — same rows as the
    # EXISTS / NOT EXISTS formulation by construction.
    "rel_late_supplier_blame": """
        WITH li AS (
          SELECT l.l_orderkey, l.l_suppkey,
                 l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        ),
        ps AS (
          SELECT l_orderkey, l_suppkey, MAX(late) AS any_late
          FROM li GROUP BY 1, 2
        ),
        po AS (
          SELECT l_orderkey, COUNT(*) AS n_supp,
                 SUM(CASE WHEN any_late THEN 1 ELSE 0 END) AS n_late
          FROM ps GROUP BY 1
        ),
        blame AS (
          SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
          FROM ps JOIN po USING (l_orderkey)
          WHERE any_late AND n_supp > 1 AND n_late = 1
          GROUP BY 1
        )
        SELECT s.s_name, b.numwait
        FROM blame b JOIN supplier s ON s.s_suppkey = b.l_suppkey
        ORDER BY b.numwait DESC, s.s_name
        LIMIT 20
    """,
    # PIT dimension join: SCD2 islands restated, then for each order
    # the valid-at interval = rank-1 by (valid_from DESC, prio DESC)
    # among intervals starting at or before the order date — the
    # relational restatement of the backward as-of (whose equal-key
    # ties resolve to the greatest (valid_from, payload) struct).
    "rel_pit_dimension_join": """
        WITH flagged AS (
          SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                 CASE WHEN LAG(o_orderpriority) OVER w IS NULL
                        OR LAG(o_orderpriority) OVER w != o_orderpriority
                      THEN 1 ELSE 0 END AS chg
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey)
        ),
        islands AS (
          SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey
                                   ROWS UNBOUNDED PRECEDING) AS island
          FROM flagged
        ),
        runs AS (
          SELECT o_custkey, island,
                 MIN(o_orderpriority) AS prio_pit,
                 MIN(o_orderdate) AS valid_from
          FROM islands GROUP BY o_custkey, island
        ),
        j AS (
          SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
                 d.valid_from, d.prio_pit,
                 ROW_NUMBER() OVER (
                   PARTITION BY o.o_orderkey
                   ORDER BY d.valid_from DESC, d.prio_pit DESC) AS rn
          FROM orders o JOIN runs d
            ON d.o_custkey = o.o_custkey
           AND d.valid_from <= o.o_orderdate
        )
        SELECT o_orderkey, o_custkey, o_orderdate,
               valid_from AS asof_valid_from, prio_pit AS asof_prio_pit
        FROM j WHERE rn = 1
    """,
    # SCD2 interval build: lag-change flag -> running-sum island id
    # -> per-island collapse -> lead closing edge. Window order
    # (o_orderdate, o_orderkey) is a key, so every step is
    # deterministic; islands are per-key sequential so the lead
    # ordering is unambiguous.
    "rel_scd2_intervals": """
        WITH flagged AS (
          SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                 CASE WHEN LAG(o_orderpriority) OVER w IS NULL
                        OR LAG(o_orderpriority) OVER w != o_orderpriority
                      THEN 1 ELSE 0 END AS chg
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey)
        ),
        islands AS (
          SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey
                                   ROWS UNBOUNDED PRECEDING) AS island
          FROM flagged
        ),
        runs AS (
          SELECT o_custkey, island,
                 MIN(o_orderpriority) AS o_orderpriority,
                 MIN(o_orderdate) AS valid_from,
                 CAST(COUNT(*) AS BIGINT) AS n_rows
          FROM islands GROUP BY o_custkey, island
        )
        SELECT o_custkey, o_orderpriority, valid_from,
               LEAD(valid_from) OVER (PARTITION BY o_custkey
                                      ORDER BY island) AS valid_to,
               n_rows
        FROM runs
    """,
    # Q5-shape: revenue in integer cents · percent (exact fold),
    # divided back once — same quantization as rel_pricing_summary.
    "rel_local_supplier_volume": """
        SELECT n.n_name,
               round(CAST(SUM(
                 CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               ) AS DOUBLE) / 10000.0, 6) AS revenue
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
    """,
    # FK discovery: distinct-set inclusion coefficients, one exact
    # division per candidate.
    "rel_fk_profile": """
        WITH oc AS (SELECT DISTINCT o_custkey AS v FROM orders),
        cc AS (SELECT DISTINCT c_custkey AS v FROM customer),
        lo AS (SELECT DISTINCT l_orderkey AS v FROM lineitem),
        oo AS (SELECT DISTINCT o_orderkey AS v FROM orders),
        pair AS (
          SELECT 'orders.o_custkey -> customer.c_custkey' AS candidate,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM oc) AS n_child_distinct,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM oc
                  WHERE EXISTS (SELECT 1 FROM cc WHERE cc.v = oc.v)) AS n_matched
          UNION ALL
          SELECT 'customer.c_custkey -> orders.o_custkey',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM cc),
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM cc
                  WHERE EXISTS (SELECT 1 FROM oc WHERE oc.v = cc.v))
          UNION ALL
          SELECT 'lineitem.l_orderkey -> orders.o_orderkey',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM lo),
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM lo
                  WHERE EXISTS (SELECT 1 FROM oo WHERE oo.v = lo.v))
          UNION ALL
          SELECT 'orders.o_orderkey -> lineitem.l_orderkey',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM oo),
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM oo
                  WHERE EXISTS (SELECT 1 FROM lo WHERE lo.v = oo.v))
          UNION ALL
          SELECT 'orders.o_custkey -> orders.o_orderkey',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM oc),
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM oc
                  WHERE EXISTS (SELECT 1 FROM oo WHERE oo.v = oc.v))
        )
        SELECT candidate, n_child_distinct, n_matched,
               round(CAST(n_matched AS DOUBLE)
                     / CAST(n_child_distinct AS DOUBLE), 6) AS inclusion
        FROM pair
    """,
    # Null-safe equality parity: <=> on the Spark side, IS NOT
    # DISTINCT FROM here — the NULL key survives as a match group.
    "rel_nullsafe_join": """
        WITH fact AS (
          SELECT nullif(o_custkey % 100, 0) AS k FROM orders
        ),
        dim AS (SELECT DISTINCT k AS dk FROM fact)
        SELECT dk AS k, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM fact JOIN dim ON fact.k IS NOT DISTINCT FROM dim.dk
        GROUP BY dk ORDER BY k NULLS FIRST
    """,
    # Row-level rule bitmask: failure COMBINATIONS, not per-rule
    # totals — all integer, one hash agg.
    "rel_dq_quarantine": """
        WITH m AS (
          SELECT o_orderkey,
                 CAST(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END AS BIGINT)
                 + CAST(CASE WHEN coalesce(o_totalprice, -1) <= 0 THEN 2 ELSE 0 END AS BIGINT)
                 + CAST(CASE WHEN o_orderdate IS NULL THEN 4 ELSE 0 END AS BIGINT)
                 + CAST(CASE WHEN o_orderstatus IS NULL
                               OR o_orderstatus NOT IN ('O', 'F', 'P')
                             THEN 8 ELSE 0 END AS BIGINT) AS rule_mask
          FROM orders
        )
        SELECT rule_mask, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_orderkey,
               CAST(MAX(o_orderkey) AS BIGINT) AS max_orderkey
        FROM m GROUP BY rule_mask ORDER BY rule_mask
    """,
    "rel_dq_report": """
        SELECT 'orders_null_custkey' AS rule,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
        FROM orders
        UNION ALL
        SELECT 'orders_nonpositive_total',
               CAST(SUM(CASE WHEN coalesce(o_totalprice, -1) <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'lineitem_discount_range',
               CAST(SUM(CASE WHEN coalesce(l_discount, -1) < 0 OR l_discount > 1
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_nonpositive_qty',
               CAST(SUM(CASE WHEN coalesce(l_quantity, 0) <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'orders_fk_customer',
               CAST(COUNT(*) AS BIGINT)
        FROM orders o WHERE NOT EXISTS
          (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'lineitem_fk_orders',
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
    # Integer cents / percent-point quantization: every SUM is an
    # order-independent BIGINT fold; naive double sums at ~1e9
    # magnitude drift above the 6-dp comparison.
    "rel_pricing_summary": """
        WITH q AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS ep,
                 CAST(round(l_quantity * 100) AS BIGINT) AS qty,
                 CAST(round(l_discount * 100) AS BIGINT) AS disc,
                 CAST(round(l_tax * 100) AS BIGINT) AS tax
          FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-03'
        ),
        g AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(SUM(qty) AS BIGINT) AS sq,
                 CAST(SUM(ep) AS BIGINT) AS sbp,
                 CAST(SUM(ep * (100 - disc)) AS BIGINT) AS sdp,
                 CAST(SUM(ep * (100 - disc) * (100 + tax)) AS BIGINT) AS sch,
                 CAST(SUM(disc) AS BIGINT) AS sd,
                 CAST(COUNT(*) AS BIGINT) AS count_order
          FROM q GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus,
               round(CAST(sq AS DOUBLE) / 100.0, 6) AS sum_qty,
               round(CAST(sbp AS DOUBLE) / 100.0, 6) AS sum_base_price,
               round(CAST(sdp AS DOUBLE) / 10000.0, 6) AS sum_disc_price,
               round(CAST(sch AS DOUBLE) / 1000000.0, 6) AS sum_charge,
               round(CAST(sq AS DOUBLE) / 100.0 / CAST(count_order AS DOUBLE), 6) AS avg_qty,
               round(CAST(sbp AS DOUBLE) / 100.0 / CAST(count_order AS DOUBLE), 6) AS avg_price,
               round(CAST(sd AS DOUBLE) / 100.0 / CAST(count_order AS DOUBLE), 6) AS avg_disc,
               count_order
        FROM g
    """,
    "rel_top_orders": """
        WITH c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        o AS (
          SELECT o_orderkey, o_orderdate FROM orders
          JOIN c ON o_custkey = c_custkey
          WHERE o_orderdate < TIMESTAMP '1995-03-15'
        ),
        r AS (
          SELECT l.l_orderkey AS o_orderkey,
                 CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rv
          FROM lineitem l JOIN o ON o.o_orderkey = l.l_orderkey
          GROUP BY l.l_orderkey
        )
        SELECT o.o_orderkey, o.o_orderdate,
               round(CAST(rv AS DOUBLE) / 10000.0, 6) AS revenue
        FROM r JOIN o USING (o_orderkey)
        ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    # CDC apply: updates replace, new keys insert, the rest carry
    # over — both engines derive the same deterministic changefeed.
    "rel_upsert_merge": """
        WITH upd AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey + 900000000, o_custkey, 'N',
                 o_totalprice, o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 1000 = 0
        )
        SELECT * FROM upd
        UNION ALL
        SELECT o.* FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey)
    """,
    # Full MERGE: updates replace, inserts add, deletes remove, the
    # rest carry over — same deterministic feed on both engines.
    "rel_merge_deletes": """
        WITH upd AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey + 900000000, o_custkey, 'N',
                 o_totalprice, o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 1000 = 0
        ),
        del AS (
          SELECT o_orderkey FROM orders
          WHERE o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0
        ),
        allkeys AS (
          SELECT o_orderkey FROM upd UNION ALL SELECT o_orderkey FROM del
        )
        SELECT * FROM upd
        UNION ALL
        SELECT o.* FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM allkeys k WHERE k.o_orderkey = o.o_orderkey)
    """,
    # Bounded-frame window: trailing-3 rolling average, integer-cents
    # exact inside the frame.
    "rel_rolling_avg": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_in_frame,
               round(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
                          AS DOUBLE) / 100.0
                     / CAST(COUNT(*) OVER w AS DOUBLE), 6) AS rolling_avg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    # Integer-cents prefix sums: exact at any prefix length.
    "rel_running_totals": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(COUNT(*) OVER w AS BIGINT) AS run_orders,
               round(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
                          AS DOUBLE) / 100.0, 6) AS run_total
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING)
    """,
}

# The streamed CDC apply must converge to EXACTLY the batch merge
# (unique feed keys ⇒ batch splits commute), so the oracle is shared.
REL_ORACLE["rel_upsert_stream"] = REL_ORACLE["rel_upsert_merge"]

# Streaming top-k twin: additive count merge across any batch split
# equals the one-shot batch count, so the oracle is the plain head.
REL_ORACLE["events_stream_topk"] = """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(row_number() OVER (
             ORDER BY COUNT(*) DESC, user_id) AS INT) AS rank
    FROM events GROUP BY user_id
    ORDER BY n DESC, user_id LIMIT 20
"""

# CMS-backed streaming heavy hitters (VERDICT r11 ask #8): the final
# counter table is batch-split-invariant (counter adds commute), the
# estimate is an exact integer function of it, and the single-file
# fixture replay keeps every key in the candidate set — so the twin
# recomputes the estimates over the whole feed and takes the same
# (n_cms DESC, user_id) head. n_cms >= n_exact always.

REL_ORACLE["events_stream_topk_cms"] = """
    WITH counters AS (
      SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT 0 AS r, CAST(CAST(CONCAT('0x', substr(md5('cms0:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1024 AS INT) AS bucket FROM events
        UNION ALL SELECT 1 AS r, CAST(CAST(CONCAT('0x', substr(md5('cms1:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1024 AS INT) AS bucket FROM events
        UNION ALL SELECT 2 AS r, CAST(CAST(CONCAT('0x', substr(md5('cms2:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1024 AS INT) AS bucket FROM events
        UNION ALL SELECT 3 AS r, CAST(CAST(CONCAT('0x', substr(md5('cms3:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1024 AS INT) AS bucket FROM events
      ) GROUP BY r, bucket
    ),
    keys AS (SELECT DISTINCT user_id FROM events),
    probes AS (
        SELECT user_id, 0 AS r, CAST(CAST(CONCAT('0x', substr(md5('cms0:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1024 AS INT) AS bucket FROM keys
        UNION ALL SELECT user_id, 1 AS r, CAST(CAST(CONCAT('0x', substr(md5('cms1:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1024 AS INT) AS bucket FROM keys
        UNION ALL SELECT user_id, 2 AS r, CAST(CAST(CONCAT('0x', substr(md5('cms2:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1024 AS INT) AS bucket FROM keys
        UNION ALL SELECT user_id, 3 AS r, CAST(CAST(CONCAT('0x', substr(md5('cms3:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1024 AS INT) AS bucket FROM keys
    ),
    est AS (
      SELECT user_id, CAST(MIN(c) AS BIGINT) AS n_cms
      FROM probes JOIN counters USING (r, bucket)
      GROUP BY user_id
    )
    SELECT user_id, n_cms,
           CAST(row_number() OVER (ORDER BY n_cms DESC, user_id) AS INT) AS rank
    FROM est ORDER BY n_cms DESC, user_id LIMIT 20
"""

# Morton interleave restated bit-by-bit; incremental merge checked
# against the FULL recompute (the self-maintainability property);
# ANALYZE stats as one UNION ALL of per-column aggregates.
REL_ORACLE["rel_zorder_key"] = _zorder_oracle_sql(16)
# Snapshot-diff closed form over the deterministic delta: removed =
# the %41 deletes, changed = surviving %37 upserts (price moved),
# nothing added, the rest unchanged.
REL_ORACLE["rel_snapshot_diff"] = """
    WITH c AS (
      SELECT CAST(SUM(CASE WHEN o_orderkey % 41 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS removed,
             CAST(SUM(CASE WHEN o_orderkey % 37 = 0 AND o_orderkey % 41 <> 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS changed,
             CAST(SUM(CASE WHEN o_orderkey % 37 <> 0 AND o_orderkey % 41 <> 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS unchanged
      FROM orders
    )
    SELECT 'added' AS change_type, CAST(0 AS BIGINT) AS n_rows FROM c
    UNION ALL SELECT 'removed', removed FROM c
    UNION ALL SELECT 'changed', changed FROM c
    UNION ALL SELECT 'unchanged', unchanged FROM c
    UNION ALL SELECT 'changed:o_totalprice', changed FROM c
    UNION ALL SELECT 'changed:o_orderstatus', CAST(0 AS BIGINT) FROM c
"""

REL_ORACLE["rel_incremental_agg_retract"] = """
    WITH up AS (
      SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice
      FROM orders WHERE o_orderkey % 37 = 0
    ),
    survivors AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_orderkey % 37 <> 0 AND o_orderkey % 41 <> 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice FROM up
      WHERE o_orderkey % 41 <> 0
    )
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           round(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                 AS DOUBLE) / 100.0, 6) AS total_spend
    FROM survivors GROUP BY 1
"""
REL_ORACLE["rel_incremental_agg"] = """
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           round(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                 AS DOUBLE) / 100.0, 6) AS total_spend
    FROM orders GROUP BY 1
"""
REL_ORACLE["rel_table_stats"] = _table_stats_oracle_sql()


EXT_QUERIES = {
    **TEXT_QUERIES,
    **DEDUP_QUERIES,
    **SIM_QUERIES,
    **MULTIMODAL_QUERIES,
    **REL_QUERIES,
    **EVENT_QUERIES,
}
EXT_ORACLE = {
    **TEXT_ORACLE,
    **DEDUP_ORACLE,
    **SIM_ORACLE,
    **EVENT_ORACLE,
    **MULTIMODAL_ORACLE,
    **REL_ORACLE,
}
