"""Text-analysis + dedup operator tests on hand-built documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigclam_apachespark_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    lsh_buckets,
    lsh_candidate_pairs,
    minhash_lsh_dups,
    minhash_signatures,
    simhash,
    simhash_near_dups,
    token_jaccard_pairs,
)
from bigclam_apachespark_spark.operators.text import (
    clean_corpus,
    fingerprints,
    lang_id,
    quality_score,
    token_stats,
)

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog!"),  # exact dup after normalize
    (2, "The quick brown fox jumps over the lazy cat"),   # near dup
    (3, "el perro es un animal que vive en la casa"),
    (4, "le chat est un animal qui vit pour la maison du village"),
    (5, "zzz qqq xxx www"),
    (6, "completely different content about spark engines and shuffles"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_token_stats(docs):
    rows = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert rows[0]["n_tokens"] == 9
    assert rows[0]["n_distinct_tokens"] == 8  # 'the' twice
    assert rows[5]["n_tokens"] == 4
    assert rows[0]["n_chars"] == len(DOCS[0][1])


def test_quality_and_lang(docs):
    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert 0.0 <= q[0]["quality"] <= 1.0
    assert q[0]["stop_ratio"] > 0
    assert q[5]["stop_ratio"] == 0.0
    lang = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert lang[0] == "en"
    assert lang[3] == "es"
    assert lang[4] == "fr"
    assert lang[5] == "und"


def test_clean_corpus_composition(docs):
    """Filter → language → dedup-among-survivors semantics: doc 1 is
    an exact dup of doc 0 after normalization (min doc_id 0 survives);
    non-English and low-stopword docs drop at the language gate."""
    out = {r["doc_id"]: r for r in clean_corpus(docs, quality_threshold=0.0).collect()}
    assert 0 in out and 1 not in out  # dup group keeps min doc_id
    assert 3 not in out and 4 not in out and 5 not in out  # es / fr / und
    assert all(r["lang_pred"] == "en" for r in out.values())
    # threshold actually gates: an impossible bar keeps nothing
    assert clean_corpus(docs, quality_threshold=1.1).count() == 0


def test_minhash_cache_handles_release(docs, spark):
    """cache_handles returns exactly the pipeline's cached frames and
    unpersisting them leaves no orphaned storage behind."""
    handles: list = []
    out = minhash_lsh_dups(docs, threshold=0.3, cache_handles=handles)
    out.count()
    assert len(handles) == 3
    assert all(h.storageLevel.useMemory for h in handles)
    for h in handles:
        h.unpersist(blocking=True)
    assert all(not h.storageLevel.useMemory for h in handles)


def test_exact_dedup(docs):
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2
    assert groups[0]["keep_doc_id"] == 0
    kept = exact_dedup(docs)
    assert kept.count() == 6  # 7 docs, one exact pair collapsed
    assert {r["doc_id"] for r in kept.collect()} == {0, 2, 3, 4, 5, 6}


def test_fingerprints_match_exact_dups(docs):
    fp = {r["doc_id"]: r for r in fingerprints(docs).collect()}
    assert fp[0]["content_fp"] == fp[1]["content_fp"]
    assert fp[0]["content_fp"] != fp[2]["content_fp"]


def test_minhash_lsh_finds_near_dups(docs):
    sig = minhash_signatures(docs, num_perms=16)
    assert sig.count() == 7 * 16
    # exact dups have identical signatures
    s = sig.groupBy("perm").agg(
        F.count_distinct("minhash").alias("d"), F.count("*").alias("n")
    )
    pairs = lsh_candidate_pairs(lsh_buckets(sig, rows_per_band=4))
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (0, 1) in got  # exact dup always a candidate
    dups = minhash_lsh_dups(docs, num_perms=16, rows_per_band=4, threshold=0.5)
    got2 = {(r["a"], r["b"]): r["jaccard"] for r in dups.collect()}
    assert got2[(0, 1)] == 1.0
    if (0, 2) in got2:  # near-dup jaccard high but < 1
        assert 0.5 <= got2[(0, 2)] < 1.0


def test_minhash_band_keys_match_agg_formulation(docs, spark):
    """The narrow-map streaming formulation (array_min over hashed
    shingles, positional band concat) must produce EXACTLY the same
    (doc_id, band, bucket) rows as the batch explode+agg pipeline —
    the equivalence the streaming oracle rests on. Also checked on
    real fixture documents (richer shingle sets than the toy docs)."""
    from bigclam_apachespark_spark.operators.dedup import minhash_band_keys

    for df in (
        docs,
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100),
    ):
        batch = lsh_buckets(minhash_signatures(df, num_perms=16), rows_per_band=4)
        narrow = minhash_band_keys(df, num_perms=16, rows_per_band=4)
        a = sorted(map(tuple, batch.collect()))
        b = sorted(map(tuple, narrow.collect()))
        assert a == b and len(a) > 0

    # NULL-text docs must drop from BOTH formulations identically
    # (the batch explode emits nothing; the narrow map must filter,
    # not hash an empty concat)
    nulled = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the dog"), (1, None)],
        "doc_id long, text string",
    )
    batch = lsh_buckets(minhash_signatures(nulled, num_perms=16), rows_per_band=4)
    narrow = minhash_band_keys(nulled, num_perms=16, rows_per_band=4)
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, narrow.collect()))
    assert a == b and {r[0] for r in a} == {0}


def test_minhash_band_stream_matches_batch(spark, tmp_path):
    """Replaying the documents fixture through the streaming
    MinHash/LSH dedup must emit exactly the batch DISTINCT
    (band, bucket) set, across micro-batch boundaries."""
    from bigclam_apachespark_spark.operators.dedup import minhash_band_keys
    from bigclam_apachespark_spark.streaming import (
        minhash_band_stream,
        read_documents_stream,
        run_stream_to_memory,
    )

    src = "/root/testdata/sf0.001/documents.parquet"
    stream = read_documents_stream(spark, src)
    got = run_stream_to_memory(
        minhash_band_stream(stream), "t_mh_stream_sink", "append", strict=True
    )
    batch = (
        minhash_band_keys(spark.read.parquet(src))
        .select("band", "bucket")
        .distinct()
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0


def test_wide_signature_path_matches_long(docs, spark):
    """The r13 wide-signature internals of minhash_lsh_dups must be
    row-identical to the long-layout formulation at every stage:
    band buckets (byte-identical hash input strings) and the
    signature-estimate prefilter's match counts. Checked on the toy
    docs AND real fixture documents."""
    from bigclam_apachespark_spark.operators.dedup import (
        lsh_buckets_from_wide,
        shingle_table,
        signature_estimate_filter,
        signature_estimate_filter_wide,
        wide_signatures_from_shingles,
    )

    for df in (
        docs,
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100),
    ):
        sh = shingle_table(df)
        long_sig = minhash_signatures(df, num_perms=16)
        wide_sig = wide_signatures_from_shingles(sh, num_perms=16)
        b_long = sorted(map(tuple, lsh_buckets(long_sig, rows_per_band=4).collect()))
        b_wide = sorted(
            map(tuple, lsh_buckets_from_wide(wide_sig, 16, rows_per_band=4).collect())
        )
        assert b_long == b_wide and len(b_long) > 0
        cand = lsh_candidate_pairs(lsh_buckets(long_sig, rows_per_band=4))
        for mm in (5, 6, 9):
            f_long = sorted(
                map(tuple, signature_estimate_filter(cand, long_sig, mm).collect())
            )
            f_wide = sorted(
                map(
                    tuple,
                    signature_estimate_filter_wide(cand, wide_sig, 16, mm).collect(),
                )
            )
            assert f_long == f_wide

    # ADVICE r13 #2: rows_per_band ∤ num_perms — the long form emits a
    # PARTIAL trailing band from the remainder perms (18 perms / 4 rows
    # = bands 0..4 with band 4 holding perms 16-17); the wide form must
    # band identically instead of dropping those perms.
    sh = shingle_table(docs)
    long18 = minhash_signatures(docs, num_perms=18)
    wide18 = wide_signatures_from_shingles(sh, num_perms=18)
    b_long = sorted(map(tuple, lsh_buckets(long18, rows_per_band=4).collect()))
    b_wide = sorted(
        map(tuple, lsh_buckets_from_wide(wide18, 18, rows_per_band=4).collect())
    )
    assert b_long == b_wide
    assert {b for _, b, _ in b_wide} == set(range(5))  # partial band present


def test_simhash(docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[0] == sh[1]  # identical token sets
    assert all(0 <= v < 2**32 for v in sh.values())
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_dups(docs, max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0


def test_token_jaccard(docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in token_jaccard_pairs(docs, threshold=0.4).collect()}
    assert pairs[(0, 1)] == 1.0  # same token set
    assert (0, 2) in pairs  # 8 of 9 distinct tokens shared
    assert (5, 6) not in pairs


def test_ngram_jaccard_is_order_sensitive(spark):
    """A word-shuffled copy keeps unigram Jaccard = 1.0 but loses its
    bigrams — the property that makes n-gram Jaccard catch reordered
    boilerplate that token-set Jaccard can't distinguish."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "zeta epsilon delta gamma beta alpha"),  # reversed
            (2, "alpha beta gamma delta epsilon zeta eta"),  # one extra word
        ],
        "doc_id long, text string",
    )
    uni = {
        (r["a"], r["b"]): r["jaccard"]
        for r in token_jaccard_pairs(docs, threshold=0.0).collect()
    }
    bi = {
        (r["a"], r["b"]): r["jaccard"]
        for r in token_jaccard_pairs(docs, threshold=0.0, ngram=2).collect()
    }
    assert uni[(0, 1)] == 1.0  # same word set
    assert (0, 1) not in bi  # reversed text shares ZERO bigrams
    assert bi[(0, 2)] == pytest.approx(5 / 6)  # prefix-shared bigrams


def test_token_jaccard_df_cap(spark):
    # Skew fixture: every doc shares the hot token "common"; only
    # docs 0/1 share rare tokens. With max_df=3 the hot token cannot
    # generate candidates, bounding the pair count; the surviving
    # pair's jaccard is still computed over the FULL token sets.
    rows = [(0, "common alpha beta gamma"),
            (1, "common alpha beta delta"),
            (2, "common zeta"),
            (3, "common eta"),
            (4, "common theta"),
            (5, "common iota")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = token_jaccard_pairs(docs, threshold=0.0)
    capped = token_jaccard_pairs(docs, threshold=0.0, max_df=3)
    n_unc = uncapped.count()
    assert n_unc == 15  # all C(6,2) pairs share "common"
    got = {(r["a"], r["b"]): r["jaccard"] for r in capped.collect()}
    assert set(got) == {(0, 1)}  # only the rare-token pair survives
    # full-set jaccard: |{common,alpha,beta}| / |{common,alpha,beta,gamma,delta}|
    assert got[(0, 1)] == pytest.approx(3 / 5, abs=1e-6)


def test_lsh_hot_bucket_cap(spark):
    # Skew fixture: 6 identical docs collapse into one bucket per
    # band; with max_bucket_size=4 those buckets generate no pairs,
    # while a distinct near-dup pair in a small bucket still does.
    rows = [(i, "identical boilerplate text repeated everywhere") for i in range(6)]
    rows += [(10, "a genuinely unique document about spark executors"),
             (11, "a genuinely unique document about spark executor")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signatures(docs)
    buckets = lsh_buckets(sig)
    unc = lsh_candidate_pairs(buckets).count()
    capped = lsh_candidate_pairs(buckets, max_bucket_size=4)
    pairs = {(r["a"], r["b"]) for r in capped.collect()}
    assert unc == 16  # C(6,2) boilerplate + (10,11)
    assert pairs == {(10, 11)}  # hot bucket suppressed, real pair kept


def test_lsh_pipeline_default_cap(spark):
    """The full pipeline caps hot buckets BY DEFAULT (r13: the 10×
    scale corpus measured the uncapped pipeline quadratic — 24.0M
    candidates from boilerplate-shingle buckets; LSH_MAX_BUCKET=256
    bounds the per-bucket term while small-bucket recall is intact).
    300 identical docs exceed the cap → zero pairs from that bucket;
    the near-dup pair in its own bucket still verifies. Passing
    max_bucket_size=None restores the uncapped C(300,2) behavior."""
    from bigclam_apachespark_spark.operators.dedup import LSH_MAX_BUCKET

    rows = [(i, "identical boilerplate text repeated everywhere") for i in range(300)]
    rows += [(1000, "a genuinely unique document about spark executors"),
             (1001, "a genuinely unique document about spark executor")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert LSH_MAX_BUCKET == 256  # oracle CAND_SQL carries the literal
    capped = {(r["a"], r["b"]) for r in minhash_lsh_dups(docs, threshold=0.5).collect()}
    assert capped == {(1000, 1001)}
    unc = minhash_lsh_dups(docs, threshold=0.5, max_bucket_size=None).count()
    assert unc == 300 * 299 // 2 + 1


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """Streaming dropDuplicates over a replayed file source emits
    exactly the batch-distinct fingerprint set (exact_dedup twin)."""
    from bigclam_apachespark_spark.functions.hashing import hash64, normalize_text
    from bigclam_apachespark_spark.streaming import (
        dedup_stream,
        read_documents_stream,
        run_stream_to_memory,
    )

    docs = spark.createDataFrame(
        [(0, "same text"), (1, "Same   TEXT"), (2, "other"), (3, "other"), (4, "unique")],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    path = str(tmp_path / "docs_parquet")
    docs.write.parquet(path)
    result = run_stream_to_memory(
        dedup_stream(read_documents_stream(spark, path)),
        "dedup_stream_test",
        "append",
    )
    got = sorted(r["content_fp"] for r in result.collect())
    want = sorted(
        r["content_fp"]
        for r in docs.select(hash64(normalize_text("text")).alias("content_fp"))
        .distinct()
        .collect()
    )
    assert got == want and len(got) == 3


def test_salient_terms(docs):
    from bigclam_apachespark_spark.operators.text import salient_terms

    out = salient_terms(docs, k=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every doc gets <= 3 ranked terms, ranks contiguous from 1
    for rows in by_doc.values():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(ranks) + 1))
    # doc 5's tokens are unique to it: tf=1, df=1 -> salience 1.0
    top5 = by_doc[5][0]
    assert top5["salience"] == 1.0 and top5["df"] == 1
    # 'the' appears in docs 0,1,2 (df=3) with tf=2 in doc 0 -> 2/3
    the_rows = [r for r in out if r["term"] == "the" and r["doc_id"] == 0]
    if the_rows:  # only if it ranked in top-3
        assert abs(the_rows[0]["salience"] - round(2 / 3, 6)) < 1e-9


def test_vocab_topk(docs):
    from bigclam_apachespark_spark.operators.text import vocab_topk

    out = vocab_topk(docs, k=5).collect()
    assert len(out) == 5
    assert out[0]["rank"] == 1
    # df must be non-increasing with rank
    by_rank = sorted(out, key=lambda r: r["rank"])
    dfs = [r["df"] for r in by_rank]
    assert dfs == sorted(dfs, reverse=True)
    # highest-df terms: 'the' in docs 0,1,2; 'animal'/'un'/'la' in 3,4
    assert by_rank[0]["df"] == 3


def test_hash_split(docs):
    from bigclam_apachespark_spark.operators.text import hash_split

    out = hash_split(docs).collect()
    assert len(out) == len(DOCS)
    for r in out:
        assert 0 <= r["bucket"] < 100
        expected = "train" if r["bucket"] < 80 else "val" if r["bucket"] < 90 else "test"
        assert r["split"] == expected
    # deterministic: same assignment on re-run
    again = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert {r["doc_id"]: r["split"] for r in out} == again


def test_token_length_quantiles(spark):
    from bigclam_apachespark_spark.operators.text import token_length_quantiles

    # 10 docs with token counts 1..10 -> p50=5, p90=9, p95=10, p99=10
    rows = [(i, " ".join(["w"] * i)) for i in range(1, 11)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["p"]: r["n_tokens_q"] for r in token_length_quantiles(d).collect()}
    assert out[0.5] == 5
    assert out[0.9] == 9
    assert out[0.95] == 10
    assert out[0.99] == 10


def test_near_dup_clusters_and_survivors(spark):
    from bigclam_apachespark_spark.operators.dedup import (
        cluster_survivors,
        near_dup_clusters,
    )

    # chain 10-11-12 merges transitively; 20-21 separate; 30 isolated doc
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21)], "a long, b long"
    )
    labels = {r["doc_id"]: r["cluster_id"] for r in near_dup_clusters(pairs).collect()}
    assert labels == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in (10, 11, 12, 20, 21, 30)], "doc_id long, text string"
    )
    surv = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in
            cluster_survivors(docs, pairs).collect()}
    assert surv == {
        10: (10, 1), 11: (10, 0), 12: (10, 0),
        20: (20, 1), 21: (20, 0), 30: (30, 1),
    }


def test_near_dup_clusters_long_chain_converges(spark):
    from bigclam_apachespark_spark.operators.dedup import near_dup_clusters

    # a 40-node path is the propagation worst case; pointer jumping
    # must converge it in O(log n) rounds (max_iter=8 << 40)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "a long, b long"
    )
    labels = near_dup_clusters(pairs, max_iter=8).collect()
    assert all(r["cluster_id"] == 0 for r in labels)
    assert len(labels) == 41


def test_training_corpus_pipeline(spark):
    from bigclam_apachespark_spark.operators.text import training_corpus

    # docs 0 and 1 are exact dups after normalize; 2 is a near dup of
    # 0 (1-word edit); 3-5 padded to clear the quality length floor
    base = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "to the house for a meal of fresh fish and sleeps on the mat"
    )
    rows = [
        (0, base),
        (1, base + "!"),
        (2, base.replace("fish", "meat")),
        (3, "el perro es un animal que vive en la casa"),  # es -> dropped
        (4, base.replace("fox", "wolf").replace("dog", "cat").replace("fish", "bread")
            .replace("mat", "bed").replace("house", "barn")),
        (5, "zzz qqq"),  # low quality -> dropped
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in training_corpus(
        d, quality_threshold=0.4, near_dup_threshold=0.5
    ).collect()}
    # 1 (exact dup of 0) dies in clean_corpus; 2 (near dup) dies in
    # cluster election; 3 wrong language; 5 low quality; 0 and 4 live
    assert set(out) == {0, 4}
    assert all(r["split"] in ("train", "val", "test") for r in out.values())


def test_read_documents_jsonl_drops_bad_lines(spark, tmp_path):
    from bigclam_apachespark_spark.sources import read_documents_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "he said \\"hi\\"", "source": "a"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "ok", "source": "b"}\n'
        '{"text": "no id", "source": "c"}\n'
    )
    rows = {r["doc_id"]: r for r in read_documents_jsonl(spark, str(p)).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == 'he said "hi"'  # JSON escapes decoded


def test_write_corpus_partitioned_prunes(spark, tmp_path):
    from bigclam_apachespark_spark.sources import write_corpus_partitioned

    df = spark.createDataFrame(
        [(i, "t", "train" if i % 2 == 0 else "test") for i in range(10)],
        "doc_id long, text string, split string",
    )
    out = str(tmp_path / "corpus")
    write_corpus_partitioned(df, out)
    back = spark.read.parquet(out).where("split = 'train'")
    assert back.count() == 5
    # the split predicate must prune at the PARTITION level, not scan
    # all files and filter rows afterwards
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(split" in plan or "split#" in plan.split(
        "PartitionFilters"
    )[1][:120]


def test_unigram_logprob(spark):
    from bigclam_apachespark_spark.operators.text import unigram_logprob

    import math

    # corpus: 4 'a', 2 'b', 1 'z' -> p(a)=4/7, p(b)=2/7, p(z)=1/7
    d = spark.createDataFrame(
        [(0, "a a b"), (1, "a a b"), (2, "z")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob(d).collect()}
    exp0 = (2 * math.log(4 / 7) + math.log(2 / 7)) / 3
    assert abs(out[0]["avg_logprob"] - round(exp0, 6)) < 1e-9
    assert out[0]["n_tokens"] == 3
    # the rare-token doc scores strictly lower
    assert out[2]["avg_logprob"] < out[0]["avg_logprob"]


def test_write_compacted_merges_small_partitions(spark, tmp_path):
    import glob

    from bigclam_apachespark_spark.sources import write_compacted

    # 64 near-empty upstream partitions of 200 rows total: a naive
    # write emits ~64 tiny files; the rebalance sink coalesces them
    df = spark.range(200).repartition(64).selectExpr("id", "repeat('x', 10) AS pad")
    naive = str(tmp_path / "naive")
    df.write.parquet(naive)
    compacted = str(tmp_path / "compacted")
    write_compacted(df, compacted)
    n_naive = len(glob.glob(f"{naive}/*.parquet"))
    n_comp = len(glob.glob(f"{compacted}/*.parquet"))
    assert n_naive >= 32
    assert n_comp <= 4
    assert spark.read.parquet(compacted).count() == 200


def test_cms_never_undercounts(docs):
    from bigclam_apachespark_spark.operators.sketches import cms_topk_estimates

    out = cms_topk_estimates(docs, k=10, d=4, w=64).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_cms"] >= r["n_exact"]  # CMS one-sided error bound
    # with a tiny corpus and d=4 rows, the top term estimate is exact
    top = max(out, key=lambda r: r["n_exact"])
    assert top["n_cms"] == top["n_exact"]


def test_multimodal_plans_skip_zero_size_media(spark):
    from bigclam_apachespark_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_chunk_plan,
        patch_grid_plan,
    )

    rows = [
        (0, "audio", bytearray(b""), None, None, 16000, None),      # empty clip
        (1, "audio", bytearray(b"\x00" * 64), None, None, 16000, None),
        (2, "image", bytearray(b"x"), 0, 0, None, None),            # zero dims
        (3, "image", bytearray(b"x"), 16, 8, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    chunks = audio_chunk_plan(media, chunk_samples=32).collect()
    assert {r["media_id"] for r in chunks} == {1}
    assert all(r["chunk_idx"] >= 0 and r["start_sample"] >= 0 for r in chunks)
    patches = patch_grid_plan(media, patch=8).collect()
    assert {r["media_id"] for r in patches} == {3}
    assert all(r["patch_row"] >= 0 and r["patch_col"] >= 0 for r in patches)


def test_split_leakage_detects_cross_split_dups(spark):
    from bigclam_apachespark_spark.operators.text import hash_split, split_leakage

    base = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "to the house for a meal of fresh fish and sleeps on the mat"
    )
    # many near-identical docs -> pairs exist; with ids spread over the
    # hash space some pair is overwhelmingly likely to straddle splits
    docs = spark.createDataFrame(
        [(i, base + f" tail{'x' * (i % 3)}") for i in range(12)],
        "doc_id long, text string",
    )
    out = split_leakage(docs, near_dup_threshold=0.5).collect()
    splits = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    for r in out:
        assert splits[r["a"]] != splits[r["b"]]
        assert r["jaccard"] >= 0.5
    # sanity: the fixture really does produce cross-split near-dups
    assert len(out) > 0


def test_chunk_plan_geometry(spark):
    from bigclam_apachespark_spark.operators.text import chunk_plan

    # 10 tokens, window 4, stride 3 -> chunks at 0,3,6 (len 4,4,4)
    # and 9 (len 1): ceil((10-4)/3)+1 = 3 chunks? ceil(6/3)=2 +1 = 3
    # -> starts 0,3,6 with lens 4,4,4; token 10 reached at 6+4=10. OK
    d = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    out = sorted(
        (r["chunk_idx"], r["start_token"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_plan(d, window=4, stride=3).collect()
    )
    assert out == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
    ]
    # short doc -> exactly one (short) chunk
    s = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    short = chunk_plan(s, window=4, stride=3).collect()
    assert len(short) == 1 and short[0]["n_chunk_tokens"] == 2


def test_pack_sequences(spark):
    from bigclam_apachespark_spark.operators.text import pack_sequences

    # doc token counts 3, 4, 5 with budget 6: starts at 0, 3, 7
    rows = [(0, "a b c"), (1, "a b c d"), (2, "a b c d e")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["bin"], r["bin_offset"])
           for r in pack_sequences(d, budget=6).collect()}
    assert out == {0: (0, 0), 1: (0, 3), 2: (1, 1)}


def test_cross_corpus_contamination(spark):
    from bigclam_apachespark_spark.operators.dedup import (
        cross_corpus_contamination,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "to the house for a meal of fresh fish and sleeps on the mat"
    )
    train = spark.createDataFrame(
        [(0, base), (1, "completely unrelated content about spark engines"),
         (2, base.replace("fish", "meat"))],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, base + "!"), (101, "zzz qqq www unrelated benchmark prompt")],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["bench_id"]): r["jaccard"]
           for r in cross_corpus_contamination(train, bench, threshold=0.5).collect()}
    # docs 0 and 2 contaminate against bench 100; doc 1 is clean and
    # bench 101 matches nothing
    assert (0, 100) in out and out[(0, 100)] > 0.9
    assert (2, 100) in out
    assert all(b == 100 for (_, b) in out)
    assert not any(d == 1 for (d, _) in out)


def test_repetition_signals_hand_computed(spark):
    """'a b a b a b': 2-grams [ab, ba, ab, ba, ab] → 5 total / 2
    distinct / top 3; 3-grams [aba, bab, aba, bab] → 4/2/2. A doc
    with one token has no grams → zero row, not a missing row."""
    from bigclam_apachespark_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "solo")], "doc_id long, text string"
    )
    rows = {(r.doc_id, r.gram_n): r for r in repetition_signals(docs).collect()}
    assert len(rows) == 4
    r2 = rows[(1, 2)]
    assert (r2.n_grams, r2.n_distinct_grams, r2.top_count) == (5, 2, 3)
    assert r2.dup_gram_frac == 0.6 and r2.top_gram_frac == 0.6
    r3 = rows[(1, 3)]
    assert (r3.n_grams, r3.n_distinct_grams, r3.top_count) == (4, 2, 2)
    assert r3.dup_gram_frac == 0.5 and r3.top_gram_frac == 0.5
    z = rows[(2, 2)]
    assert (z.n_grams, z.n_distinct_grams, z.top_count) == (0, 0, 0)
    assert z.dup_gram_frac == 0.0 and z.top_gram_frac == 0.0


def test_ngram_decontamination_hand_computed(spark):
    """Train doc sharing the 4-gram 'w x y z' with a benchmark doc of
    two distinct 4-grams → n_shared 1, bench_frac 0.5; an unrelated
    train doc produces no pair."""
    from bigclam_apachespark_spark.operators.dedup import ngram_decontamination

    train = spark.createDataFrame(
        [(1, "w x y z q"), (2, "totally different words here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "p w x y z")], "doc_id long, text string"
    )
    out = ngram_decontamination(train, bench, n=4, min_shared=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id, r.bench_id, r.n_shared, r.bench_frac) == (1, 100, 1, 0.5)
    assert ngram_decontamination(train, bench, n=4, min_shared=2).count() == 0


def test_gopher_filter_rule_bits(spark):
    """Each rule bit fires on a purpose-built document: too-short
    text (bit 0), no stopwords (bit 2), heavy 2-gram repetition
    (bits 3+4); a long clean doc keeps."""
    from bigclam_apachespark_spark.operators.text import gopher_filter

    # 36 tokens, all 2-grams distinct, contains a stopword
    clean = "the " + " ".join(f"word{i}" for i in range(35))
    reps = "spam ham " * 40
    docs = spark.createDataFrame(
        [(1, clean), (2, "tiny doc the"), (3, reps.strip())],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in gopher_filter(docs).collect()}
    assert rows[1].keep and rows[1].flags == 0
    assert rows[2].flags & 1  # under min_tokens
    assert not rows[2].keep
    # 'spam ham' x40: huge duplicate + top 2-gram mass, no stopwords
    assert rows[3].flags & 4 and rows[3].flags & 8 and rows[3].flags & 16


def test_cosine_histogram_identical_vectors(spark):
    """Sampled identical unit vectors: every pair lands in the top
    bin (cos=1 -> floor(2*10)=20 clamps to 19); total pair count =
    C(|sample|, 2)."""
    from bigclam_apachespark_spark.operators.similarity import cosine_histogram

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_histogram(emb, sample_mod=2).collect()
    assert len(out) == 1 and out[0].bin == 19
    import math
    n_sampled = out[0].n_pairs
    k = (1 + math.isqrt(1 + 8 * n_sampled)) // 2
    assert k * (k - 1) // 2 == n_sampled


def test_mix_sample_temperature_flattening(spark):
    """A tiny source (T <= c^2) keeps every doc (p caps at 1); a huge
    source gets a strict hash subset; n_tokens is the exact per-doc
    token count."""
    from bigclam_apachespark_spark.operators.text import mix_sample

    rows = [(i, "a b c d e", "tiny") for i in range(5)]
    rows += [(100 + i, "w " * 500, "huge") for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = mix_sample(docs, c=20.0).collect()
    tiny = [r for r in out if r.source == "tiny"]
    huge = [r for r in out if r.source == "huge"]
    assert all(r.keep for r in tiny) and all(r.n_tokens == 5 for r in tiny)
    kept = sum(r.keep for r in huge)
    # p = 20/sqrt(80*500) = 0.1 -> a strict, nonempty-ish subset;
    # exact membership is a pure function of md5(doc_id)
    assert 0 < kept < len(huge)
    assert all(r.n_tokens == 500 for r in huge)


def test_prefilter_min_matches_values():
    from bigclam_apachespark_spark.operators.dedup import prefilter_min_matches

    # pinned values at the defaults (16 perms, 4-row bands, miss <= 1%)
    assert prefilter_min_matches(0.35) == 5
    assert prefilter_min_matches(0.5) == 6
    assert prefilter_min_matches(0.7) == 9
    assert prefilter_min_matches(0.35, num_perms=16, rows_per_band=2) == 3
    # below ~0.32 the 1% bound is unattainable -> 0 (disabled)
    assert prefilter_min_matches(0.2) == 0
    assert prefilter_min_matches(0.1) == 0
    # when enabled, filters something (> rows_per_band) and scales
    # monotonically with the threshold
    prev = 0
    for j in (0.35, 0.5, 0.6, 0.7, 0.8, 0.9):
        mm = prefilter_min_matches(j)
        assert mm > 4
        assert mm >= prev
        prev = mm


def test_prefilter_recall_at_low_threshold(spark):
    """Pin the round-3 advice: threshold-scaled min_matches must not
    lose true pairs the banding caught, while the old fixed 6
    demonstrably did at j near 0.35. Deterministic fixture: 100
    near-dup pairs built by replacing 9-15 of 30 tokens (char-5
    shingle Jaccard mostly 0.3-0.55); 2-row bands so candidate
    recall is high enough to expose the prefilter's own loss."""
    import random

    from bigclam_apachespark_spark.operators.dedup import shingle_jaccard

    rng = random.Random(7)
    vocab = [f"tok{i:03d}" for i in range(400)]
    rows = []
    for base in range(100):
        toks = rng.sample(vocab, 30)
        rows.append((2 * base, " ".join(toks)))
        k = 9 + (base % 7)
        toks2 = list(toks)
        for i in rng.sample(range(30), k):
            toks2[i] = rng.choice(vocab)
        rows.append((2 * base + 1, " ".join(toks2)))
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    planted = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(100)], "a long, b long"
    )
    gt = {
        (r["a"], r["b"])
        for r in shingle_jaccard(df, planted).collect()
        if r["jaccard"] >= 0.35
    }

    def run(**kw):
        got = minhash_lsh_dups(df, threshold=0.35, rows_per_band=2, **kw)
        return {(r["a"], r["b"]) for r in got.collect()}

    auto = run()  # threshold-scaled: min_matches = 3 at 2-row bands
    fixed6 = run(est_min_matches=6)
    unfiltered = run(est_min_matches=0)
    # the scaled prefilter loses NOTHING the banding caught...
    assert auto & gt == unfiltered & gt
    assert len(auto & gt) >= 80
    # ...while the old fixed cut silently dropped true pairs
    assert fixed6 <= auto
    assert len(auto & gt) - len(fixed6 & gt) >= 5
    df.unpersist()


def test_pii_scrub(spark):
    from bigclam_apachespark_spark.operators.text import pii_scrub

    rows = [
        (0, "contact bob@example.com or alice.smith+tag@sub.domain.org today"),
        (1, "server at 192.168.1.1 and 10.0.0.255 port 8080"),
        (2, "call 555-123-4567 or +1 555.123.4567 x99"),
        (3, "mixed: eve@corp.io from 172.16.0.9 said call 800 555 1234"),
        (4, "clean text with no personal data at all"),
        # over-redaction guards: bare digit runs are NOT phones
        (5, "order 5551234567 at epoch 1704067200123 qty 12345678901"),
        (6, "ssn 123-45-6789 and token sk_abcDEF0123456789xyz_9 leaked"),
        (7, "short key_abc123 is not a secret; 12-34-5678 not an ssn"),
        # hyphenated prose is NOT a secret (generic prefixes need '_')
        (8, "the key-value-store-backed cache uses token-based-authentication"
            " behind an api-gateway-configuration layer"),
        # ...but vendor-style sk-/pk- keys with hyphens still redact
        (9, "leaked sk-proj-AbC123dEf456GhI789jK in the logs"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[0]["n_emails"] == 2 and "<EMAIL>" in got[0]["clean_text"]
    assert "bob@example.com" not in got[0]["clean_text"]
    assert got[1]["n_ips"] == 2 and got[1]["clean_text"].count("<IP>") == 2
    assert got[2]["n_phones"] == 2
    assert got[3]["n_emails"] == 1 and got[3]["n_ips"] == 1 and got[3]["n_phones"] == 1
    assert got[3]["clean_text"] == "mixed: <EMAIL> from <IP> said call <PHONE>"
    assert got[4]["clean_text"] == rows[4][1]
    assert got[4]["n_emails"] == got[4]["n_ips"] == got[4]["n_phones"] == 0
    assert got[4]["n_ssns"] == got[4]["n_secrets"] == 0
    # separators are mandatory: no digit run in row 5 is redacted
    assert got[5]["clean_text"] == rows[5][1]
    assert got[5]["n_phones"] == 0
    assert got[6]["n_ssns"] == 1 and got[6]["n_secrets"] == 1
    assert got[6]["clean_text"] == "ssn <SSN> and token <SECRET> leaked"
    # a 3-2-4 dashed SSN is not phone-shaped and vice versa
    assert got[6]["n_phones"] == 0
    assert got[7]["n_secrets"] == 0 and got[7]["n_ssns"] == 0
    assert got[7]["clean_text"] == rows[7][1]
    assert got[8]["n_secrets"] == 0 and got[8]["clean_text"] == rows[8][1]
    assert got[9]["n_secrets"] == 1
    assert got[9]["clean_text"] == "leaked <SECRET> in the logs"


def test_cap_per_source(spark):
    from bigclam_apachespark_spark.operators.text import cap_per_source

    rows = [(i, f"s{i % 3}" if i < 9 else "big") for i in range(29)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = cap_per_source(df, cap=2).collect()
    kept = {}
    for r in got:
        kept.setdefault(r["source"], 0)
        kept[r["source"]] += r["kept"]
        assert r["kept"] == (1 if r["rk"] <= 2 else 0)
    # 3 sources with 3 docs each -> capped at 2; 'big' with 20 -> 2
    assert kept == {"s0": 2, "s1": 2, "s2": 2, "big": 2}
    # deterministic: same selection on rerun
    again = {(r["doc_id"], r["kept"]) for r in cap_per_source(df, cap=2).collect()}
    assert again == {(r["doc_id"], r["kept"]) for r in got}


def test_cap_per_source_bucketed_matches_bruteforce(spark):
    """The two-stage bucketed rank (offset + within-bucket
    row_number) must equal the brute-force per-source sort by
    (hash64(doc_id), doc_id) — including with a heavily skewed 'hot'
    source that spans many buckets, and with few buckets so multiple
    docs share one bucket."""
    from bigclam_apachespark_spark.functions.hashing import hash64
    from bigclam_apachespark_spark.operators.text import cap_per_source

    rows = [(i, "hot" if i < 400 else f"s{i % 5}") for i in range(450)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    for buckets in (1, 4, 32):
        got = {
            r["doc_id"]: (r["rk"], r["kept"])
            for r in cap_per_source(df, cap=7, buckets=buckets).collect()
        }
        hashes = {
            r["doc_id"]: r["h"]
            for r in df.select(
                "doc_id", hash64(F.col("doc_id").cast("string")).alias("h")
            ).collect()
        }
        by_source = {}
        for i, src in rows:
            by_source.setdefault(src, []).append(i)
        for src, ids in by_source.items():
            ids.sort(key=lambda i: (hashes[i], i))
            for rk0, i in enumerate(ids):
                assert got[i] == (rk0 + 1, 1 if rk0 + 1 <= 7 else 0), (src, i)


def test_prefilter_min_matches_miss_bound_property():
    """For any (threshold, num_perms, rows_per_band) the returned cut
    must (a) filter something (> rows_per_band), (b) keep the exact
    binomial miss probability at the caller's threshold <= 1%, and
    (c) be maximal — one more required match would break the bound
    (unless already at the num_perms ceiling)."""
    from math import comb

    from bigclam_apachespark_spark.operators.dedup import prefilter_min_matches

    def miss(n, j, extra):
        return sum(comb(n, i) * j**i * (1 - j) ** (n - i) for i in range(extra))

    for num_perms, rpb in ((16, 4), (16, 2), (32, 4), (64, 8)):
        n = num_perms - rpb
        for j in (0.1, 0.2, 0.3, 0.35, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9):
            mm = prefilter_min_matches(j, num_perms, rpb)
            if mm == 0:
                # bound unattainable -> prefilter disabled entirely
                assert miss(n, j, 1) > 0.01
                continue
            extra = mm - rpb
            assert extra >= 1
            assert miss(n, j, extra) <= 0.01
            if extra < n:
                assert miss(n, j, extra + 1) > 0.01


def test_ngram_span_decontam(spark):
    """Hand-computed spans: a verbatim 10-token quotation must report
    span 10; k-1 = 3 shared consecutive tokens produce no gram match;
    two disjoint quotations of the same bench doc count as 2 spans;
    scattered shared grams below min_span_tokens are dropped."""
    from bigclam_apachespark_spark.operators.dedup import ngram_span_decontam

    quote = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens
    bench = [(100, f"start {quote} end")]
    train = [
        (1, f"noise words here {quote} trailing junk"),          # one 10-span
        (2, "unrelated alpha beta gamma text entirely"),          # 3 tokens < k
        (3, f"one {quote} two xx1 xx2 xx3 xx4 {quote} three"),   # two 10-spans
        (4, "alpha beta gamma delta padding epsilon zeta eta theta"),  # 4-span < 8
    ]
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["max_span_tokens"], r["n_spans"])
        for r in ngram_span_decontam(tdf, bdf, k=4, min_span_tokens=8).collect()
    }
    assert got == {1: (10, 1), 3: (10, 2)}


def test_global_shuffle_matches_bruteforce(spark):
    """The bucketed global rank must equal the brute-force sort by
    (hash64(doc_id), doc_id) at any bucket count, including
    buckets=1 (single bucket = the naive plan) and 64."""
    from bigclam_apachespark_spark.functions.hashing import hash64
    from bigclam_apachespark_spark.operators.text import global_shuffle_order

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    hashes = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", hash64(F.col("doc_id").cast("string")).alias("h")
        ).collect()
    }
    want = {
        i: rk + 1
        for rk, i in enumerate(sorted(hashes, key=lambda i: (hashes[i], i)))
    }
    for buckets in (1, 8, 64):
        got = {
            r["doc_id"]: r["rank"]
            for r in global_shuffle_order(df, buckets=buckets).collect()
        }
        assert got == want, buckets


def test_minhash_band_stream_watermark_matches_batch(spark):
    """The watermark-bounded streaming near-dup filter must emit
    exactly the batch DISTINCT (band, bucket) set on a bounded
    replay (nothing evicted inside one AvailableNow pass), and the
    staged arrival time must be deterministic (2024-01-01 + doc_id
    seconds)."""
    from bigclam_apachespark_spark.operators.dedup import minhash_band_keys
    from bigclam_apachespark_spark.streaming import (
        minhash_band_stream_watermark,
        read_documents_stream,
        run_stream_to_memory,
        with_arrival_time,
    )

    src = "/root/testdata/sf0.001/documents.parquet"
    staged = with_arrival_time(spark.read.parquet(src))
    t0 = staged.where("doc_id = 0").select("ts").collect()[0][0]
    assert t0.year == 2024 and t0.month == 1 and t0.day == 1

    stream = with_arrival_time(read_documents_stream(spark, src))
    got = run_stream_to_memory(
        minhash_band_stream_watermark(stream),
        "t_mh_wm_stream_sink",
        "append",
        strict=True,
    )
    batch = (
        minhash_band_keys(spark.read.parquet(src))
        .select("band", "bucket")
        .distinct()
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0


def test_scrub_duplicate_spans_hand_computed(spark):
    """Span-scrub semantics on a hand-built corpus (k=3): the
    canonical (first) occurrence keeps its tokens, every other
    occurrence loses the union of its duplicated k-windows —
    including WITHIN-document repetition."""
    from bigclam_apachespark_spark.operators.dedup import scrub_duplicate_spans

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f"),
            (1, "x y a b c d z"),  # shares the 4-token run a b c d
            (2, "p q r p q r"),    # internal repetition
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_duplicate_spans(docs, k=3).collect()}
    assert out[0]["text_scrubbed"] == "a b c d e f"  # canonical keeps all
    assert out[0]["n_tokens_removed"] == 0
    # doc 1: grams "a b c"@2 and "b c d"@3 are non-canonical dups ->
    # drop {2,3,4} U {3,4,5} -> keep x y z
    assert out[1]["text_scrubbed"] == "x y z"
    assert out[1]["n_tokens_removed"] == 4
    # doc 2: "p q r"@3 duplicates its own pos 0 -> second run drops
    assert out[2]["text_scrubbed"] == "p q r"
    assert out[2]["n_tokens_removed"] == 3


def test_bigram_logprob_hand_computed(spark):
    """Conditional bigram LM on a 3-doc corpus: hand-computed
    ln(c(w1,w2)/c(w1,·)) averages; a 1-token doc has no transitions
    and must drop from the result."""
    import math

    from bigclam_apachespark_spark.operators.text import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "z")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    assert set(got) == {1, 2}
    # corpus pairs: doc1 -> (a,b),(b,a),(a,b); doc2 -> (a,c)
    # c(a,.) = 3, c(b,.) = 1; c(a,b) = 2, c(b,a) = 1, c(a,c) = 1
    assert got[1]["n_bigrams"] == 3
    want1 = (math.log(2 / 3) + math.log(1 / 1) + math.log(2 / 3)) / 3
    assert got[1]["avg_logprob"] == round(want1, 6)
    assert got[2]["n_bigrams"] == 1
    assert got[2]["avg_logprob"] == round(math.log(1 / 3), 6)


def test_span_corruption_hand_computed(spark):
    """T5 span masking on a 10-token doc: block 0 masks absolute
    indices 3-4; block 1's maskable offsets are absolute indices
    10-11, which don't exist — so exactly ONE span masks. A 3-token
    doc masks nothing: identity input, NULL target."""
    from bigclam_apachespark_spark.operators.text import span_corruption

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "a b c")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in span_corruption(docs).collect()}
    r1 = got[1]
    assert r1["n_masked"] == 2
    assert r1["input_text"] == "t0 t1 t2 <extra_id_0> t5 t6 t7 t8 t9"
    assert r1["target_text"] == "<extra_id_0> t3 t4"
    # too short for any span: identity input, NULL target
    r2 = got[2]
    assert r2["n_masked"] == 0
    assert r2["input_text"] == "a b c"
    assert r2["target_text"] is None


def test_pmi_topk_window_and_score_hand_computed(spark):
    """PMI counts pairs at offsets 1 AND 2 (window=3), position-
    ordered. Corpus 'x y z' ×3: pairs (x,y),(y,z) at offset 1 and
    (x,z) at offset 2, each ×3. Unigrams: x,y,z ×3 each, T1=9;
    T12=9. PMI(x,y) = ln(3·81 / (9·3·3)) = ln(3) — all three pairs
    tie exactly, so the order falls back to (w1, w2)."""
    import math

    from bigclam_apachespark_spark.operators.text import pmi_topk

    docs = spark.createDataFrame(
        [(i, "x y z") for i in range(3)], "doc_id long, text string"
    )
    got = pmi_topk(docs, window=3, min_count=3, k=10).collect()
    assert [(r.w1, r.w2, r.n_pair) for r in got] == [
        ("x", "y", 3),
        ("x", "z", 3),
        ("y", "z", 3),
    ]
    assert all(r.pmi == round(math.log(3.0), 6) for r in got)


def test_pmi_min_count_prunes(spark):
    """A pair below min_count never reaches the scored relation."""
    from bigclam_apachespark_spark.operators.text import pmi_topk

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "q r")], "doc_id long, text string"
    )
    got = pmi_topk(docs, window=2, min_count=2, k=10).collect()
    # (a,b) ×2 and (b,a) ×1, (q,r) ×1 → only (a,b) survives
    assert [(r.w1, r.w2, r.n_pair) for r in got] == [("a", "b", 2)]


def test_bpe_pair_counts_weighted_and_boundary_isolated(spark):
    """Pair counts weigh by word FREQUENCY and never cross a word
    boundary: 'ab ab ba' has no (b,a)-crossing from 'ab ab' — only
    the real word 'ba' contributes (b,a). Single-char words carry
    no pairs."""
    from bigclam_apachespark_spark.operators.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "ab ab ba"), (2, "ab c")], "doc_id long, text string"
    )
    got = bpe_pair_counts(docs, k=10).collect()
    assert [(r.left_sym, r.right_sym, r.pair_count) for r in got] == [
        ("a", "b", 3),
        ("b", "a", 1),
    ]


def test_frequency_spectrum_good_turing(spark):
    """'a a a b b c d' → tf: a=3, b=2, c=1, d=1 → spectrum S(1)=2,
    S(2)=1, S(3)=1. r*(1) = 2·S(2)/S(1) = 1.0, r*(2) = 3·S(3)/S(2)
    = 3.0, r*(3) = NULL (no S(4))."""
    from bigclam_apachespark_spark.operators.text import token_frequency_spectrum

    docs = spark.createDataFrame(
        [(1, "a a a b b"), (2, "c d")], "doc_id long, text string"
    )
    got = token_frequency_spectrum(docs).collect()
    assert [(r.freq, r.n_terms, r.gt_adjusted) for r in got] == [
        (1, 2, 1.0),
        (2, 1, 3.0),
        (3, 1, None),
    ]


def test_heldout_perplexity_leakage_and_backoff(spark):
    """Train docs all say 'a b'; one val doc repeats it (seen bigram,
    P = 0.9 + 0.09·c(b)/T + 0.01/V), one val doc says 'x y' whose
    tokens never appear in train (full backoff: P = 0.01/V exactly,
    n_unseen = 1). The val docs' own text must contribute NOTHING to
    the counts — 'x' stays out-of-vocabulary even though a val doc
    contains it (the leakage-discipline claim)."""
    import hashlib
    import math

    from bigclam_apachespark_spark.operators.text import heldout_perplexity

    def split_of(doc_id: int) -> str:
        h = int(
            "0x" + hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16
        ) % 100
        return "train" if h < 80 else ("val" if h < 90 else "test")

    train_ids = [i for i in range(200) if split_of(i) == "train"][:3]
    val_ids = [i for i in range(200) if split_of(i) == "val"][:2]
    rows = [(i, "a b") for i in train_ids]
    rows.append((val_ids[0], "a b"))
    rows.append((val_ids[1], "x y"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in heldout_perplexity(docs).collect()}
    assert set(got) == set(val_ids)

    # train: 3 docs of "a b" → c2(a,b)=3, c1(a)=3, cu: a=3, b=3,
    # T=6, V=2
    seen = got[val_ids[0]]
    p_seen = 0.9 * 1.0 + 0.09 * (3 / 6) + 0.01 / 2
    assert (seen.n_bigrams, seen.n_unseen) == (1, 0)
    assert seen.avg_logprob == round(math.log(p_seen), 6)

    oov = got[val_ids[1]]
    assert (oov.n_bigrams, oov.n_unseen) == (1, 1)
    assert oov.avg_logprob == round(math.log(0.01 / 2), 6)


def test_bpe_merge_two_steps_hand_computed(spark):
    """Corpus {aaab ×2, ab}: round 1 merges "aa" (count 4 beats
    "ab"'s 3) → vocab {·ab ×2 (· = merged aa), ab}; round 2's counts
    are (a,b)=3, (·,a)=2, so it merges "ab" — whose display is plain
    text, while the surviving pair (·, merge-2) must display as
    ("aa", "ab"): the recursive marker expansion under test. The
    word "ab" collapses to a single symbol and exits pair counting."""
    from bigclam_apachespark_spark.operators.text import bpe_merge_two_steps

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab")], "doc_id long, text string"
    )
    got = [
        (r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_merge_two_steps(docs, k=10).collect()
    ]
    assert got == [("aa", "ab", 2)]


def test_bm25_topk_hand_computed(spark):
    """4-doc corpus, one query ["spark", "join"]: BM25 computed in
    pure Python (same nano-integer contribution rounding) must match
    scores AND ranks exactly. Doc 3 contains neither term and must be
    absent; doc 0 (both terms, short) must outrank doc 1 (one term,
    repeated)."""
    import math

    from bigclam_apachespark_spark.operators.text import bm25_topk

    texts = {
        0: "spark join",
        1: "join join join filter",
        2: "spark scan scan scan scan scan",
        3: "filter scan",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    out = bm25_topk(
        docs, k=10, query_terms=[("q0", ["spark", "join"])]
    ).collect()

    n, k1, b = 4, 1.2, 0.75
    dls = {d: len(t.split()) for d, t in texts.items()}
    avg = sum(dls.values()) / n
    dfs = {"spark": 2, "join": 2}

    def contrib(term, d):
        tf = texts[d].split().count(term)
        if tf == 0:
            return None
        idf = math.log(1.0 + (n - dfs[term] + 0.5) / (dfs[term] + 0.5))
        c = idf * (tf * (1.0 + k1)) / (
            tf + k1 * (1.0 - b + b * (dls[d] * n) / sum(dls.values()))
        )
        return int(round(c * 1e9))

    expect = {}
    for d in texts:
        nanos = [
            c for c in (contrib(t, d) for t in ("spark", "join")) if c is not None
        ]
        if nanos:
            expect[d] = (len(nanos), sum(nanos))
    order = sorted(expect, key=lambda d: (-expect[d][1], d))

    assert [r.doc_id for r in sorted(out, key=lambda r: r.rank)] == order
    for r in out:
        assert r.n_terms_hit == expect[r.doc_id][0]
        assert r.score == round(expect[r.doc_id][1] / 1e9, 6)
    assert 3 not in {r.doc_id for r in out}
    assert order[0] == 0


def test_bpe_encode_corpus_hand_computed(spark):
    """Corpus {aaab ×2, ab, c}: merge 1 = "aa" (4 > 3), merge 2 =
    "ab" (3 > 2); encoding yields tokens ab×3, aa×2, c×1 — the
    1-char word "c" must be encoded even though the pair trainer
    never sees it."""
    from bigclam_apachespark_spark.operators.text import bpe_encode_corpus

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab c")], "doc_id long, text string"
    )
    got = [
        (r.token, r.token_count, r.rank)
        for r in bpe_encode_corpus(docs, k=10).collect()
    ]
    assert got == [("ab", 3, 1), ("aa", 2, 2), ("c", 1, 3)]


def test_weighted_sample_hand_replay_and_bias(spark):
    """A-ES keys replayed in pure Python (same md5 uniform, same
    pico rounding) must give the identical winner set and ranks; and
    on a corpus of 50 long + 50 short docs, the top-20 winners must
    over-represent the long (10x-weight) docs."""
    import hashlib
    import math

    from bigclam_apachespark_spark.operators.text import weighted_sample

    M = 1 << 40
    texts = {}
    for i in range(50):
        texts[i] = "long " * 50
    for i in range(50, 100):
        texts[i] = "short word"
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )

    def key(i):
        h = int(hashlib.md5(f"ws:{i}".encode()).hexdigest()[:15], 16)
        u = ((h % M) + 1) / (M + 1)
        w = len(texts[i].split()) + 1
        return int(round(math.log(u) / w * 1e12))

    expect = sorted(texts, key=lambda i: (-key(i), i))[:20]
    got = [
        r.doc_id
        for r in sorted(
            weighted_sample(docs, n=20).collect(), key=lambda r: r.rank
        )
    ]
    assert got == expect
    n_long = sum(1 for d in got if d < 50)
    assert n_long >= 14  # 10x weight -> long docs dominate the sample


def test_ppjoin_exact_vs_brute_force(spark):
    """PPJoin output must equal the brute-force tau-Jaccard join on
    a corpus with hand-known overlaps, at two thresholds (integer
    cross-multiply decisions, no float)."""
    from itertools import combinations

    from bigclam_apachespark_spark.operators.dedup import ppjoin_pairs

    texts = {
        1: "a b c d",
        2: "a b c e",      # J(1,2) = 3/5
        3: "a b x y",      # J(1,3) = 2/6
        4: "p q r s",
        5: "p q r s",      # J(4,5) = 1
        6: "a",            # 1-token doc: prefix = itself
        7: "a",            # J(6,7) = 1
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )

    def brute(num, den):
        out = set()
        for x, y in combinations(sorted(texts), 2):
            sx, sy = set(texts[x].split()), set(texts[y].split())
            i, u = len(sx & sy), len(sx | sy)
            if den * i >= num * u:
                out.add((x, y, i))
        return out

    for num, den in ((1, 2), (7, 10)):
        got = {
            (r.a, r.b, r.inter)
            for r in ppjoin_pairs(
                docs, threshold_num=num, threshold_den=den
            ).collect()
        }
        assert got == brute(num, den), (num, den, got)


def test_text_corpus_roundtrip_and_bad_lines(spark, tmp_path):
    """The <doc_id>\\t<text> reader must round-trip the corpus and
    drop malformed lines (no tab, non-numeric id) instead of
    throwing under ANSI."""
    from bigclam_apachespark_spark.sources.docs import (
        read_documents_text,
        write_documents_text,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "tab\there"), (3, "x")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "corpus")
    write_documents_text(docs, path)
    back = {r.doc_id: r.text for r in read_documents_text(spark, path).collect()}
    assert back == {1: "hello world", 2: "tab here", 3: "x"}

    bad = str(tmp_path / "bad")
    spark.createDataFrame(
        [("notanid\tsome text",), ("no tab at all",), ("7\tok",)],
        "value string",
    ).write.mode("overwrite").text(bad)
    got = {(r.doc_id, r.text) for r in read_documents_text(spark, bad).collect()}
    assert got == {(7, "ok")}


def test_containment_pairs_detects_subset_duplication(spark):
    """A doc embedded in a larger doc has containment 1 toward the
    superset while its Jaccard is low — the asymmetric case the
    symmetric pass misses. Brute-force equality at tau = 4/5 on
    unigram sets."""
    from itertools import permutations

    from bigclam_apachespark_spark.operators.dedup import containment_pairs

    texts = {
        1: "a b c",
        2: "a b c d e f g h i j",   # 1 inside 2: C(1->2)=1, J=3/10
        3: "x y z",
        4: "a b q",                 # C(4->2) = 2/3 < 4/5
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r.a, r.b): (r.inter, r.containment)
        for r in containment_pairs(
            docs, threshold_num=4, threshold_den=5, ngram=1
        ).collect()
    }
    expect = {}
    for x, y in permutations(sorted(texts), 2):
        sx, sy = set(texts[x].split()), set(texts[y].split())
        i = len(sx & sy)
        if 5 * i >= 4 * len(sx):
            expect[(x, y)] = (i, round(i / len(sx), 6))
    assert got == expect
    assert (1, 2) in got and got[(1, 2)] == (3, 1.0)
    assert (2, 1) not in got and (4, 2) not in got


def test_distribution_drift_null_and_positive_controls(spark):
    """Identical distributions drift 0; disjoint vocabularies hit the
    maximum L1 = 2 (2e6 micro); a hand two-token case matches the
    closed form."""
    from bigclam_apachespark_spark.operators.text import distribution_drift

    # lang split is the controlled comparison here: 'en' docs say
    # "a a b", others say "c d" -> disjoint vocab, l1 = 2
    docs = spark.createDataFrame(
        [(1, "a a b", "en"), (2, "a a b", "en"), (3, "c d", "zh")],
        "doc_id long, text string, lang string",
    )
    rows = {r.comparison: r for r in distribution_drift(docs).collect()}
    en = rows["en_vs_rest"]
    assert (en.n_tokens_a, en.n_tokens_b, en.vocab_union) == (6, 2, 4)
    assert en.l1_micro == 2e6

    same = spark.createDataFrame(
        [(i, "x y z", "en") for i in range(40)],
        "doc_id long, text string, lang string",
    )
    r2 = {r.comparison: r for r in distribution_drift(same).collect()}
    tv = r2["train_vs_val"]
    # hash split of identical docs: every token has ca/Na == cb/Nb
    assert tv.l1_micro == 0.0
    # all docs are 'en' -> the rest side is EMPTY -> NULL, not an
    # ANSI divide-by-zero abort or a fake maximum
    assert r2["en_vs_rest"].l1_micro is None


def test_word2vec_vocab_pairs_hand_computed(spark):
    """word2vec corpus derivation replayed by hand: min_count cut,
    (cnt DESC, term) vid ranks, skip-gram pair counts at distances
    1..2 in both directions with OOV slots preserved (window over
    ORIGINAL positions), and a deterministic end-to-end step."""
    from collections import Counter

    from bigclam_apachespark_spark.operators.text import (
        word2vec_pairs,
        word2vec_step,
        word2vec_vocab,
    )
    from bigclam_apachespark_spark.functions.hashing import tokens
    from pyspark.sql import functions as F

    texts = [
        "the cat sat on the mat",
        "the dog sat on the rug zzz",
        "the cat and the dog sat",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    toked = docs.select(tokens("text").alias("l"))
    vocab = word2vec_vocab(toked, min_count=2)
    got_vocab = {r.term: (r.cnt, r.vid) for r in vocab.collect()}
    # hand counts: the=6 sat=3 cat=2 dog=2 on=2; and/mat/rug/zzz = 1 (cut)
    # vid rank by (cnt desc, term): the=1, sat=2, cat=3, dog=4, on=5
    assert got_vocab == {
        "the": (6, 1), "sat": (3, 2), "cat": (2, 3), "dog": (2, 4), "on": (2, 5)
    }

    toks = [t.split() for t in texts]
    exp = Counter()
    vid = {t: v for t, (_, v) in got_vocab.items()}
    for seq in toks:
        for i, a in enumerate(seq):
            for d in (1, 2):
                if i + d < len(seq):
                    b = seq[i + d]
                    if a in vid and b in vid and vid[a] != vid[b]:
                        exp[(vid[a], vid[b])] += 1
                        exp[(vid[b], vid[a])] += 1
    got_pairs = {(r.u, r.v): r.c_uv for r in word2vec_pairs(toked, vocab).collect()}
    assert got_pairs == dict(exp)

    out1 = sorted(map(tuple, word2vec_step(docs, min_count=2).collect()))
    out2 = sorted(map(tuple, word2vec_step(docs, min_count=2).collect()))
    assert out1 == out2 and len(out1) == 5 * 4
    # the step moved at least one component off the init
    init_w = {(v, k): ((v * 31 + 7 * k) % 19 - 9) * 20000
              for v in range(1, 6) for k in range(4)}
    assert any(r[2] != init_w[(vid[r[0]], r[1])] for r in out1)


def test_dsir_weights_prefer_target_profile(spark):
    """DSIR hand-check: with a target language whose docs share a
    distinctive vocabulary, target-profile docs must out-score the
    off-profile ones, and a raw doc written IN the target's
    vocabulary must score high even though its own lang tag differs
    (the method scores token profiles, not labels)."""
    from bigclam_apachespark_spark.operators.text import dsir_sample, dsir_weights

    rows = [
        (1, "alpha beta gamma alpha beta", "en", "s", 0),
        (2, "alpha gamma beta beta alpha", "en", "s", 0),
        (3, "uno dos tres quatro cinco", "es", "s", 0),
        (4, "uno tres dos cinco uno", "es", "s", 0),
        # es-tagged doc with the en vocabulary — must score like en
        (5, "alpha beta beta gamma alpha", "es", "s", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    lam = {r["doc_id"]: r["lambda_micro"] for r in dsir_weights(docs).collect()}
    assert len(lam) == 5
    # en-profile docs (1, 2, 5) all above the es-profile docs (3, 4)
    assert min(lam[1], lam[2], lam[5]) > max(lam[3], lam[4])
    # the resample keeps the highest-key docs; with k=3 the en-profile
    # trio dominates (lambda gaps are thousands of micro-nats, far
    # beyond the bounded Gumbel jitter)
    top = {r["doc_id"] for r in dsir_sample(docs, k=3).collect()}
    assert top == {1, 2, 5}


def test_classifier_step_learnable_xor_free_target(spark):
    """Hand-built corpus: label 'pos' iff the text contains the token
    'marker'. Two quantized steps must already move the marker dim's
    weight positive for 'pos' and negative for 'neg' — the gradient
    direction check for the trainer."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.functions.hashing import hash64
    from bigclam_apachespark_spark.operators.text import classifier_step

    rows = []
    for i in range(40):
        has = i % 2 == 0
        rows.append((i, "pos" if has else "neg",
                     ("marker alpha beta" if has else "alpha beta gamma")))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w = classifier_step(docs, steps=2, label_col="lang")
    mdim = spark.range(1).select(
        (hash64(F.lit("marker")) % 256).cast("int").alias("d")
    ).collect()[0].d
    got = {(r.label, r.dim): r.wv for r in w.collect()}
    assert got[("pos", mdim)] > 0
    assert got[("neg", mdim)] < 0
    # bias init is the prior logit: both classes are balanced, so
    # both biases started at floor(ln(1)·8e6)=0 and only moved by
    # the (small) mean-gradient updates
    assert abs(got[("pos", 256)]) < 8_000_000


def test_classifier_init_single_class_raises(spark):
    """ADVICE r12: a label that covers EVERY doc has no negative
    examples, so its prior logit ln(c/(n-c)) is undefined (old code:
    +Inf flowed through floor/cast into a silently corrupt bias).
    The init must raise in-plan instead."""
    import pytest

    from bigclam_apachespark_spark.operators.text import classifier_init

    labels = spark.createDataFrame(
        [(i, "only") for i in range(5)], "doc_id long, label string"
    )
    classes = spark.createDataFrame(
        [("only", 0)], "label string, ord int"
    )
    with pytest.raises(Exception, match="covers every doc"):
        classifier_init(labels, classes, n_docs=5).collect()


def test_classifier_fit_returns_best_state_and_converges(spark):
    """The plateau loop on the marker corpus: must report
    convergence, a positive improvement, and the returned weights
    must reproduce the reported final loss (the sgns_fit contract)."""
    from bigclam_apachespark_spark.operators.text import (
        classifier_classes,
        classifier_features,
        classifier_fit,
        classifier_loss_row,
    )
    from pyspark.sql import functions as F

    rows = []
    for i in range(40):
        has = i % 2 == 0
        rows.append((i, "pos" if has else "neg",
                     ("marker alpha beta" if has else "alpha beta gamma")))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w, stats = classifier_fit(docs, label_col="lang", max_steps=40)
    assert stats["converged"], stats
    assert stats["improvement_ppm"] > 0
    labels = docs.select("doc_id", F.col("lang").alias("label"))
    recomputed = classifier_loss_row(
        classifier_features(docs), labels, w, classifier_classes(labels), 0
    ).collect()[0]
    assert recomputed["loss_micro"] == stats["loss_final_micro"]


def test_classifier_predict_separates_marker_corpus(spark):
    """After a short fit, every doc of the balanced marker corpus must
    be classified correctly — the linear model can express the
    presence rule exactly, and the trainer must find it."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators.text import (
        classifier_features,
        classifier_fit,
        classifier_predict,
    )

    rows = []
    for i in range(40):
        has = i % 2 == 0
        rows.append((i, "pos" if has else "neg",
                     ("marker alpha beta" if has else "alpha beta gamma")))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w, stats = classifier_fit(docs, label_col="lang", max_steps=80, lr_num=96)
    pred = classifier_predict(
        classifier_features(docs), w, stats["classes"]
    )
    truth = docs.select("doc_id", F.col("lang").alias("label_true"))
    n_ok = (
        pred.join(truth, "doc_id")
        .where(F.col("label_pred") == F.col("label_true"))
        .count()
    )
    assert n_ok == 40


def test_classifier_calibration_counts_foot(spark):
    """Reliability counts must foot: every (doc, class) pair lands in
    exactly one bucket, n_pos never exceeds n_pairs, the positive
    total equals |docs| (each doc has exactly one true class), and
    every mean predicted probability lies inside its bucket's edges."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators.text import (
        classifier_calibration,
        classifier_classes,
        classifier_features,
        classifier_step,
    )

    rows = []
    for i in range(40):
        has = i % 2 == 0
        rows.append((i, "pos" if has else "neg",
                     ("marker alpha beta" if has else "alpha beta gamma")))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w = classifier_step(docs, steps=2, label_col="lang")
    labels = docs.select("doc_id", F.col("lang").alias("label"))
    classes = classifier_classes(labels)
    cal = classifier_calibration(
        classifier_features(docs), labels, w, classes
    ).collect()
    assert sum(r.n_pairs for r in cal) == 40 * 2
    assert sum(r.n_pos for r in cal) == 40
    for r in cal:
        assert 0 <= r.bucket <= 9
        assert 0 <= r.n_pos <= r.n_pairs
        mean_sigma = r.sum_sigma_micro / (r.n_pairs * 1_000_000)
        lo, hi = r.bucket / 10, (r.bucket + 1) / 10 if r.bucket < 9 else 1.0
        assert lo <= mean_sigma <= hi + 1e-6
