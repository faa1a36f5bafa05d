"""Cross-engine deterministic hashing + tokenization kernels.

Everything here is built from ``md5`` (identical output in Spark and
DuckDB) so every dedup/fingerprint operator is oracle-testable: the
driver hash-compares Spark results against DuckDB SQL, so the hash
function itself must agree bit-for-bit across engines. Spark's
``xxhash64``/``hash`` have no DuckDB twin; ``conv(substr(md5(x),1,15),
16,10)`` does — a 60-bit non-negative integer, ample for dedup keys.

All kernels are built-in-column expressions (JVM-side, codegen'd) —
no Python UDFs (extension surface; SURVEY.md §2.E notes the reference
has no string functions at all, so this whole module is north-star
extension code, not parity code).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(c: Column | str) -> Column:
    """60-bit deterministic hash of a string column.

    DuckDB oracle twin: ``CAST(CONCAT('0x', substr(md5(x),1,15)) AS
    BIGINT)``.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# DuckDB SQL fragment builder for the same function (kept next to the
# Spark definition so the two can never drift apart).
def hash64_sql(expr: str) -> str:
    return f"CAST(CONCAT('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


# MinHash permutation constants: minhash_p(s) = (a_p·h + b_p) mod P
# over the 31-bit reduction h = hash64(s) mod P. ONE md5 per shingle
# instead of num_perms of them (measured 3-4× on the LSH pipeline);
# the affine family is the standard universal-hash construction and
# the same literals are injected into the DuckDB twin, so parity
# holds. P = 2^31 − 1 keeps a_p·h < 2^62 (no BIGINT overflow under
# ANSI mode on either engine).
MINHASH_P = 2_147_483_647


def minhash_perm_constants(num_perms: int) -> list[tuple[int, int, int]]:
    """Deterministic (perm, a, b) triples, md5-derived."""
    import hashlib

    out = []
    for p in range(num_perms):
        a = int(hashlib.md5(f"mh:a:{p}".encode()).hexdigest()[:8], 16) % (MINHASH_P - 1) + 1
        b = int(hashlib.md5(f"mh:b:{p}".encode()).hexdigest()[:8], 16) % MINHASH_P
        out.append((p, a, b))
    return out


def normalize_text(c: Column | str) -> Column:
    """Lowercase + collapse non-alphanumerics to single spaces + trim.
    DuckDB twin: ``trim(regexp_replace(lower(x), '[^a-z0-9]+', ' ', 'g'))``."""
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def normalize_text_sql(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g'))"


def tokens(c: Column | str) -> Column:
    """Whitespace word tokens of normalized text (array<string>).
    DuckDB twin: ``string_split(<normalized>, ' ')`` (normalization
    collapses runs, so a plain single-space split matches)."""
    return F.split(normalize_text(c), " ")


def tokens_sql(expr: str) -> str:
    return f"string_split({normalize_text_sql(expr)}, ' ')"


def char_shingles(c: Column | str, n: int = 5) -> Column:
    """Character n-gram shingles of normalized text (array<string>,
    may repeat). DuckDB twin: a list comprehension over
    generate_series. Documents shorter than n yield a single
    truncated shingle (substring clips at the string end in both
    engines)."""
    norm = normalize_text(c)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(n - 1), F.lit(1))),
        lambda i: F.substring(norm, i, n),
    )


def char_shingles_sql(expr: str, n: int = 5) -> str:
    norm = normalize_text_sql(expr)
    return (
        f"[substr({norm}, i, {n}) "
        f"for i in generate_series(1, greatest(length({norm}) - {n - 1}, 1))]"
    )


def word_ngrams_of(tk: Column, n: int = 2) -> Column:
    """Word n-grams from an ALREADY-MATERIALIZED token-array column.

    Callers should project ``tokens(text).alias("tk")`` first and pass
    ``F.col("tk")`` here: Catalyst does not common-subexpression-
    eliminate across lambda boundaries, so inlining ``tokens(text)``
    re-runs the full regexp_replace+split tokenization once per gram
    (O(tokens²) per document — measured 3× wall on the decontamination
    join at sf0.1). A bound column reference slices a built array.
    CollapseProject keeps the staging projection: the alias is
    referenced multiple times by a non-cheap expression."""
    # sequence(a, b) with a > b DESCENDS in Spark (it would emit
    # [1, 0] for a 1-token doc) — gate on size explicitly.
    idx = F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i, n)))
    return F.when(F.size(tk) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(c: Column | str, n: int = 2) -> Column:
    """Word n-grams of normalized text, space-joined (array<string>,
    may repeat; empty for documents with < n tokens). DuckDB twin:
    ``word_ngrams_sql`` — both sides index the same token array, so
    the grams match byte-for-byte. Prefer ``word_ngrams_of`` over a
    pre-projected token column in hot paths (see its docstring)."""
    return word_ngrams_of(tokens(c), n)


def word_ngrams_sql(tokens_expr: str, n: int = 2) -> str:
    """DuckDB list comprehension over an in-scope token-list
    expression (give it a CTE column, e.g. ``tk``)."""
    joined = " || ' ' || ".join(f"{tokens_expr}[i + {j}]" for j in range(n))
    return (
        f"[{joined} for i in "
        f"generate_series(1, greatest(len({tokens_expr}) - {n - 1}, 0))]"
    )
