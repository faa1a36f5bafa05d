"""Array-column kernels (SURVEY.md §2.C) — the K-length vector math of
the reference's Breeze closures (v2:99-102,123-131) re-expressed as
Spark higher-order functions so everything stays JVM-side inside
whole-stage codegen. No Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference constants (v2:28-31, v3:21-24, v47:40-43).
MIN_P = 1e-4
MAX_P = 0.9999
MIN_F = 0.0
MAX_F = 1000.0


def arr_lit(values: list[float]) -> Column:
    """Driver-side K-vector (e.g. sumF — K doubles) as a literal array
    column: the only state that ever crosses to the driver."""
    return F.array(*[F.lit(float(v)) for v in values])


def arr_dot(a: Column | str, b: Column | str) -> Column:
    """C6: dot product of two K-vectors (v2:123-131 Breeze kernel)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


# Above this K the unrolled expression tree stops paying for itself
# (Janino splits oversized codegen methods; the compile cost and the
# expression-tree bookkeeping grow linearly while the HOF form stays
# O(1) plan-size). The K≥10³ regime runs the long/sparse layout anyway.
UNROLL_MAX_K = 128


def arr_dot_k(a: Column | str, b: Column | str, k: int) -> Column:
    """C6 fast path: dot product with driver-known K, unrolled into
    element arithmetic (``a[0]*b[0] + … + a[k-1]*b[k-1]``) so it stays
    inside whole-stage codegen. ``arr_dot``'s aggregate/zip_with form
    evaluates its lambdas interpreted per element — measured ~2× on
    the 16·E-row line-search fan-out at sf0.1. Falls back to the HOF
    form above ``UNROLL_MAX_K``."""
    if k <= 0:
        return F.lit(0.0)
    if k > UNROLL_MAX_K:
        return arr_dot(a, b)
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    out = ac[0] * bc[0]
    for i in range(1, k):
        out = out + ac[i] * bc[i]
    return out


def arr_axpy(eta: Column | float, x: Column | str, y: Column | str) -> Column:
    """C7: y + eta * x, element-wise."""
    eta_c = F.lit(eta) if isinstance(eta, (int, float)) else eta
    return F.zip_with(y, x, lambda yv, xv: yv + eta_c * xv)


def arr_clamp(a: Column, lo: float = MIN_F, hi: float = MAX_F) -> Column:
    """C8: element-wise projection onto [lo, hi] (v2:99-102 step clamp)."""
    return F.transform(a, lambda v: F.least(F.greatest(v, F.lit(lo)), F.lit(hi)))


def prob_hat(dot: Column) -> Column:
    """C9: p̂ = clip(exp(-fu·fv), MIN_P, MAX_P) (v2:130)."""
    return F.least(F.greatest(F.exp(-dot), F.lit(MIN_P)), F.lit(MAX_P))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two float arrays (extension surface)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    dot = arr_dot(a, b)
    na = F.sqrt(arr_dot(a, a))
    nb = F.sqrt(arr_dot(b, b))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
