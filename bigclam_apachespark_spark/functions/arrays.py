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
