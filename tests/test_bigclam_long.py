"""Long-layout (sparse, high-K) BigCLAM: dense <-> long parity on G1.

The long layout must reproduce the dense path's numbers exactly —
same clamps, same Armijo rule, same objective — so the strongest test
is trajectory parity against operators/bigclam.py on the fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigclam_apachespark_spark.operators import symmetrize
from bigclam_apachespark_spark.operators.bigclam import (
    bigclam_fit,
    init_factors,
    loglikelihood,
    sum_f,
)
from bigclam_apachespark_spark.operators.bigclam_long import (
    bigclam_fit_long,
    init_factors_long,
    loglikelihood_long,
    sum_f_long,
)


def _dense_to_long(factors):
    return factors.select(
        "node_id", F.posexplode("f").alias("k", "val")
    ).where(F.col("val") != 0.0)


def test_llh_parity_on_init(g1_edges):
    sym = symmetrize(g1_edges)
    dense = init_factors(sym, k=2, seed=42)
    llh_dense = loglikelihood(sym, dense, sum_f(dense))
    long_f = init_factors_long(sym, k=2)
    llh_long = loglikelihood_long(sym, long_f)
    assert llh_long == pytest.approx(llh_dense, abs=1e-9)
    # long init == sparsified dense init (same seeds, same dedup)
    a = sorted(map(tuple, _dense_to_long(dense).collect()))
    b = sorted(map(tuple, long_f.collect()))
    assert a == b


def test_sumf_long(g1_edges):
    sym = symmetrize(g1_edges)
    long_f = init_factors_long(sym, k=2)
    s = {r["k"]: r["s"] for r in sum_f_long(long_f).collect()}
    assert s == {0: 4.0, 1: 4.0}


def test_fit_trajectory_parity(g1_edges):
    # 3 iterations dense vs long from the same init: identical LLH
    # trajectory to float tolerance.
    sym = symmetrize(g1_edges)
    dense = bigclam_fit(sym, k=2, seed=42, tol=0.0, max_iter=3)
    longr = bigclam_fit_long(sym, k=2, tol=0.0, max_iter=3)
    assert len(dense.history) == len(longr.history)
    for a, b in zip(dense.history, longr.history):
        assert b == pytest.approx(a, abs=1e-7)
