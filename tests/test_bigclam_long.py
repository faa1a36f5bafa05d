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


def test_line_search_parity_disjoint_support(spark):
    """Dense↔long Armijo parity on a fixture built to hit the two
    cases where the long layout's sparse bookkeeping can silently
    diverge from the dense (reference) arithmetic:

    - spoke 1's only surviving candidate direction (c0) is held by no
      neighbor → ZERO cdot rows → its candidate neighbor term must be
      deg·log(1−p̂(0)), not a coalesced 0;
    - c2 is outside spoke 1's support → ‖grad‖² must still include
      the off-support (−sumF[2])² component like the dense full-K dot.
    """
    from bigclam_apachespark_spark.operators.bigclam import (
        gradient_state,
        line_search_updates,
    )
    from bigclam_apachespark_spark.operators.bigclam_long import (
        gradient_long,
        line_search_updates_long,
    )
    from bigclam_apachespark_spark.sources import edges_from_pairs

    # Star: hub 0 — spokes 1..12. Spoke 1 holds c0 alone; hub + spokes
    # 2..12 hold c1 at the box max so sumF[1] = 11001 exceeds spoke
    # 1's c1 weight-sum (w·1 = 10000) → grad(spoke1, c1) < 0, its
    # candidate zeroes c1, and the surviving c0 direction is held by
    # NO neighbor (hub holds only c1) → zero cdot rows for spoke 1.
    # Spoke 2 additionally holds c2 (spoke 1's off-support component).
    sym = symmetrize(edges_from_pairs(spark, [(0, i) for i in range(1, 13)]))
    rows = [(1, 0, 1.0), (0, 1, 1.0)]
    rows += [(i, 1, 1000.0) for i in range(2, 13)]
    rows += [(2, 2, 5.0)]
    K = 3
    long_f = spark.createDataFrame(rows, "node_id long, k int, val double")
    dense_map = {n: [0.0] * K for n in range(13)}
    for n, k, v in rows:
        dense_map[n][k] = v
    dense_f = spark.createDataFrame(
        sorted(dense_map.items()), "node_id long, f array<double>"
    )

    sumf_list = sum_f(dense_f)
    upd_d = line_search_updates(
        sym, dense_f, gradient_state(sym, dense_f, sumf_list), sumf_list
    )
    d_rows = set()
    d_nodes = set()
    for r in upd_d.collect():
        d_nodes.add(r["node_id"])
        for k, v in enumerate(r["f_new"]):
            if v != 0.0:
                d_rows.add((r["node_id"], k, round(v, 9)))

    long_sumf = sum_f_long(long_f)
    upd_l = line_search_updates_long(
        sym, long_f, gradient_long(sym, long_f, long_sumf), long_sumf
    )
    l_collect = upd_l.collect()
    l_nodes = {r["node_id"] for r in l_collect}
    l_rows = {
        (r["node_id"], r["k"], round(r["val"], 9))
        for r in l_collect
        if r["val"] != 0.0
    }
    assert l_nodes == d_nodes
    assert l_rows == d_rows


@pytest.mark.slow  # heavy tier (pytest.ini): runs in the round-close sweep
def test_fit_trajectory_parity(g1_edges):
    # 3 iterations dense vs long from the same init: identical LLH
    # trajectory to float tolerance.
    sym = symmetrize(g1_edges)
    dense = bigclam_fit(sym, k=2, seed=42, tol=0.0, max_iter=3)
    longr = bigclam_fit_long(sym, k=2, tol=0.0, max_iter=3)
    assert len(dense.history) == len(longr.history)
    for a, b in zip(dense.history, longr.history):
        assert b == pytest.approx(a, abs=1e-7)


def test_fold_in_hand_computed(spark):
    """2-community model {0: [1,0], 1: [1,0], 2: [0,1]}; new node 9
    with edges to 0 and 1: ws = [2, 0], sumF = [2, 1], so g =
    [w0*2 - 2, -1] -> fu = [0.05*(w0*2 - 2), 0] -> top community 0
    with the hand value; a second new node linked only to 2 must
    pick community 1."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators.bigclam_long import (
        fold_in_long,
        sum_f_long,
    )

    factors = spark.createDataFrame(
        [(0, 0, 1.0), (1, 0, 1.0), (2, 1, 1.0)],
        "node_id long, k int, val double",
    )
    sumf = sum_f_long(factors)
    cross = spark.createDataFrame(
        [(9, 0), (9, 1), (8, 2)], "src long, dst long"
    )
    out = {r.node_id: r for r in fold_in_long(cross, factors, sumf).collect()}

    w0 = 1.0 / (1.0 - 0.9999)
    assert out[9].top_k == 0 and out[9].n_model_nbrs == 2
    assert out[9].fu_top == round(min(0.05 * (w0 * 2.0 - 2.0), 1000.0), 6)
    assert out[8].top_k == 1 and out[8].n_model_nbrs == 1
    assert out[8].fu_top == round(min(0.05 * (w0 * 1.0 - 1.0), 1000.0), 6)


def test_fold_in_model_neighbor_contract(spark):
    """ADVICE r9: "model neighbor" = a neighbor with >=1 stored factor
    entry. A held-out node whose only neighbors are absent from the
    sparse factor table emits NO row; a node with a mix counts only
    the modeled neighbors — so a row appears iff n_model_nbrs > 0."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators import bigclam_long as BL

    # model: nodes 10 (k0=0.5, k1=0.2) and 11 (k0=0.1); node 12 has
    # NO rows (the sparse layout's elided all-zero row)
    factors = spark.createDataFrame(
        [(10, 0, 0.5), (10, 1, 0.2), (11, 0, 0.1)],
        "node_id long, k int, val double",
    )
    sumf = BL.sum_f_long(factors)
    # held-out 1: neighbors 10 (modeled) and 12 (unmodeled) -> counts 1
    # held-out 2: only neighbor 12 (unmodeled) -> no row
    cross = spark.createDataFrame(
        [(1, 10), (1, 12), (2, 12)], "src long, dst long"
    )
    rows = {r.node_id: r for r in BL.fold_in_long(cross, factors, sumf).collect()}
    assert set(rows) == {1}
    assert rows[1].n_model_nbrs == 1
