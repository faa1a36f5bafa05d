"""BigCLAM optimizer tests: FIXTURES.md §2 hand-computed values (FX1)
plus invariants and an end-to-end fit recovering the two cliques."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigclam_apachespark_spark.operators import symmetrize
from bigclam_apachespark_spark.operators.bigclam import (
    LINE_SEARCH_STEPS,
    apply_updates,
    bigclam_fit,
    extract_communities,
    extraction_threshold,
    geometric_k_grid,
    gradient_state,
    init_factors,
    invert_communities,
    line_search_updates,
    loglikelihood,
    sum_f,
)

FX1 = [(n, [1.0, 0.0]) for n in range(4)] + [(n, [0.0, 1.0]) for n in range(4, 8)]


@pytest.fixture(scope="module")
def fx1(spark):
    return spark.createDataFrame(FX1, "node_id long, f array<double>").cache()


def test_line_search_grid():
    assert len(LINE_SEARCH_STEPS) == 16
    assert LINE_SEARCH_STEPS[0] == 1.0
    assert LINE_SEARCH_STEPS[-1] == pytest.approx(1e-15)


def test_sumf_fx1(fx1):
    assert sum_f(fx1) == pytest.approx([4.0, 4.0])


def test_llh_fx1(g1_edges, fx1):
    # FIXTURES §2: total LLH = −29.42888423324233 (tol 1e-9)
    sym = symmetrize(g1_edges)
    llh = loglikelihood(sym, fx1, [4.0, 4.0])
    assert llh == pytest.approx(-29.42888423324233, abs=1e-9)


def test_gradient_fx1(g1_edges, fx1):
    # FIXTURES §2: grad(node 0) = [1.745930120607979, −4.0] (tol 1e-9)
    sym = symmetrize(g1_edges)
    state = gradient_state(sym, fx1, [4.0, 4.0])
    row = state.where(F.col("node_id") == 0).collect()[0]
    assert list(row["grad"]) == pytest.approx([1.745930120607979, -4.0], abs=1e-9)
    # llh_u for a clique-interior node (FIXTURES §2): −1.3760254361612458
    assert row["llh_u"] == pytest.approx(-1.3760254361612458, abs=1e-9)


def test_line_search_improves_llh(g1_edges, fx1):
    # Invariant (SURVEY §5.2): an accepted update never decreases LLH.
    sym = symmetrize(g1_edges)
    sumf = sum_f(fx1)
    llh0 = loglikelihood(sym, fx1, sumf)
    state = gradient_state(sym, fx1, sumf)
    updates = line_search_updates(sym, fx1, state, sumf)
    assert updates.count() > 0
    factors1 = apply_updates(fx1, updates)
    sumf1 = sum_f(factors1)
    llh1 = loglikelihood(sym, factors1, sumf1)
    assert llh1 >= llh0
    # C8 box invariant
    bad = factors1.where(
        F.exists("f", lambda v: (v < 0.0) | (v > 1000.0))
    ).count()
    assert bad == 0


def test_init_factors_deterministic(g1_edges, spark):
    sym = symmetrize(g1_edges)
    f1 = init_factors(sym, k=4, seed=7)
    f2 = init_factors(sym, k=4, seed=7)
    assert sorted(map(repr, f1.collect())) == sorted(map(repr, f2.collect()))
    # Seeds on G1 are {0,1,5,6}: community 0 = N(0)∪{0} = clique A.
    rows = {r["node_id"]: list(r["f"]) for r in f1.collect()}
    for n in range(4):
        assert rows[n][0] == 1.0  # clique A members in community 0
    for n in range(4, 8):
        assert rows[n][0] == 0.0


def test_init_factors_random_completion(g1_edges):
    # C2: k > n_seeds exercises the seeded-Bernoulli fill. On G1 the
    # duplicate-neighborhood dedup leaves 2 distinct seeds (cliques),
    # so k=6 fills columns 2..5 with the xxhash64 coin.
    sym = symmetrize(g1_edges)
    f1 = init_factors(sym, k=6, seed=11)
    f2 = init_factors(sym, k=6, seed=11)
    assert sorted(map(repr, f1.collect())) == sorted(map(repr, f2.collect()))
    rows = {r["node_id"]: list(r["f"]) for r in f1.collect()}
    assert all(len(v) == 6 for v in rows.values())
    vals = [rows[n][c] for n in range(8) for c in range(2, 6)]
    assert set(vals) <= {0.0, 1.0}
    assert 0.0 in vals and 1.0 in vals  # the coin actually varies
    # different seed → different fill
    f3 = init_factors(sym, k=6, seed=12)
    assert sorted(map(repr, f1.collect())) != sorted(map(repr, f3.collect()))


@pytest.mark.slow  # heavy tier (pytest.ini): runs in the round-close sweep
def test_model_selection_small_grid(g1_edges):
    # F6: grid (2, 4, 1) → Ks {2, 4}; both fit briefly; a chosen K
    # is returned and every grid point records an LLH.
    from bigclam_apachespark_spark.operators.bigclam import model_selection

    sym = symmetrize(g1_edges)
    chosen, llh_by_k = model_selection(
        sym, 2, 4, 1, seed=42, tol=1e-3, fit_tol=1e-2, max_iter=2
    )
    assert set(llh_by_k) == {2, 4}
    assert chosen in llh_by_k
    assert all(isinstance(v, float) for v in llh_by_k.values())


@pytest.mark.slow  # heavy tier (pytest.ini): runs in the round-close sweep
def test_fit_recovers_cliques(g1_edges):
    # End-to-end sanity: K=2 fit on G1 separates the cliques (FIXTURES §2).
    sym = symmetrize(g1_edges)
    res = bigclam_fit(sym, k=2, seed=42, tol=1e-4, max_iter=30)
    assert res.iterations >= 1
    # Full-batch simultaneous updates with per-node Armijo are NOT
    # globally monotone (each node's line search assumes the others
    # stay fixed — on G1 the loop settles into a 4-cycle, exactly as
    # the reference's identical Jacobi-style scheme would). The
    # guarantee to test is improvement over init, not monotonicity.
    assert max(res.history) > res.history[0] + 1.0
    assert res.history[-1] > res.history[0]
    delta = extraction_threshold(8, 13)
    assert delta == pytest.approx(0.7900343720832619, abs=1e-12)
    com = extract_communities(res.factors, delta)
    groups = {
        r["community"]: set(r["members"])
        for r in invert_communities(com).collect()
    }
    assert {0, 1, 2, 3} in groups.values()
    assert {4, 5, 6, 7} in groups.values()


@pytest.mark.slow  # heavy tier (pytest.ini): runs in the round-close sweep
def test_pipeline_end_to_end_with_sink(spark, tmp_path):
    # A1 + full flow + A3: G1 as a text edge list (with comments and a
    # malformed line) -> pipeline -> parquet sink -> re-read.
    from bigclam_apachespark_spark.operators.bigclam import bigclam_pipeline

    lines = ["# comment", "bad line here"] + [
        f"{a} {b}" for a, b in
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
         (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7), (3, 4)]
    ]
    p = tmp_path / "g1.txt"
    p.write_text("\n".join(lines) + "\n")
    out = str(tmp_path / "communities.parquet")
    inv, res = bigclam_pipeline(
        spark, str(p), k=2, seed=42, tol=1e-4, max_iter=6, out_path=out
    )
    groups = {r["community"]: set(r["members"]) for r in inv.collect()}
    assert set().union(*groups.values()) == set(range(8))
    assert res.history[-1] > res.history[0]
    # sink actually written and re-readable
    assert spark.read.parquet(out).count() == len(groups)
    # A3 text-format twin (reference saveAsTextFile, v2:230):
    # community<TAB>csv-members lines, distributed write, re-readable.
    from bigclam_apachespark_spark.operators.bigclam import save_communities_text

    tout = str(tmp_path / "communities_text")
    save_communities_text(inv, tout)
    lines_back = [r["value"] for r in spark.read.text(tout).collect()]
    parsed = {
        int(c): set(map(int, m.split(",")))
        for c, m in (ln.split("\t") for ln in lines_back)
    }
    assert parsed == groups


def test_geometric_k_grid_matches_reference_output():
    # v47:268 pasted REPL output; reproduced by minCom=50, maxCom=200,
    # divCom=15 (the file's declared divCom=100 yields a denser grid —
    # the paste is from a different REPL run).
    assert geometric_k_grid(50, 200, 15) == [
        50, 54, 59, 64, 70, 76, 83, 91, 99, 108, 118, 129, 141, 154, 168, 184, 200,
    ]


def test_arr_dot_k_matches_hof_form(spark):
    """The unrolled codegen dot (arr_dot_k) must equal the HOF fold
    (arr_dot) bit-for-bit — same left-to-right order, 0.0+x==x — on
    awkward doubles, and fall back to the HOF form above UNROLL_MAX_K."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.functions.arrays import (
        UNROLL_MAX_K,
        arr_dot,
        arr_dot_k,
    )

    vals = [0.1, -3.7e5, 1e-9, 2.5, -0.0, 7.77, 123.456, -1e3]
    df = spark.createDataFrame(
        [(vals, list(reversed(vals)))], "a array<double>, b array<double>"
    )
    row = df.select(
        arr_dot("a", "b").alias("hof"), arr_dot_k("a", "b", len(vals)).alias("unr")
    ).collect()[0]
    assert row.hof == row.unr  # exact, not approx
    # k=0 -> 0.0; k > UNROLL_MAX_K -> falls back (same value either way)
    big = list(range(UNROLL_MAX_K + 1))
    df2 = spark.createDataFrame(
        [( [float(x) for x in big], [float(x) for x in big] )],
        "a array<double>, b array<double>",
    )
    r2 = df2.select(
        arr_dot_k("a", "b", 0).alias("z"),
        arr_dot_k("a", "b", len(big)).alias("fb"),
        arr_dot("a", "b").alias("hof"),
    ).collect()[0]
    assert r2.z == 0.0 and r2.fb == r2.hof
