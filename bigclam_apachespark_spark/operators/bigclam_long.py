"""BigCLAM in the LONG (sparse) factor layout — the high-K path
(SURVEY.md §7: beyond K ≈ 10⁴ dense arrays stop fitting in a row; the
reference's v3 pivot to SparseVector at codes/bigclamv3-7.scala:17 is
the evidence dense rows were already the pain point at K=8,385).

State is ``factors_long(node_id BIGINT, k INT, val DOUBLE)`` holding
ONLY non-zero entries. Every kernel is a plain join + hash aggregation
— no K-wide arrays anywhere, so no row ever exceeds a few dozen bytes
and hub/hot-community skew is AQE-splittable.

Sparsity is CLOSED under the projected-gradient update: for an entry
with fu[k] = 0 and no neighbor support (wsum[k] = 0), the gradient is
−sumF[k] ≤ 0, so clamp(0 + η·grad, 0, 1000) stays 0. Fill-in can only
appear at (node, k) pairs produced by the neighbor join — exactly the
rows the long-layout pipeline materializes.

Semantics match operators/bigclam.py (same clamps, same Armijo rule,
same Σ-trick objective — v2:99-146,187-200); test_bigclam_long checks
dense↔long LLH parity to 1e-9 on the G1 fixture.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigclam_apachespark_spark.functions.arrays import MAX_F, MIN_F, MAX_P, MIN_P
from bigclam_apachespark_spark.operators import graph as G
from bigclam_apachespark_spark.operators.bigclam import (
    ALPHA,
    LINE_SEARCH_STEPS,
    checkpoint_fresh,
    _unpersist_ckpt,
)


def _clamp_p(dot):
    return F.least(F.greatest(F.exp(-dot), F.lit(MIN_P)), F.lit(MAX_P))


def init_factors_long(
    sym_edges: DataFrame,
    k: int,
    include_self: bool = True,
    seeds_ranked: DataFrame | None = None,
) -> DataFrame:
    """C1/C3 in long layout: (node_id, c, 1.0) triples for the top-K
    deduped seed neighborhoods — naturally sparse, no Bernoulli fill
    (matching v3/v47, whose sparse init is indicator-only and which
    cap K at the seed count; v3:60-87). Seed ranking/dedup is shared
    with the dense init (``seed_membership``) so the documented
    duplicate-neighborhood deviation lives in exactly one place."""
    from bigclam_apachespark_spark.operators.bigclam import seed_membership

    seed_members = seed_membership(
        sym_edges, k, include_self=include_self, seeds_ranked=seeds_ranked
    ).select(F.col("c").cast("int").alias("k"), "members")
    return seed_members.select(
        F.explode("members").alias("node_id"), "k", F.lit(1.0).alias("val")
    )


def sum_f_long(factors_long: DataFrame) -> DataFrame:
    """C5 distributed: (k, s) — stays a DataFrame (at K = 10⁶ even the
    sumF vector should not be a driver literal)."""
    return factors_long.groupBy("k").agg(F.sum("val").alias("s"))


def _edge_dots(sym_edges: DataFrame, factors_long: DataFrame) -> DataFrame:
    """(src, dst, dot) per directed edge — the SpGEMM-shaped join:
    factors on src ⋈ factors on (dst, k) → sum over k. Shuffle volume
    is Σ_edges nnz-overlap rows of ~24 bytes."""
    fu = factors_long.select(
        F.col("node_id").alias("src"), "k", F.col("val").alias("vu")
    )
    fv = factors_long.select(
        F.col("node_id").alias("dst"), "k", F.col("val").alias("vv")
    )
    return (
        sym_edges.join(fu, "src")
        .join(fv, ["dst", "k"])
        .groupBy("src", "dst")
        .agg(F.sum(F.col("vu") * F.col("vv")).alias("dot"))
    )


def edge_stats_long(sym_edges: DataFrame, factors_long: DataFrame) -> DataFrame:
    """(src, dst, dot, p, w): per-edge dot (zero-overlap edges kept at
    dot=0 via the left join), clamped probability, gradient weight."""
    dots = _edge_dots(sym_edges, factors_long)
    ed = sym_edges.join(dots, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("dot", F.lit(0.0)).alias("dot")
    )
    p = _clamp_p(F.col("dot"))
    return ed.select(
        "src", "dst", "dot", p.alias("p"), (1.0 / (1.0 - p)).alias("w")
    )


def loglikelihood_long(
    sym_edges: DataFrame,
    factors_long: DataFrame,
    es: DataFrame | None = None,
    sumf: DataFrame | None = None,
) -> float:
    """F1 via the Σ-trick, all scalars assembled in one driver pass:
    L = Σ_edges (log(1−p̂)+dot) − sumF·sumF + Σ‖fu‖².

    Pass ``es`` (a checkpointed ``edge_stats_long`` of the SAME
    factors) and ``sumf`` to reuse them — the fit loop computes edge
    stats ONCE per generation and shares it across LLH, gradient, and
    line search (the SpGEMM-shaped dot join is the dominant iteration
    cost; recomputing it per consumer measured ~4× per iteration)."""
    if es is None:
        es = edge_stats_long(sym_edges, factors_long)
    if sumf is None:
        sumf = sum_f_long(factors_long)
    edge_term = es.agg(
        F.sum(F.log(1.0 - F.col("p")) + F.col("dot")).alias("s")
    ).collect()[0]["s"] or 0.0
    sq = factors_long.agg(F.sum(F.col("val") * F.col("val")).alias("sq")).collect()[0][
        "sq"
    ] or 0.0
    sf2 = (
        sumf.agg(F.sum(F.col("s") * F.col("s")).alias("s2")).collect()[0]["s2"]
        or 0.0
    )
    return float(edge_term - sf2 + sq)


def gradient_long(
    sym_edges: DataFrame,
    factors_long: DataFrame,
    sumf: DataFrame,
    es: DataFrame | None = None,
) -> DataFrame:
    """F2 in long layout: (node_id, k, fval, gval) at the support
    (node, k) pairs — wsum[k] > 0 or fu[k] > 0 (sparsity closure, see
    module docstring). gval = wsum − sumF[k] + fu[k]."""
    if es is None:
        es = edge_stats_long(sym_edges, factors_long)
    fv = factors_long.select(
        F.col("node_id").alias("dst"), "k", F.col("val").alias("vv")
    )
    wsum = (
        es.join(fv, "dst")
        .groupBy(F.col("src").alias("node_id"), "k")
        .agg(F.sum(F.col("w") * F.col("vv")).alias("ws"))
    )
    fu = factors_long.select("node_id", "k", F.col("val").alias("fval"))
    support = (
        wsum.join(fu, ["node_id", "k"], "full")
        .select(
            "node_id",
            "k",
            F.coalesce("ws", F.lit(0.0)).alias("ws"),
            F.coalesce("fval", F.lit(0.0)).alias("fval"),
        )
    )
    return support.join(F.broadcast(sumf), "k").select(
        "node_id",
        "k",
        "fval",
        (F.col("ws") - F.col("s") + F.col("fval")).alias("gval"),
    )


def line_search_updates_long(
    sym_edges: DataFrame,
    factors_long: DataFrame,
    grad: DataFrame,
    sumf: DataFrame,
    alpha: float = ALPHA,
    steps: list[float] | None = None,
    es: DataFrame | None = None,
) -> DataFrame:
    """F3 in long layout → accepted new rows ``(node_id, k, val)``,
    INCLUDING explicit val=0 rows on the accepted candidate's support:
    an accepted step may zero out every entry of a node, and that node
    must still appear here so the F-rewrite clears its old rows
    (``apply_updates_long`` drops the zeros when unioning). One
    checkpoint of this frame therefore serves both the update rows and
    the accepted-node set.

    Same batched-cartesian Armijo as the dense path: candidates for
    all 16 η in one plan; per-candidate local LLH re-joins neighbors'
    CURRENT factors; sumF adjusted per candidate (v2:142).
    """
    spark = sym_edges.sparkSession
    steps = steps or LINE_SEARCH_STEPS
    steps_df = spark.createDataFrame([(float(s),) for s in steps], "eta double")

    # Per-node scalars of the CURRENT state: llh_u and ‖grad‖².
    if es is None:
        es = edge_stats_long(sym_edges, factors_long)
    nbr = es.groupBy("src").agg(
        F.sum(F.log(1.0 - F.col("p")) + F.col("dot")).alias("nbr_term")
    )
    # ‖grad‖² must cover ALL K components like the dense path (and the
    # reference's dense Breeze norm, v2:145): for k outside the
    # support rows grad[k] = −sumF[k], so the full norm is
    # Σ_support gval² + (Σ_k sumF[k]² − Σ_support sumF[k]²). The
    # global Σ sumF² arrives as a broadcast 1-row cross join (no
    # driver collect — sumf stays a DataFrame at high K).
    per_nk = grad.join(F.broadcast(sumf), "k").select(
        "node_id",
        (F.col("fval") * F.col("s")).alias("fusf"),
        (F.col("fval") * F.col("fval")).alias("fufu"),
        (F.col("gval") * F.col("gval")).alias("g2"),
        (F.col("s") * F.col("s")).alias("sfk2"),
    )
    s2row = sumf.agg(F.sum(F.col("s") * F.col("s")).alias("s2_total"))
    node_stats = (
        per_nk.groupBy("node_id")
        .agg(
            F.sum("fusf").alias("fusf"),
            F.sum("fufu").alias("fufu"),
            F.sum("g2").alias("g2_sup"),
            F.sum("sfk2").alias("sfk2_sup"),
        )
        .crossJoin(F.broadcast(s2row))
        .select(
            "node_id",
            "fusf",
            "fufu",
            (
                F.col("g2_sup") + F.col("s2_total") - F.col("sfk2_sup")
            ).alias("g2"),
        )
    )
    llh_u = node_stats.join(
        nbr.withColumnRenamed("src", "node_id"), "node_id", "left"
    ).select(
        "node_id",
        (
            F.coalesce("nbr_term", F.lit(0.0)) - F.col("fusf") + F.col("fufu")
        ).alias("llh_u"),
        "g2",
    )

    # Candidate rows: (node_id, eta, k, newval, fval); clamp keeps the
    # box, zero rows dropped (sparse).
    cand = (
        grad.crossJoin(F.broadcast(steps_df))
        .select(
            "node_id",
            "eta",
            "k",
            "fval",
            F.least(
                F.greatest(F.col("fval") + F.col("eta") * F.col("gval"), F.lit(MIN_F)),
                F.lit(MAX_F),
            ).alias("newval"),
        )
    )
    cand_nz = cand.where((F.col("newval") != 0.0) | (F.col("fval") != 0.0))

    # Per-candidate neighbor term: dot'(u,v) = Σ_k newval·fv[k].
    fv = factors_long.select(
        F.col("node_id").alias("dst"), "k", F.col("val").alias("vv")
    )
    cdot = (
        cand_nz.where(F.col("newval") != 0.0)
        .withColumnRenamed("node_id", "src")
        .join(sym_edges, "src")
        .join(fv, ["dst", "k"])
        .groupBy("src", "eta", "dst")
        .agg(F.sum(F.col("newval") * F.col("vv")).alias("dot"))
    )
    # Edges with zero-overlap candidate dot still contribute log(1−p̂(0)):
    # join back the full edge set per (src, eta). The deg backfill is
    # applied in `scored` (NOT via an inner join against cdot) so a
    # candidate with zero overlap on EVERY edge — no cdot rows at all
    # — still pays deg·log(1−p̂(0)) ≈ −9.21·deg instead of silently
    # scoring 0 and stealing the Armijo accept from a real step.
    deg = sym_edges.groupBy("src").agg(F.count("*").alias("deg"))
    nz_nbr = cdot.groupBy("src", "eta").agg(
        F.sum(F.log(1.0 - _clamp_p(F.col("dot"))) + F.col("dot")).alias("nz_term"),
        F.count("*").alias("nz_edges"),
    )
    import math as _math

    log_1mp0 = _math.log(1.0 - min(max(_math.exp(-0.0), MIN_P), MAX_P))

    # Candidate self terms: newfu·(sumF − fu + newfu) and ‖newfu‖²
    # over the candidate support rows.
    cself = (
        cand_nz.join(F.broadcast(sumf), "k")
        .groupBy("node_id", "eta")
        .agg(
            F.sum(
                F.col("newval") * (F.col("s") - F.col("fval") + F.col("newval"))
            ).alias("fusf_new"),
            F.sum(F.col("newval") * F.col("newval")).alias("fufu_new"),
        )
    )
    scored = (
        cself.join(
            nz_nbr.withColumnRenamed("src", "node_id"), ["node_id", "eta"], "left"
        )
        .join(
            F.broadcast(deg.withColumnRenamed("src", "node_id")), "node_id", "left"
        )
        .join(llh_u, "node_id")
        .select(
            "node_id",
            "eta",
            (
                F.coalesce("nz_term", F.lit(0.0))
                + (
                    F.coalesce("deg", F.lit(0)) - F.coalesce("nz_edges", F.lit(0))
                ) * F.lit(log_1mp0)
                - F.col("fusf_new")
                + F.col("fufu_new")
            ).alias("cand_llh"),
            (F.col("llh_u") + F.lit(alpha) * F.col("eta") * F.col("g2")).alias(
                "threshold"
            ),
        )
    )
    best = (
        scored.where(F.col("cand_llh") >= F.col("threshold"))
        .groupBy("node_id")
        .agg(F.max("eta").alias("eta"))
    )
    return best.join(cand_nz, ["node_id", "eta"]).select(
        "node_id", "k", F.col("newval").alias("val")
    )


def apply_updates_long(
    factors_long: DataFrame, updates: DataFrame, updated_nodes: DataFrame
) -> DataFrame:
    """F4: drop ALL rows of updated nodes, union their new non-zero
    rows (a node's accepted step may zero out entries, so the anti
    join must be on node_id, not (node_id, k))."""
    kept = factors_long.join(updated_nodes, "node_id", "left_anti")
    return kept.unionByName(
        updates.where(F.col("val") != 0.0).select("node_id", "k", "val")
    )


@dataclass
class FitLongResult:
    factors_long: DataFrame
    llh: float
    iterations: int
    history: list[float] = field(default_factory=list)


def bigclam_fit_long(
    sym_edges: DataFrame,
    k: int,
    tol: float = 1e-4,
    max_iter: int = 100,
    include_self: bool = True,
    factors0: DataFrame | None = None,
    seeds_ranked: DataFrame | None = None,
    verbose: bool = False,
) -> FitLongResult:
    """F5 convergence loop over the long layout — same driver-loop
    shape as bigclam_fit (checkpoint_fresh per generation, fused
    scalar jobs), usable at K where dense arrays cannot go.

    Per-generation sharing: ``edge_stats_long`` (the SpGEMM-shaped
    dot join — the dominant cost) is computed ONCE per factor
    generation, checkpointed, and consumed by the LLH scalars, the
    gradient, and the line-search current-state terms. Before this
    sharing the loop recomputed it ~4× per iteration (measured 242 s
    → ~110 s for the K=64 sf0.01 smoke)."""
    import time as _time

    sym_edges = sym_edges.cache()
    factors = factors0 if factors0 is not None else init_factors_long(
        sym_edges, k, include_self=include_self, seeds_ranked=seeds_ranked
    )
    factors = checkpoint_fresh(factors)
    es = checkpoint_fresh(edge_stats_long(sym_edges, factors))
    sumf = sum_f_long(factors).cache()
    llh_old = loglikelihood_long(sym_edges, factors, es=es, sumf=sumf)
    history = [llh_old]
    it = 0
    for it in range(1, max_iter + 1):
        t0 = _time.perf_counter()
        grad = checkpoint_fresh(gradient_long(sym_edges, factors, sumf, es=es))
        updates = checkpoint_fresh(
            line_search_updates_long(sym_edges, factors, grad, sumf, es=es)
        )
        # Accepted NODES (updates keeps explicit zero rows, so a step
        # that zeroes a node out still rewrites — clears — that node).
        upd_nodes = updates.select("node_id").distinct()
        n_updated = upd_nodes.count()
        if n_updated == 0:
            _unpersist_ckpt(grad)
            _unpersist_ckpt(updates)
            break
        prev, prev_es, prev_sumf = factors, es, sumf
        factors = checkpoint_fresh(apply_updates_long(factors, updates, upd_nodes))
        es = checkpoint_fresh(edge_stats_long(sym_edges, factors))
        sumf = sum_f_long(factors).cache()
        _unpersist_ckpt(prev)
        _unpersist_ckpt(prev_es)
        prev_sumf.unpersist()
        _unpersist_ckpt(grad)
        _unpersist_ckpt(updates)
        llh_new = loglikelihood_long(sym_edges, factors, es=es, sumf=sumf)
        history.append(llh_new)
        if verbose:
            print(
                f"[bigclam_fit_long] iter={it} llh={llh_new:.6f} n_upd={n_updated} "
                f"wall={_time.perf_counter() - t0:.2f}s",
                flush=True,
            )
        if llh_old != 0 and abs(1.0 - llh_new / llh_old) < tol:
            llh_old = llh_new
            break
        llh_old = llh_new
    return FitLongResult(
        factors_long=factors, llh=llh_old, iterations=it, history=history
    )


def fold_in_long(
    cross_edges: DataFrame,
    factors_long: DataFrame,
    sumf: DataFrame,
    alpha: float = ALPHA,
) -> DataFrame:
    """FOLD-IN: score unseen nodes against a FROZEN model → one
    projected-gradient step from F_u = 0 per new node →
    ``(node_id, n_model_nbrs, top_k, fu_top)`` — the serving path
    the fit pipelines lack (a production system must place today's
    new accounts into yesterday's communities without a refit; same
    role as ``append_ivf_index``'s frozen-centroid add on the ANN
    side).

    At F_u = 0 every incident dot is 0, so p clamps to MAX_P and the
    gradient weight is the CONSTANT 1/(1−MAX_P) (≈10⁴; both engines
    evaluate the identical IEEE expression) — the fold-in gradient is
    the closed form ``g[k] = w₀·Σ_{v∈N(u)} F_v[k] −
    sumF[k]`` (same formula as ``gradient_long`` specialized at
    zero; no clamp ambiguity, no iteration), and the new membership
    row is ``clamp(α·g, MIN_F, MAX_F)``. ``top_k`` is the argmax
    community (ties → lowest k), ``fu_top`` its value — nodes with
    zero model neighbors have nothing to fold in and emit no row
    (stated: fold-in is defined by the neighbor term). "Model
    neighbor" means a neighbor with AT LEAST ONE stored factor entry
    (ADVICE r9): ``n_model_nbrs`` semi-joins the cross edges against
    the factor table's node set, so a dst absent from the sparse
    layout (no rows — including an all-zero row the layout elides)
    neither counts nor contributes, and the emit contract is exact —
    a row appears iff ``n_model_nbrs > 0``.

    Scale shape: ONE join of the cross-edge list against the frozen
    factor table per (node, k) — Σ nnz-overlap shuffle volume, the
    same SpGEMM shape as the high-K gradient; sumF broadcasts; the
    argmax is a max_by hash agg, never a window over the corpus."""
    fv = factors_long.select(
        F.col("node_id").alias("dst"), "k", F.col("val").alias("vv")
    )
    w0 = 1.0 / (1.0 - MAX_P)
    ws = (
        cross_edges.join(fv, "dst")
        .groupBy(F.col("src").alias("node_id"), "k")
        .agg(F.sum("vv").alias("sv"))
    )
    nbrs = (
        cross_edges.join(
            factors_long.select(F.col("node_id").alias("dst")).distinct(),
            "dst",
            "left_semi",
        )
        .groupBy(F.col("src").alias("node_id"))
        .agg(F.count("*").alias("n_model_nbrs"))
    )
    fu = ws.join(F.broadcast(sumf), "k").select(
        "node_id",
        "k",
        F.least(
            F.greatest(
                F.lit(alpha) * (F.lit(w0) * F.col("sv") - F.col("s")),
                F.lit(MIN_F),
            ),
            F.lit(MAX_F),
        ).alias("fu"),
    )
    best = fu.groupBy("node_id").agg(
        F.max_by(
            F.struct("k", "fu"),
            F.struct(F.col("fu"), (-F.col("k")).alias("_t")),
        ).alias("_b")
    )
    return best.join(nbrs, "node_id").select(
        "node_id",
        F.col("n_model_nbrs").cast("long").alias("n_model_nbrs"),
        F.col("_b.k").cast("int").alias("top_k"),
        F.round(F.col("_b.fu"), 6).alias("fu_top"),
    )
