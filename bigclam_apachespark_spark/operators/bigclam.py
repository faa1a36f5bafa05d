"""BigCLAM optimizer (SURVEY.md §2.C/§2.F) — DataFrame-native.

Model state is a ``factors(node_id BIGINT, f ARRAY<DOUBLE>)``
DataFrame (K fixed per run) plus the K-length column-sum vector
``sumF`` (the ONLY state that crosses to the driver — K doubles,
SURVEY §1.3). The reference instead collects the whole F matrix to
the driver and re-broadcasts it every iteration (v2:118 ⚠ SURVEY
§4.3.1); here both factor lookups are joins, so the model scales with
the cluster, not driver memory.

Objective (Yang & Leskovec WSDM'13, eqs. 2+4 with the Σ-trick; exact
reference semantics at v2:187-200):
    L = Σ_u [ Σ_{v∈N(u)} (log(1 − p̂(u,v)) + fu·fv) − fu·sumFᵀ + fu·fuᵀ ]
    p̂(u,v) = clip(exp(−fu·fv), 1e-4, 0.9999)
Gradient (v2:121-133):  ∇_u = Σ_{v∈N(u)} fv/(1−p̂) − sumF + fu
Step (v2:99-102):       F_u ← clip(F_u + η·∇_u, 0, 1000)
Armijo accept (v2:140-146): L_u(new, sumF−fu+newfu) ≥ L_u + α·η·‖∇_u‖²,
keep the largest accepted η of the 16-step grid {1, 0.1, …, 1e-15}.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigclam_apachespark_spark.functions.checkpointing import (
    unpersist_local_checkpoint,
)
from bigclam_apachespark_spark.functions.arrays import (
    MAX_F,
    MIN_F,
    UNROLL_MAX_K,
    arr_clamp,
    arr_dot,
    arr_dot_k,
    arr_lit,
    prob_hat,
)
from bigclam_apachespark_spark.operators import graph as G

# Line-search grid (v2:104-114): {1, 0.1, ..., 1e-15}, α=0.05, β=0.1.
ALPHA = 0.05
BETA = 0.1
LINE_SEARCH_STEPS = [BETA**i for i in range(16)]


# ---------------------------------------------------------------------------
# Init (C1/C2/C3)
# ---------------------------------------------------------------------------


def seed_membership(
    sym_edges: DataFrame,
    k: int,
    include_self: bool = True,
    seeds_ranked: DataFrame | None = None,
    cache_handles: list | None = None,
) -> DataFrame:
    """Top-K deduped seed neighborhoods → ``(c, members)``.

    Shared by the dense (``init_factors``) and long
    (``bigclam_long.init_factors_long``) inits so the documented
    duplicate-neighborhood dedup deviation (see ``init_factors``) is
    defined in exactly one place.

    Scale shape: the locally-minimal seed set is a constant fraction
    of V (every φ local minimum), so both global rankings — the raw
    (φ, id) seed rank and the post-dedup community index — go through
    the bucketed two-stage exact-rank kernel (``functions/ranks.py``),
    never a single-partition ``row_number`` sort over a V-sized
    relation. The dedup election window partitions by ``members``
    (ego-net-sized groups) and was always safe. The kernel reads its
    input three times (bounds, per-bucket counts, final join), so
    both ranking inputs are cached — without that, the conductance
    subtree under ``seeds_ranked`` would re-evaluate per reference
    and compound across the two rankings (measured ~10× at sf0.01).
    ``cache_handles``: same release contract as ``ego_conductance``.
    The two caches are taken UNCONDITIONALLY (they are load-bearing,
    see above); a caller that passes no ``cache_handles`` accepts
    that the blocks live until executor LRU eviction — fine for
    one-shot registry queries, but loop drivers (``fit``) must pass
    handles and release per round.
    """
    from pyspark.sql import Window

    from bigclam_apachespark_spark.functions.ranks import bucketed_row_number

    if seeds_ranked is None:
        seeds_ranked = G.local_min_seeds(sym_edges, G.ego_conductance(sym_edges))
    seeds_ranked = seeds_ranked.cache()
    if cache_handles is not None:
        cache_handles.append(seeds_ranked)
    nbrs = G.neighbor_lists(sym_edges)
    ranked = bucketed_row_number(seeds_ranked, ["phi", "id"], out="rk")
    # array_sort: the dedup key must be order-insensitive (array_union
    # puts self first, so equal SETS would otherwise compare unequal).
    cand = ranked.join(nbrs, "id").select(
        "rk",
        (
            F.array_sort(F.array_union(F.array("id"), "nbrs"))
            if include_self
            else F.col("nbrs")
        ).alias("members"),
    )
    # Drop duplicate-membership seeds (keep best rank), re-rank → c.
    dedup = (
        cand.withColumn(
            "dd", F.row_number().over(Window.partitionBy("members").orderBy("rk"))
        )
        .where(F.col("dd") == 1)
        .cache()
    )
    if cache_handles is not None:
        cache_handles.append(dedup)
    return (
        bucketed_row_number(dedup, ["rk"], out="_c")
        .withColumn("c", (F.col("_c") - 1).cast("int"))
        .where(F.col("c") < k)
        .select("c", "members")
    )


def init_factors(
    sym_edges: DataFrame,
    k: int,
    seed: int = 42,
    include_self: bool = True,
    seeds_ranked: DataFrame | None = None,
) -> DataFrame:
    """C1-C3: factors init from the top-K locally-minimal seeds'
    neighborhoods — f[u][c] = 1.0 iff u ∈ N(seed_c) (∪ {seed_c} when
    ``include_self``, the v2:70 self-membership variant; v3/v47 omit
    it). If fewer than K seeds exist, remaining columns are Bernoulli
    (0.5) indicators (v2:61-63) — the reference uses unseeded
    ``Random``; we use an xxhash64-derived coin so init is
    deterministic and fully distributed (SURVEY §4.3.5).

    Community index c = seed rank (deterministic (φ, id) order via
    row_number — the reference's ``zipWithIndex`` after unordered ops
    is nondeterministic, SURVEY §2.C3).

    Deviation (documented): seeds whose membership set duplicates a
    better-ranked seed's are SKIPPED before taking the top K. Two
    identical indicator columns receive identical gradients forever
    (the dynamics are symmetric in community index), so duplicate-
    neighborhood seeds provably waste columns — on the G1 fixture the
    deterministic (φ, id) ranking picks two seeds from the same clique
    and the K=2 fit can never separate the cliques. The reference
    takes the first K of its (nondeterministically ordered) list
    (v3:62, v47:83) and avoids this only by luck of ordering.
    """
    seed_members = seed_membership(
        sym_edges, k, include_self=include_self, seeds_ranked=seeds_ranked
    )
    # (node, c) membership triples → dense K-array per node.
    memb = seed_members.select("c", F.explode("members").alias("node_id"))
    per_node = memb.groupBy("node_id").agg(F.collect_set("c").alias("cs"))
    verts = G.vertices(sym_edges).select(F.col("id").alias("node_id"))
    joined = verts.join(per_node, "node_id", "left").select(
        "node_id", F.coalesce("cs", F.array().cast("array<int>")).alias("cs")
    )

    n_seeds = seed_members.count()
    node = F.col("node_id")
    f = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda c: F.when(c < F.lit(n_seeds), F.array_contains("cs", c.cast("int")).cast("double"))
        .otherwise(F.pmod(F.xxhash64(node, c, F.lit(seed)), F.lit(2)).cast("double")),
    )
    return joined.select("node_id", f.alias("f"))


# checkpoint_fresh lives in functions/checkpointing.py since r11 (the
# SGNS fit loop hit the same SPARK-39834 stats-compounding defect this
# helper was born to fix); re-exported here for its historical callers.
from bigclam_apachespark_spark.functions.checkpointing import (  # noqa: E402
    checkpoint_fresh,
    release_fresh_checkpoint as _unpersist_ckpt,
)


def sum_f(factors: DataFrame) -> list[float]:
    """C5: column sums of F → K doubles on the driver (posexplode +
    hash agg with map-side combine; v2:95 / v3:84-85)."""
    rows = (
        factors.select(F.posexplode("f").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("s"))
        .orderBy("pos")
        .collect()
    )
    return [r["s"] for r in rows]


def sum_f_and_sq(factors: DataFrame) -> tuple[list[float], float]:
    """C5 fused with Σ_u fu·fu: one posexplode + hash agg returning
    (sumF, Σ_u ‖fu‖²) — the two driver-side scalars the convergence
    loop needs per iteration, in ONE job (K rows collected)."""
    rows = (
        factors.select(F.posexplode("f").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("s"), F.sum(F.col("val") * F.col("val")).alias("sq"))
        .orderBy("pos")
        .collect()
    )
    return [r["s"] for r in rows], float(sum(r["sq"] for r in rows))


def edge_llh_term(
    sym_edges: DataFrame, factors: DataFrame, k: int | None = None
) -> float:
    """Σ over directed edges of (log(1 − p̂(u,v)) + fu·fv) — the only
    LLH component that needs the edge join; one join pipeline → one
    global agg → one scalar (no per-node regrouping). Pass ``k`` to
    take the unrolled-codegen dot path."""
    ef = _edge_factors(sym_edges, factors)
    dot = arr_dot_k("fu", "fv", k) if k is not None else arr_dot("fu", "fv")
    term = F.log(1.0 - prob_hat(dot)) + dot
    row = ef.agg(F.sum(term).alias("s")).collect()[0]
    return float(row["s"]) if row["s"] is not None else 0.0


# ---------------------------------------------------------------------------
# Objective (F1) and gradient state (F2)
# ---------------------------------------------------------------------------


def edge_fv_relation(sym_edges: DataFrame, factors: DataFrame) -> DataFrame:
    """(src, dst, fv) per directed edge — the edges⋈factors(dst) join
    that BOTH per-iteration consumers (``gradient_state`` and
    ``line_search_updates``) re-derive. Build it once per iteration,
    checkpoint, and pass to both: saves one E-row shuffle join per
    iteration and, more importantly, keeps the 16-step line-search
    fan-out from shuffling 16·E K-wide candidate rows through a
    second (dst) join — the candidates now join the persisted edge
    relation on src only.

    Memory shape: E×(K+2) doubles. Worth materializing exactly in the
    dense-path regimes (K ≤ a few hundred, v2's K=100); the K≥10³
    regime runs the long/sparse path (``bigclam_long``) which never
    builds it.
    """
    fv = factors.select(F.col("node_id").alias("dst"), F.col("f").alias("fv"))
    return sym_edges.join(fv, "dst").select("src", "dst", "fv")


def _edge_factors(
    sym_edges: DataFrame, factors: DataFrame, edge_fv: DataFrame | None = None
) -> DataFrame:
    """(u, fu, fv) per directed edge: two joins against factors. At
    scale these are shuffle hash joins on the node id; the factors
    side is N×K — broadcast only if tiny (Catalyst decides). Pass a
    pre-materialized ``edge_fv_relation`` to skip the dst join."""
    fu = factors.select(F.col("node_id").alias("src"), F.col("f").alias("fu"))
    base = edge_fv if edge_fv is not None else edge_fv_relation(sym_edges, factors)
    return base.join(fu, "src").select("src", "dst", "fu", "fv")


def loglikelihood(sym_edges: DataFrame, factors: DataFrame, sumf: list[float]) -> float:
    """F1: total log-likelihood (exact v2:187-200 semantics, incl.
    both clamps). One join pipeline → two hash aggs → one scalar."""
    k = len(sumf)
    ef = _edge_factors(sym_edges, factors)
    dot = arr_dot_k("fu", "fv", k)
    term = F.log(1.0 - prob_hat(dot)) + dot
    per_node_edge = ef.groupBy("src").agg(F.sum(term).alias("nbr_term"))

    sf = arr_lit(sumf)
    fu_terms = factors.select(
        F.col("node_id").alias("src"),
        (arr_dot_k(F.col("f"), sf, k)).alias("fusf"),
        (arr_dot_k(F.col("f"), F.col("f"), k)).alias("fufu"),
    )
    total = (
        per_node_edge.join(fu_terms, "src")
        .select((F.col("nbr_term") - F.col("fusf") + F.col("fufu")).alias("llh_u"))
        .agg(F.sum("llh_u").alias("llh"))
        .collect()[0]["llh"]
    )
    return float(total)


def gradient_state(
    sym_edges: DataFrame,
    factors: DataFrame,
    sumf: list[float],
    edge_fv: DataFrame | None = None,
) -> DataFrame:
    """F2: per-node optimizer state ``(node_id, fu, grad, llh_u)`` —
    the reference's ``result1`` (v2:121-133) without the driver
    round-trip.

    The weighted neighbor sum Σ fv/(1−p̂) is computed in the LONG
    layout (posexplode → groupBy(node, k)) so no executor ever holds
    a deg(u)×K blob: rows stay K doubles wide, partial aggregation
    happens map-side, and hub nodes parallelize across k.

    ``edge_fv``: optional pre-materialized ``edge_fv_relation`` (the
    iteration loops build it once and share it with the line search).
    """
    k = len(sumf)
    ef = _edge_factors(sym_edges, factors, edge_fv=edge_fv)
    dot = arr_dot_k("fu", "fv", k)
    p = prob_hat(dot)
    per_edge = ef.select(
        "src",
        "fv",
        (F.log(1.0 - p) + dot).alias("term"),
        (1.0 / (1.0 - p)).alias("w"),
    )

    nbr_llh = per_edge.groupBy("src").agg(F.sum("term").alias("nbr_term"))
    wsum_long = (
        per_edge.select("src", "w", F.posexplode("fv").alias("pos", "val"))
        .groupBy("src", "pos")
        .agg(F.sum(F.col("w") * F.col("val")).alias("ws"))
    )
    wsum = wsum_long.groupBy("src").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "ws"))), lambda s: s["ws"]
        ).alias("wsum")
    )

    sf = arr_lit(sumf)
    fu = factors.select(F.col("node_id").alias("src"), F.col("f").alias("fu"))
    return (
        fu.join(nbr_llh, "src")
        .join(wsum, "src")
        .select(
            F.col("src").alias("node_id"),
            "fu",
            F.zip_with(
                F.zip_with("wsum", sf, lambda a, b: a - b), "fu", lambda a, b: a + b
            ).alias("grad"),
            (
                F.col("nbr_term")
                - arr_dot_k("fu", sf, k)
                + arr_dot_k("fu", "fu", k)
            ).alias("llh_u"),
        )
    )


# ---------------------------------------------------------------------------
# Line search + update (F3/F4)
# ---------------------------------------------------------------------------


def line_search_updates(
    sym_edges: DataFrame,
    factors: DataFrame,
    state: DataFrame,
    sumf: list[float],
    alpha: float = ALPHA,
    steps: list[float] | None = None,
    checkpoint_state: bool = True,
    quantize: int | None = None,
    edge_fv: DataFrame | None = None,
) -> DataFrame:
    """F3: batched backtracking line search (v2:136-146) →
    ``(node_id, eta, fu_old, f_new)`` for nodes with ≥1 accepted step.

    ``quantize``: round both sides of the Armijo comparison to N
    decimals first — used ONLY by the oracle twin (cross-engine float
    fold order can flip an accept at the last ulp); production runs
    compare exact same-engine floats (quantize=None).

    All 16 candidate steps are evaluated in ONE crossJoin job (the
    reference's cartesian trick, kept on purpose — SURVEY §4.1) with
    the step list broadcast. Candidate local LLH re-joins the
    neighbors' CURRENT factors; sumF is adjusted per candidate as
    sumF − fu + newfu exactly like v2:142.
    """
    spark = sym_edges.sparkSession
    steps = steps or LINE_SEARCH_STEPS
    steps_df = spark.createDataFrame([(float(s),) for s in steps], "eta double")

    # The gradient state feeds BOTH the candidate fan-out and the
    # accept-join below; materialize it once or the whole
    # gradient pipeline (two shuffle aggregations) re-executes per
    # reference — measured as a 50× per-iteration blowup on the G1
    # fixture once AQE replans the duplicated subtrees. Callers that
    # already checkpointed (the fit loop, which must unpersist it
    # afterwards) pass checkpoint_state=False.
    if checkpoint_state:
        state = checkpoint_fresh(state)

    sf = arr_lit(sumf)
    cand = (
        state.crossJoin(F.broadcast(steps_df))
        .select(
            "node_id",
            "fu",
            "grad",
            "llh_u",
            "eta",
            arr_clamp(
                F.zip_with("fu", "grad", lambda a, b: a + F.col("eta") * b),
                MIN_F,
                MAX_F,
            ).alias("newfu"),
        )
    )

    if edge_fv is None:
        edge_fv = edge_fv_relation(sym_edges, factors)
    k = len(sumf)
    # The unrolled single-pass shape materializes |steps|·K element
    # expressions per edge row; past ~512 of them the expression-tree
    # bookkeeping and codegen (Janino method splitting) eat the win —
    # the dense K=100 v2 regime and anything larger keep the fan-out
    # join (same results, measured-equal plans at those widths).
    if k * len(steps) <= 4 * UNROLL_MAX_K:
        # OPTIMIZATION r13 (guide §2.3 — shuffle fewer rows/bytes):
        # the old shape materialized the 16·N candidate table and
        # joined it against edge_fv into a 16·E-row relation before
        # aggregating. All 16 candidate neighbor terms are pure
        # per-edge expressions of (fu, grad, fv, η) with driver-known
        # η and K, so compute them UNROLLED in one E-row pass
        # (edge_fv ⋈ state on src — the N-row state side broadcasts)
        # and aggregate 16 sums per node instead of one sum per
        # (node, η) over 16× the rows. Per-(edge, η) arithmetic is
        # the IDENTICAL expression tree (element-wise clamp + dot +
        # log), so each term is bit-identical to the old plan's; only
        # the hash-agg fold order differs, which is the same
        # cross-engine class the quantized Armijo accept already
        # absorbs. 16·E-row join + 16·E-row shuffle → E-row narrow
        # pass + N×16 shuffle. Falls back to the fan-out join above
        # UNROLL_MAX_K (that regime runs bigclam_long anyway).
        st = state.select(
            F.col("node_id").alias("src"),
            F.col("fu").alias("_fu"),
            F.col("grad").alias("_gr"),
        )

        def _cterm(eta_val: float) -> Column:
            fu, gr, fv = F.col("_fu"), F.col("_gr"), F.col("fv")
            cdot = None
            for j in range(k):
                nf = F.least(
                    F.greatest(fu[j] + F.lit(eta_val) * gr[j], F.lit(MIN_F)),
                    F.lit(MAX_F),
                )
                term = nf * fv[j]
                cdot = term if cdot is None else cdot + term
            return F.log(1.0 - prob_hat(cdot)) + cdot

        per_edge = edge_fv.join(st, "src").select(
            "src", *[_cterm(float(s)).alias(f"_t{i}") for i, s in enumerate(steps)]
        )
        agg_nbr = per_edge.groupBy("src").agg(
            *[F.sum(f"_t{i}").alias(f"_s{i}") for i in range(len(steps))]
        )
        cand_nbr = agg_nbr.select(
            "src",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(float(s)).alias("eta"),
                            F.col(f"_s{i}").alias("nbr_term"),
                        )
                        for i, s in enumerate(steps)
                    ]
                )
            ).alias("_en"),
        ).select(
            "src",
            F.col("_en.eta").alias("eta"),
            F.col("_en.nbr_term").alias("nbr_term"),
        )
    else:
        cand_edges = cand.select(
            F.col("node_id").alias("src"), "eta", "newfu"
        ).join(edge_fv, "src")
        cdot = arr_dot_k("newfu", "fv", k)
        cterm = F.log(1.0 - prob_hat(cdot)) + cdot
        cand_nbr = cand_edges.groupBy("src", "eta").agg(
            F.sum(cterm).alias("nbr_term")
        )

    # newsf = sumF − fu + newfu (v2:142); accept iff candidate local
    # LLH ≥ llh_u + α·η·‖grad‖² (v2:145).
    newsf = F.zip_with(
        F.zip_with(sf, "fu", lambda a, b: a - b), "newfu", lambda a, b: a + b
    )
    cand_llh = (
        cand.withColumnRenamed("node_id", "src")
        .join(cand_nbr, ["src", "eta"])
        .select(
            "src",
            "eta",
            "fu",
            "grad",
            "newfu",
            (
                F.col("nbr_term")
                - arr_dot_k(F.col("newfu"), newsf, k)
                + arr_dot_k("newfu", "newfu", k)
            ).alias("cand_llh"),
            (F.col("llh_u") + F.lit(alpha) * F.col("eta") * arr_dot_k("grad", "grad", k)).alias(
                "threshold"
            ),
        )
    )
    if quantize is not None:
        accepted = cand_llh.where(
            F.round(F.col("cand_llh"), quantize) >= F.round(F.col("threshold"), quantize)
        )
    else:
        accepted = cand_llh.where(F.col("cand_llh") >= F.col("threshold"))
    # D9: per-node max accepted step; groupBy.agg(max_by) gives partial
    # aggregation (the reference's groupByKey materializes all — §4.3.2).
    best = accepted.groupBy("src").agg(
        F.max("eta").alias("eta"),
        F.max_by(F.struct("fu", "newfu"), "eta").alias("b"),
    )
    return best.select(
        F.col("src").alias("node_id"),
        "eta",
        F.col("b.fu").alias("fu_old"),
        F.col("b.newfu").alias("f_new"),
    )


def apply_updates(factors: DataFrame, updates: DataFrame) -> DataFrame:
    """F4: F ← (F anti⟕ updated) ∪ new rows (v2:152, via left_anti
    instead of the reference's driver-collected ``contains`` set)."""
    new_rows = updates.select("node_id", F.col("f_new").alias("f"))
    return factors.join(updates.select("node_id"), "node_id", "left_anti").unionByName(
        new_rows
    )


# ---------------------------------------------------------------------------
# Convergence loop (F5) and model selection (F6)
# ---------------------------------------------------------------------------


@dataclass
class FitResult:
    factors: DataFrame
    sumf: list[float]
    llh: float
    iterations: int
    history: list[float] = field(default_factory=list)


def bigclam_fit(
    sym_edges: DataFrame,
    k: int,
    seed: int = 42,
    tol: float = 1e-4,
    max_iter: int = 100,
    include_self: bool = True,
    factors0: DataFrame | None = None,
    seeds_ranked: DataFrame | None = None,
    verbose: bool = False,
) -> FitResult:
    """F5: full-batch projected-gradient-ascent loop (the reference's
    «MBSGD», which despite the name updates ALL vertices each round —
    v2:209, SURVEY §2.F5) until |1 − LLH_new/LLH_old| < tol.

    Per-iteration job structure (round 1 ran ~6 multi-stage shuffle
    pipelines per iteration and leaked every intermediate checkpoint —
    disqualifying overhead): gradient-state checkpoint → ONE tiny agg
    over the checkpointed state for the LLH (Σ llh_u over the state's
    per-node terms equals edge_term − sumF·sumF + Σ‖fu‖² exactly —
    the gradient join already computed every per-node piece, so the
    separate edge-LLH join job is eliminated) → line-search
    checkpoint → count (trivial scan of the checkpointed blocks, no
    recompute — replaces round 1's separate ``isEmpty``) → anti∪new
    factor rewrite → sumF collect. The LLH of a new factor generation
    is observed at the TOP of the next iteration (same comparisons as
    the reference's post-update check, evaluated lazily); only a
    max_iter exhaustion pays one final standalone LLH job. Every
    checkpoint generation is unpersisted when superseded.
    """

    def _self_dot(xs: list[float]) -> float:
        return float(sum(x * x for x in xs))

    sym_edges = sym_edges.cache()
    factors = factors0 if factors0 is not None else init_factors(
        sym_edges, k, seed=seed, include_self=include_self, seeds_ranked=seeds_ranked
    )
    factors = checkpoint_fresh(factors)
    sumf = sum_f(factors)
    llh_old: float | None = None
    history: list[float] = []

    import time as _time

    it = 0
    converged = False
    for it in range(1, max_iter + 1):
        t0 = _time.perf_counter()
        # Per-iteration shared relation: edges⋈fv, consumed by BOTH the
        # gradient pipeline and the line-search fan-out (r9 verdict #2).
        edge_fv = checkpoint_fresh(edge_fv_relation(sym_edges, factors))
        state = checkpoint_fresh(
            gradient_state(sym_edges, factors, sumf, edge_fv=edge_fv)
        )
        row = state.agg(F.sum("llh_u").alias("llh")).collect()[0]
        llh_new = float(row["llh"]) if row["llh"] is not None else 0.0
        history.append(llh_new)
        if verbose:
            print(
                f"[bigclam_fit] iter={it} llh={llh_new:.6f} "
                f"rel={abs(1.0 - llh_new / llh_old) if llh_old else float('nan'):.3e} "
                f"wall={_time.perf_counter() - t0:.2f}s",
                flush=True,
            )
        if llh_old is not None and llh_old != 0 and abs(1.0 - llh_new / llh_old) < tol:
            llh_old = llh_new
            _unpersist_ckpt(edge_fv)
            _unpersist_ckpt(state)
            converged = True
            break
        llh_old = llh_new
        updates = checkpoint_fresh(
            line_search_updates(
                sym_edges, factors, state, sumf, checkpoint_state=False, edge_fv=edge_fv
            )
        )
        _unpersist_ckpt(edge_fv)
        n_updated = updates.count()
        if n_updated == 0:
            _unpersist_ckpt(state)
            _unpersist_ckpt(updates)
            converged = True
            break
        prev = factors
        factors = checkpoint_fresh(apply_updates(factors, updates))
        _unpersist_ckpt(prev)
        _unpersist_ckpt(state)
        _unpersist_ckpt(updates)
        sumf = sum_f(factors)
    if not converged:
        # max_iter exhausted right after applying an update: one final
        # LLH job for the returned generation.
        sumf_sq, fufu = sum_f_and_sq(factors)
        llh_old = edge_llh_term(sym_edges, factors) - _self_dot(sumf_sq) + fufu
        history.append(llh_old)
    return FitResult(factors=factors, sumf=sumf, llh=llh_old, iterations=it, history=history)


def geometric_k_grid(min_com: int, max_com: int, div_com: int) -> list[int]:
    """F6 grid (v47:116-133): geometric spacing min→max, integerized
    with +1 bumps on collisions, end capped at max_com.

    Scala parity: ``maxCom/minCom`` at v47:116 is Int/Int — INTEGER
    division — so the ratio is floored before the log (visible only
    when min_com doesn't divide max_com). The pasted REPL grid at
    v47:268 is reproduced exactly by (50, 200, 15)."""
    gap = math.exp(math.log(max_com // min_com) / div_com)
    ks = [int(min_com)]
    x = int(min_com)
    while True:
        xt = int(x * gap)
        if xt == x:
            xt += 1
        x = xt
        if x >= max_com:
            break
        ks.append(x)
    ks.append(int(max_com))
    return ks


def model_selection(
    sym_edges: DataFrame,
    min_com: int,
    max_com: int,
    div_com: int,
    seed: int = 42,
    tol: float = 1e-3,
    fit_tol: float = 1e-4,
    max_iter: int = 50,
) -> tuple[int, dict[int, float]]:
    """F6 (v47:244-266): fit each K in the geometric grid; stop at the
    first K whose relative LLH gain over the previous K is < tol;
    return (chosen K, {K: LLH}). The conductance seed ranking is
    computed ONCE and reused across K (the reference does the same
    via its broadcast ``Sbc``, v47:75). The reference's
    ``LLHKold == null`` first-point guard is dead code (Double never
    null, SURVEY §2.F6 ⚠) — we use an explicit first-point branch.
    """
    sym_edges = sym_edges.cache()
    seeds_ranked = G.local_min_seeds(sym_edges, G.ego_conductance(sym_edges)).cache()
    llh_by_k: dict[int, float] = {}
    llh_prev: float | None = None
    chosen = 0
    for k in geometric_k_grid(min_com, max_com, div_com):
        res = bigclam_fit(
            sym_edges, k, seed=seed, tol=fit_tol, max_iter=max_iter,
            seeds_ranked=seeds_ranked,
        )
        llh_by_k[k] = res.llh
        if llh_prev is not None and (1.0 - res.llh / llh_prev) < tol:
            chosen = k
            break
        llh_prev = res.llh
        chosen = k
    return chosen, llh_by_k


# ---------------------------------------------------------------------------
# Community extraction + inversion (F7/F8)
# ---------------------------------------------------------------------------


def extraction_threshold(n_vertices: int, n_undirected_edges: int) -> float:
    """F7 δ: ε = 2|E|/(N(N−1)) background edge probability, δ =
    √(−ln(1−ε)) (paper intent). The reference's v2:223 counts
    vertices-having-edges instead of edges (GraphX collectEdges
    returns a vertex-keyed RDD — SURVEY §2.F7 ⚠); we implement the
    intent and keep this helper pure so either input can be fed."""
    eps = 2.0 * n_undirected_edges / (n_vertices * (n_vertices - 1))
    return math.sqrt(-math.log(1.0 - eps))


def extract_communities(factors: DataFrame, delta: float) -> DataFrame:
    """F7 membership (v2:226-229): u ∈ c iff F_uc ≥ δ; if max_c F_uc
    < δ, u joins every argmax community (the reference's `value ==
    Fmax` keeps ties — preserved). Returns ``(community, node_id)``."""
    exploded = factors.select(
        "node_id",
        F.array_max("f").alias("fmax"),
        F.posexplode("f").alias("community", "val"),
    )
    keep = F.when(F.col("fmax") < F.lit(delta), F.col("val") == F.col("fmax")).otherwise(
        F.col("val") >= F.lit(delta)
    )
    return exploded.where(keep).select("community", "node_id")


def invert_communities(communities: DataFrame) -> DataFrame:
    """F8: (community → sorted member array) — the reference's
    groupByKey + saveAsTextFile sink (v2:230) as a proper grouped
    aggregation; write with ``df.write.parquet`` downstream."""
    return communities.groupBy("community").agg(
        F.array_sort(F.collect_list("node_id")).alias("members")
    )


def save_communities_text(inverted: DataFrame, path: str) -> None:
    """A3 text-format sink twin of the reference's ``saveAsTextFile``
    (codes/Bigclamv2.scala:230): one line per community,
    ``community<TAB>m1,m2,...``, written distributed via the text
    datasource (no driver collect). Parquet remains the primary sink
    (bigclam_pipeline); this closes the text-output parity delta."""
    inverted.select(
        F.concat_ws(
            "\t",
            F.col("community").cast("string"),
            F.array_join(F.transform("members", lambda x: x.cast("string")), ","),
        ).alias("value")
    ).write.mode("overwrite").text(path)


def bigclam_pipeline(
    spark,
    edge_path: str,
    k: int = 10,
    seed: int = 42,
    tol: float = 1e-4,
    max_iter: int = 50,
    out_path: str | None = None,
    include_self: bool = True,
    verbose: bool = False,
) -> tuple[DataFrame, FitResult]:
    """The reference's complete v2 flow (codes/Bigclamv2.scala:14-230):
    edge-list scan (A1) → symmetrize (B1) → conductance seeding
    (B6/B7) → F init (C1-C3) → optimize (F1-F5) → community extraction
    (F7) → inversion (F8) → parquet sink + re-read (A3).

    Sanity target (BASELINE.md): facebook_combined at K≈10 converges
    in minutes on a local session — measured ~6 s/iteration on
    local[32], rel ΔLLH < 2e-3 by iteration 8.

    Returns (inverted communities DataFrame, FitResult). When
    ``out_path`` is given the communities are round-tripped through
    the parquet sink, so the returned DataFrame reads from storage.
    """
    from bigclam_apachespark_spark.operators import graph as G2
    from bigclam_apachespark_spark.sources.edgelist import read_edge_list

    edges = read_edge_list(spark, edge_path)
    sym = G2.symmetrize(edges).cache()
    res = bigclam_fit(
        sym, k=k, seed=seed, tol=tol, max_iter=max_iter,
        include_self=include_self, verbose=verbose,
    )
    n_v = G2.vertices(sym).count()
    n_e = sym.count() // 2
    delta = extraction_threshold(n_v, n_e)
    inv = invert_communities(extract_communities(res.factors, delta))
    if out_path is not None:
        inv.write.mode("overwrite").parquet(out_path)
        inv = spark.read.parquet(out_path)
    return inv, res
