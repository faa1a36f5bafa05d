"""Query registry: every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable plus its DuckDB oracle SQL.

This is the single source of truth consumed by __spark_entry__.py
(driver correctness gate), bench.py (timing loop), and tests.

Column-name discipline: the driver sorts columns by name before
hashing values, so every computed column is aliased identically in
the Spark plan and the oracle SQL.

Oracle-authoring rule (unrolled-CTE chains): any step CTE of an
unrolled iteration (s0→s1→…, v0→v1→…, emb0→emb1→…) that is
referenced more than once MUST be born ``AS MATERIALIZED`` — DuckDB
inlines plain CTEs per reference, so a chain whose steps are each
read twice re-derives the whole prefix 2^L times (the
``graph_walk_pmi`` sweep spilled >80 GB of temp before its steps
were MATERIALIZED — PERFORMANCE.md round-9 close). Enforced by
``tests/test_rotation.py::test_unrolled_cte_chains_are_materialized``
over every entry in ORACLE.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigclam_apachespark_spark.operators import graph as G
from bigclam_apachespark_spark.sources import (
    copurchase_edges,
    customer_supplier_edges,
    edges_from_pairs,
    read_edge_list,
)
from bigclam_apachespark_spark.sqlfrag import (
    CONDUCTANCE_SQL,
    EDGES_CS_SQL,
    EDGES_SQL,
    SEEDS_SQL,
    SYM_SQL,
    modularity_tail_sql,
)

# ---------------------------------------------------------------------------
# Shared SQL fragments (DuckDB side). The driver pre-registers views for
# the parquet tables; graph views are derived inline per FIXTURES.md §5.
# ---------------------------------------------------------------------------

def _sym(spark: SparkSession, sf_dir: str) -> DataFrame:
    # copurchase_edges is symmetric, src<>dst, and distinct by
    # construction, so symmetrize's union+distinct would be a no-op
    # costing one full extra shuffle — skip it. (B1 symmetrize itself
    # is oracle-exercised on the bipartite graph: graph_symmetrize_cs.)
    #
    # OPTIMIZATION r13: session-pooled (shared.shared_sym) — ~40
    # registry queries consume this relation per suite pass, and the
    # BigCLAM registry's plan-keyed `.cache()` was already sharing it
    # with them implicitly from whichever kernel query ran first; the
    # pool makes the persist explicit, charged to the first consumer,
    # and released at suite teardown (bench release_all()).
    from bigclam_apachespark_spark.shared import shared_sym

    return shared_sym(spark, sf_dir)


# ---------------------------------------------------------------------------
# Query callables (Spark side)
# ---------------------------------------------------------------------------


def q_copurchase_edges(spark, sf_dir):
    """A1-analog source derivation: co-purchase part graph."""
    return copurchase_edges(spark, sf_dir)


# The reference's own shipped dataset (codes/Bigclamv2.scala:14 loads
# edge-list text via GraphLoader.edgeListFile). facebook_combined is
# space-separated with no comments; the '#'-comment + CRLF + tab path
# (Email-Enron) is covered by tests/test_graph.py unit fixtures.
FACEBOOK_EDGES = "/root/reference/data/facebook_combined.txt"

# A2 fixture pairs (FIXTURES.md §2: two 4-cliques + bridge).
G1_PAIRS = [
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7),
    (3, 4),
]


def q_edge_list_scan(spark, sf_dir):
    """A1: whitespace edge-list text scan (GraphLoader.edgeListFile
    parity) on the reference's facebook_combined dataset."""
    return read_edge_list(spark, FACEBOOK_EDGES)


def q_parallelize_pairs(spark, sf_dir):
    """A2: driver-local collection → DataFrame (sc.parallelize parity,
    reference v2:18,85,114)."""
    return edges_from_pairs(spark, G1_PAIRS)


def q_symmetrize(spark, sf_dir):
    """B1 on the bipartite customer-supplier graph (exercises reversal)."""
    return G.symmetrize(customer_supplier_edges(spark, sf_dir))


def q_degrees(spark, sf_dir):
    """B5 per-node degree."""
    return G.degrees(_sym(spark, sf_dir))


def q_total_volume(spark, sf_dir):
    """B5 global: sum of degrees = 2|E|."""
    return G.degrees(_sym(spark, sf_dir)).agg(F.sum("degree").alias("sdeg"))


def q_neighbors(spark, sf_dir):
    """B3 neighbor lists, stringified for cross-engine hashing."""
    nb = G.neighbor_lists(_sym(spark, sf_dir))
    return nb.select(
        "id",
        F.array_join(F.transform("nbrs", lambda x: x.cast("string")), ",").alias("nbrs_csv"),
        F.size("nbrs").alias("n_nbrs"),
    )


def q_ego_nets(spark, sf_dir):
    """B4 ego nets, stringified."""
    ego = G.ego_nets(G.neighbor_lists(_sym(spark, sf_dir)))
    return ego.select(
        "id",
        F.array_join(F.transform("members", lambda x: x.cast("string")), ",").alias("members_csv"),
        F.size("members").alias("n_members"),
    )


def q_conductance(spark, sf_dir):
    """B6 flagship: per-node ego-net conductance."""
    return G.ego_conductance(_sym(spark, sf_dir))


def q_conductance_pairs(spark, sf_dir):
    """B6 skew variant (fixed-width pair rows, AQE-splittable): must
    produce EXACTLY graph_conductance's numbers — registered against
    the SAME oracle SQL so the variant cannot silently drift."""
    return G.ego_conductance_pairs(_sym(spark, sf_dir))


def q_seeds(spark, sf_dir):
    """B7 locally-minimal seed ranking (intent semantics)."""
    sym = _sym(spark, sf_dir)
    return G.local_min_seeds(sym, G.ego_conductance(sym))


def q_seed_top20(spark, sf_dir):
    """D14: top-20 of the ranked seed list."""
    sym = _sym(spark, sf_dir)
    return G.top_k_seeds(G.local_min_seeds(sym, G.ego_conductance(sym)), 20)


def q_vertex_count(spark, sf_dir):
    """B8 graph sizes."""
    sym = _sym(spark, sf_dir)
    return G.vertices(sym).agg(F.count("*").alias("n_vertices"))


def q_triangles(spark, sf_dir):
    """Per-node triangle counts (compact-forward enumeration) —
    extension of the graph substrate beyond reference parity."""
    return G.triangle_counts(_sym(spark, sf_dir))


def q_clustering(spark, sf_dir):
    """Local clustering coefficients (exact integers + one IEEE
    division, bit-stable cross-engine)."""
    return G.clustering_coefficients(_sym(spark, sf_dir))


def q_pagerank(spark, sf_dir):
    """Fixed-5-iteration PageRank (mean-1 normalization)."""
    return G.pagerank(_sym(spark, sf_dir), n_iter=5)


def q_pagerank_weighted(spark, sf_dir):
    """Edge-weighted PageRank over the support-thresholded
    co-purchase graph (ranks by co-purchase strength); shared-pool
    wedges (consumed by every one of the 5 unrolled iterations)."""
    from bigclam_apachespark_spark.shared import shared_wedges

    return G.pagerank_weighted(shared_wedges(spark, sf_dir), n_iter=5)


def q_louvain_move(spark, sf_dir):
    """Louvain phase-1 first sweep over the weighted co-purchase
    graph (one synchronous modularity-gain move from singletons —
    the greedy kernel full Louvain iterates; exact-integer gain
    numerators, deterministic ties). ``wedges`` comes from the
    session-shared pool: five registry queries consume the lineitem →
    basket → pair derivation in a suite pass (VERDICT r8 ask #6)."""
    from bigclam_apachespark_spark.shared import shared_wedges

    return G.louvain_one_move(shared_wedges(spark, sf_dir))


def q_louvain_coarsen(spark, sf_dir):
    """Louvain phase 2 composed on phase 1: the weighted co-purchase
    graph coarsened by the first sweep's labels — the level-1
    super-graph (self-loops carry intra-community weight). Checks the
    phase-1 → phase-2 composition end to end. ``wedges`` comes cached
    from the session-shared pool: the move consumes it from three
    subtrees and the coarsen join from two more — uncached, the
    lineitem → basket → pair derivation re-executes per consumer."""
    from bigclam_apachespark_spark.shared import shared_wedges

    wedges = shared_wedges(spark, sf_dir)
    labels = G.louvain_one_move(wedges).select("id", "label")
    return G.community_coarsen(wedges, labels)


def q_louvain_two_levels(spark, sf_dir):
    """Unrolled two-level Louvain (VERDICT r8 ask #2): downhill
    phase-1 sweep → coarsen → downhill sweep on the coarsened graph,
    node-level final labels + the level-2 decision numerator — the
    composed-fixture counterpart of the two kernel oracles, exactly
    the ``bigclam_two_iterations`` pattern (each kernel oracle-green
    alone, the chained composition hash-checked end to end so
    level-to-level drift cannot hide)."""
    from bigclam_apachespark_spark.shared import shared_wedges

    return G.louvain_two_levels(shared_wedges(spark, sf_dir))


def q_louvain_move_general(spark, sf_dir):
    """General-partition Louvain move (VERDICT r8 ask #8): the Σ_tot
    gain formula evaluated on the level-1 downhill partition of the
    weighted co-purchase graph — a genuinely non-singleton partition,
    so the own-community attachment and Σ_tot(D∖{i}) terms are live
    (on singletons the kernel reduces to ``louvain_one_move``, which
    tests pin). Completes the kernel family: singleton move, general
    move, coarsen, each oracle-checked."""
    from bigclam_apachespark_spark.shared import shared_wedges

    wedges = shared_wedges(spark, sf_dir)
    labels = G.louvain_one_move(wedges, downhill_only=True).select(
        "id", "label"
    )
    return G.louvain_move_general(wedges, labels)


def q_modularity_weighted(spark, sf_dir):
    """Weighted Newman modularity of the level-1 downhill Louvain
    partition on the weighted co-purchase graph — the OBJECTIVE the
    Louvain family maximizes, scored by the exact-integer-numerator
    kernel (the unweighted ``graph_modularity`` twin with support
    weights live)."""
    from bigclam_apachespark_spark.shared import shared_wedges

    wedges = shared_wedges(spark, sf_dir)
    labels = G.louvain_one_move(wedges, downhill_only=True).select(
        "id", F.col("label").alias("lbl")
    )
    return G.modularity_weighted(wedges, labels)


def q_louvain_copurchase(spark, sf_dir):
    """Rows-only smoke: FULL Louvain on the weighted co-purchase
    graph, plateau-stopped on WEIGHTED modularity (the objective the
    move gains optimize) — the sf-scaled counterpart of the facebook
    smoke, proving the fit loop on the harness's own weighted graph.
    Emits ONE row: levels, community count, and final weighted Q."""
    from bigclam_apachespark_spark.shared import shared_wedges

    wedges = shared_wedges(spark, sf_dir)
    labels, n_levels = G.louvain_fit(
        wedges, max_levels=20, score_edges=wedges, tol=1e-4
    )
    lab = labels.select("id", F.col("label").alias("lbl"))
    return G.modularity_weighted(wedges, lab).select(
        F.lit(n_levels).cast("long").alias("n_levels"), "*"
    )


def q_louvain_facebook(spark, sf_dir):
    """Rows-only smoke: FULL Louvain (driver loop of the two
    oracle-checked kernels, downhill acceptance) on the reference's
    own facebook_combined graph, run to the structural fixpoint and
    scored by the SHARED ``modularity`` kernel — apples-to-apples
    with the LPA and BigCLAM quality rows (reference v2:14's
    dataset). Emits ONE row: levels, community count, and final Q."""
    edges = read_edge_list(spark, FACEBOOK_EDGES)
    sym = G.symmetrize(edges)
    wedges = sym.select("src", "dst", F.lit(1).cast("long").alias("support"))
    labels, n_levels = G.louvain_fit(wedges, max_levels=20, score_edges=sym)
    lab = labels.select("id", F.col("label").alias("lbl"))
    row = G.modularity(sym, lab).select(
        F.lit(n_levels).cast("long").alias("n_levels"), "*"
    )
    # Pinned invariant (r9 verdict ask #8): facebook_combined has
    # strong known community structure (the reference visualizes it;
    # canonical Louvain reports Q≈0.83 / ~16 communities — our
    # downhill-only plateau-stopped variant lands at Q≈0.69 / 6
    # communities over ~11 levels). The smoke now FAILS — via
    # raise_error inside the filter, which survives column pruning —
    # if the partition degrades outside a generous band around that,
    # or if the labeling stops being a valid full partition, instead
    # of merely returning a non-empty row.
    ok = (
        (F.col("q") > 0.55)
        & (F.col("q") < 0.95)
        & F.col("n_communities").between(3, 60)
        & (F.col("n_unlabeled") == 0)
        & (F.col("n_dup_labels") == 0)
    )
    return row.where(
        F.when(ok, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("facebook louvain invariant violated: q="),
                    F.col("q").cast("string"),
                    F.lit(" n_communities="),
                    F.col("n_communities").cast("string"),
                )
            )
        )
    )


def q_pagerank_personalized(spark, sf_dir):
    """Personalized PageRank: teleport mass on the id%97 seed cohort
    (a stable, hash-free ~1% sample of vertices)."""
    sym = _sym(spark, sf_dir)
    seeds = G.vertices(sym).where(F.col("id") % 97 == 0)
    return G.pagerank_personalized(sym, seeds, n_iter=5)


# One ANSI-portable SQL string executed VERBATIM by BOTH engines:
# Spark runs it with spark.sql() over temp views of the parquet
# tables, and the IDENTICAL string is registered as the DuckDB
# oracle — the SQL surface exercised first-class, with dialect
# portability itself under test (derived tables aliased, no
# engine-specific functions, COUNT(*) → BIGINT on both).
PORTABLE_DEGREE_HIST_SQL = """
WITH edges_g AS (
  SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
),
sym AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM edges_g
    UNION
    SELECT dst AS src, src AS dst FROM edges_g
  ) u WHERE src <> dst
),
deg AS (SELECT src AS id, COUNT(*) AS degree FROM sym GROUP BY src)
SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY degree
"""


def q_link_candidates(spark, sf_dir):
    """Common-neighbor link prediction (integer-exact score; ln-free
    by design — see operator docstring). The gate config uses the
    FOCUS-COHORT shape (recommendations for the id % 20 = 0 cohort):
    the whole-graph pair aggregation is Σ C(deg, 2) — quadratic in
    degree and measured 42 s at sf0.1 — while the cohort shape is
    linear in the cohort's neighborhood; the oracle mirrors it."""
    sym = _sym(spark, sf_dir)
    focus = G.vertices(sym).where(F.col("id") % 20 == 0)
    return G.common_neighbor_candidates(sym, min_common=20, focus=focus)


def q_bfs_hops(spark, sf_dir):
    """Bounded BFS hop distances from the id % 100 = 0 source cohort
    (the traversal primitive; frontier-expansion shape)."""
    sym = _sym(spark, sf_dir)
    sources = G.vertices(sym).where(F.col("id") % 100 == 0)
    return G.bfs_hops(sym, sources, max_hops=3)


def q_neighborhood_features(spark, sf_dir):
    """One-hop GNN-style neighborhood aggregation (degree profile):
    one edges-join-degrees join-agg, the message-passing primitive."""
    return G.neighborhood_features(_sym(spark, sf_dir))


def q_ktruss(spark, sf_dir):
    """30-truss of the co-purchase graph, peeled to a CERTIFIED
    fixpoint (edge-cohesion backbone, one rung above kcore).
    Measured fixpoints: round 3 at sf0.01, round 2 at sf0.1, round
    14 at sf0.001 (the smallest graph cascades SLOWEST to its empty
    k=30 truss — denser co-purchase projection; the r11 certificate
    caught exactly this when the plan sweep ran at sf0.001) — the
    result is EMPTY at all three scales, which is the honest answer
    for k=30; the non-trivial backbone lives in
    `graph_ktruss_backbone` (k=12). rounds=20 is the certificate
    budget, not the answer depth: the loop raises rather than
    truncate, and the oracle unrolls the same bound (converged
    rounds are no-ops — wedge joins over the emptied edge set — so
    the hash is unchanged from the rounds=3 record)."""
    return G.ktruss(_sym(spark, sf_dir), k=30, rounds=20)


def q_ktruss_backbone(spark, sf_dir):
    """12-truss of the co-purchase graph — the NON-TRIVIAL community
    backbone (1,127 edges at sf0.01, 9,790 at sf0.1; measured
    fixpoint round 5/3), peeled to a certified fixpoint with
    rounds=8 budget. Added in the r10 fixed-round kernel audit: the
    k=30 row converges but to the empty graph, so this is the row
    that actually exercises truss peeling's cascade on gate data."""
    return G.ktruss(_sym(spark, sf_dir), k=12, rounds=8)


def q_structural_similarity(spark, sf_dir):
    """SCAN edge structural similarity (closed-neighborhood overlap
    over the geometric degree mean) — the core/hub/outlier measure.
    Served from the session-shared pool (VERDICT r8 ask #3): the
    |E|^1.5 wedge join is built once per suite session and reused by
    ``graph_scan_clusters``."""
    from bigclam_apachespark_spark.shared import shared_sim

    return shared_sim(spark, sf_dir)


def q_scan_clusters(spark, sf_dir):
    """SCAN core clustering at (eps=0.16, mu=3) — the co-purchase
    graph is dense and homogeneous (sigma <= 0.23 everywhere), so
    the threshold sits at the ~97th percentile of edge similarity:
    only genuinely cohesive pockets survive as cores. The similarity
    relation comes from the session-shared pool via
    ``scan_clusters(sim=...)`` instead of recomputing the |E|^1.5
    wedge join (VERDICT r8 ask #3 — the same sharing move that took
    ``graph_louvain_coarsen`` 14.1 → 7.3 s)."""
    from bigclam_apachespark_spark.shared import shared_sim

    return G.scan_clusters(
        _sym(spark, sf_dir), eps=0.16, mu=3, sim=shared_sim(spark, sf_dir)
    )


def q_harmonic_sampled(spark, sf_dir):
    """Eppstein-Wang seed-sampled harmonic centrality, 3 bounded
    hops. The sample is the 16 SMALLEST ids of the id % 250 = 0
    cohort — a fixed sample size regardless of graph scale (the
    estimator needs s = O(log n / ε²) seeds, not a constant
    FRACTION; a mod-only cohort grows with the graph and turns the
    sampled estimate back into s× full BFS — measured 33 s vs 7 s
    at sf0.1). TakeOrdered on the tiny cohort relation, no global
    window."""
    sym = _sym(spark, sf_dir)
    seeds = (
        G.vertices(sym).where(F.col("id") % 250 == 0).orderBy("id").limit(16)
    )
    return G.harmonic_centrality_sampled(sym, seeds, max_hops=3)


def q_hits(spark, sf_dir):
    """HITS hubs/authorities, 3 mean-normalized rounds on the
    directed bipartite customer→supplier graph (buyers ranked by the
    suppliers they reach, suppliers by their buyers)."""
    return G.hits(customer_supplier_edges(spark, sf_dir), n_iter=3)


def q_sssp_weighted(spark, sf_dir):
    """Bounded weighted SSSP (4 Bellman-Ford rounds) from the
    src % 100 = 0 cohort over the support-weighted co-purchase
    graph. Edge cost = 1e6 div support (integer division on BOTH
    engines — strong ties are cheap to traverse), so every path sum
    is an exact integer and the min is bit-stable."""
    from bigclam_apachespark_spark.shared import shared_wedges

    w = shared_wedges(spark, sf_dir)
    costs = w.select(
        "src", "dst", F.expr("1000000 div support").cast("long").alias("cost")
    )
    sources = costs.select(F.col("src").alias("id")).distinct().where(
        F.col("id") % 100 == 0
    )
    return G.sssp_weighted(costs, sources, rounds=4)


def q_label_prop(spark, sf_dir):
    """Two synchronous LPA rounds on the co-purchase graph (identity
    init; deterministic mode-with-smallest-tie rule — exact unrolled
    oracle twin)."""
    return G.label_propagation(_sym(spark, sf_dir), rounds=2)


def q_modularity(spark, sf_dir):
    """Newman modularity of the 2-round LPA partition — the
    community-quality score, integer-numerator-exact."""
    sym = _sym(spark, sf_dir)
    return G.modularity(sym, G.label_propagation(sym, rounds=2))


PORTABLE_GROUPING_SETS_SQL = """
WITH e AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, day,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       CAST(GROUPING(day) AS INT) AS g_day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM e
GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())
"""


def q_sql_grouping_sets(spark, sf_dir):
    """GROUPING SETS parity, declared once in PORTABLE SQL and run
    VERBATIM on both engines (the sql_degree_hist pattern): four
    explicit aggregation grains in one pass with per-column GROUPING
    flags — the D-surface feature rollup/cube don't pin down (those
    are fixed lattices; GROUPING SETS is the general form), with
    NULL-placeholder and flag semantics cross-checked exactly.
    Money folds as integer cents."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(PORTABLE_GROUPING_SETS_SQL)


def q_sql_degree_hist(spark, sf_dir):
    """Degree histogram of the co-purchase graph, declared in pure
    SQL (spark.sql over a temp view; Catalyst plans it exactly like
    the DataFrame twin — same pushdown, same agg pipeline)."""
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(PORTABLE_DEGREE_HIST_SQL)


def q_kcore(spark, sf_dir):
    """k-core (k=80) of the co-purchase graph, peeled to a CERTIFIED
    fixpoint (measured: round 6 at sf0.01 AND sf0.1; rounds=8 is the
    certificate budget with margin — the loop raises rather than
    truncate, and the oracle unrolls the identical chain, where
    converged rounds are no-ops)."""
    return G.kcore(_sym(spark, sf_dir), k=80, rounds=8)


def q_assortativity(spark, sf_dir):
    """Degree assortativity (one-row Pearson r of endpoint degrees)."""
    return G.degree_assortativity(_sym(spark, sf_dir))


def q_components(spark, sf_dir):
    """Weakly connected components of the support-≥2 co-purchase
    graph (thresholding sparsifies ~30×, which keeps the oracle's
    transitive closure tractable and is the market-basket semantics
    anyway — support-1 pairs are coincidence)."""
    from bigclam_apachespark_spark.shared import shared_wedges

    return G.connected_components(shared_wedges(spark, sf_dir))


def q_betweenness(spark, sf_dir):
    """Seed-sampled hop-bounded Brandes (pivot cohort id % 1997 = 0,
    2 hops — the Bader-style pivot sampling plus the harmonic
    family's k-hop truncation; exact-integer σ, fixed-order δ folds.
    Gate config: the dense co-purchase graph reaches most of V in 3
    hops, so |S|·|DAG| made the 3-hop row 59 s at sf0.1 — 2 hops
    exercises the identical forward+backward machinery at honest
    cost; the hand tests cover depth-4 exactness)."""
    sym = _sym(spark, sf_dir)
    seeds = G.vertices(sym).where(F.col("id") % 1997 == 0)
    return G.betweenness_sampled(sym, seeds, max_hops=2)


def q_coreness(spark, sf_dir):
    """Full core decomposition: the h-index iteration RUN TO ITS
    CERTIFIED FIXPOINT (frontier-pruned; raises rather than return a
    non-converged table — the r10 fix after the convergence guard
    exposed the old 8-round unroll as an intermediate value at
    sf0.01). Oracle unrolls 48 rounds, past the measured fixpoint
    depth at both gate scales; tests assert the fixpoint equals the
    peel-based k-core at every k."""
    return G.coreness_hindex(_sym(spark, sf_dir))


def q_mis(spark, sf_dir):
    """Deterministic Luby MIS on the co-purchase graph, 8 unrolled
    rounds (converged rounds are no-ops; tests assert genuine
    maximality at the tested scales)."""
    return G.maximal_independent_set(_sym(spark, sf_dir), rounds=8)


def q_node2vec_walks(spark, sf_dir):
    """node2vec biased corpus (p=4 discourages returning, q=0.25
    favors outward DFS moves) — same start cohort and shape as the
    uniform walks, so the two corpora are directly comparable."""
    return G.node2vec_walks(
        _sym(spark, sf_dir), walk_len=4, n_walks=2, start_mod=23, p=4.0, q=0.25
    )


def q_walk_pmi(spark, sf_dir):
    """Top-30 walk-co-occurrence PMI pairs — the SGNS statistic of
    the DeepWalk corpus (embedding neighborhoods without SGD)."""
    return G.walk_cooccurrence_pmi(
        _sym(spark, sf_dir), walk_len=4, n_walks=2, start_mod=23, window=2, k=30
    )


def q_random_walks(spark, sf_dir):
    """Deterministic DeepWalk sampling corpus: 2 walks × 4 steps from
    the id % 23 = 0 start cohort of the co-purchase graph. The hash-
    argmin transitions replay identically on any engine — the oracle
    unrolls the same four join+struct-min steps. r13: the operator
    now eagerly localCheckpoints the edge relation once and each
    frontier level (the r12 verdict's plan-defect fix) — the earlier
    "ReuseExchange dedupes the sym subtree" claim was wrong in
    practice (committed r12 plans: 18 lineitem scans, 0
    ReusedExchange), and the lazy chain was O(walk_len²) scans. The
    r1-era "persist was 1.5× slower" reading measured a lazy
    .persist() of the full union, not per-level checkpoints."""
    return G.random_walks(_sym(spark, sf_dir), walk_len=4, n_walks=2, start_mod=23)


def q_random_walks_len16(spark, sf_dir):
    """The walk_len=16 corpus (r13): 16 frontier joins over the
    per-level-checkpointed chain — linear in walk_len since the r13
    materialization fix (the r12 lazy plan re-derived shared
    prefixes, O(walk_len²) scans, and could not afford this row).
    Sparser start cohort (id % 97) than the len-4 row so the DuckDB
    twin's 16 materialized steps stay cheap."""
    return G.random_walks(
        _sym(spark, sf_dir), walk_len=16, n_walks=2, start_mod=97
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "graph_copurchase_edges": q_copurchase_edges,
    "graph_edge_list_scan": q_edge_list_scan,
    "graph_parallelize_pairs": q_parallelize_pairs,
    "graph_symmetrize_cs": q_symmetrize,
    "graph_degrees": q_degrees,
    "graph_total_volume": q_total_volume,
    "graph_neighbors": q_neighbors,
    "graph_ego_nets": q_ego_nets,
    "graph_conductance": q_conductance,
    "graph_conductance_pairs": q_conductance_pairs,
    "graph_seeds": q_seeds,
    "graph_seed_top20": q_seed_top20,
    "graph_vertex_count": q_vertex_count,
    "graph_triangles": q_triangles,
    "graph_clustering": q_clustering,
    "graph_pagerank": q_pagerank,
    "graph_pagerank_personalized": q_pagerank_personalized,
    "graph_components": q_components,
    "graph_pagerank_weighted": q_pagerank_weighted,
    "graph_louvain_move": q_louvain_move,
    "graph_louvain_coarsen": q_louvain_coarsen,
    "graph_louvain_two_levels": q_louvain_two_levels,
    "graph_louvain_move_general": q_louvain_move_general,
    "graph_modularity_weighted": q_modularity_weighted,
    "graph_louvain_copurchase": q_louvain_copurchase,
    "graph_louvain_facebook": q_louvain_facebook,
    "graph_kcore": q_kcore,
    "graph_random_walks": q_random_walks,
    "graph_random_walks_len16": q_random_walks_len16,
    "graph_walk_pmi": q_walk_pmi,
    "graph_node2vec_walks": q_node2vec_walks,
    "graph_mis": q_mis,
    "graph_coreness": q_coreness,
    "graph_betweenness": q_betweenness,
    "graph_assortativity": q_assortativity,
    "sql_degree_hist": q_sql_degree_hist,
    "sql_grouping_sets": q_sql_grouping_sets,
    "graph_link_candidates": q_link_candidates,
    "graph_bfs_hops": q_bfs_hops,
    "graph_harmonic_sampled": q_harmonic_sampled,
    "graph_neighborhood_features": q_neighborhood_features,
    "graph_ktruss": q_ktruss,
    "graph_ktruss_backbone": q_ktruss_backbone,
    "graph_structural_similarity": q_structural_similarity,
    "graph_scan_clusters": q_scan_clusters,
    "graph_sssp_weighted": q_sssp_weighted,
    "graph_hits": q_hits,
    "graph_label_prop": q_label_prop,
    "graph_modularity": q_modularity,
}


def _lpa_cte(rounds: int = 2) -> str:
    """Unrolled synchronous-LPA CTE chain (MATERIALIZED rounds —
    DuckDB inlines CTEs, and each round references the previous
    twice); final labels are in ``l{rounds}``."""
    parts = ["l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS lbl FROM sym)"]
    for r in range(1, rounds + 1):
        parts.append(
            f"""n{r} AS MATERIALIZED (
  SELECT e.src AS id, l.lbl FROM sym e JOIN l{r - 1} l ON l.id = e.dst),
c{r} AS MATERIALIZED (
  SELECT id, lbl, COUNT(*) AS n FROM n{r} GROUP BY id, lbl),
l{r} AS MATERIALIZED (
  SELECT id, lbl FROM (
    SELECT id, lbl, ROW_NUMBER() OVER (PARTITION BY id ORDER BY n DESC, lbl) AS rn
    FROM c{r}) WHERE rn = 1)"""
        )
    return ",\n".join(parts)


def _lpa_sql(rounds: int = 2) -> str:
    return _lpa_cte(rounds) + f"\nSELECT id, lbl FROM l{rounds}"


def _modularity_sql(rounds: int = 2) -> str:
    """Modularity of the round-``rounds`` LPA partition (tail shared
    with the BigCLAM community-quality twin via sqlfrag)."""
    return _lpa_cte(rounds) + ",\n" + modularity_tail_sql(f"l{rounds}")


def _bfs_sql(rounds: int = 3, mod: int = 100) -> str:
    """Unrolled frontier-expansion BFS twin (MATERIALIZED rounds —
    same rationale as _kcore_sql: DuckDB inlines CTEs and the chain
    references each round multiple times)."""
    parts = [
        f"""d0 AS MATERIALIZED (
  SELECT DISTINCT src AS id, CAST(0 AS INT) AS hops FROM sym WHERE src % {mod} = 0),
f0 AS MATERIALIZED (SELECT id FROM d0)"""
    ]
    for h in range(1, rounds + 1):
        parts.append(
            f"""n{h} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS id FROM sym e JOIN f{h - 1} f ON f.id = e.src),
x{h} AS MATERIALIZED (
  SELECT n.id, CAST({h} AS INT) AS hops
  FROM n{h} n LEFT JOIN d{h - 1} d ON d.id = n.id WHERE d.id IS NULL),
d{h} AS MATERIALIZED (
  SELECT id, hops FROM d{h - 1} UNION ALL SELECT id, hops FROM x{h}),
f{h} AS MATERIALIZED (SELECT id FROM x{h})"""
        )
    return ",\n".join(parts) + f"\nSELECT id, hops FROM d{rounds}"


def _mbfs_sql(rounds: int = 3, mod: int = 250) -> str:
    """Unrolled MULTI-SOURCE labeled-BFS twin: (seed, id, d) state,
    same MATERIALIZED-round rationale as _bfs_sql. The harmonic sum
    is a FIXED-ORDER chain of count_d / d terms — exact integers
    into correctly-rounded divisions, never a float fold."""
    parts = [
        f"""md0 AS MATERIALIZED (
  SELECT seed, seed AS id, CAST(0 AS INT) AS d FROM (
    SELECT DISTINCT src AS seed FROM sym WHERE src % {mod} = 0
    ORDER BY seed LIMIT 16
  )),
mf0 AS MATERIALIZED (SELECT seed, id FROM md0)"""
    ]
    for h in range(1, rounds + 1):
        parts.append(
            f"""mn{h} AS MATERIALIZED (
  SELECT DISTINCT f.seed, e.dst AS id FROM sym e JOIN mf{h - 1} f ON f.id = e.src),
mx{h} AS MATERIALIZED (
  SELECT n.seed, n.id, CAST({h} AS INT) AS d
  FROM mn{h} n LEFT JOIN md{h - 1} p ON p.seed = n.seed AND p.id = n.id
  WHERE p.id IS NULL),
md{h} AS MATERIALIZED (
  SELECT seed, id, d FROM md{h - 1} UNION ALL SELECT seed, id, d FROM mx{h}),
mf{h} AS MATERIALIZED (SELECT seed, id FROM mx{h})"""
        )
    harmonic = " + ".join(
        f"CAST(SUM(CASE WHEN d = {h} THEN 1 ELSE 0 END) AS DOUBLE) / {float(h)}"
        for h in range(1, rounds + 1)
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT id, CAST(COUNT(*) AS BIGINT) AS n_reached,
       round({harmonic}, 6) AS harmonic
FROM md{rounds} WHERE d >= 1 GROUP BY id"""
    )


def _ktruss_sql(k: int = 4, rounds: int = 3) -> str:
    """Unrolled k-truss twin (MATERIALIZED rounds — same rationale
    as _kcore_sql): per round degrees → degree orientation → wedge
    join → canonical per-edge support → peel. Requires k ≥ 3 (the
    inner support join drops 0-support edges, which only matches
    the Spark filter when k−2 > 0). Final support recounted on the
    surviving edge set, 0-support rows kept via LEFT JOIN."""
    assert k >= 3

    def round_ctes(r: int) -> str:
        return f"""sym{r} AS MATERIALIZED (
  SELECT x AS src, y AS dst FROM und{r} UNION ALL SELECT y, x FROM und{r}),
deg{r} AS MATERIALIZED (SELECT src AS id, COUNT(*) AS d FROM sym{r} GROUP BY src),
ori{r} AS MATERIALIZED (
  SELECT s.src AS u, s.dst AS v FROM sym{r} s
  JOIN deg{r} a ON a.id = s.src JOIN deg{r} b ON b.id = s.dst
  WHERE a.d < b.d OR (a.d = b.d AND s.src < s.dst)),
tri{r} AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM ori{r} e1 JOIN ori{r} e2 ON e2.u = e1.v
  JOIN ori{r} e3 ON e3.u = e1.u AND e3.v = e2.v),
sup{r} AS MATERIALIZED (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT least(a, b) AS x, greatest(a, b) AS y FROM tri{r}
    UNION ALL SELECT least(b, c), greatest(b, c) FROM tri{r}
    UNION ALL SELECT least(a, c), greatest(a, c) FROM tri{r}
  ) GROUP BY x, y)"""

    parts = [
        """und0 AS MATERIALIZED (
  SELECT src AS x, dst AS y FROM sym WHERE src < dst)"""
    ]
    for r in range(rounds):
        parts.append(round_ctes(r))
        parts.append(
            f"""und{r + 1} AS MATERIALIZED (
  SELECT u.x, u.y FROM und{r} u
  JOIN sup{r} s ON s.x = u.x AND s.y = u.y WHERE s.c >= {k - 2})"""
        )
    parts.append(round_ctes(rounds))
    return (
        ",\n".join(parts)
        + f"""
SELECT u.x, u.y, CAST(COALESCE(s.c, 0) AS BIGINT) AS support
FROM und{rounds} u
LEFT JOIN sup{rounds} s ON s.x = u.x AND s.y = u.y"""
    )


def _hits_sql(rounds: int = 3) -> str:
    """Unrolled HITS twin over the bipartite edges_cs view
    (MATERIALIZED rounds; each round is two join-aggs + two
    mean-normalization scalars, exactly the Spark chain)."""
    parts = [
        """hh0 AS MATERIALIZED (
  SELECT DISTINCT src AS id, 1.0::DOUBLE AS s FROM edges_cs)"""
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""ar{k} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(h.s) AS s
  FROM edges_cs e JOIN hh{k - 1} h ON h.id = e.src GROUP BY e.dst),
am{k} AS MATERIALIZED (SELECT AVG(s) AS m FROM ar{k}),
aa{k} AS MATERIALIZED (
  SELECT id, s / m AS s FROM ar{k} CROSS JOIN am{k}),
hr{k} AS MATERIALIZED (
  SELECT e.src AS id, SUM(a.s) AS s
  FROM edges_cs e JOIN aa{k} a ON a.id = e.dst GROUP BY e.src),
hm{k} AS MATERIALIZED (SELECT AVG(s) AS m FROM hr{k}),
hh{k} AS MATERIALIZED (
  SELECT id, s / m AS s FROM hr{k} CROSS JOIN hm{k})"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT id, 'hub' AS role, round(s, 6) AS score FROM hh{rounds}
UNION ALL
SELECT id, 'authority' AS role, round(s, 6) AS score FROM aa{rounds}"""
    )


def _sssp_sql(rounds: int = 4, mod: int = 100) -> str:
    """Unrolled frontier Bellman-Ford twin over the weighted
    co-purchase graph (MATERIALIZED rounds — same rationale as
    _bfs_sql). Integer costs via DuckDB's // (exact twin of Spark's
    `div`)."""
    parts = [
        """costs AS MATERIALIZED (
  SELECT src, dst, 1000000 // support AS cost FROM wedges)""",
        f"""sd0 AS MATERIALIZED (
  SELECT DISTINCT src AS id, CAST(0 AS BIGINT) AS dist FROM costs
  WHERE src % {mod} = 0),
sf0 AS MATERIALIZED (SELECT id, dist FROM sd0)""",
    ]
    for h in range(1, rounds + 1):
        parts.append(
            f"""sc{h} AS MATERIALIZED (
  SELECT e.dst AS id, MIN(f.dist + e.cost) AS nd
  FROM costs e JOIN sf{h - 1} f ON f.id = e.src GROUP BY e.dst),
sx{h} AS MATERIALIZED (
  SELECT c.id, CAST(c.nd AS BIGINT) AS dist
  FROM sc{h} c LEFT JOIN sd{h - 1} d ON d.id = c.id
  WHERE d.id IS NULL OR c.nd < d.dist),
sd{h} AS MATERIALIZED (
  SELECT d.id, d.dist FROM sd{h - 1} d
  LEFT JOIN sx{h} x ON x.id = d.id WHERE x.id IS NULL
  UNION ALL SELECT id, dist FROM sx{h}),
sf{h} AS MATERIALIZED (SELECT id, dist FROM sx{h})"""
        )
    return ",\n".join(parts) + f"\nSELECT id, dist FROM sd{rounds}"


def _kcore_sql(k: int = 80, rounds: int = 8) -> str:
    """Unrolled bounded-round peeling chain (DuckDB twin of
    operators/graph.py kcore). Every round CTE is MATERIALIZED:
    DuckDB inlines CTEs by default and each round references the
    previous one 3× (edge list + both alive probes), so the inlined
    tree re-reads the base scan 3^rounds times — materialization
    makes the chain linear, exactly like the Spark side's
    localCheckpoint cadence."""
    parts = ["e0 AS MATERIALIZED (SELECT src, dst FROM sym)"]
    for i in range(rounds):
        parts.append(
            f"""a{i} AS MATERIALIZED (
  SELECT src AS id FROM e{i} GROUP BY src HAVING COUNT(*) >= {k}),
e{i + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i} e
  JOIN a{i} x ON x.id = e.src JOIN a{i} y ON y.id = e.dst
)"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS core_deg
FROM e{rounds} GROUP BY src HAVING COUNT(*) >= {k}"""
    )


# Support-thresholded weighted co-purchase edges (basket-set
# semantics: support counts ORDERS, so a part listed twice in one
# order counts that order once — matching the Spark collect_set).
_WEDGES_SQL = """
wedges AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS support FROM (
    SELECT DISTINCT l1.l_orderkey AS ok, l1.l_partkey AS src, l2.l_partkey AS dst
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
  ) GROUP BY src, dst HAVING COUNT(*) >= 2
)"""


# Louvain level-1 downhill sweep as a reusable CTE chain (labels in
# ``l1``): shared by the two-level composition and the general-move
# oracle so the level-1 semantics cannot fork between them.
_LOUVAIN_L1_CTES = """wdeg AS (
          SELECT src AS id, CAST(SUM(support) AS BIGINT) AS k
          FROM wedges GROUP BY src
        ),
        tm AS (SELECT CAST(SUM(k) AS BIGINT) AS two_m FROM wdeg),
        sc1 AS (
          SELECT w.src, w.dst,
                 CAST(t.two_m AS HUGEINT) * w.support
                   - CAST(a.k AS HUGEINT) * b.k AS gain
          FROM wedges w
          JOIN wdeg a ON a.id = w.src
          JOIN wdeg b ON b.id = w.dst
          CROSS JOIN tm t
          WHERE w.dst < w.src
        ),
        b1 AS (
          SELECT src, dst, gain FROM (
            SELECT src, dst, gain,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY gain DESC, dst) AS rn
            FROM sc1
          ) WHERE rn = 1
        ),
        l1 AS MATERIALIZED (
          SELECT d.id,
                 CASE WHEN b.gain > 0 THEN b.dst ELSE d.id END AS label
          FROM wdeg d LEFT JOIN b1 b ON b.src = d.id
        )"""

# Level-2 sweep on the coarsened graph (reads ``wedges`` + ``l1`` from
# scope; final labels+gain in ``l2``) — shared by the two-level oracle
# and the method-comparison readout so the semantics cannot fork.
_LOUVAIN_L2_CTES = """coarse AS MATERIALIZED (
          SELECT la.label AS src, lb.label AS dst,
                 CAST(SUM(w.support) AS BIGINT) AS support
          FROM wedges w
          JOIN l1 la ON la.id = w.src
          JOIN l1 lb ON lb.id = w.dst
          GROUP BY 1, 2
        ),
        wdeg2 AS (
          SELECT src AS id, CAST(SUM(support) AS BIGINT) AS k
          FROM coarse GROUP BY src
        ),
        tm2 AS (SELECT CAST(SUM(k) AS BIGINT) AS two_m FROM wdeg2),
        sc2 AS (
          SELECT c.src, c.dst,
                 CAST(t.two_m AS HUGEINT) * c.support
                   - CAST(a.k AS HUGEINT) * b.k AS gain
          FROM coarse c
          JOIN wdeg2 a ON a.id = c.src
          JOIN wdeg2 b ON b.id = c.dst
          CROSS JOIN tm2 t
          WHERE c.dst < c.src
        ),
        b2 AS (
          SELECT src, dst, gain FROM (
            SELECT src, dst, gain,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY gain DESC, dst) AS rn
            FROM sc2
          ) WHERE rn = 1
        ),
        l2 AS MATERIALIZED (
          SELECT d.id,
                 CASE WHEN b.gain > 0 THEN b.dst ELSE d.id END AS label,
                 CAST(COALESCE(b.gain, 0) AS BIGINT) AS level2_gain
          FROM wdeg2 d LEFT JOIN b2 b ON b.src = d.id
        )"""


def _pagerank_weighted_sql(n_iter: int = 5, d: float = 0.85) -> str:
    """Unrolled weighted-PageRank twin over wedges."""
    parts = [
        "wsum AS (SELECT src AS id, SUM(support) AS wtot FROM wedges GROUP BY src)",
        "verts AS (SELECT DISTINCT src AS id FROM wedges)",
        "pr0 AS (SELECT id, 1.0::DOUBLE AS r FROM verts)",
    ]
    for i in range(n_iter):
        parts.append(
            f"""pr{i + 1} AS (
  SELECT v.id, {1.0 - d} + {d} * COALESCE(s.m, 0) AS r
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id,
           SUM(p.r * CAST(e.support AS DOUBLE) / CAST(w.wtot AS DOUBLE)) AS m
    FROM wedges e JOIN pr{i} p ON p.id = e.src JOIN wsum w ON w.id = e.src
    GROUP BY e.dst
  ) s USING (id)
)"""
        )
    return ",\n".join(parts) + f"\nSELECT id, round(r, 6) AS rank FROM pr{n_iter}"


def _ppr_sql(n_iter: int = 5, d: float = 0.85, mod: int = 97) -> str:
    """Unrolled personalized-PageRank twin: teleport only on the
    id%mod seed cohort, (1−d)·N/|S| each — same fixed-k chain as
    _pagerank_sql with the teleport column replacing the constant."""
    parts = [
        "deg AS (SELECT src AS id, COUNT(*) AS degree FROM sym GROUP BY src)",
        "verts AS (SELECT DISTINCT src AS id FROM sym)",
        f"seeds AS (SELECT id FROM verts WHERE id % {mod} = 0)",
        "st AS (SELECT (SELECT COUNT(*) FROM verts) AS n_v, "
        "(SELECT COUNT(*) FROM seeds) AS n_s)",
        f"""tele AS (
  SELECT v.id,
         CASE WHEN sd.id IS NOT NULL
              THEN {1.0 - d} * (CAST(st.n_v AS DOUBLE) / CAST(st.n_s AS DOUBLE))
              ELSE 0.0 END AS tele
  FROM verts v LEFT JOIN seeds sd USING (id) CROSS JOIN st
)""",
        "pr0 AS (SELECT id, 1.0::DOUBLE AS r FROM verts)",
    ]
    for i in range(n_iter):
        parts.append(
            f"""pr{i + 1} AS (
  SELECT t.id, t.tele + {d} * COALESCE(s.m, 0) AS r
  FROM tele t LEFT JOIN (
    SELECT e.dst AS id, SUM(p.r / dg.degree) AS m
    FROM sym e JOIN pr{i} p ON p.id = e.src JOIN deg dg ON dg.id = e.src
    GROUP BY e.dst
  ) s USING (id)
)"""
        )
    return ",\n".join(parts) + f"\nSELECT id, round(r, 6) AS rank FROM pr{n_iter}"


def _pagerank_sql(n_iter: int = 5, d: float = 0.85) -> str:
    """Unrolled k-iteration PageRank CTE chain (DuckDB twin of
    operators/graph.py pagerank) — fixed k keeps the fixpoint
    deterministic on both engines; the final SELECT rounds."""
    parts = [
        "deg AS (SELECT src AS id, COUNT(*) AS degree FROM sym GROUP BY src)",
        "verts AS (SELECT DISTINCT src AS id FROM sym)",
        "pr0 AS (SELECT id, 1.0::DOUBLE AS r FROM verts)",
    ]
    for i in range(n_iter):
        parts.append(
            f"""pr{i + 1} AS (
  SELECT v.id, {1.0 - d} + {d} * COALESCE(s.m, 0) AS r
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id, SUM(p.r / dg.degree) AS m
    FROM sym e JOIN pr{i} p ON p.id = e.src JOIN deg dg ON dg.id = e.src
    GROUP BY e.dst
  ) s USING (id)
)"""
        )
    return ",\n".join(parts) + f"\nSELECT id, round(r, 6) AS rank FROM pr{n_iter}"

# Degree-ordered orientation + compact-forward triangle enumeration
# (DuckDB twin of operators/graph.py _oriented/triangle_counts).
_TRI_SQL = """
deg AS (SELECT src AS id, COUNT(*) AS degree FROM sym GROUP BY src),
o AS (
  SELECT s.src AS u, s.dst AS v
  FROM sym s JOIN deg a ON a.id = s.src JOIN deg b ON b.id = s.dst
  WHERE (a.degree < b.degree) OR (a.degree = b.degree AND s.src < s.dst)
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM o e1 JOIN o e2 ON e2.u = e1.v
  JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (SELECT unnest([a, b, c]) AS id FROM tri),
cnt AS (SELECT id, COUNT(*) AS n_tri FROM corners GROUP BY id),
verts AS (SELECT DISTINCT src AS id FROM sym)"""

ORACLE: dict[str, str] = {
    "graph_copurchase_edges": f"WITH {EDGES_SQL} SELECT src, dst FROM edges_g",
    "graph_edge_list_scan": f"""
        SELECT src, dst FROM read_csv('{FACEBOOK_EDGES}', delim=' ',
            header=false, columns={{'src': 'BIGINT', 'dst': 'BIGINT'}})
    """,
    "graph_parallelize_pairs": (
        "SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM (VALUES "
        + ", ".join(f"({s}, {d})" for s, d in G1_PAIRS)
        + ") AS t(src, dst)"
    ),
    "graph_symmetrize_cs": f"""
        WITH {EDGES_CS_SQL}
        SELECT src, dst FROM (
          SELECT src, dst FROM edges_cs
          UNION
          SELECT dst AS src, src AS dst FROM edges_cs
        ) WHERE src <> dst
    """,
    "graph_degrees": f"WITH {EDGES_SQL}, {SYM_SQL} SELECT src AS id, COUNT(*) AS degree FROM sym GROUP BY src",
    "graph_total_volume": f"WITH {EDGES_SQL}, {SYM_SQL} SELECT COUNT(*) AS sdeg FROM sym",
    "graph_neighbors": f"""
        WITH {EDGES_SQL}, {SYM_SQL}
        SELECT src AS id,
               STRING_AGG(CAST(dst AS VARCHAR), ',' ORDER BY dst) AS nbrs_csv,
               CAST(COUNT(*) AS INT) AS n_nbrs
        FROM sym GROUP BY src
    """,
    "graph_ego_nets": f"""
        WITH {EDGES_SQL}, {SYM_SQL},
        ego_pairs AS (
          SELECT src AS u, dst AS m FROM sym
          UNION
          SELECT DISTINCT src AS u, src AS m FROM sym
        )
        SELECT u AS id,
               STRING_AGG(CAST(m AS VARCHAR), ',' ORDER BY m) AS members_csv,
               CAST(COUNT(*) AS INT) AS n_members
        FROM ego_pairs GROUP BY u
    """,
    "graph_conductance": CONDUCTANCE_SQL,
    "graph_conductance_pairs": CONDUCTANCE_SQL,
    "graph_seeds": SEEDS_SQL,
    "graph_seed_top20": f"WITH ranked AS ({SEEDS_SQL}) SELECT id, phi FROM ranked ORDER BY phi, id LIMIT 20",
    "graph_vertex_count": f"""
        WITH {EDGES_SQL}, {SYM_SQL}
        SELECT COUNT(*) AS n_vertices FROM (SELECT DISTINCT src FROM sym)
    """,
    "graph_triangles": f"""
        WITH {EDGES_SQL}, {SYM_SQL}, {_TRI_SQL}
        SELECT v.id, CAST(COALESCE(c.n_tri, 0) AS BIGINT) AS n_tri
        FROM verts v LEFT JOIN cnt c USING (id)
    """,
    "graph_clustering": f"""
        WITH {EDGES_SQL}, {SYM_SQL}, {_TRI_SQL}
        SELECT d.id, d.degree,
               CAST(COALESCE(c.n_tri, 0) AS BIGINT) AS n_tri,
               round(CASE WHEN d.degree >= 2
                          THEN (2.0 * COALESCE(c.n_tri, 0))
                               / (d.degree * (d.degree - 1))
                          ELSE 0.0 END, 6) AS clustering
        FROM deg d LEFT JOIN cnt c USING (id)
    """,
    "graph_pagerank": f"WITH {EDGES_SQL}, {SYM_SQL},\n{_pagerank_sql(5)}",
    "graph_pagerank_personalized": f"WITH {EDGES_SQL}, {SYM_SQL},\n{_ppr_sql(5)}",
    # Components of the support-thresholded graph as a recursive
    # fixpoint (closure over the sparsified edge set; label = MIN
    # reachable id — Spark computes the same fixpoint iteratively via
    # the shared CC kernel).
    "graph_components": """
        WITH RECURSIVE wedges AS (
          -- support = number of ORDERS containing both parts (basket-
          -- set semantics: a part listed twice in one order still
          -- counts that order once), matching the collect_set basket
          -- formulation on the Spark side.
          SELECT src, dst FROM (
            SELECT DISTINCT l1.l_orderkey AS ok, l1.l_partkey AS src, l2.l_partkey AS dst
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
          ) GROUP BY src, dst HAVING COUNT(*) >= 2
        ),
        reach(u, r) AS (
          SELECT src, src FROM (SELECT DISTINCT src FROM wedges)
          UNION
          SELECT w.src, reach.r FROM wedges w JOIN reach ON reach.u = w.dst
        )
        SELECT u AS id, MIN(r) AS component FROM reach GROUP BY u
    """,
    "graph_pagerank_weighted": f"WITH {_WEDGES_SQL},\n{_pagerank_weighted_sql(5)}",
    # Louvain phase-1 first sweep: ΔQ for isolated i joining {j} has
    # sign(2m·w_ij − k_i·k_j) — all-integer numerators (wdeg/total
    # cast back to BIGINT: DuckDB SUM promotes to HUGEINT), argmax
    # ties to the smallest neighbor, stay-put decisions (gain ≤ 0)
    # reported too so the decision boundary itself is hash-checked.
    "graph_louvain_move": f"""
        WITH {_WEDGES_SQL},
        wdeg AS (
          SELECT src AS id, CAST(SUM(support) AS BIGINT) AS k
          FROM wedges GROUP BY src
        ),
        tm AS (SELECT CAST(SUM(k) AS BIGINT) AS two_m FROM wdeg),
        scored AS (
          SELECT w.src, w.dst, t.two_m * w.support - a.k * b.k AS gain
          FROM wedges w
          JOIN wdeg a ON a.id = w.src
          JOIN wdeg b ON b.id = w.dst
          CROSS JOIN tm t
        ),
        best AS (
          SELECT src, dst, gain FROM (
            SELECT src, dst, gain,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY gain DESC, dst) AS rn
            FROM scored
          ) WHERE rn = 1
        )
        SELECT src AS id,
               CASE WHEN gain > 0 THEN dst ELSE src END AS label,
               CAST(gain AS BIGINT) AS best_gain
        FROM best
    """,
    # Louvain phase 2 on phase 1's labels: endpoints map to their
    # communities, parallel edges merge by weight sum, self-loops
    # kept (intra-community weight for the next level's gains).
    "graph_louvain_coarsen": f"""
        WITH {_WEDGES_SQL},
        wdeg AS (
          SELECT src AS id, CAST(SUM(support) AS BIGINT) AS k
          FROM wedges GROUP BY src
        ),
        tm AS (SELECT CAST(SUM(k) AS BIGINT) AS two_m FROM wdeg),
        scored AS (
          SELECT w.src, w.dst, t.two_m * w.support - a.k * b.k AS gain
          FROM wedges w
          JOIN wdeg a ON a.id = w.src
          JOIN wdeg b ON b.id = w.dst
          CROSS JOIN tm t
        ),
        lbl AS (
          SELECT src AS id,
                 CASE WHEN gain > 0 THEN dst ELSE src END AS label
          FROM (
            SELECT src, dst, gain,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY gain DESC, dst) AS rn
            FROM scored
          ) WHERE rn = 1
        )
        SELECT la.label AS src, lb.label AS dst,
               CAST(SUM(w.support) AS BIGINT) AS support
        FROM wedges w
        JOIN lbl la ON la.id = w.src
        JOIN lbl lb ON lb.id = w.dst
        GROUP BY 1, 2
    """,
    # Unrolled two-level Louvain: downhill sweep (candidates restricted
    # to dst < src — the merge-correct symmetry breaking the composed
    # loop uses; see louvain_one_move) → coarsen → downhill sweep on
    # the coarsened graph (self-loops feed degrees/2m but are not
    # candidate moves; nodes with no downhill candidate stay put via
    # the LEFT JOIN, reported gain 0). Products in HUGEINT mirroring
    # the Spark side's decimal(38,0) upgrade (ADVICE r8); only the
    # reported numerator is cast back to BIGINT.
    "graph_louvain_two_levels": f"""
        WITH {_WEDGES_SQL},
        {_LOUVAIN_L1_CTES},
        {_LOUVAIN_L2_CTES}
        SELECT l1.id AS id, l2.label AS label, l2.level2_gain AS level2_gain
        FROM l1 JOIN l2 ON l2.id = l1.label
    """,
    # Weighted Newman modularity of the level-1 downhill partition:
    # integer numerators (W_in, D2 in HUGEINT, 2m), then the same two
    # IEEE divisions as the unweighted twin (modularity_tail_sql).
    "graph_modularity_weighted": f"""
        WITH {_WEDGES_SQL},
        {_LOUVAIN_L1_CTES},
        win AS (
          SELECT CAST(SUM(w.support) // 2 AS BIGINT) AS w_within
          FROM wedges w
          JOIN l1 a ON a.id = w.src
          JOIN l1 b ON b.id = w.dst
          WHERE a.label = b.label
        ),
        dcs AS (
          SELECT l.label AS lbl, SUM(d.k) AS dc
          FROM wdeg d JOIN l1 l ON l.id = d.id GROUP BY l.label
        ),
        comm AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
                 SUM(CAST(dc AS HUGEINT) * dc) AS d2
          FROM dcs
        ),
        mm AS (SELECT CAST(SUM(support) // 2 AS BIGINT) AS m FROM wedges),
        unl AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_unlabeled
          FROM (SELECT DISTINCT src AS id FROM wedges) v
          LEFT JOIN l1 l ON l.id = v.id WHERE l.id IS NULL
        ),
        dupl AS (
          SELECT CAST(COUNT(*) - COUNT(DISTINCT id) AS BIGINT) AS n_dup_labels
          FROM l1
        )
        SELECT n_communities, w_within, n_unlabeled, n_dup_labels,
               round(CAST(w_within AS DOUBLE) / CAST(m AS DOUBLE)
                     - CAST(d2 AS DOUBLE)
                       / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)), 6) AS q
        FROM win, comm, mm, unl, dupl
    """,
    # General-partition Louvain move (Blondel eq. 2 integerized):
    # score of i in community X is 2m·k_{i,X} − k_i·Σ_tot(X); gain of
    # moving D → C is s(C) − s(D∖{i}) with Σ_tot(D∖{i}) = Σ_tot(D) −
    # k_i. Runs on the level-1 downhill partition (shared l1 CTEs) —
    # a genuinely non-singleton partition, so the Σ_tot term is live.
    "graph_louvain_move_general": f"""
        WITH {_WEDGES_SQL},
        {_LOUVAIN_L1_CTES},
        sig AS (
          SELECT l.label AS c, CAST(SUM(d.k) AS BIGINT) AS sig
          FROM wdeg d JOIN l1 l ON l.id = d.id GROUP BY l.label
        ),
        kic AS (
          SELECT w.src, lj.label AS c, CAST(SUM(w.support) AS BIGINT) AS kix
          FROM wedges w JOIN l1 lj ON lj.id = w.dst
          WHERE w.src <> w.dst
          GROUP BY w.src, lj.label
        ),
        node AS (
          SELECT d.id, li.label AS ci, d.k,
                 COALESCE(o.kix, 0) AS kid,
                 s.sig - d.k AS sig_dp
          FROM wdeg d
          JOIN l1 li ON li.id = d.id
          LEFT JOIN kic o ON o.src = d.id AND o.c = li.label
          JOIN sig s ON s.c = li.label
        ),
        cand AS (
          SELECT n.id, k2.c AS cdst,
                 (CAST(t.two_m AS HUGEINT) * k2.kix
                    - CAST(n.k AS HUGEINT) * s.sig)
               - (CAST(t.two_m AS HUGEINT) * n.kid
                    - CAST(n.k AS HUGEINT) * n.sig_dp) AS gain
          FROM node n
          JOIN kic k2 ON k2.src = n.id AND k2.c <> n.ci
          JOIN sig s ON s.c = k2.c
          CROSS JOIN tm t
        ),
        bst AS (
          SELECT id, cdst, gain FROM (
            SELECT id, cdst, gain,
                   ROW_NUMBER() OVER (PARTITION BY id
                                      ORDER BY gain DESC, cdst) AS rn
            FROM cand
          ) WHERE rn = 1
        )
        SELECT n.id AS id,
               CASE WHEN b.gain > 0 THEN b.cdst ELSE n.ci END AS label,
               CAST(COALESCE(b.gain, 0) AS BIGINT) AS best_gain
        FROM node n LEFT JOIN bst b ON b.id = n.id
    """,
    "graph_sssp_weighted": f"WITH {_WEDGES_SQL},\n{_sssp_sql(4, 100)}",
    "graph_hits": f"WITH {EDGES_CS_SQL},\n{_hits_sql(3)}",
    "graph_kcore": f"WITH {EDGES_SQL}, {SYM_SQL},\n{_kcore_sql(80, 8)}",
    "graph_ktruss": f"WITH {EDGES_SQL}, {SYM_SQL},\n{_ktruss_sql(30, 20)}",
    "graph_ktruss_backbone": f"WITH {EDGES_SQL}, {SYM_SQL},\n{_ktruss_sql(12, 8)}",
    # SCAN clustering: the sigma chain above + recursive CC over
    # core-core eps-edges; isolated cores self-label.
    "graph_scan_clusters": f"""WITH RECURSIVE {EDGES_SQL.strip().lstrip()}, {SYM_SQL.strip().lstrip()},
und AS MATERIALIZED (SELECT src AS x, dst AS y FROM sym WHERE src < dst),
deg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY src),
ori AS MATERIALIZED (
  SELECT s.src AS u, s.dst AS v FROM sym s
  JOIN deg a ON a.id = s.src JOIN deg b ON b.id = s.dst
  WHERE a.d < b.d OR (a.d = b.d AND s.src < s.dst)),
tri AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM ori e1 JOIN ori e2 ON e2.u = e1.v
  JOIN ori e3 ON e3.u = e1.u AND e3.v = e2.v),
sup AS MATERIALIZED (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT least(a, b) AS x, greatest(a, b) AS y FROM tri
    UNION ALL SELECT least(b, c), greatest(b, c) FROM tri
    UNION ALL SELECT least(a, c), greatest(a, c) FROM tri
  ) GROUP BY x, y),
simed AS MATERIALIZED (
  SELECT u.x, u.y FROM und u
  LEFT JOIN sup s ON s.x = u.x AND s.y = u.y
  JOIN deg dx ON dx.id = u.x JOIN deg dy ON dy.id = u.y
  WHERE round(CAST(COALESCE(s.c, 0) + 2 AS DOUBLE)
              / sqrt(CAST((dx.d + 1) * (dy.d + 1) AS DOUBLE)), 6) >= 0.16),
edeg AS MATERIALIZED (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_eps_nbrs FROM (
    SELECT x AS id FROM simed UNION ALL SELECT y FROM simed
  ) GROUP BY id),
cores AS MATERIALIZED (SELECT id, n_eps_nbrs FROM edeg WHERE n_eps_nbrs >= 3),
ce AS MATERIALIZED (
  SELECT x, y FROM simed
  WHERE x IN (SELECT id FROM cores) AND y IN (SELECT id FROM cores)),
symce AS MATERIALIZED (SELECT x AS u, y AS v FROM ce UNION SELECT y, x FROM ce),
reach(u, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM symce)
  UNION
  SELECT s.u, reach.r FROM symce s JOIN reach ON reach.u = s.v),
cc AS (SELECT u AS id, MIN(r) AS cluster FROM reach GROUP BY u)
SELECT co.id, COALESCE(cc.cluster, co.id) AS cluster, co.n_eps_nbrs
FROM cores co LEFT JOIN cc ON cc.id = co.id""",
    # SCAN edge similarity: support via the same oriented wedge
    # join, then integers into one sqrt + divide.
    "graph_structural_similarity": f"""WITH {EDGES_SQL}, {SYM_SQL},
und AS (SELECT src AS x, dst AS y FROM sym WHERE src < dst),
deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY src),
ori AS (
  SELECT s.src AS u, s.dst AS v FROM sym s
  JOIN deg a ON a.id = s.src JOIN deg b ON b.id = s.dst
  WHERE a.d < b.d OR (a.d = b.d AND s.src < s.dst)),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM ori e1 JOIN ori e2 ON e2.u = e1.v
  JOIN ori e3 ON e3.u = e1.u AND e3.v = e2.v),
sup AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT least(a, b) AS x, greatest(a, b) AS y FROM tri
    UNION ALL SELECT least(b, c), greatest(b, c) FROM tri
    UNION ALL SELECT least(a, c), greatest(a, c) FROM tri
  ) GROUP BY x, y)
SELECT u.x, u.y,
       CAST(COALESCE(s.c, 0) + 2 AS BIGINT) AS n_common,
       round(CAST(COALESCE(s.c, 0) + 2 AS DOUBLE)
             / sqrt(CAST((dx.d + 1) * (dy.d + 1) AS DOUBLE)), 6) AS sigma
FROM und u
LEFT JOIN sup s ON s.x = u.x AND s.y = u.y
JOIN deg dx ON dx.id = u.x JOIN deg dy ON dy.id = u.y""",
    # Verbatim the same string spark.sql() executes — portability is
    # the point (see PORTABLE_DEGREE_HIST_SQL).
    "sql_degree_hist": PORTABLE_DEGREE_HIST_SQL,
    "sql_grouping_sets": PORTABLE_GROUPING_SETS_SQL,
    "graph_bfs_hops": f"WITH {EDGES_SQL}, {SYM_SQL},\n{_bfs_sql(3, 100)}",
    "graph_harmonic_sampled": f"WITH {EDGES_SQL}, {SYM_SQL},\n{_mbfs_sql(3, 250)}",
    # One-hop neighborhood aggregation: exact integer degree sums,
    # one fixed division per output row.
    "graph_neighborhood_features": f"""
        WITH {EDGES_SQL}, {SYM_SQL},
        deg AS (
          SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS degree
          FROM sym GROUP BY src
        )
        SELECT e.src AS id,
               CAST(COUNT(*) AS BIGINT) AS degree,
               CAST(MAX(d.degree) AS BIGINT) AS max_nbr_degree,
               round(CAST(SUM(d.degree) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS mean_nbr_degree
        FROM sym e JOIN deg d ON d.id = e.dst
        GROUP BY e.src
    """,
    "graph_label_prop": f"WITH {EDGES_SQL}, {SYM_SQL},\n{_lpa_sql(2)}",
    "graph_modularity": f"WITH {EDGES_SQL}, {SYM_SQL},\n{_modularity_sql(2)}",
    "graph_link_candidates": f"""
        WITH {EDGES_SQL}, {SYM_SQL},
        wedge AS (
          SELECT a.dst AS u, b.dst AS w, CAST(COUNT(*) AS BIGINT) AS n_common
          FROM sym a JOIN sym b ON a.src = b.src AND a.dst <> b.dst
          WHERE a.dst % 20 = 0
          GROUP BY 1, 2
          HAVING COUNT(*) >= 20
        )
        SELECT wg.u, wg.w, wg.n_common
        FROM wedge wg LEFT JOIN sym e ON e.src = wg.u AND e.dst = wg.w
        WHERE e.src IS NULL
    """,
    # Assortativity: integer count/degree sums stay BIGINT; the
    # product sums are DOUBLE on both engines (n·Σxy overflows BIGINT
    # at scale) and the final r is rounded at 6 — the repo convention
    # for fold-order-dependent sums.
    "graph_assortativity": f"""
        WITH {EDGES_SQL}, {SYM_SQL},
        deg AS (SELECT src AS id, COUNT(*) AS degree FROM sym GROUP BY src),
        ej AS (
          SELECT a.degree AS dx, b.degree AS dy
          FROM sym s JOIN deg a ON a.id = s.src JOIN deg b ON b.id = s.dst
        ),
        s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
                 SUM(CAST(dx AS DOUBLE) * dy) AS sxy,
                 SUM(CAST(dx AS DOUBLE) * dx) AS sxx,
                 SUM(CAST(dy AS DOUBLE) * dy) AS syy
          FROM ej
        )
        SELECT n AS n_edges,
               round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                     6) AS assortativity
        FROM s
    """,
}


def _walk_steps_parts(
    walk_len: int, start_mod: int, n_walks: int
) -> tuple[str, str]:
    """(ctes, union) parts of the unrolled random-walk chain —
    shared by the plain corpus oracle and the co-occurrence/PMI
    composition, so the two can never drift."""
    from bigclam_apachespark_spark.functions.hashing import hash64_sql

    walks = ", ".join(f"({w})" for w in range(n_walks))
    # every step CTE is referenced TWICE (the next step + the final
    # union): MATERIALIZED, or DuckDB's inlining doubles the work per
    # level — 2^walk_len chain re-derivations, which at sf0.1 spilled
    # >80 GB of temp through the pair-join consumer (graph_walk_pmi)
    ctes = [
        f"""s0 AS MATERIALIZED (
          SELECT v.id AS start, CAST(w.walk AS INT) AS walk,
                 0 AS step, v.id AS node
          FROM (SELECT DISTINCT src AS id FROM sym) v
          CROSS JOIN (VALUES {walks}) w(walk)
          WHERE v.id % {start_mod} = 0
        )"""
    ]
    for s in range(1, walk_len + 1):
        h = hash64_sql(
            "CONCAT(CAST(c.start AS VARCHAR), ':', CAST(c.walk AS VARCHAR), "
            f"':{s}:', CAST(e.dst AS VARCHAR))"
        )
        ctes.append(
            f"""s{s} AS MATERIALIZED (
          SELECT start, walk, {s} AS step,
                 (min(struct_pack(h := {h}, v := e.dst))).v AS node
          FROM s{s - 1} c JOIN sym e ON c.node = e.src
          GROUP BY start, walk
        )"""
        )
    union = "\n        UNION ALL\n        ".join(
        f"SELECT start, walk, step, node FROM s{s}" for s in range(walk_len + 1)
    )
    return ",\n        ".join(ctes), union


def _walk_steps_sql(walk_len: int, start_mod: int, n_walks: int) -> str:
    ctes, union = _walk_steps_parts(walk_len, start_mod, n_walks)
    return f"{ctes}\n        {union}"


ORACLE["graph_random_walks"] = (
    f"WITH {EDGES_SQL}, {SYM_SQL},\n        "
    + _walk_steps_sql(walk_len=4, start_mod=23, n_walks=2)
)

# r13: the LONG-walk twin — hash-pinned evidence that the per-level
# checkpoint discipline holds at DeepWalk-realistic walk lengths (the
# r12 lazy chain was O(walk_len²) scans and walk_len=16 was
# infeasible; the DuckDB side has been MATERIALIZED since r9 for the
# same reason). Sparser start cohort (id % 97) keeps the corpus
# oracle-sized: ~206 starts × 2 walks × 17 steps at sf0.1.
ORACLE["graph_random_walks_len16"] = (
    f"WITH {EDGES_SQL}, {SYM_SQL},\n        "
    + _walk_steps_sql(walk_len=16, start_mod=97, n_walks=2)
)

_WALK_CTES, _WALK_UNION = _walk_steps_parts(walk_len=4, start_mod=23, n_walks=2)

ORACLE["graph_walk_pmi"] = f"""
    WITH {EDGES_SQL}, {SYM_SQL},
    {_WALK_CTES},
    walks AS MATERIALIZED (
        {_WALK_UNION}
    ),
    wpairs AS (
      SELECT least(w1.node, w2.node) AS a, greatest(w1.node, w2.node) AS b
      FROM walks w1
      JOIN walks w2 ON w1.start = w2.start AND w1.walk = w2.walk
      WHERE w2.step > w1.step AND w2.step - w1.step <= 2
        AND w1.node <> w2.node
    ),
    cab AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
            FROM wpairs GROUP BY a, b),
    occ AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS c_v FROM (
        SELECT a AS v FROM wpairs UNION ALL SELECT b AS v FROM wpairs
      ) GROUP BY v
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM wpairs),
    scored AS (
      SELECT cab.a, cab.b, cab.c_ab, oa.c_v AS c_a, ob.c_v AS c_b, n.n_pairs,
             CAST(cab.c_ab * n.n_pairs AS DOUBLE)
               / CAST(oa.c_v * ob.c_v AS DOUBLE) AS ratio
      FROM cab
      JOIN occ oa ON oa.v = cab.a
      JOIN occ ob ON ob.v = cab.b
      CROSS JOIN n
    )
    SELECT a, b, c_ab, c_a, c_b, n_pairs,
           round(ln(ratio), 6) AS pmi,
           CAST(row_number() OVER (ORDER BY ratio DESC, a, b) AS INT) AS rank
    FROM scored
    ORDER BY ratio DESC, a, b LIMIT 30
"""


def _coreness_rounds_sql(rounds: int) -> str:
    """Unrolled h-index iteration — per-round: neighbor-value join,
    desc-rank window, prefix-closed indicator count. MATERIALIZED per
    round (each round reads its predecessor once, but inlining would
    still chain the whole prefix into one mega-plan)."""
    ctes = [
        """v0 AS MATERIALIZED (
      SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS c FROM sym GROUP BY src
    )"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""v{r} AS MATERIALIZED (
      SELECT src AS id, CAST(SUM(CASE WHEN cd >= rn THEN 1 ELSE 0 END)
                             AS BIGINT) AS c
      FROM (
        SELECT e.src, x.c AS cd,
               ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY x.c DESC) AS rn
        FROM sym e JOIN v{r - 1} x ON x.id = e.dst
      ) GROUP BY src
    )"""
        )
    return (
        ",\n        ".join(ctes)
        + f"\n        SELECT id, c AS coreness FROM v{rounds}"
    )


# 48 unrolled rounds: ≥ the MEASURED h-index fixpoint depth on the
# co-purchase graph (19 rounds at sf0.01, 38 at sf0.1) with slack —
# rounds past the fixpoint are no-ops, so any bound ≥ convergence
# hashes identically to the Spark side's convergence-driven loop,
# which certifies its own fixpoint (raises on max_rounds exhaustion).
ORACLE["graph_coreness"] = (
    f"WITH {EDGES_SQL}, {SYM_SQL},\n        " + _coreness_rounds_sql(48)
)


def _n2v_steps_sql(
    walk_len: int, start_mod: int, n_walks: int, p: float, q: float
) -> str:
    """Unrolled node2vec chain — same A-ES pico-integer key, same
    p/q weight classes, same (key DESC, cand ASC) winner rule as
    operators/graph.node2vec_walks."""
    from bigclam_apachespark_spark.functions.hashing import hash64_sql

    M = 1 << 40
    walks = ", ".join(f"({w})" for w in range(n_walks))
    ctes = [
        f"""t0 AS MATERIALIZED (
          SELECT v.id AS start, CAST(w.walk AS INT) AS walk,
                 0 AS step, v.id AS node, CAST(NULL AS BIGINT) AS prev
          FROM (SELECT DISTINCT src AS id FROM sym) v
          CROSS JOIN (VALUES {walks}) w(walk)
          WHERE v.id % {start_mod} = 0
        )"""
    ]
    for s in range(1, walk_len + 1):
        h = hash64_sql(
            "CONCAT(CAST(c.start AS VARCHAR), ':', CAST(c.walk AS VARCHAR), "
            f"':{s}:', CAST(e.dst AS VARCHAR))"
        )
        u = f"(CAST(({h}) % {M} AS DOUBLE) + 1) / {float(M + 1)}"
        if s == 1:
            key = f"CAST(round(ln({u}) * 1e12) AS BIGINT)"
            body = f"""
          SELECT c.start, c.walk, e.dst AS cand, c.node AS cnode,
                 {key} AS key
          FROM t{s - 1} c JOIN sym e ON e.src = c.node"""
        else:
            w_expr = (
                f"CASE WHEN e.dst = c.prev THEN {1.0 / p} "
                f"WHEN a.src IS NOT NULL THEN 1.0 "
                f"ELSE {1.0 / q} END"
            )
            body = f"""
          SELECT c.start, c.walk, e.dst AS cand, c.node AS cnode,
                 CAST(round(ln({u}) / ({w_expr}) * 1e12) AS BIGINT) AS key
          FROM t{s - 1} c
          JOIN sym e ON e.src = c.node
          LEFT JOIN sym a ON a.src = c.prev AND a.dst = e.dst"""
        ctes.append(
            f"""t{s} AS MATERIALIZED (
          SELECT start, walk, {s} AS step,
                 (min(struct_pack(nk := -key, c := cand))).c AS node,
                 MIN(cnode) AS prev
          FROM ({body}) GROUP BY start, walk
        )"""
        )
    union = "\n        UNION ALL\n        ".join(
        f"SELECT start, walk, step, node FROM t{s}" for s in range(walk_len + 1)
    )
    return ",\n        ".join(ctes) + f"\n        {union}"


ORACLE["graph_node2vec_walks"] = (
    f"WITH {EDGES_SQL}, {SYM_SQL},\n        "
    + _n2v_steps_sql(walk_len=4, start_mod=23, n_walks=2, p=4.0, q=0.25)
)


def _betweenness_sql(seed_mod: int = 997, hops: int = 3) -> str:
    """Unrolled hop-bounded Brandes twin: exact-integer σ per level,
    backward δ via list_reduce over the (w-ordered, 0.0-seeded) fold
    — the same left fold Spark's F.aggregate performs, so the
    doubles are bit-identical."""
    ctes = [
        f"""bseed AS (SELECT DISTINCT src AS s FROM sym WHERE src % {seed_mod} = 0)""",
        """bn0 AS MATERIALIZED (
      SELECT s, s AS v, CAST(1 AS BIGINT) AS sigma FROM bseed
    )""",
        "bvis0 AS MATERIALIZED (SELECT s, v FROM bn0)",
    ]
    for d in range(1, hops + 1):
        ctes += [
            f"""bg{d} AS MATERIALIZED (
      SELECT f.s, f.v, e.dst AS w, f.sigma AS sv
      FROM bn{d - 1} f JOIN sym e ON e.src = f.v
    )""",
            f"""bn{d} AS MATERIALIZED (
      SELECT s, w AS v, CAST(SUM(sv) AS BIGINT) AS sigma
      FROM bg{d} g ANTI JOIN bvis{d - 1} vis
        ON vis.s = g.s AND vis.v = g.w
      GROUP BY s, w
    )""",
            f"""bdag{d} AS MATERIALIZED (
      SELECT g.s, g.v, g.w, g.sv AS sigma_v, n.sigma AS sigma_w
      FROM bg{d} g JOIN bn{d} n ON n.s = g.s AND n.v = g.w
    )""",
            f"""bvis{d} AS MATERIALIZED (
      SELECT s, v FROM bvis{d - 1} UNION ALL SELECT s, v FROM bn{d}
    )""",
        ]
    # backward: deepest level's delta is 0
    for d in range(hops, 0, -1):
        if d == hops:
            src = f"""SELECT s, v, w,
                 CAST(sigma_v AS DOUBLE) / CAST(sigma_w AS DOUBLE) AS c
          FROM bdag{d}"""
        else:
            src = f"""SELECT g.s, g.v, g.w,
                 (CAST(g.sigma_v AS DOUBLE) / CAST(g.sigma_w AS DOUBLE))
                 * (1.0 + COALESCE(x.delta, 0.0)) AS c
          FROM bdag{d} g
          LEFT JOIN bdl{d + 1} x ON x.s = g.s AND x.v = g.w"""
        ctes.append(
            f"""bdl{d} AS MATERIALIZED (
      SELECT s, v,
             list_reduce(list_prepend(0.0, list(c ORDER BY w)),
                         (a, b) -> a + b) AS delta
      FROM ({src}) GROUP BY s, v
    )"""
        )
    union = "\n      UNION ALL\n      ".join(
        f"SELECT s, v, delta FROM bdl{d}" for d in range(1, hops + 1)
    )
    ctes.append(f"""bdelta AS (
      SELECT s, v, delta FROM (
      {union}
      ) WHERE v <> s
    )""")
    return (
        ",\n        ".join(ctes)
        + """
        SELECT v AS id,
               round(list_reduce(list_prepend(0.0, list(delta ORDER BY s)),
                                 (a, b) -> a + b), 6) AS bc
        FROM bdelta GROUP BY v"""
    )


ORACLE["graph_betweenness"] = (
    f"WITH {EDGES_SQL}, {SYM_SQL},\n        " + _betweenness_sql(1997, 2)
)


def _mis_rounds_sql(rounds: int) -> str:
    """Unrolled Luby MIS CTE chain — identical per-round election to
    operators/graph.maximal_independent_set, including the
    (priority, id) tie-break. Active/edge CTEs are MATERIALIZED:
    each round references its predecessor three times, so inlining
    would re-derive the whole prefix 3^r times."""
    from bigclam_apachespark_spark.functions.hashing import hash64_sql

    ctes = [
        "a0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM sym)",
        "e0 AS MATERIALIZED (SELECT src, dst FROM sym)",
    ]
    for r in range(1, rounds + 1):
        h = hash64_sql(f"CONCAT('mis:{r}:', CAST(id AS VARCHAR))")
        ctes += [
            f"p{r} AS MATERIALIZED (SELECT id, {h} AS p FROM a{r - 1})",
            f"""l{r} AS MATERIALIZED (
          SELECT DISTINCT e.src AS id
          FROM e{r - 1} e
          JOIN p{r} ps ON ps.id = e.src
          JOIN p{r} pd ON pd.id = e.dst
          WHERE ps.p > pd.p OR (ps.p = pd.p AND e.src > e.dst)
        )""",
            f"""w{r} AS MATERIALIZED (
          SELECT a.id, CAST({r} AS INT) AS mis_round
          FROM a{r - 1} a ANTI JOIN l{r} l ON l.id = a.id
        )""",
            f"""c{r} AS (
          SELECT DISTINCT e.dst AS id
          FROM e{r - 1} e SEMI JOIN w{r} w ON w.id = e.src
          UNION
          SELECT id FROM w{r}
        )""",
            f"""a{r} AS MATERIALIZED (
          SELECT a.id FROM a{r - 1} a ANTI JOIN c{r} c ON c.id = a.id
        )""",
            f"""e{r} AS MATERIALIZED (
          SELECT e.src, e.dst FROM e{r - 1} e
          SEMI JOIN a{r} x ON x.id = e.src
          SEMI JOIN a{r} y ON y.id = e.dst
        )""",
        ]
    union = "\n        UNION ALL\n        ".join(
        f"SELECT id, mis_round FROM w{r}" for r in range(1, rounds + 1)
    )
    return ",\n        ".join(ctes) + f"\n        {union}"


ORACLE["graph_mis"] = (
    f"WITH {EDGES_SQL}, {SYM_SQL},\n        " + _mis_rounds_sql(8)
)


# ---------------------------------------------------------------------------
# SGNS: one/two deterministic synchronous skip-gram steps over the
# DeepWalk corpus (operators/graph.py sgns_step) — the last missing
# LLM-pipeline stage between "walk corpus" and "embeddings table"
# (r9 verdict ask #3). All state is int64 micro-units; σ is floored
# at 1e-6 immediately (the quantize-the-accept move), so the full
# post-step matrix hash-matches across engines.
# ---------------------------------------------------------------------------


def q_sgns_step(spark, sf_dir):
    """One synchronous SGNS step from the deterministic init over the
    id%23 DeepWalk corpus — the full updated (node_id, k, wv, cv)
    embedding table, hash-checked."""
    return G.sgns_step(_sym(spark, sf_dir))


def q_sgns_two_steps(spark, sf_dir):
    """TWO chained SGNS steps (the ``bigclam_two_iterations`` mold:
    step 2 consumes step 1's checkpointed matrix; recompute-vs-
    incremental drift in the update accumulation would hash-mismatch
    here). The walk-pair corpus is built once and shared."""
    sym = _sym(spark, sf_dir)
    walks = G.random_walks(sym, walk_len=4, n_walks=2, start_mod=23)
    pairs = G.sgns_pairs(walks, window=2).localCheckpoint(eager=True)
    ranked, n_v = G.sgns_id_rank(sym)  # step-invariant (r14)
    emb = None
    for _ in range(2):
        emb = G.sgns_step(
            sym, emb=emb, pairs=pairs, id_rank=ranked, n_ids=n_v
        ).localCheckpoint(eager=True)
    return emb


def q_sgns_pmi_agreement(spark, sf_dir):
    """Embedding-quality readout: overlap of the top-30 cosine
    neighborhoods of the 1-step SGNS embeddings with the top-30
    walk-PMI pairs (Levy-Goldberg: converged SGNS factorizes the PMI
    matrix; this row measures one deterministic step's progress)."""
    return G.sgns_pmi_agreement(_sym(spark, sf_dir), steps=1, k_top=30)


_SGNS_SIG = "1.0 / (1.0 + exp(-(CAST({dot} AS DOUBLE) / 1e12)))"


def _sgns_prelude_sql(include_negdraw: bool = True) -> str:
    """Corpus-derived CTEs shared by every SGNS oracle: ordered pair
    counts, vertex count + rank, and (unless the caller substitutes
    the weighted variant) the emb-independent uniform negative
    draws. Every CTE is referenced more than once downstream →
    MATERIALIZED (the unrolled-CTE authoring rule)."""
    from bigclam_apachespark_spark.functions.hashing import hash64_sql

    h = hash64_sql(
        "CONCAT('sgns:', CAST(p.u AS VARCHAR), ':', "
        "CAST(p.v AS VARCHAR), ':', CAST(j.j AS VARCHAR))"
    )
    negdraw_cte = f""",
    negdraw AS MATERIALIZED (
      SELECT p.u, p.v, p.c_uv, j.j, r.id AS n
      FROM spairs p
      CROSS JOIN (VALUES (1), (2)) j(j)
      CROSS JOIN nverts
      JOIN vrank r ON r.rk = ({h} % nverts.n) + 1
    )"""
    return f"""spairs AS MATERIALIZED (
      SELECT w1.node AS u, w2.node AS v, CAST(COUNT(*) AS BIGINT) AS c_uv
      FROM walks w1
      JOIN walks w2 ON w1.start = w2.start AND w1.walk = w2.walk
      WHERE w2.step <> w1.step AND abs(w2.step - w1.step) <= 2
        AND w1.node <> w2.node
      GROUP BY 1, 2
    ),
    nverts AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT DISTINCT src FROM sym)
    ),
    vrank AS MATERIALIZED (
      SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) AS BIGINT) AS rk
      FROM (SELECT DISTINCT src AS id FROM sym)
    ),
    emb0 AS MATERIALIZED (
      SELECT v.id AS node_id, CAST(kk.k AS INT) AS k,
             CAST(((v.id * 31 + 7 * kk.k) % 19 - 9) * 20000 AS BIGINT) AS wv,
             CAST(((v.id * 17 + 5 * kk.k) % 19 - 9) * 20000 AS BIGINT) AS cv
      FROM (SELECT DISTINCT src AS id FROM sym) v
      CROSS JOIN (VALUES (0), (1), (2), (3)) kk(k)
    )""" + (negdraw_cte if include_negdraw else "")


def _sgns_step_sql(i: int) -> str:
    """CTEs computing emb{i} from emb{i-1}: positive/negative dots,
    quantized coefficient edge list, the two exact-int64 update aggs,
    and the floored-division apply. ``assoc{i}`` is read by BOTH
    update aggs and ``emb{i-1}`` by five consumers → MATERIALIZED."""
    p = f"emb{i - 1}"
    sig_pos = _SGNS_SIG.format(dot="dot_int")
    return f"""posdot{i} AS MATERIALIZED (
      SELECT p.u, p.v, p.c_uv, SUM(w.wv * c.cv) AS dot_int
      FROM spairs p
      JOIN {p} w ON w.node_id = p.u
      JOIN {p} c ON c.node_id = p.v AND c.k = w.k
      GROUP BY 1, 2, 3
    ),
    negdot{i} AS MATERIALIZED (
      SELECT d.u, d.v, d.j, d.c_uv, d.n, SUM(w.wv * c.cv) AS dot_int
      FROM negdraw d
      JOIN {p} w ON w.node_id = d.u
      JOIN {p} c ON c.node_id = d.n AND c.k = w.k
      GROUP BY 1, 2, 3, 4, 5
    ),
    assoc{i} AS MATERIALIZED (
      SELECT u, v AS x,
             CAST(FLOOR((1.0 - {sig_pos}) * 1000000.0) AS BIGINT) * c_uv AS coef
      FROM posdot{i}
      UNION ALL
      SELECT u, n AS x,
             -CAST(FLOOR(({sig_pos}) * 1000000.0) AS BIGINT) * c_uv AS coef
      FROM negdot{i}
    ),
    dw{i} AS MATERIALIZED (
      SELECT a.u AS node_id, c.k, SUM(a.coef * c.cv) AS dsum
      FROM assoc{i} a JOIN {p} c ON c.node_id = a.x
      GROUP BY 1, 2
    ),
    dc{i} AS MATERIALIZED (
      SELECT a.x AS node_id, w.k, SUM(a.coef * w.wv) AS dsum
      FROM assoc{i} a JOIN {p} w ON w.node_id = a.u
      GROUP BY 1, 2
    ),
    emb{i} AS MATERIALIZED (
      SELECT e.node_id, e.k,
             e.wv + CAST(FLOOR(CAST(COALESCE(dw{i}.dsum, 0) AS DOUBLE)
                               / 40000000.0) AS BIGINT) AS wv,
             e.cv + CAST(FLOOR(CAST(COALESCE(dc{i}.dsum, 0) AS DOUBLE)
                               / 40000000.0) AS BIGINT) AS cv
      FROM emb0 e
      LEFT JOIN dw{i} ON dw{i}.node_id = e.node_id AND dw{i}.k = e.k
      LEFT JOIN dc{i} ON dc{i}.node_id = e.node_id AND dc{i}.k = e.k
    )"""


# NOTE: emb{i} applies updates against emb{i-1}, so the step builder
# must read FROM emb{i-1}, not emb0 — patch the apply CTE per step.
def _sgns_chain_sql(steps: int) -> str:
    parts = [
        f"WITH {EDGES_SQL}, {SYM_SQL},",
        _WALK_CTES + ",",
        f"walks AS MATERIALIZED (\n        {_WALK_UNION}\n    ),",
        _sgns_prelude_sql() + ",",
    ]
    for i in range(1, steps + 1):
        parts.append(
            _sgns_step_sql(i).replace("FROM emb0 e", f"FROM emb{i - 1} e") + ","
        )
    body = "\n    ".join(parts).rstrip(",")
    return f"{body}\n    SELECT node_id, k, wv, cv FROM emb{steps}"


ORACLE["graph_sgns_step"] = _sgns_chain_sql(1)
ORACLE["graph_sgns_two_steps"] = _sgns_chain_sql(2)


def q_sgns_step_unigram(spark, sf_dir):
    """SGNS step with word2vec's actual unigram^0.75 negative
    distribution (degree^{3/4}-weighted draws through the exact
    integer inverse-CDF — graph.sgns_negatives_weighted), closing
    the uniform-draw deviation documented in graph_sgns_step."""
    return G.sgns_step_unigram(_sym(spark, sf_dir))


def _sgns_unigram_sql() -> str:
    from bigclam_apachespark_spark.functions.hashing import hash64_sql

    h = hash64_sql(
        "CONCAT('sgnsw:', CAST(p.u AS VARCHAR), ':', "
        "CAST(p.v AS VARCHAR), ':', CAST(j.j AS VARCHAR))"
    )
    # exact-integer inverse-CDF over the id-ordered running sum of
    # floor(deg^0.75 · 1e6); the bucket map is (x·1024) // W — no
    # float anywhere in the bucketing, matching Spark's `div`.
    weighted_negdraw = f""",
    wts AS MATERIALIZED (
      SELECT src AS id,
             CAST(FLOOR(pow(CAST(COUNT(*) AS DOUBLE), 0.75)
                        * 1000000.0) AS BIGINT) AS w
      FROM sym GROUP BY src
    ),
    cum AS MATERIALIZED (
      SELECT id, w,
             CAST(SUM(w) OVER (ORDER BY id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
      FROM wts
    ),
    tot AS MATERIALIZED (SELECT CAST(MAX(hi) AS BIGINT) AS t FROM cum),
    iv AS MATERIALIZED (
      SELECT c.id AS n, c.hi - c.w AS lo, c.hi,
             unnest(generate_series((c.hi - c.w) * 1024 // t.t,
                                    (c.hi - 1) * 1024 // t.t)) AS bkt
      FROM cum c CROSS JOIN tot t
    ),
    drawsw AS MATERIALIZED (
      SELECT p.u, p.v, p.c_uv, j.j, ({h} % t.t) AS r
      FROM spairs p CROSS JOIN (VALUES (1), (2)) j(j) CROSS JOIN tot t
    ),
    negdraw AS MATERIALIZED (
      SELECT d.u, d.v, d.c_uv, d.j, i.n
      FROM drawsw d CROSS JOIN tot t
      JOIN iv i ON i.bkt = d.r * 1024 // t.t
      WHERE d.r >= i.lo AND d.r < i.hi
    )"""
    return (
        f"WITH {EDGES_SQL}, {SYM_SQL},\n    "
        + _WALK_CTES
        + ",\n    walks AS MATERIALIZED (\n        "
        + _WALK_UNION
        + "\n    ),\n    "
        + _sgns_prelude_sql(include_negdraw=False)
        + weighted_negdraw
        + ",\n    "
        + _sgns_step_sql(1)
        + "\n    SELECT node_id, k, wv, cv FROM emb1"
    )


ORACLE["graph_sgns_step_unigram"] = _sgns_unigram_sql()
QUERIES["graph_sgns_step_unigram"] = q_sgns_step_unigram


def q_sgns_loss_curve(spark, sf_dir):
    """SGNS objective before each of 3 synchronous steps (step 0 =
    init) — the training-works readout: per-pair ln σ terms floored
    to int64 micro-nats, order-free integer sums; measured monotone
    descent ~4.5e6 micro-nats/step at sf0.01."""
    return G.sgns_loss_curve(_sym(spark, sf_dir), steps=3)


def _sgns_loss_sql(i: int) -> str:
    """loss{i} = the objective under emb{i-1}, read from the chain's
    posdot{i}/negdot{i} (their dots ARE the step-i inputs)."""
    sig_p = "1.0/(1.0 + exp(-(CAST(dot_int AS DOUBLE)/1e12)))"
    sig_n = "1.0/(1.0 + exp((CAST(dot_int AS DOUBLE)/1e12)))"
    return f"""loss{i} AS MATERIALIZED (
      SELECT CAST({i - 1} AS INT) AS step,
             CAST(
               (SELECT SUM(CAST(FLOOR(ln({sig_p}) * 1000000.0) AS BIGINT)
                           * c_uv) FROM posdot{i})
               + (SELECT SUM(CAST(FLOOR(ln({sig_n}) * 1000000.0) AS BIGINT)
                             * c_uv) FROM negdot{i})
               AS BIGINT) AS loss_micro
    )"""


def _sgns_loss_curve_sql(steps: int = 3) -> str:
    parts = [
        f"WITH {EDGES_SQL}, {SYM_SQL},",
        _WALK_CTES + ",",
        f"walks AS MATERIALIZED (\n        {_WALK_UNION}\n    ),",
        _sgns_prelude_sql() + ",",
    ]
    for i in range(1, steps + 1):
        parts.append(
            _sgns_step_sql(i).replace("FROM emb0 e", f"FROM emb{i - 1} e") + ","
        )
        parts.append(_sgns_loss_sql(i) + ",")
    body = "\n    ".join(parts).rstrip(",")
    union = "\n    UNION ALL ".join(
        f"SELECT step, loss_micro FROM loss{i}" for i in range(1, steps + 1)
    )
    return f"{body}\n    {union}"


ORACLE["graph_sgns_loss_curve"] = _sgns_loss_curve_sql(3)
QUERIES["graph_sgns_loss_curve"] = q_sgns_loss_curve

ORACLE["graph_sgns_pmi_agreement"] = f"""
    WITH {EDGES_SQL}, {SYM_SQL},
    {_WALK_CTES},
    walks AS MATERIALIZED (
        {_WALK_UNION}
    ),
    {_sgns_prelude_sql()},
    {_sgns_step_sql(1)},
    upairs AS MATERIALIZED (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM spairs
    ),
    cosr AS MATERIALIZED (
      SELECT p.a, p.b,
             CAST(SUM(wa.wv * wb.wv) AS DOUBLE)
               / (sqrt(CAST(SUM(wa.wv * wa.wv) AS DOUBLE))
                  * sqrt(CAST(SUM(wb.wv * wb.wv) AS DOUBLE))) AS cosv
      FROM upairs p
      JOIN emb1 wa ON wa.node_id = p.a
      JOIN emb1 wb ON wb.node_id = p.b AND wb.k = wa.k
      GROUP BY 1, 2
      HAVING SUM(wa.wv * wa.wv) > 0 AND SUM(wb.wv * wb.wv) > 0
    ),
    topcos AS MATERIALIZED (
      SELECT a, b FROM cosr ORDER BY cosv DESC, a, b LIMIT 30
    ),
    wpairs AS MATERIALIZED (
      SELECT least(w1.node, w2.node) AS a, greatest(w1.node, w2.node) AS b
      FROM walks w1
      JOIN walks w2 ON w1.start = w2.start AND w1.walk = w2.walk
      WHERE w2.step > w1.step AND w2.step - w1.step <= 2
        AND w1.node <> w2.node
    ),
    cab AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
            FROM wpairs GROUP BY a, b),
    occ AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS c_v FROM (
        SELECT a AS v FROM wpairs UNION ALL SELECT b AS v FROM wpairs
      ) GROUP BY v
    ),
    np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM wpairs),
    toppmi AS MATERIALIZED (
      SELECT cab.a, cab.b
      FROM cab
      JOIN occ oa ON oa.v = cab.a
      JOIN occ ob ON ob.v = cab.b
      CROSS JOIN np
      ORDER BY CAST(cab.c_ab * np.n_pairs AS DOUBLE)
               / CAST(oa.c_v * ob.c_v AS DOUBLE) DESC, cab.a, cab.b
      LIMIT 30
    )
    SELECT 30 AS k,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cosr) AS n_scored,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM topcos t JOIN toppmi p ON p.a = t.a AND p.b = t.b) AS n_overlap
"""

QUERIES.update(
    {
        "graph_sgns_step": q_sgns_step,
        "graph_sgns_two_steps": q_sgns_two_steps,
        "graph_sgns_pmi_agreement": q_sgns_pmi_agreement,
    }
)


def q_sgns_rank_corr(spark, sf_dir):
    """Quantized Spearman between the 2-step SGNS pair scores and the
    uniform-negatives closed-form target ranking (VERDICT r11 ask #4:
    the signed rank correlation that replaces the degenerate top-30
    overlap 0 with the number that identifies the frequency-dominated
    transient — and flips sign on a gradient-direction bug). Same
    2-step embedding as graph_sgns_two_steps; exact integer ranks via
    the bucketed two-stage row_number on both sides."""
    sym = _sym(spark, sf_dir)
    walks = G.random_walks(sym, walk_len=4, n_walks=2, start_mod=23)
    pairs = G.sgns_pairs(walks, window=2).localCheckpoint(eager=True)
    ranked, n_v = G.sgns_id_rank(sym)  # step-invariant (r14)
    emb = None
    for _ in range(2):
        emb = G.sgns_step(
            sym, emb=emb, pairs=pairs, id_rank=ranked, n_ids=n_v
        ).localCheckpoint(eager=True)
    return G.sgns_rank_corr_row(pairs, emb)


ORACLE["graph_sgns_rank_corr"] = f"""
    WITH {EDGES_SQL}, {SYM_SQL},
    {_WALK_CTES},
    walks AS MATERIALIZED (
        {_WALK_UNION}
    ),
    {_sgns_prelude_sql()},
    {_sgns_step_sql(1)},
    {_sgns_step_sql(2).replace("FROM emb0 e", "FROM emb1 e")},
    up2 AS MATERIALIZED (
      SELECT least(u, v) AS a, greatest(u, v) AS b, c_uv FROM spairs
    ),
    scores AS MATERIALIZED (
      SELECT p.a, p.b,
             CAST(SUM(ea.wv * eb.cv) + SUM(eb.wv * ea.cv) AS BIGINT) AS dot_wc
      FROM (SELECT DISTINCT a, b FROM up2) p
      JOIN emb2 ea ON ea.node_id = p.a
      JOIN emb2 eb ON eb.node_id = p.b AND eb.k = ea.k
      GROUP BY 1, 2
    ),
    cab2 AS (
      SELECT a, b, CAST(SUM(c_uv) AS BIGINT) AS c_ab FROM up2 GROUP BY a, b
    ),
    occ2 AS (
      SELECT v, CAST(SUM(c) AS BIGINT) AS c_v FROM (
        SELECT a AS v, c_uv AS c FROM up2
        UNION ALL SELECT b AS v, c_uv AS c FROM up2
      ) GROUP BY v
    ),
    bothr AS MATERIALIZED (
      SELECT s.a, s.b, s.dot_wc,
             CAST(c.c_ab * c.c_ab AS DOUBLE)
               / CAST(oa.c_v * ob.c_v AS DOUBLE) AS ratio
      FROM scores s
      JOIN cab2 c ON c.a = s.a AND c.b = s.b
      JOIN occ2 oa ON oa.v = s.a
      JOIN occ2 ob ON ob.v = s.b
    ),
    rm AS (
      SELECT a, b, CAST(ROW_NUMBER() OVER (
        ORDER BY dot_wc DESC, a, b) AS BIGINT) AS rm FROM bothr
    ),
    rt AS (
      SELECT a, b, CAST(ROW_NUMBER() OVER (
        ORDER BY ratio DESC, a, b) AS BIGINT) AS rt FROM bothr
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM((rm.rm - rt.rt) * (rm.rm - rt.rt)) AS BIGINT) AS sum_d2
      FROM rm JOIN rt ON rt.a = rm.a AND rt.b = rm.b
    )
    SELECT n_pairs, sum_d2,
           CAST(FLOOR((1.0 - (6.0 * CAST(sum_d2 AS DOUBLE))
                 / (CAST(n_pairs AS DOUBLE) * CAST(n_pairs AS DOUBLE)
                    * CAST(n_pairs AS DOUBLE) - CAST(n_pairs AS DOUBLE)))
                * 1000000.0) AS BIGINT) AS spearman_ppm
    FROM agg
"""

QUERIES["graph_sgns_rank_corr"] = q_sgns_rank_corr


# ---------------------------------------------------------------------------
# Community-method comparison (r9 verdict ask #5): ONE readout with
# the modularity Q of all three community methods on the SAME graph
# and the SAME scoring kernel (graph.modularity's integer-exact Q):
# BigCLAM argmax membership, two-level Louvain, and the LPA baseline.
# ---------------------------------------------------------------------------


def q_q_method_compare(spark, sf_dir):
    """Three rows ``(method, n_communities, e_within, n_unlabeled,
    n_dup_labels, q)`` on the unweighted co-purchase graph: BigCLAM
    strongest-community argmax (fixture factors — the
    ``bigclam_community_quality`` labeling), the composed two-level
    Louvain sweep (labels optimized on the support-weighted wedges,
    scored here on the unweighted graph like the others — vertices
    below the wedge support threshold surface in ``n_unlabeled``),
    and 2-round LPA. The apples-to-apples table a user choosing a
    community method would ask for; the facebook-graph analog is the
    ``graph_louvain_facebook`` smoke + PERFORMANCE.md round-10 notes."""
    from bigclam_apachespark_spark.registry_bigclam import fixture_factors
    from bigclam_apachespark_spark.shared import shared_wedges

    sym = _sym(spark, sf_dir)
    fx = fixture_factors(sym)
    bc = fx.select(
        F.col("node_id").alias("id"),
        (F.array_position(F.col("f"), F.array_max(F.col("f"))) - 1)
        .cast("long")
        .alias("lbl"),
    )
    lou = G.louvain_two_levels(shared_wedges(spark, sf_dir)).select(
        "id", F.col("label").alias("lbl")
    )
    lpa = G.label_propagation(sym, rounds=2)
    out = None
    for method, lab in (
        ("bigclam_argmax", bc),
        ("louvain2", lou),
        ("lpa2", lpa),
    ):
        row = G.modularity(sym, lab).select(F.lit(method).alias("method"), "*")
        out = row if out is None else out.unionByName(row)
    return out


def _q_method_compare_sql(graph_prelude: str | None = None) -> str:
    """``graph_prelude``: CTE text defining ``sym`` (directed-both-ways
    edge relation) and ``wedges`` (weighted edges). Defaults to the
    co-purchase graph; the facebook variant passes the edge-list scan
    with unit weights."""
    import re as _re

    from bigclam_apachespark_spark.registry_bigclam import FACTORS_LONG_SQL
    from bigclam_apachespark_spark.sqlfrag import modularity_tail_ctes

    if graph_prelude is None:
        graph_prelude = f"{EDGES_SQL}, {SYM_SQL}, {_WEDGES_SQL}"
    # LPA chain renamed l*/n*/c* → lp*/np*/cp* so it coexists with the
    # Louvain l1/l2 chain in one WITH clause.
    lpa_ctes = _re.sub(r"\b([lnc])(\d)\b", r"\g<1>p\g<2>", _lpa_cte(2))
    return f"""
        WITH {graph_prelude},
        {FACTORS_LONG_SQL},
        bc_labels AS MATERIALIZED (
          SELECT node_id AS id, CAST(k AS BIGINT) AS lbl FROM (
            SELECT node_id, k,
                   ROW_NUMBER() OVER (PARTITION BY node_id
                                      ORDER BY val DESC, k) AS rn
            FROM factors_long
          ) WHERE rn = 1
        ),
        {_LOUVAIN_L1_CTES},
        {_LOUVAIN_L2_CTES},
        lou_labels AS MATERIALIZED (
          SELECT l1.id AS id, l2.label AS lbl
          FROM l1 JOIN l2 ON l2.id = l1.label
        ),
        {lpa_ctes},
        lpa_labels AS (SELECT id, lbl FROM lp2),
        {modularity_tail_ctes("bc_labels", "_bc")},
        {modularity_tail_ctes("lou_labels", "_lou")},
        {modularity_tail_ctes("lpa_labels", "_lpa")}
        SELECT 'bigclam_argmax' AS method, * FROM qrow_bc
        UNION ALL SELECT 'louvain2' AS method, * FROM qrow_lou
        UNION ALL SELECT 'lpa2' AS method, * FROM qrow_lpa
    """


ORACLE["graph_q_method_compare"] = _q_method_compare_sql()
QUERIES["graph_q_method_compare"] = q_q_method_compare


def q_q_method_compare_facebook(spark, sf_dir):
    """The same three-method modularity readout on the reference's
    own facebook_combined graph — REAL community structure, so the Q
    values separate meaningfully (unlike the near-random co-purchase
    basket graph), and fully ORACLE-CHECKED (the bounded two-level
    Louvain composition stands in for the iterative fit, which the
    rows-only ``graph_louvain_facebook`` smoke covers with its pinned
    Q≈0.69 invariant)."""
    from bigclam_apachespark_spark.registry_bigclam import fixture_factors

    edges = read_edge_list(spark, FACEBOOK_EDGES)
    sym = G.symmetrize(edges).localCheckpoint(eager=True)
    wedges = sym.select("src", "dst", F.lit(1).cast("long").alias("support"))
    fx = fixture_factors(sym)
    bc = fx.select(
        F.col("node_id").alias("id"),
        (F.array_position(F.col("f"), F.array_max(F.col("f"))) - 1)
        .cast("long")
        .alias("lbl"),
    )
    lou = G.louvain_two_levels(wedges).select("id", F.col("label").alias("lbl"))
    lpa = G.label_propagation(sym, rounds=2)
    out = None
    for method, lab in (
        ("bigclam_argmax", bc),
        ("louvain2", lou),
        ("lpa2", lpa),
    ):
        row = G.modularity(sym, lab).select(F.lit(method).alias("method"), "*")
        out = row if out is None else out.unionByName(row)
    return out


_FB_GRAPH_PRELUDE = f"""fb AS (
      SELECT src, dst FROM read_csv('{FACEBOOK_EDGES}', delim=' ',
          header=false, columns={{'src': 'BIGINT', 'dst': 'BIGINT'}})
    ),
    sym AS (
      SELECT src, dst FROM (
        SELECT src, dst FROM fb UNION SELECT dst AS src, src AS dst FROM fb
      ) WHERE src <> dst
    ),
    wedges AS (SELECT src, dst, CAST(1 AS BIGINT) AS support FROM sym)"""

ORACLE["graph_q_method_compare_facebook"] = _q_method_compare_sql(
    _FB_GRAPH_PRELUDE
)
QUERIES["graph_q_method_compare_facebook"] = q_q_method_compare_facebook


def q_q_method_compare_facebook_fit(spark, sf_dir):
    """The facebook three-method comparison with REAL FITS (rows-only:
    iterative driver loops are not SQL-expressible — VERDICT r10 ask
    #8, upgrading the fixture-factor BigCLAM row of
    ``graph_q_method_compare_facebook``): BigCLAM fitted F (K=10,
    tol=1e-3, max_iter=12 — the facebook-pipeline regime) argmax
    labels, Louvain run to its structural fixpoint (``louvain_fit``,
    the ``graph_louvain_facebook`` regime), and 2-round LPA (fixed-k
    BY CONTRACT — see ``label_propagation``), all scored by the SAME
    integer-exact modularity kernel. Pinned in-plan invariants
    (raise_error survives column pruning): every labeling must be a
    valid full partition and each method's Q must land in a generous
    band around its measured value — fitted-BigCLAM argmax Q≈0.751
    (10 communities; the fit BEATS the Louvain sweep's Q≈0.690 here —
    overlapping factors concentrate the argmax on the real ego-net
    structure), louvain_fit Q≈0.690 (6 communities, matching the
    ``graph_louvain_facebook`` smoke), 2-round LPA Q≈0.743 (26
    communities)."""
    from bigclam_apachespark_spark.operators.bigclam import bigclam_fit

    edges = read_edge_list(spark, FACEBOOK_EDGES)
    sym = G.symmetrize(edges).localCheckpoint(eager=True)
    wedges = sym.select("src", "dst", F.lit(1).cast("long").alias("support"))
    res = bigclam_fit(sym, k=10, seed=42, tol=1e-3, max_iter=12)
    bc = res.factors.select(
        F.col("node_id").alias("id"),
        (F.array_position(F.col("f"), F.array_max(F.col("f"))) - 1)
        .cast("long")
        .alias("lbl"),
    )
    lab_lou, _levels = G.louvain_fit(wedges, max_levels=20, score_edges=sym)
    lou = lab_lou.select("id", F.col("label").alias("lbl"))
    lpa = G.label_propagation(sym, rounds=2)
    out = None
    for method, lab, q_lo, q_hi in (
        ("bigclam_fit", bc, 0.55, 0.95),
        ("louvain_fit", lou, 0.55, 0.95),
        ("lpa2", lpa, 0.45, 0.95),
    ):
        row = G.modularity(sym, lab).select(F.lit(method).alias("method"), "*")
        ok = (
            (F.col("q") > q_lo)
            & (F.col("q") < q_hi)
            & (F.col("n_unlabeled") == 0)
            & (F.col("n_dup_labels") == 0)
        )
        row = row.where(
            F.when(ok, F.lit(True)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(f"facebook {method} fit invariant violated: q="),
                        F.col("q").cast("string"),
                        F.lit(" n_unlabeled="),
                        F.col("n_unlabeled").cast("string"),
                    )
                )
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


QUERIES["graph_q_method_compare_facebook_fit"] = q_q_method_compare_facebook_fit


def q_sgns_fit_facebook(spark, sf_dir):
    """SGNS trained to its loss plateau on the reference's own
    facebook graph (rows-only: iterative driver loop — the F5 analog
    for embedding training, VERDICT r10 ask #6) → ONE row
    ``(n_steps, converged, loss_init_micro, loss_final_micro,
    improvement_ppm, pos_mean_dot_micro, neg_mean_dot_micro, k,
    n_scored, n_overlap, lp_n_scored, n_win, n_tie, win_ppm,
    rc_n_pairs, spearman_ppm)``: the fixed-objective quantized SGNS loop
    over the deterministic facebook walk corpus at a DeepWalk-
    REALISTIC sampling regime (r13, VERDICT r12 ask #3: walk_len=16,
    n_walks=5 — feasible now that the walk build is O(walk_len);
    the r12 corpus was walk_len=4, n_walks=2), plus TWO quality
    readouts of the FITTED embeddings — the model-score separation
    row (positives' mean w·c vs the trained negatives'; the metric
    that must move) and the Levy-Goldberg PMI-agreement row (same
    ``sgns_agreement_row`` kernel as the oracle-checked two-step
    row). lr was re-calibrated for the 6.4× pair corpus (210k
    distinct pairs): per-node gradient magnitude scales with its
    pair count, so the r12 lr=1/20 is hot at this scale — the first
    step overshoots and the past-peak plateau fires at step 2 with a
    1% improvement and win_ppm 609k. Measured sweep (2026-08-16):
    lr=1/60 → 6 steps, 11.0% improvement, win_ppm 830k; lr=1/120 →
    12 steps, 29.0% improvement, win_ppm 882k, spearman −293k —
    lr=1/120 pinned. Pinned in-plan invariants (raise_error): the
    loop must report convergence, the loss must improve ≥25% from
    init (measured 29.0%), the fitted model must score positives
    strictly above its negatives, and held-out link prediction must
    stay ≥ 800k ppm (measured 882,424; the r12 gate was 750k at the
    toy corpus). All quantities are deterministic — the corpus,
    negatives, and arithmetic replay exactly — so the gates pin
    measured values with real margin, not stochastic bands."""
    edges = read_edge_list(spark, FACEBOOK_EDGES)
    sym = G.symmetrize(edges).localCheckpoint(eager=True)
    emb, stats = G.sgns_fit(
        sym, max_steps=60, lr_den=120, walk_len=16, n_walks=5, start_mod=3,
        window=2,
    )
    sep = G.sgns_separation_row(stats["pairs"], stats["negdraw"], emb)
    # PMI ground truth over the SAME walk corpus the model trained on
    ag = G.sgns_agreement_row(sym, emb, stats["pairs"], 30, 16, 5, 3, 2)
    lp = G.sgns_linkpred_row(stats["pairs"], emb, sym).select(
        F.col("n_scored").alias("lp_n_scored"), "n_win", "n_tie", "win_ppm"
    )
    rc = G.sgns_rank_corr_row(stats["pairs"], emb).select(
        F.col("n_pairs").alias("rc_n_pairs"), "spearman_ppm"
    )
    fit_row = spark.createDataFrame(
        [
            (
                int(stats["n_steps"]),
                bool(stats["converged"]),
                int(stats["loss_init_micro"]),
                int(stats["loss_final_micro"]),
                int(stats["improvement_ppm"]),
            )
        ],
        "n_steps long, converged boolean, loss_init_micro long, "
        "loss_final_micro long, improvement_ppm long",
    )
    row = fit_row.crossJoin(sep).crossJoin(ag).crossJoin(lp).crossJoin(rc)
    # Gates (re-pinned r13 at the realistic corpus, VERDICT r12 ask
    # #3): the quality claim rides on the held-out link-prediction
    # win rate — measured 882,424 ppm at walk_len=16/n_walks=5/
    # lr=1/120 (vs 861k at the r12 toy corpus, ~473k at random
    # init), floor 800k — because the model RANKS observed structure
    # above never-trained noise after a productive fit. spearman_ppm
    # vs the closed-form target is REPORTED with a wide tripwire
    # band: measured −293k here (the frequency-dominated transient;
    # a positive reading past +200k would mean a flipped gradient),
    # documented in sgns_rank_corr_row.
    ok = (
        F.col("converged")
        & (F.col("improvement_ppm") >= 250_000)
        & (F.col("pos_mean_dot_micro") > F.col("neg_mean_dot_micro"))
        & (F.col("win_ppm") >= 800_000)
        & (F.col("spearman_ppm") >= -800_000)
        & (F.col("spearman_ppm") <= 200_000)
    )
    return row.where(
        F.when(ok, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("facebook sgns_fit invariant violated: converged="),
                    F.col("converged").cast("string"),
                    F.lit(" improvement_ppm="),
                    F.col("improvement_ppm").cast("string"),
                    F.lit(" pos-neg="),
                    (
                        F.col("pos_mean_dot_micro")
                        - F.col("neg_mean_dot_micro")
                    ).cast("string"),
                    F.lit(" win_ppm="),
                    F.col("win_ppm").cast("string"),
                    F.lit(" spearman_ppm="),
                    F.col("spearman_ppm").cast("string"),
                )
            )
        )
    )


QUERIES["graph_sgns_fit_facebook"] = q_sgns_fit_facebook


# ---------------------------------------------------------------------------
# word2vec over the documents token corpus — the text twin of the
# graph SGNS kernel (operators/text.word2vec_step shares
# graph.sgns_apply, so the arithmetic cannot fork; this oracle
# re-states only the corpus derivation and reuses _sgns_step_sql).
# ---------------------------------------------------------------------------


def q_word2vec_step(spark, sf_dir):
    """One synchronous SGNS step over the documents token stream —
    the full (term, k, wv, cv) token-embedding table, hash-checked
    (min_count=5 vocabulary, window 2, vids = (cnt DESC, term) dense
    ranks)."""
    from bigclam_apachespark_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return T.word2vec_step(docs, steps=1)


def _word2vec_sql() -> str:
    from bigclam_apachespark_spark.functions.hashing import (
        hash64_sql,
        tokens_sql,
    )

    toks = tokens_sql("text")
    h = hash64_sql(
        "CONCAT('w2v:', CAST(p.u AS VARCHAR), ':', "
        "CAST(p.v AS VARCHAR), ':', CAST(j.j AS VARCHAR))"
    )
    return f"""
    WITH tk AS MATERIALIZED (SELECT {toks} AS l FROM documents),
    vocab AS MATERIALIZED (
      SELECT term, cnt,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS vid
      FROM (
        SELECT w AS term, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(l) AS w FROM tk) GROUP BY w
        HAVING COUNT(*) >= 5
      )
    ),
    rawp AS (
      SELECT unnest(l[1:len(l)-1]) AS tu, unnest(l[2:len(l)]) AS tv
      FROM tk WHERE len(l) >= 2
      UNION ALL
      SELECT unnest(l[2:len(l)]), unnest(l[1:len(l)-1])
      FROM tk WHERE len(l) >= 2
      UNION ALL
      SELECT unnest(l[1:len(l)-2]), unnest(l[3:len(l)])
      FROM tk WHERE len(l) >= 3
      UNION ALL
      SELECT unnest(l[3:len(l)]), unnest(l[1:len(l)-2])
      FROM tk WHERE len(l) >= 3
    ),
    spairs AS MATERIALIZED (
      SELECT vu.vid AS u, vv.vid AS v, CAST(COUNT(*) AS BIGINT) AS c_uv
      FROM rawp
      JOIN vocab vu ON vu.term = rawp.tu
      JOIN vocab vv ON vv.term = rawp.tv
      WHERE vu.vid <> vv.vid
      GROUP BY 1, 2
    ),
    nverts AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vocab),
    vrank AS MATERIALIZED (SELECT vid AS id, vid AS rk FROM vocab),
    negdraw AS MATERIALIZED (
      SELECT p.u, p.v, p.c_uv, j.j, r.id AS n
      FROM spairs p
      CROSS JOIN (VALUES (1), (2)) j(j)
      CROSS JOIN nverts
      JOIN vrank r ON r.rk = ({h} % nverts.n) + 1
    ),
    emb0 AS MATERIALIZED (
      SELECT v.vid AS node_id, CAST(kk.k AS INT) AS k,
             CAST(((v.vid * 31 + 7 * kk.k) % 19 - 9) * 20000 AS BIGINT) AS wv,
             CAST(((v.vid * 17 + 5 * kk.k) % 19 - 9) * 20000 AS BIGINT) AS cv
      FROM vocab v
      CROSS JOIN (VALUES (0), (1), (2), (3)) kk(k)
    ),
    {_sgns_step_sql(1)}
    SELECT v.term, e.k, e.wv, e.cv
    FROM emb1 e JOIN vocab v ON v.vid = e.node_id
    """


ORACLE["text_word2vec_step"] = _word2vec_sql()
QUERIES["text_word2vec_step"] = q_word2vec_step

# ---------------------------------------------------------------------------
# Merge: extension surface (text/dedup/similarity/events/streaming/
# multimodal) and BigCLAM kernel queries. Imported last to keep this
# module the single source of truth for the driver contract.
# ---------------------------------------------------------------------------

from bigclam_apachespark_spark.registry_bigclam import (  # noqa: E402
    BIGCLAM_ORACLE,
    BIGCLAM_QUERIES,
    BIGCLAM_SMOKES,
)
from bigclam_apachespark_spark.registry_ext import EXT_ORACLE, EXT_QUERIES  # noqa: E402

QUERIES.update(BIGCLAM_QUERIES)
QUERIES.update(EXT_QUERIES)
QUERIES.update(BIGCLAM_SMOKES)
ORACLE.update(BIGCLAM_ORACLE)
ORACLE.update(EXT_ORACLE)

# ---------------------------------------------------------------------------
# Rotation: registration order = the driver's execution order, and the
# driver's correctness gate samples only the FIRST ~50 entries. To make
# the sampling window sweep the whole registry over successive rounds,
# order least-recently-driver-verified first:
#   (rows_only_smoke, effective_round, front_rank, stable_index)
# effective_round = last hash-green round for driver-green queries;
# for never-driver-green ones it is introduction_round - (cycle - 1):
# a never-verified query enters the window as if already at the
# 3-round staleness limit, so it INTERLEAVES with genuinely stale
# cohorts instead of pre-empting them (VERDICT r7 ask #1 — defaulting
# unseen queries to 0 let 50 brand-new r7 queries consume the whole
# window while the r4 cohort went 3 rounds unverified). Former driver
# hash-FAILs and the streaming/multimodal replays sort first inside a
# tied cohort; rows-only smokes (which can never hash-match) always
# run LAST so a driver budget truncation only ever drops them.
# LAST_GREEN / INTRODUCED / NEWEST_ROUND are regenerated each round by
# scripts/update_verification_log.py from CORRECTNESS_r*.json.
# ---------------------------------------------------------------------------

from bigclam_apachespark_spark.verification_log import (  # noqa: E402
    INTRODUCED,
    LAST_GREEN,
    NEWEST_ROUND,
)

# Worst-case driver staleness: the driver hash-verifies ~50 oracle
# queries per round, so a full sweep of the registry takes
# ceil(|ORACLE| / 50) rounds and the worst case is one round less.
# COMPUTED from the registry (ADVICE r8): the former hardcoded 3
# lagged the registry's growth past 200 oracle queries, letting
# never-driver-green queries enter the window one round early and
# mildly re-introducing the starvation the rotation fix removed.
_STALENESS_LIMIT = max(0, -(-len(ORACLE) // 50) - 1)

_FRONT = {
    name: i
    for i, name in enumerate(
        [
            # the three former r2 driver hash-FAILs (fixed in r3, never
            # re-sampled by the driver — verify these first)
            "dedup_simhash",
            "sim_hyperplane_buckets",
            "events_sessionize",
            # streaming replays (never driver-recorded)
            "events_stream_tumbling",
            "events_stream_sessionize",
            "events_stream_interval_join",
            "events_stream_enrich",
            # multimodal (never driver-recorded)
            "multimodal_media_stats",
            "multimodal_media_features",
            "multimodal_frame_sample",
            "multimodal_patch_grid",
            "multimodal_audio_chunks",
            "multimodal_caption_join",
        ]
    )
}
_ORIG = {name: i for i, name in enumerate(QUERIES)}


def _effective_round(name: str) -> int:
    """Rotation priority: last driver-green round, or — for queries the
    driver has never hash-verified — their introduction round minus the
    staleness limit, so a never-seen query waits at most one cycle but
    cannot starve cohorts that are already past the limit."""
    if name in LAST_GREEN:
        return LAST_GREEN[name]
    return INTRODUCED.get(name, NEWEST_ROUND) - _STALENESS_LIMIT


def _rotation_key(name: str) -> tuple:
    return (
        name not in ORACLE,  # rows-only smokes last
        _effective_round(name),  # least-recently-verified first
        # brand-new queries (no driver row AND no recorded introduction)
        # break effective-round ties LAST: a query added this round must
        # not displace a genuinely stale one from the 50-window — it
        # gets its first driver row next cycle instead of aging the
        # stale cohort another round.
        name not in LAST_GREEN and name not in INTRODUCED,
        _FRONT.get(name, len(_FRONT)),
        _ORIG[name],
    )


QUERIES = {name: QUERIES[name] for name in sorted(QUERIES, key=_rotation_key)}
