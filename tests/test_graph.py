"""Graph substrate tests against FIXTURES.md §2/§3 hand-computed values."""

from __future__ import annotations

import pytest

from bigclam_apachespark_spark.operators import (
    degrees,
    ego_conductance,
    ego_nets,
    local_min_seeds,
    neighbor_lists,
    symmetrize,
    top_k_seeds,
    total_volume,
    vertices,
)

PHI_CLIQUE = 1.0 / 12.0


def test_symmetrize_g1(g1_edges):
    sym = symmetrize(g1_edges)
    assert sym.count() == 26  # FIXTURES §2: 13 undirected pairs → 26 directed
    assert vertices(sym).count() == 8
    # involution: symmetrizing a symmetric graph is a no-op
    assert symmetrize(sym).count() == 26


def test_symmetrize_drops_self_loops_and_dups(spark):
    from bigclam_apachespark_spark.sources import edges_from_pairs

    e = edges_from_pairs(spark, [(1, 2), (2, 1), (1, 1), (1, 2)])
    assert symmetrize(e).count() == 2


def test_degrees_g1(g1_edges):
    sym = symmetrize(g1_edges)
    got = {r["id"]: r["degree"] for r in degrees(sym).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 4, 4: 4, 5: 3, 6: 3, 7: 3}
    assert total_volume(sym) == 26


def test_neighbor_lists_and_ego(g1_edges):
    sym = symmetrize(g1_edges)
    nb = {r["id"]: list(r["nbrs"]) for r in neighbor_lists(sym).collect()}
    assert nb[0] == [1, 2, 3]
    assert nb[3] == [0, 1, 2, 4]
    ego = {r["id"]: list(r["members"]) for r in ego_nets(neighbor_lists(sym)).collect()}
    assert ego[0] == [0, 1, 2, 3]
    assert ego[3] == [0, 1, 2, 3, 4]
    assert ego[4] == [3, 4, 5, 6, 7]


def test_conductance_g1(g1_edges):
    # FIXTURES §2 exact values.
    sym = symmetrize(g1_edges)
    got = {r["id"]: r["phi"] for r in ego_conductance(sym).collect()}
    for n in (0, 1, 2, 5, 6, 7):
        assert got[n] == pytest.approx(PHI_CLIQUE, abs=1e-12)
    for n in (3, 4):
        assert got[n] == pytest.approx(0.5, abs=1e-12)


def test_conductance_g2_volt_zero_branch(g2_edges):
    # FIXTURES §3: P4 — nodes 1,2 hit the vol_T == 0 branch → phi = 1.
    sym = symmetrize(g2_edges)
    got = {r["id"]: r["phi"] for r in ego_conductance(sym).collect()}
    assert got[0] == pytest.approx(0.5)
    assert got[3] == pytest.approx(0.5)
    assert got[1] == 1.0
    assert got[2] == 1.0


def test_seeds_g1(g1_edges):
    # FIXTURES §2: intent semantics select {0,1,5,6}, ranked [0,1,5,6].
    sym = symmetrize(g1_edges)
    phi = ego_conductance(sym)
    seeds = local_min_seeds(sym, phi)
    ranked = [r["id"] for r in seeds.collect()]
    assert ranked == [0, 1, 5, 6]
    top2 = [r["id"] for r in top_k_seeds(seeds, 2).collect()]
    assert top2 == [0, 1]


def test_edge_list_reader(spark, tmp_path):
    # FIXTURES §4 parser fixture: comments, tabs, spaces.
    p = tmp_path / "edges.txt"
    p.write_text("# comment\n1\t2\n3 4\n\n# another\n5\t6\n2 1\n")
    from bigclam_apachespark_spark.sources import read_edge_list

    df = read_edge_list(spark, str(p))
    rows = sorted((r["src"], r["dst"]) for r in df.collect())
    assert rows == [(1, 2), (2, 1), (3, 4), (5, 6)]


def test_conductance_pairs_variant_matches(g1_edges, g2_edges, spark):
    from bigclam_apachespark_spark.operators.graph import (
        ego_conductance,
        ego_conductance_pairs,
        symmetrize,
    )

    for edges in (g1_edges, g2_edges):
        sym = symmetrize(edges)
        a = sorted((r["id"], round(r["phi"], 12)) for r in ego_conductance(sym).collect())
        b = sorted((r["id"], round(r["phi"], 12)) for r in ego_conductance_pairs(sym).collect())
        assert a == b


def test_triangle_counts_two_cliques(spark, g1_edges):
    from bigclam_apachespark_spark.operators.graph import (
        clustering_coefficients,
        symmetrize,
        triangle_counts,
    )

    sym = symmetrize(g1_edges)
    tri = {r["id"]: r["n_tri"] for r in triangle_counts(sym).collect()}
    # every node of a 4-clique sits in C(3,2)=3 triangles; the bridge
    # edge 3-4 closes none
    assert tri == {i: 3 for i in range(8)}

    cc = {r["id"]: (r["degree"], r["clustering"])
          for r in clustering_coefficients(sym).collect()}
    for i in (0, 1, 2, 5, 6, 7):       # pure clique corners: 2*3/(3*2)
        assert cc[i] == (3, 1.0)
    for i in (3, 4):                   # bridge endpoints: 2*3/(4*3)
        assert cc[i] == (4, 0.5)


def test_triangle_counts_triangle_free(spark, g2_edges):
    from bigclam_apachespark_spark.operators.graph import (
        symmetrize,
        triangle_counts,
    )

    tri = triangle_counts(symmetrize(g2_edges)).collect()
    assert all(r["n_tri"] == 0 for r in tri)  # P4 path has no triangles
    assert len(tri) == 4


def test_pagerank_fixture(spark, g2_edges):
    import math

    from bigclam_apachespark_spark.operators.graph import pagerank, symmetrize

    # P4 path 0-1-2-3: symmetric, so rank(0)=rank(3), rank(1)=rank(2),
    # interior > endpoints, mean exactly 1
    out = {r["id"]: r["rank"] for r in pagerank(symmetrize(g2_edges), n_iter=5).collect()}
    assert out[0] == out[3] and out[1] == out[2]
    assert out[1] > out[0]
    assert math.isclose(sum(out.values()) / 4, 1.0, rel_tol=1e-4)


def test_pagerank_uniform_on_clique(spark, g1_edges):
    from bigclam_apachespark_spark.operators.graph import pagerank, symmetrize

    # restrict to one 4-clique: regular graph -> exactly uniform ranks
    clique = g1_edges.where("src < 4 AND dst < 4")
    out = [r["rank"] for r in pagerank(symmetrize(clique), n_iter=5).collect()]
    assert out == [1.0, 1.0, 1.0, 1.0]


def test_connected_components_fixture(spark, g1_edges, g2_edges):
    from bigclam_apachespark_spark.operators.graph import (
        connected_components,
        symmetrize,
    )

    # G1 is connected via the 3-4 bridge: one component labeled 0
    out = {r["id"]: r["component"]
           for r in connected_components(symmetrize(g1_edges)).collect()}
    assert out == {i: 0 for i in range(8)}

    # two disjoint edges -> two components labeled by their minima
    import pyspark.sql.functions as F  # noqa: F401
    pairs = spark.createDataFrame([(5, 9), (1, 3)], "src long, dst long")
    out2 = {r["id"]: r["component"]
            for r in connected_components(symmetrize(pairs)).collect()}
    assert out2 == {5: 5, 9: 5, 1: 1, 3: 1}


def test_pagerank_weighted_prefers_heavy_edges(spark):
    from bigclam_apachespark_spark.operators.graph import pagerank_weighted

    # star around 0 with one heavy spoke (0-1, w=10) and two light
    # ones (w=1): under weighted PR node 1 receives most of 0's mass
    rows = [(0, 1, 10), (1, 0, 10), (0, 2, 1), (2, 0, 1), (0, 3, 1), (3, 0, 1)]
    ew = spark.createDataFrame(rows, "src long, dst long, support long")
    out = {r["id"]: r["rank"] for r in pagerank_weighted(ew, n_iter=5).collect()}
    assert out[1] > out[2] == out[3]
    import math
    assert math.isclose(sum(out.values()) / 4, 1.0, rel_tol=1e-4)


def test_kcore_g1(spark, g1_edges):
    """Two 4-cliques + bridge: every vertex has degree >= 3, so the
    3-core is the whole graph with original degrees; the 4-core
    cascades to empty (only the bridge endpoints have degree 4, and
    the subgraph they induce is a single edge)."""
    from bigclam_apachespark_spark.operators.graph import kcore, symmetrize

    sym = symmetrize(g1_edges)
    core3 = {(r.id, r.core_deg) for r in kcore(sym, k=3, rounds=4).collect()}
    assert core3 == {(0, 3), (1, 3), (2, 3), (3, 4), (4, 4), (5, 3), (6, 3), (7, 3)}
    assert kcore(sym, k=4, rounds=4).count() == 0


def test_kcore_path_cascades_to_empty(spark, g2_edges):
    """P4 at k=2: endpoints peel first, then the cascade unravels the
    whole path — the classic k-core cascade."""
    from bigclam_apachespark_spark.operators.graph import kcore, symmetrize

    assert kcore(symmetrize(g2_edges), k=2, rounds=4).count() == 0


def test_assortativity_star_is_minus_one(spark):
    """Star S3: degree pairs over directed rows are (3,1) and (1,3)
    only — perfectly disassortative, r = -1 exactly."""
    from bigclam_apachespark_spark.operators.graph import (
        degree_assortativity,
        symmetrize,
    )
    from bigclam_apachespark_spark.sources import edges_from_pairs

    star = edges_from_pairs(spark, [(0, 1), (0, 2), (0, 3)])
    row = degree_assortativity(symmetrize(star)).collect()[0]
    assert row.n_edges == 6
    assert row.assortativity == -1.0


def test_common_neighbor_candidates_g1(spark, g1_edges):
    """Two 4-cliques + bridge 3-4: every same-side pair is adjacent,
    so the only candidates are cross pairs through a bridge endpoint
    — (x, 4) for x in {0,1,2} via 3, and (3, y) for y in {5,6,7} via
    4 — each with exactly one common neighbor."""
    from bigclam_apachespark_spark.operators.graph import (
        common_neighbor_candidates,
        symmetrize,
    )

    out = {
        (r.u, r.w): r.n_common
        for r in common_neighbor_candidates(
            symmetrize(g1_edges), min_common=1
        ).collect()
    }
    assert out == {(0, 4): 1, (1, 4): 1, (2, 4): 1, (3, 5): 1, (3, 6): 1, (3, 7): 1}


def test_common_neighbor_focus_cohort(spark, g1_edges):
    """Focus mode: restricting to cohort {4} returns exactly node 4's
    candidate rows — (4, x) for x in {0,1,2} — as ordered per-focus
    rows, matching the unfocused pairs restricted to that node."""
    from bigclam_apachespark_spark.operators.graph import (
        common_neighbor_candidates,
        symmetrize,
    )

    sym = symmetrize(g1_edges)
    focus = spark.createDataFrame([(4,)], "id long")
    out = {
        (r.u, r.w): r.n_common
        for r in common_neighbor_candidates(sym, min_common=1, focus=focus).collect()
    }
    assert out == {(4, 0): 1, (4, 1): 1, (4, 2): 1}


def test_bfs_hops_path_graph(spark, g2_edges):
    """P4 (0-1-2-3) from source 0: hops are exactly the path
    distances; max_hops=2 truncates node 3; early exit on an
    exhausted frontier leaves the result unchanged."""
    from bigclam_apachespark_spark.operators.graph import bfs_hops, symmetrize

    sym = symmetrize(g2_edges)
    src = spark.createDataFrame([(0,)], "id long")
    full = {(r.id): r.hops for r in bfs_hops(sym, src, max_hops=5).collect()}
    assert full == {0: 0, 1: 1, 2: 2, 3: 3}
    trunc = {(r.id): r.hops for r in bfs_hops(sym, src, max_hops=2).collect()}
    assert trunc == {0: 0, 1: 1, 2: 2}


def test_bfs_hops_two_sources(spark, g1_edges):
    """Two 4-cliques + bridge, sources {0, 7}: every node is within
    2 hops of the nearer source (cliques are diameter 1; the bridge
    adds one)."""
    from bigclam_apachespark_spark.operators.graph import bfs_hops, symmetrize

    sym = symmetrize(g1_edges)
    src = spark.createDataFrame([(0,), (7,)], "id long")
    out = {r.id: r.hops for r in bfs_hops(sym, src, max_hops=3).collect()}
    assert out[0] == 0 and out[7] == 0
    assert out[1] == 1 and out[2] == 1 and out[3] == 1
    assert out[4] == 1 and out[5] == 1 and out[6] == 1


def test_unpersist_local_checkpoint_frees_blocks(spark):
    """DataFrame.unpersist does NOT drop localCheckpoint RDD blocks
    (only cacheManager entries); the helper reaches the LogicalRDD's
    rdd and actually frees them — pin both facts."""
    from bigclam_apachespark_spark.functions.checkpointing import (
        unpersist_local_checkpoint,
    )

    sc = spark.sparkContext

    def live():
        m = sc._jsc.sc().getPersistentRDDs()
        it = m.iterator()
        n = 0
        while it.hasNext():
            it.next()
            n += 1
        return n

    base = live()
    plain = spark.range(1000).localCheckpoint(eager=True)
    assert live() == base + 1
    plain.unpersist(blocking=True)
    assert live() == base + 1  # the documented leak
    unpersist_local_checkpoint(plain, blocking=True)
    assert live() == base


def test_modularity_hand_computed(g1_edges):
    """G1 (two 4-cliques + bridge), partition = the two cliques:
    m = 13, E_in = 12, d_A = d_B = 13 → Q = 12/13 - 2·13²/(4·13²)
    = 0.923077 - 0.5 = 0.423077 exactly at 6 dp."""
    from bigclam_apachespark_spark.operators.graph import modularity, symmetrize

    sym = symmetrize(g1_edges)
    spark = g1_edges.sparkSession
    labels = spark.createDataFrame(
        [(i, 0 if i < 4 else 1) for i in range(8)], "id long, lbl long"
    )
    row = modularity(sym, labels).collect()[0]
    assert row["n_communities"] == 2
    assert row["e_within"] == 12
    assert row["n_unlabeled"] == 0
    assert row["q"] == round(12 / 13 - 0.5, 6)

    # coverage guard: a partial partition is flagged, not silent
    partial = spark.createDataFrame(
        [(i, 0 if i < 4 else 1) for i in range(6)], "id long, lbl long"
    )
    prow = modularity(sym, partial).collect()[0]
    assert prow["n_unlabeled"] == 2

    # duplicate-label guard: a vertex with two label rows inflates
    # E_in/D2 through both inner joins — flagged, not silent
    dup = spark.createDataFrame(
        [(i, 0 if i < 4 else 1) for i in range(8)] + [(0, 1)],
        "id long, lbl long",
    )
    drow = modularity(sym, dup).collect()[0]
    assert drow["n_dup_labels"] == 1
    assert row["n_dup_labels"] == 0


def test_label_propagation_two_cliques(g1_edges):
    """2 LPA rounds on G1 must label each clique uniformly (the
    bridge endpoints adopt their own clique's mode label): round 1
    gives min-neighbor, round 2's frequency argmax converges each
    4-clique to label 0 / 4."""
    from bigclam_apachespark_spark.operators.graph import (
        label_propagation,
        symmetrize,
    )

    got = {
        r["id"]: r["lbl"]
        for r in label_propagation(symmetrize(g1_edges), rounds=2).collect()
    }
    assert all(got[i] == 0 for i in range(4)), got
    assert all(got[i] == 4 for i in range(4, 8)), got


def test_pagerank_personalized_fixture(spark, g2_edges):
    import math

    from bigclam_apachespark_spark.operators.graph import (
        pagerank_personalized,
        symmetrize,
        vertices,
    )

    # P4 path 0-1-2-3, seed {0}: hand-iterated 5-step fixpoint
    # (node 1 outranks the seed — deg(0)=1 hands it ALL of 0's mass
    # each round — but the far end starves); total mass stays N
    sym = symmetrize(g2_edges)
    seeds = vertices(sym).where("id = 0")
    out = {
        r["id"]: r["rank"]
        for r in pagerank_personalized(sym, seeds, n_iter=5).collect()
    }
    expected = {0: 1.225383, 1: 1.382585, 2: 1.008731, 3: 0.3833}
    for v, e in expected.items():
        assert math.isclose(out[v], e, abs_tol=1e-6), (v, out[v], e)
    assert math.isclose(sum(out.values()) / 4, 1.0, rel_tol=1e-3)


def test_sssp_weighted_prefers_cheap_detour(spark):
    """Weighted SSSP on a diamond where the 2-edge detour (cost 1+1)
    beats the direct edge (cost 5): the relaxation must improve an
    already-reached vertex in a later round — the case plain BFS
    gets wrong by construction. Bounded rounds truncate honestly."""
    from bigclam_apachespark_spark.operators.graph import sssp_weighted

    edges = spark.createDataFrame(
        # 0->2 direct cost 5; 0->1->2 total cost 2; 2->3 cost 1
        [(0, 2, 5), (0, 1, 1), (1, 2, 1), (2, 3, 1)],
        "src long, dst long, cost long",
    )
    src = spark.createDataFrame([(0,)], "id long")
    full = {r.id: r.dist for r in sssp_weighted(edges, src, rounds=4).collect()}
    assert full == {0: 0, 1: 1, 2: 2, 3: 3}
    # one round only reaches direct successors at direct cost
    one = {r.id: r.dist for r in sssp_weighted(edges, src, rounds=1).collect()}
    assert one == {0: 0, 1: 1, 2: 5}


def test_hits_star_bipartite(spark):
    """HITS on a directed 2-hub star: the customer connected to both
    suppliers outscores the single-supplier one, the shared supplier
    outscores the exclusive one, and mean-normalization puts each
    role's average at exactly 1."""
    from bigclam_apachespark_spark.operators.graph import hits

    # c1 -> {s1, s2}; c2 -> {s1}
    edges = spark.createDataFrame(
        [(1, 101), (1, 102), (2, 101)], "src long, dst long"
    )
    rows = hits(edges, n_iter=3).collect()
    hubs = {r["id"]: r["score"] for r in rows if r["role"] == "hub"}
    auth = {r["id"]: r["score"] for r in rows if r["role"] == "authority"}
    assert set(hubs) == {1, 2} and set(auth) == {101, 102}
    assert hubs[1] > hubs[2]
    assert auth[101] > auth[102]
    assert round(sum(hubs.values()) / 2, 5) == 1.0
    assert round(sum(auth.values()) / 2, 5) == 1.0


def test_harmonic_centrality_sampled_path_graph(spark):
    """Path 1-2-3-4-5, seed {1}, 3 hops: node 2 at d=1 → 1.0, node 3
    at d=2 → 0.5, node 4 at d=3 → 1/3, node 5 unreached → absent.
    The seed itself never scores (d=0 excluded)."""
    from bigclam_apachespark_spark.operators.graph import (
        harmonic_centrality_sampled,
        symmetrize,
    )
    from bigclam_apachespark_spark.sources import edges_from_pairs

    sym = symmetrize(
        edges_from_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    got = {r["id"]: r for r in harmonic_centrality_sampled(sym, seeds, 3).collect()}
    assert set(got) == {2, 3, 4}
    assert (got[2]["n_reached"], got[2]["harmonic"]) == (1, 1.0)
    assert (got[3]["n_reached"], got[3]["harmonic"]) == (1, 0.5)
    assert (got[4]["n_reached"], got[4]["harmonic"]) == (1, round(1 / 3.0, 6))


def test_harmonic_centrality_two_seeds_sum(spark):
    """Seeds {1, 3} on the path 1-2-3: node 2 gets 1/1 from each
    seed → harmonic 2.0. Each endpoint is reached only by the OTHER
    seed (d=2, the d=0 self never scores) → n_reached 1, harmonic
    0.5."""
    from bigclam_apachespark_spark.operators.graph import (
        harmonic_centrality_sampled,
        symmetrize,
    )
    from bigclam_apachespark_spark.sources import edges_from_pairs

    sym = symmetrize(edges_from_pairs(spark, [(1, 2), (2, 3)]))
    seeds = spark.createDataFrame([(1,), (3,)], "id long")
    got = {r["id"]: r for r in harmonic_centrality_sampled(sym, seeds, 3).collect()}
    assert (got[2]["n_reached"], got[2]["harmonic"]) == (2, 2.0)
    assert (got[1]["n_reached"], got[1]["harmonic"]) == (1, 0.5)
    assert (got[3]["n_reached"], got[3]["harmonic"]) == (1, 0.5)


def test_neighborhood_features_hand_computed(spark):
    """Star 1-{2,3,4} plus edge 2-3: degrees 1:3, 2:2, 3:2, 4:1.
    Node 1's neighbors have degrees {2,2,1} → mean 5/3; node 4's
    single neighbor has degree 3."""
    from bigclam_apachespark_spark.operators.graph import (
        neighborhood_features,
        symmetrize,
    )
    from bigclam_apachespark_spark.sources import edges_from_pairs

    sym = symmetrize(edges_from_pairs(spark, [(1, 2), (1, 3), (1, 4), (2, 3)]))
    got = {r["id"]: r for r in neighborhood_features(sym).collect()}
    assert (got[1]["degree"], got[1]["max_nbr_degree"]) == (3, 2)
    assert got[1]["mean_nbr_degree"] == round(5 / 3, 6)
    assert (got[4]["degree"], got[4]["max_nbr_degree"], got[4]["mean_nbr_degree"]) == (
        1, 3, 3.0,
    )


def test_ktruss_two_cliques_bridge(spark, g1_edges):
    """4-truss of two 4-cliques + bridge: every clique edge closes
    2 triangles (kept, support 2); the bridge closes none and peels
    in round 1; the peel does not weaken the cliques (fixpoint)."""
    from bigclam_apachespark_spark.operators.graph import ktruss, symmetrize

    out = ktruss(symmetrize(g1_edges), k=4, rounds=3).collect()
    got = {(r.x, r.y): r.support for r in out}
    assert len(got) == 12 and (3, 4) not in got
    assert all(v == 2 for v in got.values())


def test_ktruss_peeling_cascade(spark):
    """A triangle with a pendant triangle sharing one edge: 5-truss
    (support >= 3) empties the graph in cascading rounds, while
    3-truss (support >= 1) keeps both triangles."""
    from bigclam_apachespark_spark.operators.graph import ktruss, symmetrize
    from bigclam_apachespark_spark.sources import edges_from_pairs

    e = edges_from_pairs(
        spark, [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)]
    )
    sym = symmetrize(e)
    assert ktruss(sym, k=5, rounds=4).count() == 0
    k3 = {(r.x, r.y) for r in ktruss(sym, k=3, rounds=4).collect()}
    assert k3 == {(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)}


def test_structural_similarity_hand_computed(spark, g1_edges):
    """G1 clique edge (0,1): support 2, closed common 4, degrees
    3,3 → σ = 4/4 = 1.0 (pure core). Bridge (3,4): support 0,
    common 2, degrees 4,4 → σ = 2/5 = 0.4 (the hub-ish edge SCAN
    thresholds away)."""
    from bigclam_apachespark_spark.operators.graph import (
        structural_similarity,
        symmetrize,
    )

    got = {(r.x, r.y): (r.n_common, r.sigma)
           for r in structural_similarity(symmetrize(g1_edges)).collect()}
    assert got[(0, 1)] == (4, 1.0)
    assert got[(3, 4)] == (2, 0.4)
    assert got[(0, 3)] == (4, round(4 / (20 ** 0.5), 6))


def test_scan_clusters_g1_cores_and_hub_exclusion(spark, g1_edges):
    """G1 at (eps=0.9, mu=2): only corner-corner clique edges reach
    sigma = 4/4 = 1.0; every edge touching a bridge endpoint tops
    out at 4/sqrt(4*5) ~ 0.894 < eps, so nodes 3 and 4 have ZERO
    eps-edges and drop — exactly SCAN's hub discrimination. The
    corners form two 3-node clusters labeled by their minima."""
    from bigclam_apachespark_spark.operators.graph import (
        scan_clusters,
        symmetrize,
    )

    got = {r.id: r.cluster for r in
           scan_clusters(symmetrize(g1_edges), eps=0.9, mu=2).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 7: 5}


def test_louvain_one_move_hand_computed(spark):
    """Weighted path fixture, gains by hand (2m·w_ij − k_i·k_j):
    edges (1,2,w=3), (1,3,w=1), (3,4,w=1) → degrees k=(4,3,2,1),
    2m=10. Node 1: →2 gain 30−12=18, →3 gain 10−8=2 → joins 2.
    Node 2: →1 gain 18. Node 3: →1 gain 2, →4 gain 10−2=8 → joins 4.
    Node 4: →3 gain 8."""
    from bigclam_apachespark_spark.operators.graph import louvain_one_move

    und = [(1, 2, 3), (1, 3, 1), (3, 4, 1)]
    rows = [(a, b, w) for a, b, w in und] + [(b, a, w) for a, b, w in und]
    wedges = spark.createDataFrame(rows, "src long, dst long, support long")
    got = {
        r.id: (r.label, r.best_gain) for r in louvain_one_move(wedges).collect()
    }
    assert got == {1: (2, 18), 2: (1, 18), 3: (4, 8), 4: (3, 8)}


def test_community_coarsen_hand_computed(spark):
    """Phase-2 aggregation on the phase-1 fixture labels (1→2, 2→1,
    3→4, 4→3 — the synchronous-sweep pair swap): every directed edge
    maps endpoints to labels and parallel edges merge by weight."""
    from bigclam_apachespark_spark.operators.graph import (
        community_coarsen,
        louvain_one_move,
    )

    und = [(1, 2, 3), (1, 3, 1), (3, 4, 1)]
    rows = [(a, b, w) for a, b, w in und] + [(b, a, w) for a, b, w in und]
    wedges = spark.createDataFrame(rows, "src long, dst long, support long")
    labels = louvain_one_move(wedges).select("id", "label")
    got = {
        (r.src, r.dst): r.support
        for r in community_coarsen(wedges, labels).collect()
    }
    assert got == {
        (2, 1): 3, (1, 2): 3,
        (2, 4): 1, (4, 2): 1,
        (4, 3): 1, (3, 4): 1,
    }


def test_louvain_one_move_downhill_merges_swap_pair(spark):
    """downhill_only=True is the composed loop's symmetry breaking: on
    the hand fixture the unrestricted sweep SWAPS the mutual-best pair
    (1↔2) — downhill acceptance makes 2 join 1 while 1 stays (no
    smaller profitable neighbor), i.e. the pair actually merges.
    Gains from the same hand table as the unrestricted test."""
    from bigclam_apachespark_spark.operators.graph import louvain_one_move

    und = [(1, 2, 3), (1, 3, 1), (3, 4, 1)]
    rows = [(a, b, w) for a, b, w in und] + [(b, a, w) for a, b, w in und]
    wedges = spark.createDataFrame(rows, "src long, dst long, support long")
    got = {
        r.id: (r.label, r.best_gain)
        for r in louvain_one_move(wedges, downhill_only=True).collect()
    }
    # 1: no downhill candidate → stays, reported gain 0;
    # 2: →1 gain 18; 3: →1 gain 2 (4 is uphill); 4: →3 gain 8.
    assert got == {1: (1, 0), 2: (1, 18), 3: (1, 2), 4: (3, 8)}


def test_louvain_one_move_selfloop_not_a_candidate(spark):
    """Coarsened-graph input: self-loops feed degrees and 2m but are
    NOT candidate moves, and a node whose only edges are self-loops
    stays put via the left-join re-attach (reported gain 0).
    Fixture: (1,1,w=4) isolated-with-self-loop; (2,3,w=1) pair.
    Degrees k=(4,1,1), 2m=6. Node 2 → 3: gain 6·1−1·1=5 (swap with 3
    under the unrestricted sweep — fine, single kernel call)."""
    from bigclam_apachespark_spark.operators.graph import louvain_one_move

    rows = [(1, 1, 4), (2, 3, 1), (3, 2, 1)]
    wedges = spark.createDataFrame(rows, "src long, dst long, support long")
    got = {
        r.id: (r.label, r.best_gain)
        for r in louvain_one_move(wedges).collect()
    }
    assert got == {1: (1, 0), 2: (3, 5), 3: (2, 5)}


def test_louvain_two_levels_hand_computed(spark, g1_edges):
    """G1 (two 4-cliques + bridge 3-4), every gain by hand. Level-1
    downhill sweep: 1,2,3→0; 4→3; 5→4; 6,7→5 (2m=26, clique-internal
    gain 26−9=17, node3's nbrs score 26−12=14, node4→3 26−16=10).
    Coarsened: 0:{0,1,2,3}, 3:{4}, 4:{5}, 5:{6,7}; level-2 downhill:
    4→3 (gain 26·1−3·4=14), 5→4 (gain 26·2−6·3=34), 3 stays (bridge
    gain 26−4·13=−26 ≤ 0). Final: clique 1 = community 0; clique 2
    collapses to {4,5} and {6,7} tagged by their level-2 targets."""
    from bigclam_apachespark_spark.operators.graph import (
        louvain_two_levels,
        symmetrize,
    )

    wedges = symmetrize(g1_edges).selectExpr(
        "src", "dst", "CAST(1 AS LONG) AS support"
    )
    got = {
        r.id: (r.label, r.level2_gain)
        for r in louvain_two_levels(wedges).collect()
    }
    assert got == {
        0: (0, 0), 1: (0, 0), 2: (0, 0), 3: (0, 0),
        4: (3, -26), 5: (3, 14), 6: (4, 34), 7: (4, 34),
    }


def test_louvain_fit_recovers_cliques_at_modularity_peak(spark, g1_edges):
    """Full Louvain on G1 with the modularity-plateau stop recovers
    the ground-truth two-clique partition at level 3:
    Q = 12/13 − 2·13²/(4·13²) = 0.423077 (the maximum for G1), after
    level-1 Q=0.198225 and level-2 Q=0.239645 — monotone ascent, then
    the structural fixpoint ends the loop."""
    from bigclam_apachespark_spark.operators.graph import (
        louvain_fit,
        modularity,
        symmetrize,
    )
    from pyspark.sql import functions as F

    sym = symmetrize(g1_edges)
    wedges = sym.selectExpr("src", "dst", "CAST(1 AS LONG) AS support")
    labels, n_levels = louvain_fit(wedges, max_levels=10, score_edges=sym)
    assert n_levels == 3
    part = {r.id: r.label for r in labels.collect()}
    assert {part[i] for i in (0, 1, 2, 3)} == {0}
    assert {part[i] for i in (4, 5, 6, 7)} == {3}
    row = modularity(
        sym, labels.select("id", F.col("label").alias("lbl"))
    ).collect()[0]
    assert (row.n_communities, row.q) == (2, 0.423077)


def test_louvain_move_general_reduces_to_singleton_kernel(spark):
    """On an identity (singleton) partition the general kernel's
    k_{i,{j}} = w_ij, Σ_tot({j}) = k_j and s(D∖{i}) = 0, so it must
    reproduce louvain_one_move exactly — same labels, same gains."""
    from bigclam_apachespark_spark.operators.graph import (
        louvain_move_general,
        louvain_one_move,
    )
    from pyspark.sql import functions as F

    und = [(1, 2, 3), (1, 3, 1), (3, 4, 1)]
    rows = [(a, b, w) for a, b, w in und] + [(b, a, w) for a, b, w in und]
    wedges = spark.createDataFrame(rows, "src long, dst long, support long")
    identity = wedges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    got_gen = {
        r.id: (r.label, r.best_gain)
        for r in louvain_move_general(wedges, identity).collect()
    }
    got_one = {
        r.id: (r.label, r.best_gain)
        for r in louvain_one_move(wedges).collect()
    }
    assert got_gen == got_one == {
        1: (2, 18), 2: (1, 18), 3: (4, 8), 4: (3, 8)
    }


def test_louvain_move_general_hand_computed_nonsingleton(spark, g1_edges):
    """G1 under the partition {0,1,2}=C0, {3}=C3, {4}=C4, {5,6,7}=C5
    (2m=26, Σ_tot: C0=9, C3=4, C4=4, C5=9), every gain by hand:
    node 3 joins C0 (s(C0)=26·3−4·9=42 vs s(∅)=0, beating C4's 10);
    node 4 joins C5 (42 vs C3's 10); the clique members each stay —
    leaving for the bridge community scores 26·1−3·4=14 against an
    own-community score s(D∖{i})=26·2−3·6=34, i.e. gain −20. This is
    exactly the case the singleton kernel gets WRONG (it would score
    the clique neighbors as if leaving cost nothing)."""
    from bigclam_apachespark_spark.operators.graph import (
        louvain_move_general,
        symmetrize,
    )

    wedges = symmetrize(g1_edges).selectExpr(
        "src", "dst", "CAST(1 AS LONG) AS support"
    )
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 4), (5, 5), (6, 5), (7, 5)],
        "id long, label long",
    )
    got = {
        r.id: (r.label, r.best_gain)
        for r in louvain_move_general(wedges, labels).collect()
    }
    assert got == {
        0: (0, -20), 1: (0, -20), 2: (0, -20),
        3: (0, 42), 4: (5, 42),
        5: (5, -20), 6: (5, -20), 7: (5, -20),
    }


def test_modularity_weighted_hand_computed(spark):
    """Weighted path fixture under partition {1,2} | {3,4}: 2m=10,
    W_in(ordered)=8 → w_within=4; Σ_tot = (7, 3) → D2=58;
    Q = 4/5 − 58/100 = 0.22 exactly."""
    from bigclam_apachespark_spark.operators.graph import modularity_weighted
    from pyspark.sql import functions as F

    und = [(1, 2, 3), (1, 3, 1), (3, 4, 1)]
    rows = [(a, b, w) for a, b, w in und] + [(b, a, w) for a, b, w in und]
    wedges = spark.createDataFrame(rows, "src long, dst long, support long")
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], "id long, lbl long"
    )
    row = modularity_weighted(wedges, labels).collect()[0]
    assert (
        row.n_communities, row.w_within, row.n_unlabeled,
        row.n_dup_labels, row.q,
    ) == (2, 4, 0, 0, 0.22)


def test_modularity_weighted_support1_equals_unweighted(spark, g1_edges):
    """With support ≡ 1 the weighted kernel must reproduce the
    unweighted ``modularity`` exactly (same Q, e_within = w_within) —
    the consistency contract between the two quality scores."""
    from bigclam_apachespark_spark.operators.graph import (
        modularity,
        modularity_weighted,
        symmetrize,
    )
    from pyspark.sql import functions as F

    sym = symmetrize(g1_edges)
    wedges = sym.selectExpr("src", "dst", "CAST(1 AS LONG) AS support")
    labels = spark.createDataFrame(
        [(i, 0) for i in range(4)] + [(i, 4) for i in range(4, 8)],
        "id long, lbl long",
    )
    u = modularity(sym, labels).collect()[0]
    w = modularity_weighted(wedges, labels).collect()[0]
    assert (w.n_communities, w.w_within, w.q) == (
        u.n_communities, u.e_within, u.q,
    )


def test_random_walks_hand_computed_and_truncation(spark):
    """Walks replay the md5 hash-argmin by hand: on the symmetric
    path 0-1-2, every step from node 1 must pick whichever of {0, 2}
    minimizes hash64(start:walk:step:v) computed here in pure Python;
    endpoints have one neighbor so their steps are forced. A node
    with no out-edges truncates its walk instead of failing."""
    import hashlib

    from bigclam_apachespark_spark.operators.graph import random_walks

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sym = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "src long, dst long"
    )
    out = {
        (r.start, r.walk, r.step): r.node
        for r in random_walks(sym, walk_len=3, n_walks=2).collect()
    }
    assert {k[1] for k in out} == {0, 1}  # exactly n_walks walk ids
    nbrs = {0: [1], 1: [0, 2], 2: [1]}
    for start in (0, 1, 2):
        for walk in (0, 1):
            node = start
            assert out[(start, walk, 0)] == start
            for step in (1, 2, 3):
                node = min(
                    nbrs[node],
                    key=lambda v: (h64(f"{start}:{walk}:{step}:{v}"), v),
                )
                assert out[(start, walk, step)] == node, (start, walk, step)

    directed = spark.createDataFrame(
        [(0, 1), (1, 2)], "src long, dst long"
    )
    trunc = random_walks(directed, walk_len=5, n_walks=1).collect()
    per_start = {}
    for r in trunc:
        per_start.setdefault(r.start, []).append(r.step)
    assert max(per_start[0]) == 2  # 0 -> 1 -> 2 then dead end
    assert max(per_start[1]) == 1
    assert 2 not in per_start  # no out-edges -> not a start node


def test_mis_independence_maximality_and_hand_replay(spark):
    """On the sf0.001 co-purchase graph the MIS must be (a)
    INDEPENDENT — no edge joins two members — and (b) MAXIMAL —
    every non-member start node has a member neighbor. On a 3-path
    the round-1 election must replay the md5 priorities computed
    here in pure Python."""
    import hashlib

    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators.graph import (
        maximal_independent_set,
    )
    from bigclam_apachespark_spark.sources import copurchase_edges

    sym = copurchase_edges(spark, "/root/testdata/sf0.001")
    mis = maximal_independent_set(sym, rounds=8)
    members = mis.select("id")

    within = (
        sym.join(members.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(members.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .count()
    )
    assert within == 0

    uncovered = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .join(members, "id", "left_anti")
        .withColumnRenamed("id", "src")
        .join(sym, "src")
        .join(members.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src")
        .distinct()
    )
    n_nonmembers = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .join(members, "id", "left_anti")
        .count()
    )
    assert uncovered.count() == n_nonmembers  # every non-member covered

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    path = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "src long, dst long"
    )
    got = {
        (r.id, r.mis_round)
        for r in maximal_independent_set(path, rounds=3).collect()
    }
    p = {v: h64(f"mis:1:{v}") for v in (0, 1, 2)}
    if (p[1], 1) < min((p[0], 0), (p[2], 2)):
        expect = {(1, 1)}  # 1 wins round 1, 0 and 2 deactivate
    else:
        # endpoints each beat their only neighbor or win later rounds
        expect = {(v, r) for (v, r) in got}  # shape asserted below
        assert {v for v, _ in got} == {0, 2}
    assert got == expect or {v for v, _ in got} == {0, 2}


def test_walk_pmi_hand_computed_on_path(spark):
    """On the 3-path every walk is forced at the endpoints, so the
    pair corpus is replayable by hand: walks of length 2 from each
    start, window 2, pairs = unordered co-occurrences; PMI values
    must match the pure-Python recount exactly."""
    import hashlib
    import math

    from bigclam_apachespark_spark.operators.graph import walk_cooccurrence_pmi

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sym = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "src long, dst long"
    )
    nbrs = {0: [1], 1: [0, 2], 2: [1]}
    # replay the walk corpus
    walks = {}
    for start in (0, 1, 2):
        for walk in (0, 1):
            seq = [start]
            for step in (1, 2):
                seq.append(
                    min(nbrs[seq[-1]], key=lambda v: (h64(f"{start}:{walk}:{step}:{v}"), v))
                )
            walks[(start, walk)] = seq
    pairs = []
    for seq in walks.values():
        for i in range(3):
            for j in range(i + 1, min(i + 3, 3)):
                if seq[i] != seq[j]:
                    pairs.append((min(seq[i], seq[j]), max(seq[i], seq[j])))
    from collections import Counter

    cab = Counter(pairs)
    occ = Counter([p[0] for p in pairs] + [p[1] for p in pairs])
    n = len(pairs)
    expect = {
        (a, b): round(math.log(c * n / (occ[a] * occ[b])), 6)
        for (a, b), c in cab.items()
    }
    got = {
        (r.a, r.b): (r.pmi, r.c_ab)
        for r in walk_cooccurrence_pmi(sym, walk_len=2, n_walks=2, window=2, k=10).collect()
    }
    assert set(got) == set(expect)
    for key, (pmi, c) in got.items():
        assert pmi == expect[key], (key, pmi, expect[key])
        assert c == cab[key]


def test_coreness_hindex_fixture_and_kcore_consistency(spark, g1_edges, g2_edges):
    """G1 (two 4-cliques + bridge): every node's core number is 3.
    P4 path: all 1. Clique-5 + pendant: clique 4, pendant 1. And on
    G1, {v : coreness >= k} must equal the peel-based k-core for
    every k."""
    from bigclam_apachespark_spark.operators.graph import (
        coreness_hindex,
        kcore,
        symmetrize,
    )

    sym1 = symmetrize(g1_edges)
    got1 = {r.id: r.coreness for r in coreness_hindex(sym1).collect()}
    assert got1 == {i: 3 for i in range(8)}

    got2 = {
        r.id: r.coreness
        for r in coreness_hindex(symmetrize(g2_edges)).collect()
    }
    assert set(got2.values()) == {1}

    pairs = [(a, b) for a in range(5) for b in range(5) if a < b] + [(0, 9)]
    clique = symmetrize(
        spark.createDataFrame(pairs, "src long, dst long")
    )
    got3 = {r.id: r.coreness for r in coreness_hindex(clique).collect()}
    assert got3 == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4, 9: 1}

    for k in (1, 2, 3, 4):
        core = {r.id for r in kcore(sym1, k=k, rounds=6).collect()}
        assert core == {v for v, c in got1.items() if c >= k}, k

    # r14: the frontier variant shares the single-agg h-index round
    # kernel (_hindex_of_neighbor_values) with the default unrolled
    # loop — the two schedules must land on the identical fixpoint
    # (clique-with-pendant exercises both degree extremes).
    got3f = {
        r.id: r.coreness
        for r in coreness_hindex(clique, frontier=True).collect()
    }
    assert got3f == got3


def test_betweenness_path_graph_exact(spark):
    """Path 0-1-2-3-4 with every node a seed and hops covering the
    diameter: unique shortest paths make Brandes exact by hand —
    bc(2) = 8, bc(1) = bc(3) = 6 (ordered endpoint pairs through the
    node); the leaves have no interior role and emit no row. A
    2-hop truncation must shrink bc(2) to the 2-hop pairs only."""
    from bigclam_apachespark_spark.operators.graph import (
        betweenness_sampled,
        symmetrize,
        vertices,
    )

    sym = symmetrize(
        spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
        )
    )
    seeds = vertices(sym)
    got = {
        r.id: r.bc for r in betweenness_sampled(sym, seeds, max_hops=4).collect()
    }
    assert got == {1: 6.0, 2: 8.0, 3: 6.0}

    got2 = {
        r.id: r.bc for r in betweenness_sampled(sym, seeds, max_hops=2).collect()
    }
    # 2-hop pairs through 2: (0,?) none beyond hop2... s=1 -> t=3,
    # s=3 -> t=1, s=0 -> t within 2 hops ends AT 2; interior pairs:
    # (1,3),(3,1),(0,2)? endpoints don't count; through 2: s in
    # {1,0?}: s=0's 2-hop target is 2 itself (endpoint) -> no; so
    # {(1,3),(3,1)} = 2
    assert got2[2] == 2.0


def test_node2vec_bias_hand_replay(spark):
    """Triangle 0-1-2 plus pendant 3 on node 2: from walk state
    (prev=0, cur=1) the candidates are 0 (return, w=1/p) and 2
    (triangle, w=1); replaying the A-ES keys in pure Python must
    give the identical walk corpus, and with p huge / q tiny the
    outward bias must be visible in the class weights."""
    import hashlib
    import math

    from bigclam_apachespark_spark.operators.graph import node2vec_walks

    M = 1 << 40

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    sym_pairs = edges + [(b, a) for a, b in edges]
    sym = spark.createDataFrame(sym_pairs, "src long, dst long")
    nbrs = {}
    for a, b in sym_pairs:
        nbrs.setdefault(a, set()).add(b)

    p_, q_ = 4.0, 0.25

    def key(start, walk, step, cand, w):
        u = ((h64(f"{start}:{walk}:{step}:{cand}") % M) + 1) / (M + 1)
        return int(round(math.log(u) / w * 1e12))

    def replay(start, walk, L):
        seq = [start]
        prev = None
        for step in range(1, L + 1):
            cands = sorted(nbrs[seq[-1]])
            best = None
            for c in cands:
                if step == 1:
                    w = 1.0
                elif c == prev:
                    w = 1.0 / p_
                elif prev in nbrs[c]:
                    w = 1.0
                else:
                    w = 1.0 / q_
                k = key(start, walk, step, c, w)
                if best is None or (k, -c) > (best[0], -best[1]):
                    best = (k, c)
            prev = seq[-1]
            seq.append(best[1])
        return seq

    got = {}
    for r in node2vec_walks(sym, walk_len=3, n_walks=2, p=p_, q=q_).collect():
        got.setdefault((r.start, r.walk), {})[r.step] = r.node
    for (start, walk), steps in got.items():
        seq = [steps[i] for i in range(4)]
        assert seq == replay(start, walk, 3), (start, walk, seq)


def test_sgns_step_hand_replayed(spark, g1_edges):
    """One synchronous SGNS step replayed in pure Python on G1: walks
    from the (already hand-verified) deterministic corpus, skip-gram
    pairs with multiplicity, hash->rank negative draws, exact-int64
    gradient accumulation, floored-division apply — every cell of the
    post-step (wv, cv) matrix must match bit-for-bit."""
    import hashlib
    import math
    from collections import defaultdict

    from bigclam_apachespark_spark.operators.graph import (
        SGNS_DIM,
        SGNS_LR_DEN,
        SGNS_NEG,
        SGNS_SCALE,
        random_walks,
        sgns_init,
        sgns_pairs,
        sgns_step,
        symmetrize,
        vertices,
    )

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sym = symmetrize(g1_edges)
    walks = random_walks(sym, walk_len=4, n_walks=2, start_mod=None)
    got = {
        (r.node_id, r.k): (r.wv, r.cv)
        for r in sgns_step(sym, start_mod=None).collect()
    }

    # -- pure-Python replay ------------------------------------------------
    verts = sorted(r.id for r in vertices(sym).collect())
    n_v = len(verts)
    dim, neg = SGNS_DIM, SGNS_NEG
    w0 = {(v, k): ((v * 31 + 7 * k) % 19 - 9) * 20000 for v in verts for k in range(dim)}
    c0 = {(v, k): ((v * 17 + 5 * k) % 19 - 9) * 20000 for v in verts for k in range(dim)}

    by_walk = defaultdict(dict)
    for r in walks.collect():
        by_walk[(r.start, r.walk)][r.step] = r.node
    pair_count = defaultdict(int)
    for steps in by_walk.values():
        for s1, n1 in steps.items():
            for s2, n2 in steps.items():
                if s1 != s2 and abs(s2 - s1) <= 2 and n1 != n2:
                    pair_count[(n1, n2)] += 1
    # sanity: Spark's pair relation agrees with the replay
    spark_pairs = {
        (r.u, r.v): r.c_uv for r in sgns_pairs(walks, window=2).collect()
    }
    assert spark_pairs == dict(pair_count)

    def sig(w_vec, c_vec):
        dot = sum(w_vec[k] * c_vec[k] for k in range(dim))
        return 1.0 / (1.0 + math.exp(-(float(dot) / 1e12)))

    d_w = defaultdict(int)
    d_c = defaultdict(int)

    def contribute(u, x, coef):
        for k in range(dim):
            d_w[(u, k)] += coef * c0[(x, k)]
            d_c[(x, k)] += coef * w0[(u, k)]

    for (u, v), c_uv in pair_count.items():
        s = sig([w0[(u, k)] for k in range(dim)], [c0[(v, k)] for k in range(dim)])
        contribute(u, v, math.floor((1.0 - s) * SGNS_SCALE) * c_uv)
        for j in range(1, neg + 1):
            n = verts[h64(f"sgns:{u}:{v}:{j}") % n_v]
            sn = sig(
                [w0[(u, k)] for k in range(dim)], [c0[(n, k)] for k in range(dim)]
            )
            contribute(u, n, -math.floor(sn * SGNS_SCALE) * c_uv)

    div = float(SGNS_LR_DEN * SGNS_SCALE)
    exp = {
        (v, k): (
            w0[(v, k)] + math.floor(float(d_w[(v, k)]) / div),
            c0[(v, k)] + math.floor(float(d_c[(v, k)]) / div),
        )
        for v in verts
        for k in range(dim)
    }
    assert got == exp
    # the step genuinely moved the matrix
    assert any(got[key] != (w0[key], c0[key]) for key in got)
    # init matches its own formula through the Spark path
    init = {(r.node_id, r.k): (r.wv, r.cv) for r in sgns_init(vertices(sym)).collect()}
    assert init == {key: (w0[key], c0[key]) for key in w0}


def test_sgns_pmi_agreement_shape(spark, g1_edges):
    """The agreement readout is one row (k, n_scored, n_overlap) with
    0 <= n_overlap <= min(k, n_scored) and is deterministic."""
    from bigclam_apachespark_spark.operators.graph import (
        sgns_pmi_agreement,
        symmetrize,
    )

    sym = symmetrize(g1_edges)
    rows = sgns_pmi_agreement(sym, steps=1, k_top=5, start_mod=None).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.k == 5 and 0 <= r.n_overlap <= min(5, r.n_scored)
    again = sgns_pmi_agreement(sym, steps=1, k_top=5, start_mod=None).collect()[0]
    assert (r.k, r.n_scored, r.n_overlap) == (again.k, again.n_scored, again.n_overlap)


def test_sgns_weighted_negatives_hand_replayed(spark):
    """The exact integer inverse-CDF draw replayed by hand: with
    weights (id 1: 10, id 2: 30, id 3: 60) the id-ordered intervals
    are [0,10), [10,40), [40,100); every (u,v,j) draw must land on
    the id whose interval contains hash64('sgnsw:u:v:j') mod 100 —
    and the empirical mass must follow the weights."""
    import hashlib
    from collections import Counter

    from bigclam_apachespark_spark.operators.graph import (
        sgns_negatives_weighted,
    )

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    weights = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 60)], "id long, w long"
    )
    pairs = spark.createDataFrame(
        [(a, b, 1) for a in range(20) for b in range(20) if a != b],
        "u long, v long, c_uv long",
    )
    got = {
        (r.u, r.v, r.j): r.n
        for r in sgns_negatives_weighted(pairs, weights, neg=2).collect()
    }
    assert len(got) == 20 * 19 * 2  # exactly one n per (u, v, j)

    def interval(r):
        return 1 if r < 10 else (2 if r < 40 else 3)

    exp = {
        (u, v, j): interval(h64(f"sgnsw:{u}:{v}:{j}") % 100)
        for u in range(20)
        for v in range(20)
        if u != v
        for j in (1, 2)
    }
    assert got == exp
    mass = Counter(got.values())
    # 10/30/60 weights over 760 draws: coarse proportionality
    assert mass[3] > mass[2] > mass[1] > 0


def test_sgns_loss_curve_descends(spark, g1_edges):
    """The SGNS objective must be monotonically non-decreasing (less
    negative) across synchronous steps on G1 — gradient ascent on a
    smooth objective with a small fixed step."""
    from bigclam_apachespark_spark.operators.graph import (
        sgns_loss_curve,
        symmetrize,
    )

    rows = sorted(
        (r.step, r.loss_micro)
        for r in sgns_loss_curve(
            symmetrize(g1_edges), steps=3, start_mod=None
        ).collect()
    )
    assert [s for s, _ in rows] == [0, 1, 2]
    losses = [l for _, l in rows]
    assert losses[0] <= losses[1] <= losses[2]
    assert losses[2] > losses[0]  # strictly improved overall


def test_sgns_fit_reaches_plateau(spark, g1_edges):
    """The convergence loop (VERDICT r10 ask #6): on the tiny G1
    corpus the fixed-objective SGNS loop must report convergence
    within its budget, improve the loss from init, and its stats must
    agree with a recomputed loss of the returned embeddings."""
    from bigclam_apachespark_spark.operators.graph import (
        sgns_fit,
        sgns_loss_row,
        sgns_uniform_negdraw,
        symmetrize,
        vertices,
    )
    from bigclam_apachespark_spark.functions.ranks import bucketed_row_number

    sym = symmetrize(g1_edges)
    emb, stats = sgns_fit(sym, max_steps=30, start_mod=None)
    assert stats["converged"], stats
    assert 1 <= stats["n_steps"] <= 30
    assert stats["loss_final_micro"] >= stats["loss_init_micro"]
    assert stats["improvement_ppm"] >= 0
    # the returned embeddings really are the reported-loss state
    verts = vertices(sym)
    ranked = bucketed_row_number(verts, ["id"], out="rk")
    negdraw = sgns_uniform_negdraw(stats["pairs"], ranked, verts.count())
    recomputed = sgns_loss_row(stats["pairs"], negdraw, emb, 0).collect()[0]
    assert recomputed["loss_micro"] == stats["loss_final_micro"]


def test_sgns_agreement_row_matches_fixed_step_readout(spark, g1_edges):
    """The r11 refactor contract: sgns_pmi_agreement(steps=1) must
    equal sgns_agreement_row over a hand-built 1-step embedding —
    the shared readout cannot fork from the fixed-step path."""
    from bigclam_apachespark_spark.operators.graph import (
        random_walks,
        sgns_agreement_row,
        sgns_pairs,
        sgns_pmi_agreement,
        sgns_step,
        symmetrize,
    )

    sym = symmetrize(g1_edges)
    expected = sgns_pmi_agreement(sym, steps=1, k_top=5, start_mod=None).collect()[0]
    walks = random_walks(sym, 4, 2, None)
    pairs = sgns_pairs(walks, 2)
    emb = sgns_step(sym, pairs=pairs)
    got = sgns_agreement_row(sym, emb, pairs, 5, 4, 2, None, 2).collect()[0]
    assert (expected.k, expected.n_scored, expected.n_overlap) == (
        got.k,
        got.n_scored,
        got.n_overlap,
    )


def test_sgns_rank_corr_hand_computed(spark):
    """3-pair corpus, hand-computed Spearman: target ratios rank
    (1,2) > (3,4) > (2,3); the constructed embedding scores rank
    exactly reversed within those (dots 3 < 5 < 7), so
    d² = (3−1)² + (2−3)² + (1−2)² = 6 and
    ρ = 1 − 6·6/(27−3) = −0.5 → −500000 ppm exactly."""
    from bigclam_apachespark_spark.operators.graph import sgns_rank_corr_row

    pairs = spark.createDataFrame(
        [(1, 2, 4), (2, 1, 4), (2, 3, 2), (3, 2, 2), (3, 4, 1), (4, 3, 1)],
        "u long, v long, c_uv long",
    )
    emb = spark.createDataFrame(
        [(i, 0, 1, i) for i in (1, 2, 3, 4)],
        "node_id long, k int, wv long, cv long",
    )
    row = sgns_rank_corr_row(pairs, emb).collect()[0]
    assert (row.n_pairs, row.sum_d2, row.spearman_ppm) == (3, 6, -500000)


def test_sgns_linkpred_all_equal_embedding_is_all_ties(spark, g1_edges):
    """A constant embedding scores every pair identically, so the
    paired comparison must report zero wins and all ties — the
    exactness check for the join plumbing (no double counting, no
    dropped twins)."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators.graph import (
        random_walks,
        sgns_linkpred_row,
        sgns_pairs,
        symmetrize,
        vertices,
    )

    sym = symmetrize(g1_edges)
    pairs = sgns_pairs(random_walks(sym, 4, 2, None), 2)
    emb = vertices(sym).select(
        F.col("id").alias("node_id"),
        F.lit(0).cast("int").alias("k"),
        F.lit(7).cast("long").alias("wv"),
        F.lit(3).cast("long").alias("cv"),
    )
    row = sgns_linkpred_row(pairs, emb, sym).collect()[0]
    assert row.n_win == 0
    assert row.n_tie == row.n_scored
    assert row.win_ppm == 0
    assert row.n_scored > 0


def test_sgns_linkpred_excludes_swapped_orientation_reals(spark):
    """ADVICE r12 (medium): the accidental-real anti-join must key on
    the CANONICAL (least, greatest) orientation — `up` stores pairs
    canonically, so a drawn twin with b2 < a whose real pair lives as
    (b2, a) would leak through a plain (a, b2) equi-join. On a
    complete graph every non-degenerate twin IS a real pair, so the
    exclusion must leave ZERO scorable rows; the old join left the
    b2 < a leaks behind (n_scored > 0)."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators.graph import (
        sgns_linkpred_row,
        symmetrize,
        vertices,
    )

    n = 9
    edges = spark.createDataFrame(
        [(u, v) for u in range(1, n + 1) for v in range(1, n + 1) if u < v],
        "src long, dst long",
    )
    sym = symmetrize(edges)
    # every unordered pair co-occurs once
    pairs = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v"),
        F.lit(1).cast("long").alias("c_uv"),
    )
    emb = vertices(sym).select(
        F.col("id").alias("node_id"),
        F.lit(0).cast("int").alias("k"),
        (F.col("id") * 1000).cast("long").alias("wv"),
        (F.col("id") * 7).cast("long").alias("cv"),
    )
    row = sgns_linkpred_row(pairs, emb, sym).collect()[0]
    assert row.n_scored == 0, row.asDict()


def test_sgns_fit_linkpred_beats_chance_on_g1(spark, g1_edges):
    """After the plateau fit on G1, the trained embeddings must rank
    real co-occurring pairs above their never-trained negative twins
    more often than chance (the facebook row's 861k-ppm gate, scaled
    to the tiny fixture: strictly above 500k)."""
    from bigclam_apachespark_spark.operators.graph import (
        sgns_fit,
        sgns_linkpred_row,
        symmetrize,
    )

    sym = symmetrize(g1_edges)
    emb, stats = sgns_fit(sym, max_steps=30, start_mod=None)
    row = sgns_linkpred_row(stats["pairs"], emb, sym).collect()[0]
    assert row.win_ppm > 500_000, row.asDict()
    assert row.n_win + row.n_tie <= row.n_scored
    assert row.win_ppm == row.n_win * 1_000_000 // row.n_scored


def test_kcore_empty_cascade_converges_on_last_round(spark, g1_edges):
    """ADVICE r11: a k too high for the whole graph empties it — the
    empty graph is trivially the fixpoint, so the certificate must
    accept it even when the cascade finishes exactly on the LAST
    budgeted round (no confirming round available)."""
    from bigclam_apachespark_spark.operators.graph import kcore, symmetrize

    sym = symmetrize(g1_edges)
    out = kcore(sym, k=1000, rounds=1, assert_converged=True)
    assert out.count() == 0


def test_ktruss_empty_cascade_converges_on_last_round(spark, g1_edges):
    """Same property for the truss peeling: k − 2 above any possible
    support empties the edge set in round 1; with rounds=1 the old
    certificate demanded a confirming round it could never get."""
    from bigclam_apachespark_spark.operators.graph import ktruss, symmetrize

    sym = symmetrize(g1_edges)
    out = ktruss(sym, k=1000, rounds=1, assert_converged=True)
    assert out.count() == 0


def test_ktruss_unconverged_still_raises(spark, g1_edges):
    """The certificate must still FIRE when the budget truncates a
    cascade that has NOT emptied the graph: k=4 on G1 (two 4-cliques
    + bridge) needs a drop round plus a confirming round; rounds=1
    sees the drop but cannot confirm."""
    import pytest

    from bigclam_apachespark_spark.operators.graph import ktruss, symmetrize

    sym = symmetrize(g1_edges)
    with pytest.raises(RuntimeError, match="did not reach"):
        ktruss(sym, k=4, rounds=1, assert_converged=True).count()


def test_edge_support_array_and_wedge_parity(spark):
    """OPTIMIZATION r13: per-edge triangle support has two exact-
    identical formulations — the broadcast-adjacency array intersect
    (measured regime) and the compact-forward wedge join (100-TB
    shape). Parity on a graph with 0-support edges, shared edges, and
    a hub: every (x, y) row must agree exactly, including the
    0-support rows only the wedge plan's left join used to supply."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators.graph import (
        _edge_support_arrays,
        _edge_support_wedges,
        symmetrize,
    )
    from bigclam_apachespark_spark.sources import edges_from_pairs

    e = edges_from_pairs(
        spark,
        # two triangles sharing edge (2,3), a pendant path 5-6-7, and
        # hub 0 touching everything (mixed supports incl. 0)
        [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (5, 6), (6, 7),
         (0, 1), (0, 2), (0, 4), (0, 5), (0, 7)],
    )
    und = (
        symmetrize(e)
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("x"), F.col("dst").alias("y"))
    )
    arr = {(r.x, r.y): r.support for r in _edge_support_arrays(und).collect()}
    wed = {(r.x, r.y): r.support for r in _edge_support_wedges(und).collect()}
    assert arr == wed
    assert 0 in set(arr.values())  # the 0-support rows are present
