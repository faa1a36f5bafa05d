"""Shared DuckDB SQL fragments for the oracle gate.

The driver pre-registers parquet views (region nation customer
supplier part orders lineitem events documents embeddings); graph
views are derived inline per FIXTURES.md §5.
"""

EDGES_SQL = """
edges_g AS (
  SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
)"""

SYM_SQL = """
sym AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM edges_g
    UNION
    SELECT dst AS src, src AS dst FROM edges_g
  ) WHERE src <> dst
)"""

EDGES_CS_SQL = """
edges_cs AS (
  SELECT DISTINCT o.o_custkey AS src, 100000000 + l.l_suppkey AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)"""

CONDUCTANCE_SQL = f"""
WITH {EDGES_SQL}, {SYM_SQL},
ego_pairs AS (
  SELECT src AS u, dst AS m FROM sym
  UNION
  SELECT DISTINCT src AS u, src AS m FROM sym
),
twohop AS (
  SELECT e.u, s.dst AS w FROM ego_pairs e JOIN sym s ON e.m = s.src
),
flags AS (
  SELECT t.u, CASE WHEN ep.u IS NULL THEN 1 ELSE 0 END AS is_cut
  FROM twohop t LEFT JOIN ego_pairs ep ON ep.u = t.u AND ep.m = t.w
),
agg AS (
  SELECT u, SUM(is_cut) AS cut, COUNT(*) AS z FROM flags GROUP BY u
),
tot AS (SELECT COUNT(*) AS sdeg FROM sym)
SELECT u AS id,
  CASE WHEN z - cut = 0 THEN 0.0
       WHEN sdeg - (z - cut) - 2 * cut = 0 THEN 1.0
       ELSE CAST(cut AS DOUBLE) / LEAST(z - cut, sdeg - (z - cut) - 2 * cut)
  END AS phi
FROM agg, tot
"""

SEEDS_SQL = f"""
WITH {EDGES_SQL}, {SYM_SQL},
ego_pairs AS (
  SELECT src AS u, dst AS m FROM sym
  UNION
  SELECT DISTINCT src AS u, src AS m FROM sym
),
twohop AS (
  SELECT e.u, s.dst AS w FROM ego_pairs e JOIN sym s ON e.m = s.src
),
flags AS (
  SELECT t.u, CASE WHEN ep.u IS NULL THEN 1 ELSE 0 END AS is_cut
  FROM twohop t LEFT JOIN ego_pairs ep ON ep.u = t.u AND ep.m = t.w
),
agg AS (SELECT u, SUM(is_cut) AS cut, COUNT(*) AS z FROM flags GROUP BY u),
tot AS (SELECT COUNT(*) AS sdeg FROM sym),
cond AS (
  SELECT u AS id,
    CASE WHEN z - cut = 0 THEN 0.0
         WHEN sdeg - (z - cut) - 2 * cut = 0 THEN 1.0
         ELSE CAST(cut AS DOUBLE) / LEAST(z - cut, sdeg - (z - cut) - 2 * cut)
    END AS phi
  FROM agg, tot
),
cand AS (
  SELECT s.src, s.dst, c.phi,
         ROW_NUMBER() OVER (PARTITION BY s.src ORDER BY c.phi, s.dst) AS rn
  FROM sym s JOIN cond c ON s.dst = c.id
)
SELECT DISTINCT dst AS id, phi FROM cand WHERE rn = 1
"""


def modularity_tail_sql(labels_cte: str) -> str:
    """Newman-modularity CTE tail over any ``(id, lbl)`` labels CTE
    (expects ``sym`` in scope) — integer numerators (E_in, D2, m),
    then the same two IEEE divisions ``graph.modularity`` performs.
    Shared by the LPA twin (registry.py) and the BigCLAM
    community-quality twin (registry_bigclam.py)."""
    lf = labels_cte
    return f"""tagged AS (
  SELECT la.lbl AS la, lb.lbl AS lb
  FROM sym e JOIN {lf} la ON la.id = e.src JOIN {lf} lb ON lb.id = e.dst),
e_in AS (SELECT CAST(COUNT(*) / 2 AS BIGINT) AS e_within FROM tagged WHERE la = lb),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src),
dcs AS (SELECT l.lbl, SUM(d.deg) AS dc FROM deg d JOIN {lf} l ON l.id = d.id GROUP BY l.lbl),
comm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
                CAST(SUM(dc * dc) AS BIGINT) AS d2 FROM dcs),
mm AS (SELECT CAST(COUNT(*) / 2 AS BIGINT) AS m FROM sym),
unl AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_unlabeled
  FROM (SELECT DISTINCT src AS id FROM sym) v
  LEFT JOIN {lf} l ON l.id = v.id WHERE l.id IS NULL),
dupl AS (
  SELECT CAST(COUNT(*) - COUNT(DISTINCT id) AS BIGINT) AS n_dup_labels
  FROM {lf})
SELECT n_communities, e_within, n_unlabeled, n_dup_labels,
       round(CAST(e_within AS DOUBLE) / CAST(m AS DOUBLE)
             - CAST(d2 AS DOUBLE)
               / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)), 6) AS q
FROM e_in, comm, mm, unl, dupl"""


def modularity_tail_ctes(labels_cte: str, sfx: str) -> str:
    """Suffixed variant of ``modularity_tail_sql`` ending in a one-row
    CTE ``qrow{sfx}`` instead of a bare SELECT — lets several
    partitions' Q readouts coexist in one WITH clause (the
    ``graph_q_method_compare`` three-method readout). Same integer
    numerators, same two IEEE divisions."""
    lf = labels_cte
    return f"""tagged{sfx} AS (
  SELECT la.lbl AS la, lb.lbl AS lb
  FROM sym e JOIN {lf} la ON la.id = e.src JOIN {lf} lb ON lb.id = e.dst),
e_in{sfx} AS (SELECT CAST(COUNT(*) / 2 AS BIGINT) AS e_within
              FROM tagged{sfx} WHERE la = lb),
deg{sfx} AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src),
dcs{sfx} AS (SELECT l.lbl, SUM(d.deg) AS dc
             FROM deg{sfx} d JOIN {lf} l ON l.id = d.id GROUP BY l.lbl),
comm{sfx} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
                     CAST(SUM(dc * dc) AS BIGINT) AS d2 FROM dcs{sfx}),
mm{sfx} AS (SELECT CAST(COUNT(*) / 2 AS BIGINT) AS m FROM sym),
unl{sfx} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_unlabeled
  FROM (SELECT DISTINCT src AS id FROM sym) v
  LEFT JOIN {lf} l ON l.id = v.id WHERE l.id IS NULL),
dupl{sfx} AS (
  SELECT CAST(COUNT(*) - COUNT(DISTINCT id) AS BIGINT) AS n_dup_labels
  FROM {lf}),
qrow{sfx} AS (
  SELECT n_communities, e_within, n_unlabeled, n_dup_labels,
         round(CAST(e_within AS DOUBLE) / CAST(m AS DOUBLE)
               - CAST(d2 AS DOUBLE)
                 / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)), 6) AS q
  FROM e_in{sfx}, comm{sfx}, mm{sfx}, unl{sfx}, dupl{sfx})"""
