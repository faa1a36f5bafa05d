"""Two-scale verification of the CHAINED BigCLAM iteration bodies —
the last never-two-scale oracle queries (VERDICT r6 ask #4).

The driver-gate oracle for ``bigclam_two_iterations`` is one WITH
clause instantiating the verified iteration body twice; at sf0.1 that
single statement re-derives the whole round-1 chain inside round 2's
planning scope and is DuckDB-prohibitive. This script CHAINS instead:
round-1 factors are materialized into a temp table (exactly the
round(·, 6) re-quantization barrier the single-statement oracle puts
between iterations), and round 2 runs as a second statement reading
it — same numbers, tractable memory. Usage:

    python scripts/sweep_chained_iterations.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigclam_apachespark_spark import registry_bigclam as RB
from bigclam_apachespark_spark.sqlfrag import EDGES_SQL, SYM_SQL
from bigclam_apachespark_spark.registry import ORACLE, QUERIES
from bigclam_apachespark_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(rows, colnames):
    import math

    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = 0.0 if v == 0 else round(v, 9) if math.isfinite(v) else v
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("chained_sweep")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # --- one iteration: the single-statement driver oracle as-is ---
    t0 = time.time()
    sdf = QUERIES["bigclam_one_iteration"](spark, sf_dir)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    t_spark1 = time.time() - t0
    t0 = time.time()
    res = duck.execute(ORACLE["bigclam_one_iteration"])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    t_duck1 = time.time() - t0
    ok1 = _norm(srows, scols) == _norm(drows, dcols)
    print(
        f"bigclam_one_iteration: {'OK' if ok1 else 'MISMATCH'} "
        f"rows={len(srows)}/{len(drows)} spark={t_spark1:.1f}s duck={t_duck1:.1f}s",
        flush=True,
    )

    # --- two iterations: STAGED oracle (temp-table chain) ---
    t0 = time.time()
    sdf = QUERIES["bigclam_two_iterations"](spark, sf_dir)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    t_spark2 = time.time() - t0

    t0 = time.time()
    round1 = f"""
        CREATE OR REPLACE TEMP TABLE f_round1 AS
        WITH {EDGES_SQL}, {SYM_SQL}, {RB.FACTORS_LONG_SQL},
        {RB._iteration_ctes('_i1', 'factors_long')}
        SELECT node_id, k, val FROM fnext_i1
    """
    duck.execute(round1)
    round2 = f"""
        WITH {EDGES_SQL}, {SYM_SQL},
        f1 AS (SELECT node_id, k, val FROM f_round1),
        {RB._iteration_ctes('_i2', 'f1')}
        SELECT node_id, CAST(k AS INT) AS k, val AS fval FROM fnext_i2
    """
    res = duck.execute(round2)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    t_duck2 = time.time() - t0
    ok2 = _norm(srows, scols) == _norm(drows, dcols)
    print(
        f"bigclam_two_iterations (staged oracle): {'OK' if ok2 else 'MISMATCH'} "
        f"rows={len(srows)}/{len(drows)} spark={t_spark2:.1f}s duck={t_duck2:.1f}s",
        flush=True,
    )

    # Staged == single-statement equivalence at the gate scale: the
    # driver keeps the one-statement oracle; prove the chain is the
    # same computation where both are tractable.
    if "0.01" in sf_dir or "0.001" in sf_dir:
        res = duck.execute(ORACLE["bigclam_two_iterations"])
        one = _norm(res.fetchall(), [d[0] for d in res.description])
        print(
            "staged == single-statement:",
            one == _norm(drows, dcols),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
