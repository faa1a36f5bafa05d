"""Local rehearsal of the driver's sf0.01 correctness gate.

Runs every registry query on Spark and (where present) its DuckDB
oracle, compares row count + schema + order-insensitive values, and
prints one JSON report. Usage:

    python scripts/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import math
import sys
import time
import traceback
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigclam_apachespark_spark.registry import ORACLE, QUERIES
from bigclam_apachespark_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(rows, colnames):
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(QUERIES)
    spark = get_spark("correctness_check")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    report: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        entry: dict = {}
        sdf = None  # so the finally-block never sees the previous query's DF
        try:
            sdf = QUERIES[name](spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
            entry["spark_rows"] = len(spark_rows)
            if name in ORACLE:
                res = duck.execute(ORACLE[name])
                duck_cols = [d[0] for d in res.description]
                duck_rows = res.fetchall()
                entry["oracle_rows"] = len(duck_rows)
                entry["rows_match"] = len(spark_rows) == len(duck_rows)
                entry["schema_match"] = sorted(spark_cols) == sorted(duck_cols)
                ns, nd = _norm(spark_rows, spark_cols), _norm(duck_rows, duck_cols)
                entry["hash_match"] = ns == nd
                if not entry["hash_match"]:
                    entry["first_mismatch"] = repr(
                        next(((a, b) for a, b in zip(ns, nd) if a != b), None)
                    )[:400]
                # Dtype-parity guard: fetchall() compares Python ints,
                # which is BLIND to DuckDB HUGEINT/DECIMAL outputs —
                # but the driver goes through pandas/arrow, where
                # HUGEINT becomes float64/decimal128 and its stringified
                # values ("3.0") hash-mismatch Spark's LONG ("3"). That
                # was the r1/r2 dedup_simhash / sim_hyperplane_buckets /
                # events_sessionize failure class: green locally, red
                # under the driver. DESCRIBE gets the types without
                # re-executing the query.
                bad_types = [
                    f"{r[0]}:{r[1]}"
                    for r in duck.execute(f"DESCRIBE {ORACLE[name]}").fetchall()
                    if "HUGEINT" in r[1] or r[1].startswith("DECIMAL")
                ]
                if bad_types:
                    entry["dtype_flags"] = bad_types
            else:
                entry["err"] = "no_oracle"
        except Exception:
            entry["err"] = traceback.format_exc()[-800:]
        finally:
            # deterministic cache release for queries that surface
            # their internal cache handles (see registry_ext
            # _with_handles) — a full-registry sweep must not lean on
            # LRU eviction between heavy minhash pipelines.
            for h in getattr(sdf, "_cache_handles", []) or []:
                try:
                    h.unpersist()
                except Exception:
                    pass
        entry["sec"] = round(time.time() - t0, 2)
        report[name] = entry
        ok = entry.get("hash_match", entry.get("err") == "no_oracle" and entry.get("spark_rows") is not None)
        print(f"{name}: {'OK' if ok else 'FAIL'} ({entry['sec']}s)", flush=True)

    out = Path(__file__).resolve().parent.parent / "CORRECTNESS_local.json"
    # A name-filtered run MERGES into the existing report: a one-query
    # probe must not clobber the full-sweep record (same guard as
    # bench.py's BENCH_local.json).
    if len(sys.argv) > 2 and out.exists():
        try:
            merged = json.loads(out.read_text())
        except Exception:
            merged = {}
        merged.update(report)
        out.write_text(json.dumps(merged, indent=1))
    else:
        out.write_text(json.dumps(report, indent=1))
    bad = [n for n, e in report.items()
           if e.get("err") not in (None, "no_oracle") or e.get("hash_match") is False
           or e.get("rows_match") is False or e.get("schema_match") is False
           or e.get("dtype_flags")]
    print(json.dumps({"total": len(report), "bad": bad}))


if __name__ == "__main__":
    main()
