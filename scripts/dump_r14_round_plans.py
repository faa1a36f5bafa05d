"""Dump the REAL per-round bodies of the r14 broadcast-hint kernels.

The committed query-level plan dumps are checkpoint tails: every
per-round localCheckpoint truncates the plan, so the join-strategy
change inside the loop body is invisible in them. Stubbing
checkpoints out doesn't work either — without checkpoints the
planner sees honest statistics and auto-broadcasts on its own, so
before/after would look identical and prove nothing.

The faithful evidence is the round body EXACTLY as the loop builds
it: on top of the previous round's real localCheckpoint (whose
LogicalRDD carries garbage size estimates, SPARK-39834). This script
wraps ``localCheckpoint`` to RECORD the DataFrame it is invoked on
(then checkpoints as normal), runs each touched kernel for a few
rounds on the sf0.1 substrate, and dumps the LAST recorded round
body's ``explain("formatted")`` — BroadcastHashJoin under the r14
exact-count hints, SortMergeJoin on the estimate-blind plans before.

Usage: python scripts/dump_r14_round_plans.py <tag>
writes plans/r14/<kernel>_roundbody_<tag>.txt
Run at HEAD for <tag>=after and in a worktree at the pre-hint commit
(4b201b7) for <tag>=before.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql.classic.dataframe import DataFrame as ClassicDF  # noqa: E402

RECORDED: list = []
_orig_lc = ClassicDF.localCheckpoint


def _recording_lc(self, eager=True, storageLevel=None):
    RECORDED.append(self)
    if storageLevel is None:
        return _orig_lc(self, eager=eager)
    return _orig_lc(self, eager=eager, storageLevel=storageLevel)


ClassicDF.localCheckpoint = _recording_lc  # type: ignore[method-assign]

from pyspark.sql import functions as F  # noqa: E402

from bigclam_apachespark_spark.operators import dedup as D  # noqa: E402
from bigclam_apachespark_spark.operators import graph as G  # noqa: E402
from bigclam_apachespark_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("round_plan_dump_r14")
    from bigclam_apachespark_spark.shared import shared_sym

    sym = shared_sym(spark, SF_DIR)
    sources = (
        sym.select("src").distinct().limit(50).select(sym.src.alias("id"))
    )
    pairs = (
        sym.where("src < dst")
        .limit(5000)
        .select(sym.src.alias("a"), sym.dst.alias("b"))
    )
    costed = sym.select("src", "dst", F.lit(7).cast("long").alias("cost"))

    kernels = {
        "pagerank": lambda: G.pagerank(sym, n_iter=3),
        "bfs_hops": lambda: G.bfs_hops(sym, sources, max_hops=2),
        "sssp_weighted": lambda: G.sssp_weighted(costed, sources, rounds=2),
        "mis": lambda: G.maximal_independent_set(
            sym, rounds=3, assert_converged=False
        ),
        "kcore": lambda: G.kcore(sym, rounds=3, assert_converged=False),
        "components": lambda: D.near_dup_clusters(pairs, max_iter=3),
        "betweenness": lambda: G.betweenness_sampled(sym, sources, max_hops=2),
    }
    for name, build in kernels.items():
        RECORDED.clear()
        try:
            df = build()
            df.count()  # drive the tail so every round body was really built
        except Exception as ex:  # pragma: no cover — diagnostic dump tool
            print(f"# {name}: SKIPPED ({type(ex).__name__}: {ex})")
            continue
        if not RECORDED:
            print(f"# {name}: no checkpoints recorded")
            continue
        body = RECORDED[-1]
        txt = _explain(body)
        path = out_dir / f"{name}_roundbody_{tag}.txt"
        path.write_text(txt)
        counts = {
            op: len(re.findall(op, txt))
            for op in ("BroadcastHashJoin", "SortMergeJoin", "Exchange")
        }
        print(f"# wrote {path.name}: rounds_recorded={len(RECORDED)} {counts}")
    spark.stop()


if __name__ == "__main__":
    main()
