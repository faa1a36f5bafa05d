"""Dump .explain('formatted') for named queries to plans/r14/<q>_<tag>.txt.

Usage: python scripts/dump_r14_plans.py <tag> <query> [query ...]
Runs at sf0.1 (the bench scale) so plan shapes match the measured rows.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigclam_apachespark_spark.registry import QUERIES  # noqa: E402
from bigclam_apachespark_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan_dump_r14")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(txt)
        print(f"# wrote {name}_{tag}.txt ({len(txt.splitlines())} lines)")
        for h in getattr(df, "_cache_handles", []) or []:
            try:
                h.unpersist()
            except Exception:
                pass
    spark.stop()


if __name__ == "__main__":
    main()
