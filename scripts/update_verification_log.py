"""Regenerate bigclam_apachespark_spark/verification_log.py from the
driver's CORRECTNESS_r*.json files.

Rotation policy (VERDICT r3 "Next round" #1-#2): the driver's gate
samples only the FIRST ~50 entries of ``queries()``, so registration
order decides which queries get a driver-recorded correctness row
each round. ``registry.py`` orders the dict least-recently-verified
first:

    sort key = (is_rows_only_smoke, effective_round, front_rank)

THE CONTRACT (stated to match the arithmetic, VERDICT r8 ask #5): a
full sweep of the registry takes ceil(|ORACLE| / 50) driver rounds
and the worst-case staleness is one round less — both DERIVED from
the registry size in ``registry._STALENESS_LIMIT``, not pinned to a
constant the registry can outgrow. At 230-250 oracle queries that is
a ~5-round cycle / 4-round worst-case staleness; every query's
between-rounds coverage comes from the builder's two-scale
round-close sweep, and the driver rows are the rolling independent
confirmation.

``effective_round`` is the last hash-green round for driver-green
queries, and ``introduction_round - staleness_limit`` for
never-driver-green ones — a never-verified query enters the window as
if it were already at the staleness limit, so it interleaves with
genuinely stale cohorts
instead of pre-empting them wholesale (the r7 starvation failure:
defaulting unseen queries to 0 let 50 brand-new queries consume the
whole window while the r4 cohort went 3 rounds unverified).
``front_rank`` breaks ties inside a cohort (former driver FAILs
first, then streaming/multimodal, then stable original order).
Rows-only smokes always run LAST so a driver budget truncation can
only ever drop entries that cannot hash-match anyway.

Run this once per round after the driver writes CORRECTNESS_r{N}.json:

    python scripts/update_verification_log.py
"""

from __future__ import annotations

import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "bigclam_apachespark_spark" / "verification_log.py"


def main() -> None:
    last_green: dict[str, int] = {}
    introduced: dict[str, int] = {}
    newest_round = 0
    for path in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        newest_round = max(newest_round, rnd)
        data = json.loads(path.read_text())
        for name, row in data.items():
            # First driver row of any kind (green, red, or rows-only)
            # bounds the query's introduction round from above.
            introduced.setdefault(name, rnd)
            introduced[name] = min(introduced[name], rnd)
            if row.get("hash_match"):
                last_green[name] = max(last_green.get(name, 0), rnd)

    lines = [
        '"""Driver-verification history (GENERATED — do not edit by hand).',
        "",
        "Regenerate with ``python scripts/update_verification_log.py`` after",
        "each round's CORRECTNESS_r{N}.json lands. ``registry.py`` uses",
        "LAST_GREEN (and, for never-driver-green queries, INTRODUCED with a",
        "staleness-limit bonus) to order queries least-recently-verified",
        "first so the driver's first-50 sampling window rotates over the",
        "whole registry without new registry growth starving stale cohorts",
        '(VERDICT r7 ask #1)."""',
        "",
        f"NEWEST_ROUND: int = {newest_round}",
        "",
        "LAST_GREEN: dict[str, int] = {",
    ]
    for name in sorted(last_green):
        lines.append(f'    "{name}": {last_green[name]},')
    lines.append("}")
    lines.append("")
    lines.append("# First round each query got ANY driver row (green or not).")
    lines.append("# Queries absent from every CORRECTNESS file default to")
    lines.append("# NEWEST_ROUND at rotation time (they are part of the newest")
    lines.append("# registry expansion the driver has not reached yet).")
    lines.append("INTRODUCED: dict[str, int] = {")
    for name in sorted(introduced):
        lines.append(f'    "{name}": {introduced[name]},')
    lines.append("}")
    lines.append("")
    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT} ({len(last_green)} hash-green queries)")

    # Report the DERIVED rotation contract (module docstring): cycle =
    # ceil(|ORACLE| / 50), worst-case staleness = cycle - 1, with
    # registry._STALENESS_LIMIT computed from the same arithmetic so
    # the stated invariant can never silently lag registry growth.
    try:
        import sys

        sys.path.insert(0, str(ROOT))
        from bigclam_apachespark_spark.registry import (
            ORACLE,
            _STALENESS_LIMIT,
        )

        n = len(ORACLE)
        cycle = -(-n // 50)
        print(
            f"rotation contract: {n} oracle queries -> cycle {cycle} "
            f"rounds, worst-case staleness {cycle - 1} rounds "
            f"(registry._STALENESS_LIMIT = {_STALENESS_LIMIT})"
        )
        if _STALENESS_LIMIT != cycle - 1:
            print(
                "WARNING: registry._STALENESS_LIMIT disagrees with the "
                "derived cycle — the computation in registry.py changed."
            )
    except Exception as ex:  # registry import needs pyspark; best-effort
        print(f"(cycle check skipped: {ex})")


if __name__ == "__main__":
    main()
