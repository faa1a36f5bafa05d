"""Reconstruct a clean per-query timing map from a driver BENCH_r{N}.json.

The driver's artifact carries ``parsed: null`` and a ``tail`` that is a
raw truncated fragment of bench.py's one-line JSON (the leading bytes
are cut, so it does not json-parse). This tool recovers every complete
``"name": seconds`` pair by regex, validates the names against the
query registry, and cross-checks the values against the committed
``BENCH_local.json`` merge-by-min record (r9 verdict ask #6).

Usage:
    python scripts/parse_driver_bench.py BENCH_r09.json [...]

Prints one JSON object per input file:
    {"file": ..., "n_queries": ..., "queries": {...}, "sf": ...,
     "unknown_names": [...], "vs_local": {"n_common": ..,
     "median_ratio": .., "over_2x": [...]}}

Exit status is nonzero only when a tail yields no parsable pairs or
contains names absent from the registry (a real format drift, not a
slow host window).
"""

from __future__ import annotations

import json
import re
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PAIR = re.compile(r'"([A-Za-z0-9_]+)":\s*(-?\d+(?:\.\d+)?)')
# keys of the envelope JSON that are not query timings
META_KEYS = {"value", "sf", "n", "rc", "cpus"}


def parse_tail(tail: str) -> tuple[dict[str, float], float | None]:
    """All complete "name": number pairs in the fragment. The FIRST
    pair may be truncated mid-key (the driver cut leading bytes), so
    drop it unless the fragment happens to start at a quote."""
    pairs = list(PAIR.finditer(tail))
    if pairs and not tail.lstrip().startswith('"'):
        # leading fragment like 'on_window": 0.736' — regex still
        # matches the partial key; discard it.
        pairs = pairs[1:]
    queries: dict[str, float] = {}
    sf = None
    for m in pairs:
        name, val = m.group(1), float(m.group(2))
        if name == "sf":
            sf = val
        if name in META_KEYS:
            continue
        queries[name] = val
    return queries, sf


def main() -> int:
    from bigclam_apachespark_spark.registry import QUERIES

    files = sys.argv[1:] or sorted(str(p) for p in REPO.glob("BENCH_r*.json"))
    local_path = REPO / "BENCH_local.json"
    local = {}
    if local_path.exists():
        local = json.load(open(local_path)).get("queries", {})

    rc = 0
    for f in files:
        doc = json.load(open(f))
        queries, sf = parse_tail(doc.get("tail") or "")
        parsed = doc.get("parsed")
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            # the driver did parse — prefer its map, tail is backup
            queries = {**queries, **parsed["queries"]}
            sf = parsed.get("sf", sf)
        unknown = sorted(n for n in queries if n not in QUERIES)
        common = {n: v for n, v in queries.items() if n in local and local[n] > 0}
        ratios = sorted(v / local[n] for n, v in common.items())
        report = {
            "file": str(f),
            "n_queries": len(queries),
            "sf": sf if sf is not None else doc.get("sf"),
            "queries": dict(sorted(queries.items())),
            "unknown_names": unknown,
            "vs_local": {
                "n_common": len(common),
                "median_ratio": round(statistics.median(ratios), 3) if ratios else None,
                "over_2x": sorted(
                    n for n, v in common.items() if v > 2.0 * local[n]
                ),
            },
        }
        print(json.dumps(report))
        if not queries:
            print(f"ERROR: {f}: no parsable query timings in tail", file=sys.stderr)
            rc = 1
        if unknown:
            print(
                f"ERROR: {f}: names not in registry: {unknown[:10]}",
                file=sys.stderr,
            )
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
