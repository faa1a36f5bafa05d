"""The verification-log rotation must never go stale (VERDICT r6 ask
#7): ``verification_log.LAST_GREEN`` orders the driver's ~50-query
sampling window least-recently-verified first, so a log regenerated
from an OLD round fronts the wrong cohort and queries silently exceed
the two-round staleness guarantee. This suite fails loudly the moment
a new ``CORRECTNESS_r{N}.json`` lands without
``scripts/update_verification_log.py`` being re-run. No Spark needed.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _correctness_files() -> dict[int, dict]:
    out = {}
    for path in ROOT.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", path.name)
        if m:
            out[int(m.group(1))] = json.loads(path.read_text())
    return out


def test_verification_log_regenerated_from_newest_round():
    """LAST_GREEN must reflect every hash-green row of every driver
    round on disk — exactly what update_verification_log.py writes.
    A mismatch means the log predates the newest CORRECTNESS file:
    run ``python scripts/update_verification_log.py``."""
    from bigclam_apachespark_spark.verification_log import LAST_GREEN

    files = _correctness_files()
    assert files, "no CORRECTNESS_r*.json on disk"
    expected: dict[str, int] = {}
    for rnd, data in sorted(files.items()):
        for name, row in data.items():
            if row.get("hash_match"):
                expected[name] = max(expected.get(name, 0), rnd)
    assert LAST_GREEN == expected, (
        "verification_log.py is stale — regenerate with "
        "`python scripts/update_verification_log.py` "
        f"(newest driver round on disk: r{max(files)}, "
        f"newest round in the log: r{max(LAST_GREEN.values(), default=0)})"
    )


def test_registry_fronts_least_recently_verified():
    """The registry ordering contract: every never-driver-green
    oracle query sorts before every driver-green one, and green
    queries sort by ascending last-green round — so the driver's
    first-50 window always samples the stalest cohort."""
    from bigclam_apachespark_spark.registry import ORACLE, QUERIES
    from bigclam_apachespark_spark.verification_log import LAST_GREEN

    oracle_names = [n for n in QUERIES if n in ORACLE]
    rounds = [LAST_GREEN.get(n, 0) for n in oracle_names]
    # rows-only smokes aside, the oracle-bearing prefix must be
    # non-decreasing in last-green round
    assert rounds == sorted(rounds), (
        "registry order does not front the least-recently-verified "
        "oracle queries"
    )
