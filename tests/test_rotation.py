"""The verification-log rotation must never go stale (VERDICT r6 ask
#7): ``verification_log.LAST_GREEN`` orders the driver's ~50-query
sampling window least-recently-verified first, so a log regenerated
from an OLD round fronts the wrong cohort and queries silently exceed
the derived staleness bound (ceil(|ORACLE| / 50) - 1 rounds — see
scripts/update_verification_log.py). This suite fails loudly the moment
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
    """The registry ordering contract (VERDICT r7 ask #1): oracle
    queries sort by ascending EFFECTIVE round — last driver-green
    round, or introduction_round - staleness_limit for queries the
    driver has never hash-verified — so the first-50 window samples
    the stalest cohort, with never-seen queries interleaved at the
    staleness limit rather than pre-empting everything at 0."""
    from bigclam_apachespark_spark.registry import (
        ORACLE,
        QUERIES,
        _effective_round,
    )

    oracle_names = [n for n in QUERIES if n in ORACLE]
    rounds = [_effective_round(n) for n in oracle_names]
    assert rounds == sorted(rounds), (
        "registry order does not front the least-recently-verified "
        "oracle queries"
    )


def test_never_seen_queries_interleave_not_preempt():
    """A never-driver-green query introduced in round N must sort AS IF
    last verified in round N - staleness_limit — ahead of fresher
    cohorts but not ahead of cohorts that are older than that. This is
    the anti-starvation fix: r7's window was consumed 50/50 by
    brand-new queries while the r4 cohort went 3 rounds unverified."""
    from bigclam_apachespark_spark.registry import (
        _STALENESS_LIMIT,
        _effective_round,
    )
    from bigclam_apachespark_spark.verification_log import (
        INTRODUCED,
        LAST_GREEN,
        NEWEST_ROUND,
    )

    never_seen = [
        n for n in INTRODUCED if n not in LAST_GREEN
    ]
    for name in never_seen:
        assert _effective_round(name) == INTRODUCED[name] - _STALENESS_LIMIT
    # A brand-new query with no driver row at all keys off the newest
    # round on disk, never 0.
    assert (
        _effective_round("__no_such_query__") == NEWEST_ROUND - _STALENESS_LIMIT
    )


def test_staleness_limit_tracks_registry_size():
    """ADVICE r8: the limit must be derived from the oracle-query
    count (ceil(|ORACLE| / 50) - 1), not a constant that silently lags
    registry growth."""
    from bigclam_apachespark_spark.registry import ORACLE, _STALENESS_LIMIT

    assert _STALENESS_LIMIT == max(0, -(-len(ORACLE) // 50) - 1)


def test_unrolled_cte_chains_are_materialized():
    """The oracle-authoring rule (registry.py module docstring): in an
    unrolled iteration chain (two or more CTEs sharing an alphabetic
    prefix with distinct numeric suffixes, e.g. s0..s4, v0..v8,
    emb0..emb2), any step referenced more than once must be
    MATERIALIZED — inlining re-derives the whole chain prefix per
    reference (2^L blowup; the graph_walk_pmi >80 GB spill)."""
    import re
    from collections import defaultdict

    from bigclam_apachespark_spark.registry import ORACLE

    header = re.compile(r"\b(\w+?)\s+AS\s+(MATERIALIZED\s+)?\(", re.IGNORECASE)
    numbered = re.compile(r"^([A-Za-z_]+)(\d+)$")
    violations = []
    for name, sql in ORACLE.items():
        ctes = {}  # cte name -> materialized?
        for m in header.finditer(sql):
            ctes[m.group(1)] = bool(m.group(2))
        families = defaultdict(list)
        for cte in ctes:
            nm = numbered.match(cte)
            if nm:
                families[nm.group(1)].append(cte)
        chain_ctes = {c for fam in families.values() if len(fam) >= 2 for c in fam}
        for cte in chain_ctes:
            if ctes[cte]:
                continue
            # references = word occurrences beyond the definition header
            n_refs = len(re.findall(rf"\b{re.escape(cte)}\b", sql)) - 1
            if n_refs >= 2:
                violations.append(f"{name}: CTE {cte} referenced {n_refs}x, not MATERIALIZED")
    assert not violations, "\n".join(violations)

def test_survey_census_in_sync_with_registry():
    """VERDICT r10 ask #2: SURVEY.md is the judged spec — every registry
    query must appear in it by name, and the auto-generated §2.H census
    block must carry the live counts. Regenerate with
    ``python scripts/update_survey_census.py``."""
    from bigclam_apachespark_spark.registry import ORACLE, QUERIES

    survey = (ROOT / "SURVEY.md").read_text()
    missing = [n for n in QUERIES if f"`{n}`" not in survey]
    assert not missing, (
        f"{len(missing)} registry queries absent from SURVEY.md "
        f"(run scripts/update_survey_census.py): {missing[:10]}"
    )
    counts = (
        f"**{len(QUERIES)} driver queries, {len(ORACLE)} oracle-checked"
    )
    assert counts in survey, (
        "SURVEY.md §2.H census counts are stale — run "
        "scripts/update_survey_census.py"
    )
