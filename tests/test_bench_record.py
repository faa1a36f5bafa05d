"""BENCH_local.json write-path contract (VERDICT r10 asks #3 and #4):
within one driver round the per-query record is monotone non-increasing
across runs (a throttled window can never clobber a healthy
measurement), raw samples accumulate for mechanical p50/p95
noise-vs-regression adjudication, and a new driver round starts the
record fresh so genuine cross-round regressions stay visible. No Spark
needed — the writer is pure JSON plumbing.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402


@pytest.fixture()
def patched_round(monkeypatch):
    def set_round(n: int) -> None:
        monkeypatch.setattr(bench, "_newest_correctness_round", lambda: n)

    set_round(11)
    return set_round


def _write(
    out: Path,
    timings: dict[str, float],
    degraded: bool = False,
    cpus: int = bench.CANON_CPUS,
):
    bench._write_round_record(out, 0.1, timings, degraded, lambda m: 0.9, cpus)
    return json.loads(out.read_text()) if out.exists() else None


def test_within_round_min_merge_is_monotone(tmp_path, patched_round):
    out = tmp_path / "BENCH_local.json"
    first = _write(out, {"a": 5.0, "b": 2.0})
    assert first["queries"] == {"a": 5.0, "b": 2.0}
    second = _write(out, {"a": 3.0, "b": 4.0})
    # per-query min: a improves, b's earlier healthy value survives
    assert second["queries"] == {"a": 3.0, "b": 2.0}
    assert second["runs_this_round"] == 2
    third = _write(out, {"a": 30.0, "b": 30.0})  # throttled window
    assert third["queries"] == {"a": 3.0, "b": 2.0}


def test_samples_and_variance_accumulate(tmp_path, patched_round):
    out = tmp_path / "BENCH_local.json"
    _write(out, {"a": 5.0})
    rec = _write(out, {"a": 3.0})
    assert rec["samples"]["a"] == [5.0, 3.0]
    assert rec["variance"]["a"]["n"] == 2
    assert rec["variance"]["a"]["min"] == 3.0
    assert rec["variance"]["a"]["p50"] == 4.0
    assert rec["variance"]["a"]["p95"] >= rec["variance"]["a"]["p50"]


def test_new_round_starts_fresh(tmp_path, patched_round):
    out = tmp_path / "BENCH_local.json"
    _write(out, {"a": 3.0})
    patched_round(12)
    rec = _write(out, {"a": 9.0})
    # a genuine cross-round regression must stay visible
    assert rec["queries"] == {"a": 9.0}
    assert rec["runs_this_round"] == 1
    assert rec["round_key"] == 12


def test_legacy_record_without_samples_is_seeded(tmp_path, patched_round):
    out = tmp_path / "BENCH_local.json"
    out.write_text(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": 5.0,
                "unit": "sec",
                "queries": {"a": 5.0},
                "sf": 0.1,
                "round_key": 11,
            }
        )
    )
    rec = _write(out, {"a": 7.0})
    assert rec["queries"] == {"a": 5.0}
    assert rec["samples"]["a"] == [5.0, 7.0]


def test_sample_history_is_bounded(tmp_path, patched_round):
    out = tmp_path / "BENCH_local.json"
    for i in range(20):
        rec = _write(out, {"a": 10.0 + i})
    assert len(rec["samples"]["a"]) == 12
    # min survives in queries even after its sample aged out
    assert rec["queries"]["a"] == 10.0


def test_retired_queries_are_dropped(tmp_path, patched_round):
    """ADVICE r11: a query renamed or retired mid-round must not
    persist in the record and inflate the headline sum."""
    out = tmp_path / "BENCH_local.json"
    _write(out, {"a": 3.0, "old_name": 5.0})
    rec = _write(out, {"a": 2.0, "new_name": 4.0})
    assert "old_name" not in rec["queries"]
    assert "old_name" not in rec["samples"]
    assert rec["queries"] == {"a": 2.0, "new_name": 4.0}
    assert rec["value"] == 6.0


def test_prior_band_carries_across_round_roll(tmp_path, patched_round):
    """VERDICT r11 ask #3a: when the round key rolls, the outgoing
    round's variance becomes the new round's reference band, so the
    first n=1 window is mechanically adjudicable."""
    out = tmp_path / "BENCH_local.json"
    _write(out, {"a": 3.0})
    _write(out, {"a": 5.0})
    patched_round(12)
    rec = _write(out, {"a": 9.0})
    assert rec["round_key"] == 12
    assert rec["prior_round_key"] == 11
    assert rec["prior_band"]["a"]["min"] == 3.0
    assert rec["prior_band"]["a"]["n"] == 2
    # and the band survives subsequent same-round runs
    rec = _write(out, {"a": 8.0})
    assert rec["prior_band"]["a"]["min"] == 3.0
    assert rec["prior_round_key"] == 11


def test_low_core_runs_never_touch_the_record(tmp_path, patched_round):
    """VERDICT r13 #1: the record's bands are CANON_CPUS-core. The
    driver's low-core scaling pass (r13: 8 cores) used to min-merge
    into them, leaving minima a healthy 32-core run cannot hit — a
    mixed-cpus sequence must keep only the canonical samples."""
    out = tmp_path / "BENCH_local.json"
    # a low-core run before any canonical run: no record at all
    assert _write(out, {"a": 1.0}, cpus=8) is None
    assert not out.exists()
    first = _write(out, {"a": 5.0, "b": 2.0})  # canonical 32-core
    assert first["cpus"] == bench.CANON_CPUS
    # the low-core pass reads faster (fewer tiny shuffle tasks) but
    # must not lower the canonical minima nor add samples
    rec = _write(out, {"a": 1.3, "b": 0.9}, cpus=8)
    assert rec["queries"] == {"a": 5.0, "b": 2.0}
    assert rec["samples"]["a"] == [5.0]
    assert rec["runs_this_round"] == 1
    # a later canonical run merges normally
    rec = _write(out, {"a": 4.0, "b": 3.0})
    assert rec["queries"] == {"a": 4.0, "b": 2.0}
    assert rec["samples"]["a"] == [5.0, 4.0]
    assert rec["runs_this_round"] == 2


def test_gate_limit_caps_prior_band_ratchet():
    """ADVICE r12: the prior-round p95 may loosen the rerun gate, but
    only up to BAND_CAP_FACTOR x the committed EXPECTED anchor — an
    uncapped carry-over would let a gradual regression ratchet the
    band upward round over round undetected."""
    import bench

    # p95 inside the cap: the looser of anchor/p95 wins
    assert bench._gate_limit(4.0, 6.0) == 6.0
    # p95 below anchor: anchor stands
    assert bench._gate_limit(4.0, 2.0) == 4.0
    # p95 past the cap: clamped to BAND_CAP_FACTOR x anchor
    assert bench._gate_limit(4.0, 40.0) == bench.BAND_CAP_FACTOR * 4.0
    # no anchor: p95 passes through; no band: anchor passes through
    assert bench._gate_limit(None, 7.0) == 7.0
    assert bench._gate_limit(4.0, None) == 4.0
