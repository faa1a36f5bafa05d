"""Property-based check of the vectorized stateful session kernel.

`_session_fn`'s numpy cumsum-of-breaks segmentation must be
bit-equivalent to the naive per-row reference for ANY batch split of
ANY event sequence, including the open-session state carried across
batch boundaries. Exercised WITHOUT Spark via a minimal GroupState
stand-in, so hypothesis can drive hundreds of cases in seconds.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from bigclam_apachespark_spark.streaming.events_stream import _session_fn

GAP_S = 60


class FakeState:
    hasTimedOut = False

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass

    def setTimeoutTimestamp(self, ms):
        pass


def reference(ts_us_sorted, values, gap_seconds):
    """The pre-round-4 per-row loop, kept as the executable spec:
    (closed sessions, open session) over the WHOLE sequence."""
    s0 = last = None
    n, sv = 0, 0.0
    out = []
    for ts_us, v in zip(ts_us_sorted, values):
        if s0 is None:
            s0, last, n, sv = ts_us, ts_us, 1, float(v)
        elif ts_us // 1_000_000 - last // 1_000_000 > gap_seconds:
            out.append((s0, last, n, sv))
            s0, last, n, sv = ts_us, ts_us, 1, float(v)
        else:
            last = ts_us
            n += 1
            sv += float(v)
    return out, (s0, last, n, sv)


@given(
    deltas=st.lists(st.integers(min_value=0, max_value=4 * GAP_S), min_size=1, max_size=60),
    values=st.data(),
    split=st.integers(min_value=0, max_value=60),
)
@settings(max_examples=200, deadline=None)
def test_vectorized_kernel_matches_reference(deltas, values, split):
    vals = values.draw(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            min_size=len(deltas),
            max_size=len(deltas),
        )
    )
    ts = []
    t = 1_700_000_000_000_000  # epoch micros
    for d in deltas:
        t += d * 1_000_000 + (d % 7) * 137  # sub-second jitter
        ts.append(t)

    fn = _session_fn(GAP_S, timeout="none")
    state = FakeState()
    split = min(split, len(ts))
    emitted = []
    for lo, hi in ((0, split), (split, len(ts))):
        if lo == hi:
            continue
        batch = pd.DataFrame(
            {"ts": pd.to_datetime(ts[lo:hi], unit="us"), "value": vals[lo:hi]}
        )
        for out in fn((7,), iter([batch]), state):
            emitted.extend(
                (
                    int(r["session_start"].value // 1000),
                    int(r["session_end"].value // 1000),
                    int(r["n_events"]),
                    float(r["sum_value"]),
                )
                for _, r in out.iterrows()
            )

    ref_closed, ref_open = reference(ts, vals, GAP_S)
    # (start, end, n) exactly; float sums to 1e-6 abs (the vectorized
    # reduceat's summation order differs from the sequential spec by
    # design — the 6dp output policy absorbs it, mirrored here)
    assert [(a, b, c) for a, b, c, _ in emitted] == [
        (a, b, c) for a, b, c, _ in ref_closed
    ]
    for (_, _, _, got), (_, _, _, want) in zip(emitted, ref_closed):
        assert abs(got - want) < 1e-6
    s0, last, n, sv, n_closed = state.get
    assert (s0, last, n) == ref_open[:3]
    assert abs(sv - ref_open[3]) < 1e-6
    assert n_closed == len(ref_closed)


def test_empty_batch_keeps_state():
    fn = _session_fn(GAP_S, timeout="none")
    state = FakeState()
    state.update((1_000_000, 2_000_000, 3, 4.5, 2))
    out = list(fn((1,), iter([pd.DataFrame({"ts": pd.to_datetime([]), "value": []})]), state))
    assert out == []
    assert state.get == (1_000_000, 2_000_000, 3, 4.5, 2)
