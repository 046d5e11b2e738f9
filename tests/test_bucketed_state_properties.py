"""Property tests: the bucketed state kernels are EXACTLY the per-key
kernels under every interleaving.

Round 8 replaced per-user applyInPandasWithState groups with
hash(user)%B buckets (one state row of parallel arrays per bucket,
vectorized pandas per trigger) for ``streaming_scd2`` and
``streaming_asof_join``. The Spark-level tests pin two-path equality on
one replay of the hub fixture; these hypothesis tests drive the update
FUNCTIONS directly with a fake GroupState over randomized streams —
random users (including None = event with no user_id property), random
event types, ties in event time, and random micro-batch boundaries —
and require the bucketed kernel's cumulative output to equal the
per-key kernel's, batch for batch. This is the strongest practical
statement of the docstring contract "output and state CONTENT are
identical — only the state layout changes".
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_eventhubs_spark.streaming.stateful import (
    _asof_bucket_update,
    _asof_update,
    _counters_bucket_update,
    _scd2_bucket_update,
    _scd2_update,
    _update_counters,
)


class FakeState:
    """The subset of pyspark's GroupState the update kernels touch."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        if self._v is None:
            raise ValueError("state does not exist")
        return self._v

    def update(self, v):
        self._v = tuple(v)


# event stream: (user | None, is_purchase, enq_us, seqNo); enq_us may
# tie across events (seqNo breaks the tie, as the hub replay does)
_users = st.sampled_from([None, "a", "b", "cc"])


@st.composite
def _streams(draw, mark_strategy):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    enq = 1_000_000
    for seq in range(n):
        enq += draw(st.sampled_from([0, 1, 60_000_000]))
        rows.append((draw(_users), draw(mark_strategy), enq, seq))
    # batch boundaries: random cut points -> at least one batch
    cuts = sorted(
        draw(
            st.sets(
                st.integers(min_value=1, max_value=max(1, n - 1)), max_size=5
            )
        )
    )
    batches = []
    lo = 0
    for c in cuts + [n]:
        if c > lo:
            batches.append(rows[lo:c])
            lo = c
    return batches


def _per_key_run(update_fn, batches, frame_of, key_of):
    """Drive the per-key kernel exactly as Spark would: one state per
    distinct key, each batch sliced per key (only keys present in the
    batch get a call)."""
    states: dict = {}
    out = []
    for batch in batches:
        by_key: dict = {}
        for r in batch:
            by_key.setdefault(key_of(r), []).append(r)
        for key, rows in by_key.items():
            state = states.setdefault(key, FakeState())
            for pdf in update_fn((key,), [frame_of(rows)], state):
                out.append(pdf)
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def _bucket_run(update_fn, batches, frame_of):
    """Drive the bucketed kernel with ONE bucket (the worst case for
    intra-bucket vectorization: every user shares a state row)."""
    state = FakeState()
    out = []
    for batch in batches:
        for pdf in update_fn((0,), [frame_of(batch)], state):
            out.append(pdf)
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def _canon(df: pd.DataFrame, cols) -> list:
    if df.empty:
        return []
    recs = []
    for t in df[list(cols)].itertuples(index=False):
        recs.append(tuple(None if pd.isna(v) else v for v in t))
    return sorted(
        recs, key=lambda r: tuple((v is not None, v) for v in r)
    )


# --------------------------------------------------------------------
# as-of join: side 0 = click, side 1 = purchase
# --------------------------------------------------------------------

def _asof_frame(rows):
    return pd.DataFrame(
        {
            "user_id": pd.array([r[0] for r in rows], dtype=object),
            "side": pd.array([int(r[1]) for r in rows], dtype="int64"),
            "enq_us": pd.array([r[2] for r in rows], dtype="int64"),
            "sequenceNumber": pd.array([r[3] for r in rows], dtype="int64"),
        }
    )


@pytest.mark.parametrize("kernel", ["asof"])
@given(batches=_streams(st.booleans()))
@settings(max_examples=150, deadline=None)
def test_asof_bucketed_kernel_equals_per_user(kernel, batches):
    per = _per_key_run(_asof_update, batches, _asof_frame, lambda r: r[0])
    buck = _bucket_run(_asof_bucket_update, batches, _asof_frame)
    cols = ("user_id", "purchase_us", "last_click_us")
    assert _canon(buck, cols) == _canon(per, cols)


# --------------------------------------------------------------------
# SCD2: event_type strings, runs close on type change
# --------------------------------------------------------------------

def _scd2_frame(rows):
    return pd.DataFrame(
        {
            "user_id_str": pd.array([r[0] for r in rows], dtype=object),
            "event_type": pd.array([r[1] for r in rows], dtype=object),
            "enq_us": pd.array([r[2] for r in rows], dtype="int64"),
            "sequenceNumber": pd.array([r[3] for r in rows], dtype="int64"),
        }
    )


# --------------------------------------------------------------------
# running counters: per-trigger cumulative (count, last-seen) rows
# --------------------------------------------------------------------

def _counters_frame(rows):
    return pd.DataFrame(
        {
            "user_id": pd.array([r[0] for r in rows], dtype=object),
            "enq_us": pd.array([r[2] for r in rows], dtype="int64"),
        }
    )


@given(batches=_streams(st.booleans()))
@settings(max_examples=150, deadline=None)
def test_counters_bucketed_kernel_equals_per_user(batches):
    """Update-mode semantics: each trigger emits one row per PRESENT
    user with the cumulative totals after it — the bucketed kernel
    must reproduce the per-user rows exactly, including the None-user
    carry across triggers (the 'nan' round-trip bug class)."""
    per = _per_key_run(
        _update_counters, batches, _counters_frame, lambda r: r[0]
    )
    buck = _bucket_run(_counters_bucket_update, batches, _counters_frame)
    cols = ("user_id", "n_events", "last_seen_us")
    assert _canon(buck, cols) == _canon(per, cols)


@given(batches=_streams(st.sampled_from(["x", "y", None])))
@settings(max_examples=150, deadline=None)
def test_scd2_bucketed_kernel_equals_per_user(batches):
    """None in the type domain: an event with no event_type property is
    a real run state (emitted as NULL by both kernels), not a sentinel
    — regression for the per-user kernel's old ``cur is None`` check."""
    per = _per_key_run(_scd2_update, batches, _scd2_frame, lambda r: r[0])
    buck = _bucket_run(_scd2_bucket_update, batches, _scd2_frame)
    cols = (
        "user_id_str", "state", "valid_from_us", "valid_to_us", "n_events"
    )
    assert _canon(buck, cols) == _canon(per, cols)
