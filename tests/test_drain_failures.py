"""Streaming-drain failure paths must surface as ERRORS, never as an
empty/partial sink (round-11 driver red: stream_sessionize's flush
deadline RuntimeError died inside a daemon thread, join() returned
normally, and the entry returned 0 rows with err=null).

These tests force each failure mode and assert the helper RAISES.
They are pure-Python (no SparkSession): the helpers only touch the
query object through lastProgress / processAllAvailable, so a stub
stands in for a StreamingQuery.
"""

import time

import pytest

from spark_eventhubs_spark.queries import _await_state_flush, _threaded_drain


class _Boom(Exception):
    pass


def test_threaded_drain_reraises_drain_exception():
    """An exception inside the drained callable must propagate out of
    _threaded_drain (the r11 silent-swallow bug), chained as cause."""

    def _drain():
        raise _Boom("flush did not complete")

    with pytest.raises(RuntimeError, match="drain into cat_x failed") as ei:
        _threaded_drain(_drain, budget_s=5, name="cat_x")
    assert isinstance(ei.value.__cause__, _Boom)


def test_threaded_drain_times_out_loudly():
    def _hang():
        time.sleep(30)

    t0 = time.time()
    with pytest.raises(RuntimeError, match="timed out"):
        _threaded_drain(_hang, budget_s=0.2, name="cat_x")
    assert time.time() - t0 < 5


def test_threaded_drain_passes_through_on_success():
    seen = []
    _threaded_drain(lambda: seen.append(1), budget_s=5, name="cat_x")
    assert seen == [1]


class _StuckQuery:
    """lastProgress never reaches the flushed state."""

    isActive = True
    lastProgress = {"stateOperators": [{"numRowsTotal": 999}]}


class _FlushedQuery:
    isActive = True
    lastProgress = {"stateOperators": [{"numRowsTotal": 1}]}


class _NoProgressQuery:
    isActive = True
    lastProgress = None


class _DeadQuery:
    """Query died mid-flush: isActive False, exception() carries the
    real failure, lastProgress frozen pre-flush."""

    isActive = False
    lastProgress = {"stateOperators": [{"numRowsTotal": 999}]}

    def __init__(self, exc=None):
        self._exc = exc

    def exception(self):
        return self._exc


def test_await_state_flush_raises_at_deadline():
    with pytest.raises(RuntimeError, match="watermark flush"):
        _await_state_flush(
            _StuckQuery(), time.time() + 0.2, "cat_x", poll_s=0.01
        )


def test_await_state_flush_raises_when_no_progress_ever():
    with pytest.raises(RuntimeError, match="watermark flush"):
        _await_state_flush(
            _NoProgressQuery(), time.time() + 0.2, "cat_x", poll_s=0.01
        )


def test_await_state_flush_returns_once_state_drained():
    _await_state_flush(_FlushedQuery(), time.time() + 5, "cat_x", poll_s=0.01)


def test_await_state_flush_surfaces_dead_query_error_immediately():
    """r12 ADVICE: a query that dies during the flush wait must
    surface its OWN error at once — not a misleading flush-deadline
    message after the full remaining budget burns."""
    boom = _Boom("executor lost")
    t0 = time.time()
    with pytest.raises(RuntimeError, match="died during watermark") as ei:
        _await_state_flush(
            _DeadQuery(boom), time.time() + 30, "cat_x", poll_s=0.01
        )
    assert time.time() - t0 < 5
    assert ei.value.__cause__ is boom


def test_await_state_flush_reports_clean_termination_without_flush():
    t0 = time.time()
    with pytest.raises(RuntimeError, match="terminated during watermark"):
        _await_state_flush(
            _DeadQuery(None), time.time() + 30, "cat_x", poll_s=0.01
        )
    assert time.time() - t0 < 5


def test_forced_flush_timeout_surfaces_from_threaded_drain():
    """The composed shape stream_sessionize uses: the flush wait runs
    INSIDE the drained callable; its deadline failure must come back
    out of _threaded_drain as an error, not vanish with the thread."""

    def _drain():
        _await_state_flush(_StuckQuery(), time.time() + 0.1, "cat_ssess",
                           poll_s=0.01)

    with pytest.raises(RuntimeError, match="failed") as ei:
        _threaded_drain(_drain, budget_s=5, name="cat_ssess")
    assert "watermark flush" in str(ei.value.__cause__)
