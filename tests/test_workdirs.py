"""Scratch-directory lifecycle (spark_eventhubs_spark/workdirs.py).

The package materializes ingest artifacts and streaming checkpoints
under the system tempdir; workdirs tracks every such tree and reclaims
it — checkpoints immediately after their drain, artifacts at process
exit. These tests pin the mechanism and the one end-to-end contract
that used to leak: a catalog streaming drain must not leave its
checkpoint directory behind.
"""

import glob
import os

import pytest

from spark_eventhubs_spark import workdirs


def test_scratch_dir_tracked_and_released():
    d = workdirs.scratch_dir("seh_wdtest_")
    assert os.path.isdir(d)
    assert d in workdirs.tracked()
    workdirs.release(d)
    assert not os.path.exists(d)
    assert d not in workdirs.tracked()
    # releasing twice is a no-op, not an error
    workdirs.release(d)


def test_sweep_removes_everything_tracked():
    dirs = [workdirs.scratch_dir("seh_wdtest_") for _ in range(3)]
    removed = workdirs.sweep()
    assert set(dirs) <= set(removed)
    for d in dirs:
        assert not os.path.exists(d)
    assert workdirs.tracked() == set()
    # second sweep is empty and clean
    assert workdirs.sweep() == []


def test_keep_scratch_env_disables_removal(monkeypatch):
    monkeypatch.setenv("SEH_KEEP_SCRATCH", "1")
    d = workdirs.scratch_dir("seh_wdtest_")
    workdirs.release(d)
    assert os.path.isdir(d)  # kept for forensics
    monkeypatch.delenv("SEH_KEEP_SCRATCH")
    workdirs.track(d)
    workdirs.sweep()
    assert not os.path.exists(d)


def test_release_untracked_path_still_removes(tmp_path):
    # a dir created outside scratch_dir may still be handed to release
    p = tmp_path / "ext"
    p.mkdir()
    workdirs.release(str(p))
    assert not p.exists()


def test_streaming_drain_leaves_no_checkpoint(spark, sf_dir):
    """End-to-end: a catalog streaming twin's drain must release its
    seh_ckpt_* checkpoint once the query stops (the pre-fix behavior
    stranded one directory per drain — ~300 dirs per full-catalog
    run)."""
    import tempfile

    from spark_eventhubs_spark import queries

    pattern = os.path.join(tempfile.gettempdir(), "seh_ckpt_*")
    before = set(glob.glob(pattern))
    # __wrapped__ bypasses the per-session plan memo so the drain (and
    # its checkpoint allocation) really runs even if another test
    # already invoked this entry
    rows = queries._QUERIES["stream_running_counters"].__wrapped__(
        spark, sf_dir
    ).collect()
    # the drain must have processed REAL events: an earlier sweep test
    # may have reclaimed the session-cached hub dir, and a drain over a
    # deleted source would pass the checkpoint assertion vacuously
    assert rows
    after = set(glob.glob(pattern))
    assert after - before == set()


def test_sweep_mid_session_self_heals(spark, sf_dir):
    """A mid-process ``sweep()`` (the documented long-lived-driver
    call) reclaims scratch trees that live session memos still point
    at. The memos must re-validate and rebuild, not silently return
    empty results: before the fix, the second invocation below drained
    0 rows from the deleted hub dir with no error."""
    from spark_eventhubs_spark import queries

    fn = queries._QUERIES["stream_running_counters"].__wrapped__
    first = sorted(
        (r["user_id"], r["n_events"]) for r in fn(spark, sf_dir).collect()
    )
    assert first
    hub_before = queries._hub_stream_dir(spark, sf_dir)
    workdirs.sweep()
    assert not os.path.exists(hub_before)
    second = sorted(
        (r["user_id"], r["n_events"]) for r in fn(spark, sf_dir).collect()
    )
    assert second == first
    assert queries._hub_stream_dir(spark, sf_dir) != hub_before


def test_sweep_mid_session_rebuilds_bucketed_tables(spark, sf_dir):
    """Same self-heal contract for the bucketed catalog tables: after a
    sweep deletes their backing files, ensure_bucketed must detect the
    dead directory (the catalog still lists the table) and
    re-materialize instead of returning a table over deleted files."""
    from spark_eventhubs_spark import bucketing

    tabs = bucketing.ensure_bucketed(spark, sf_dir)
    n1 = spark.table(tabs["lineitem"]).count()
    assert n1 > 0
    workdirs.sweep()
    tabs2 = bucketing.ensure_bucketed(spark, sf_dir)
    n2 = spark.table(tabs2["lineitem"]).count()
    assert n2 == n1
