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
    queries._QUERIES["stream_running_counters"].__wrapped__(
        spark, sf_dir
    ).collect()
    after = set(glob.glob(pattern))
    assert after - before == set()
