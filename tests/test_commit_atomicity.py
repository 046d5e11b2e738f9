"""The hub-log commit must be write-then-rename, never an in-place
write of the visible file name: readers scan partition dirs for
parquet footer stats on every micro-batch (sources/datasource.py
hub_bounds), and at a 5 ms trigger cadence a reader reliably catches
an in-place write mid-flight and dies with "Parquet magic bytes not
found in footer" (reproduced at sf10, round 12).

Pure-Python (no SparkSession): commit_staged_paths is driver-side
pyarrow code.
"""

import os

import pyarrow as pa
import pyarrow.parquet as papq
import pytest

from spark_eventhubs_spark.sources import datasource as ds


def _stage_one_event(hub_dir: str) -> str:
    staging = os.path.join(hub_dir, "_staging")
    os.makedirs(staging, exist_ok=True)
    path = os.path.join(staging, "stage-00000-0.parquet")
    papq.write_table(
        pa.table(
            {
                "body": pa.array([b"x"], pa.binary()),
                "partition": pa.array(["0"], pa.string()),
                "partitionKey": pa.array([None], pa.string()),
                "properties": pa.array([[]], pa.map_(pa.string(), pa.string())),
            }
        ),
        path,
    )
    return path


def test_interrupted_commit_leaves_no_visible_file(tmp_path, monkeypatch):
    """Crash mid-write: the partition dir must contain NO visible
    .parquet file — the half-written bytes stay behind a dot-name
    that _parquet_files filters out."""
    hub = str(tmp_path / "hub")
    os.makedirs(hub)
    staged = _stage_one_event(hub)

    real_write = papq.write_table

    def dying_write(tbl, where, **kw):
        # emulate a crash after the file exists but before the footer
        with open(where, "wb") as fh:
            fh.write(b"PARTIAL")
        raise OSError("simulated crash mid-write")

    monkeypatch.setattr(ds.papq, "write_table", dying_write)
    with pytest.raises(OSError, match="simulated crash"):
        ds.commit_staged_paths(hub, [staged], "t0", partition_count=4)
    pdir = os.path.join(hub, "partition=0")
    assert os.path.isdir(pdir)
    assert ds._parquet_files(pdir) == []
    # hub_bounds must also survive the leftover partial file
    monkeypatch.setattr(ds.papq, "write_table", real_write)
    assert all(lo == hi for lo, hi in ds.hub_bounds(hub, 4).values())


def test_successful_commit_is_visible_and_readable(tmp_path):
    hub = str(tmp_path / "hub")
    os.makedirs(hub)
    staged = _stage_one_event(hub)
    n = ds.commit_staged_paths(hub, [staged], "t0", partition_count=4)
    assert n == 1
    pdir = os.path.join(hub, "partition=0")
    files = ds._parquet_files(pdir)
    assert len(files) == 1 and files[0].endswith("commit-t0.parquet")
    # no in-progress residue
    assert not [f for f in os.listdir(pdir) if f.startswith(".inprogress")]
    assert papq.read_table(files[0]).num_rows == 1
    assert ds.hub_bounds(hub, 4)[0] == (0, 1)
