"""Native Spark 4 Python DataSource: ``spark.read.format("eventhubs")``.

The reference registers ``"eventhubs"`` through Java's DataSourceRegister
(core/src/main/resources/META-INF/services, provider
core/src/main/scala/org/apache/spark/sql/eventhubs/EventHubsSourceProvider.scala:56-64)
and exposes: a fixed-schema batch relation (EventHubsRelation.scala), a
micro-batch streaming source (EventHubsSource.scala), and batch/stream
sinks (EventHubsSourceProvider.scala:108-141, EventHubsSink.scala). This
module is the same surface through PySpark 4's DataSource API, so users
write exactly the idiomatic calls the reference documents:

    spark.dataSource.register(EventHubsDataSource)       # once
    df  = spark.read.format("eventhubs").options(**conf).load()
    sdf = spark.readStream.format("eventhubs").options(**conf).load()
    df.write.format("eventhubs").mode("append").options(**conf).save()
    sdf.writeStream.format("eventhubs").options(**conf).start()

Storage is a **materialized hub directory**: hive layout
``partition=<pid>/*.parquet`` in the canonical 9-column schema minus the
partition key column, each file sorted by ``sequenceNumber``. This is
the file-backed analogue of the service's per-partition append-only log
(SURVEY §1.1) and what :func:`materialize_hub` writes.

Scale design (100 TB):
- **Planning is metadata-only.** earliest/latest per partition come
  from parquet footer row-group statistics (`hub_bounds`) — no data
  pages are read to plan a batch, mirroring the reference's
  ``allBoundedSeqNos`` service probe (EventHubsClient.scala:124-139).
- **One InputPartition per (hub partition, planned range)** — the
  reference's partition-aligned parallelism (EventHubsRDD.scala:46-57).
  Each task reads only its partition directory (hive pruning) and only
  the row groups overlapping its seqNo range (stats pruning), via
  Arrow batches end to end.
- **Rate limiting** reuses the proportional backlog-weighted split
  (streaming/ratelimit.py, ref EventHubsSource.scala:263-319) inside
  ``latestOffset``; the streaming engine's own offset log provides
  exactly-once planning.
- The write path stages per-task Arrow files, then ``commit()``
  assigns dense per-partition sequence numbers centrally — the role
  the service's broker plays on arrival; at-least-once delivery with
  batchId idempotence, matching the reference sink
  (EventHubsSink.scala:35-42).

Deployment note: like any Python DataSource, the package must be
importable by Spark's Python workers (pip-install on executors, or
PYTHONPATH; tests/bench set PYTHONPATH before session start).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pacompute
import pyarrow.dataset as pads
import pyarrow.parquet as papq

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

# ---------------------------------------------------------------------------
# schema (ref EventHubsSourceProvider.scala:152-165)
# ---------------------------------------------------------------------------

HUB_SCHEMA_DDL = (
    "body binary, partition string, offset string, sequenceNumber long, "
    "enqueuedTime timestamp, publisher string, partitionKey string, "
    "properties map<string,string>, systemProperties map<string,string>"
)

# columns physically stored in the part files (partition = hive dir key)
_FILE_COLUMNS = [
    "body", "offset", "sequenceNumber", "enqueuedTime",
    "publisher", "partitionKey", "properties", "systemProperties",
]


def _arrow_file_schema() -> pa.Schema:
    return pa.schema(
        [
            pa.field("body", pa.binary()),
            pa.field("offset", pa.string()),
            pa.field("sequenceNumber", pa.int64()),
            pa.field("enqueuedTime", pa.timestamp("us", tz="UTC")),
            pa.field("publisher", pa.string()),
            pa.field("partitionKey", pa.string()),
            pa.field("properties", pa.map_(pa.string(), pa.string())),
            pa.field("systemProperties", pa.map_(pa.string(), pa.string())),
        ]
    )


def _arrow_out_schema() -> pa.Schema:
    fs = _arrow_file_schema()
    return pa.schema(
        [fs.field("body"), pa.field("partition", pa.string())]
        + [fs.field(n) for n in _FILE_COLUMNS[1:]]
    )


def _partitioning() -> pads.Partitioning:
    return pads.partitioning(
        pa.schema([pa.field("partition", pa.string())]), flavor="hive"
    )


# ---------------------------------------------------------------------------
# metadata-only planning helpers
# ---------------------------------------------------------------------------

def _partition_dirs(hub_dir: str) -> Dict[int, str]:
    out: Dict[int, str] = {}
    if not os.path.isdir(hub_dir):
        return out
    for name in os.listdir(hub_dir):
        if name.startswith("partition="):
            try:
                out[int(name.split("=", 1)[1])] = os.path.join(hub_dir, name)
            except ValueError:
                continue
    return out


def _parquet_files(d: str) -> List[str]:
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


# Footer-stat memo keyed by (path, column) -> ((mtime_ns, size), stats).
# Hub-log parquet files are IMMUTABLE once visible (writers stage to a
# temp name and rename on commit), so a file's footer statistics never
# change for a given (mtime, size) — re-opening the footer on every
# micro-batch made the planner spend half its per-trigger budget in
# pyarrow ParquetFile.__init__ (r6→r7 bench planner regression). A
# replaced path (same name, new mtime/size) overwrites its slot, so the
# memo is bounded by live file count.
_RG_STATS_CACHE: Dict[Tuple[str, str], Tuple[Tuple[int, int], list]] = {}


def _evict_rg_stats(path_prefix: str) -> int:
    """Drop memoized footer stats for paths under ``path_prefix``.

    Called by :func:`compact_hub_log` / :func:`truncate_hub_log` after
    their directory swap: those rewrite the whole file set under new
    part names, so the old paths' cache slots would otherwise live for
    the driver's lifetime (the per-slot overwrite only covers in-place
    path reuse). Returns the number of entries dropped.
    """
    prefix = path_prefix.rstrip("/") + "/"
    dead = [k for k in _RG_STATS_CACHE if k[0].startswith(prefix)]
    for k in dead:
        del _RG_STATS_CACHE[k]
    return len(dead)


def _rg_stats(path: str, column: str) -> List[Tuple[int, int, object, object]]:
    """Per row group: (index, num_rows, stat_min, stat_max) for column.
    Memoized per (path, mtime, size) — see ``_RG_STATS_CACHE``."""
    try:
        st = os.stat(path)
    except FileNotFoundError:
        # the file vanished (compaction/truncation swap): purge any
        # stale slot for it before propagating, so the cache can't
        # accumulate dead keys even off the explicit eviction paths
        _RG_STATS_CACHE.pop((path, column), None)
        raise
    tag = (st.st_mtime_ns, st.st_size)
    hit = _RG_STATS_CACHE.get((path, column))
    if hit is not None and hit[0] == tag:
        return hit[1]
    md = papq.ParquetFile(path).metadata
    try:
        ci = [md.schema.column(i).name for i in range(md.num_columns)].index(column)
    except ValueError:
        _RG_STATS_CACHE[(path, column)] = (tag, [])
        return []
    out = []
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        cst = rg.column(ci).statistics
        out.append(
            (i, rg.num_rows, cst.min if cst else None, cst.max if cst else None)
        )
    _RG_STATS_CACHE[(path, column)] = (tag, out)
    return out


def hub_bounds(
    hub_dir: str, partition_count: Optional[int] = None
) -> Dict[int, Tuple[int, int]]:
    """(earliest, latest=last+1) per partition from parquet footer
    statistics only — the ``allBoundedSeqNos`` probe
    (ref EventHubsClient.scala:124-139) without reading data pages.
    Empty partitions report earliest == latest
    (ref SimulatedEventHubs.scala:248-256)."""
    out: Dict[int, Tuple[int, int]] = {}
    for pid, d in _partition_dirs(hub_dir).items():
        lo, hi = None, None
        for f in _parquet_files(d):
            for _, n, mn, mx in _rg_stats(f, "sequenceNumber"):
                if n == 0 or mn is None:
                    continue
                lo = int(mn) if lo is None else min(lo, int(mn))
                hi = int(mx) if hi is None else max(hi, int(mx))
        out[pid] = (lo, hi + 1) if lo is not None else (0, 0)
    if partition_count is not None:
        for pid in range(partition_count):
            out.setdefault(pid, (0, 0))
    return out


def _stat_us(v) -> int:
    """Footer timestamp statistic -> int microseconds since epoch."""
    return v.value if hasattr(v, "value") else int(
        pa.scalar(v, pa.timestamp("us")).value
    )


def _seq_at_time(hub_dir: str, pid: int, t_us: int, latest: int) -> int:
    """min(seqNo) with enqueuedTime >= t in one partition; past-end
    times resolve to latest (ref EventHubsClient.scala:306-338).

    Stats-first (round-7 verdict item 2 — the old path iterated every
    row past t in driver Python, O(backlog) for early timestamps):

    - row groups with max(enqueuedTime) < t are skipped (no row
      qualifies);
    - row groups with min(enqueuedTime) >= t qualify ENTIRELY, so
      their footer min(sequenceNumber) is the exact candidate — zero
      data pages read; for a time near stream start this resolves the
      whole partition from footers alone;
    - only boundary groups (min < t <= max) are read, and filtered
      with vectorized ``pyarrow.compute`` instead of per-row Python;
    - a group whose footer min(sequenceNumber) can't beat the current
      best is pruned without reading. Exact regardless of
      enqueuedTime/seqNo ordering — no monotonicity assumption.
    """
    d = _partition_dirs(hub_dir).get(pid)
    if d is None:
        return latest
    t_scalar = pa.scalar(t_us, pa.timestamp("us", tz="UTC"))
    best: Optional[int] = None
    for f in _parquet_files(d):
        # seqNo footer stats are fetched lazily, on the first row group
        # that passes the enqueuedTime filter: a past-end probe (the
        # common latest-position path) then touches only enqueuedTime
        # footers and allocates no sequenceNumber cache slots
        seq_min: Optional[Dict[int, int]] = None
        pf = None
        for i, n, mn, mx in _rg_stats(f, "enqueuedTime"):
            if n == 0 or mx is None or _stat_us(mx) < t_us:
                continue
            if seq_min is None:
                seq_min = {
                    i2: int(mn2)
                    for i2, n2, mn2, _ in _rg_stats(f, "sequenceNumber")
                    if n2 and mn2 is not None
                }
            smn = seq_min.get(i)
            if best is not None and smn is not None and smn >= best:
                continue
            if mn is not None and _stat_us(mn) >= t_us and smn is not None:
                cand = smn  # whole group qualifies: footer min is exact
            else:
                if pf is None:
                    pf = papq.ParquetFile(f)
                tbl = pf.read_row_groups(
                    [i], columns=["sequenceNumber", "enqueuedTime"]
                )
                enq = tbl.column("enqueuedTime").cast(
                    pa.timestamp("us", tz="UTC")
                )
                seqs = pacompute.filter(
                    tbl.column("sequenceNumber"),
                    pacompute.greater_equal(enq, t_scalar),
                )
                if len(seqs) == 0:
                    continue
                cand = pacompute.min(seqs).as_py()
            best = cand if best is None else min(best, cand)
    return best if best is not None else latest


# ---------------------------------------------------------------------------
# options → plan (runs in Spark's python planner process)
# ---------------------------------------------------------------------------

def _hub_dir_from_options(options) -> str:
    path = options.get("path") or options.get("hubdir")
    if path:
        return path
    cs = options.get("eventhubs.connectionstring")
    if cs:
        from spark_eventhubs_spark.connstr import ConnectionStringBuilder
        from spark_eventhubs_spark.crypto import decrypt_or_plaintext

        # option maps built from EventHubsConf.to_map() carry the
        # encrypted form (the reference's toConf decrypt moment —
        # EventHubsConf.scala:727-731)
        b = ConnectionStringBuilder.parse(decrypt_or_plaintext(cs))
        root = (b.endpoint or "").removeprefix("file://")
        return os.path.join(root, b.entity_path or "events")
    raise ValueError(
        "eventhubs datasource needs .option('path', <hub dir>) or "
        "eventhubs.connectionString with a file:// endpoint"
    )


def _conf_from_options(options):
    from spark_eventhubs_spark.conf import EventHubsConf

    conf = EventHubsConf()
    for k in options:
        conf.set(k, options[k])
    return conf


def _resolve_positions(
    conf, hub_dir: str, bounds: Dict[int, Tuple[int, int]], use_start: bool
) -> Dict[int, int]:
    """EventPosition → seqNo per partition against footer-stat bounds
    (same rules as sources.client.SimulatedClient.translate,
    ref EventHubsClient.scala:264-353)."""
    out: Dict[int, int] = {}
    for pid, (lo, hi) in bounds.items():
        pos = (conf.starting_position_for(pid) if use_start
               else conf.ending_position_for(pid))
        if pos.seq_no is not None:
            out[pid] = pos.seq_no
        elif pos.is_start_of_stream:
            out[pid] = lo
        elif pos.is_end_of_stream:
            out[pid] = hi
        elif pos.offset is not None:
            out[pid] = int(pos.offset)
        elif pos.enqueued_time is not None:
            t_us = int(pos.enqueued_time.timestamp() * 1_000_000)
            out[pid] = _seq_at_time(hub_dir, pid, t_us, hi)
        else:
            raise ValueError(f"unresolvable position for partition {pid}")
    return out


@dataclass
class RangeInputPartition(InputPartition):
    hub_dir: str
    partition_id: int
    from_seq_no: int
    until_seq_no: int


def _plan_range_partitions(
    hub_dir: str,
    start: Dict[int, int],
    end: Dict[int, int],
    earliest: Dict[int, Tuple[int, int]],
) -> List[RangeInputPartition]:
    parts = []
    for pid in sorted(end):
        frm = start.get(pid, 0)
        # data-loss guard: clamp to earliest (ref EventHubsSource.scala:246-260)
        frm = max(frm, earliest.get(pid, (0, 0))[0])
        until = end[pid]
        if until > frm:
            parts.append(RangeInputPartition(hub_dir, pid, frm, until))
    return parts


# ---------------------------------------------------------------------------
# executor-side read (pure pyarrow)
# ---------------------------------------------------------------------------

def _read_range(p: RangeInputPartition) -> Iterator[pa.RecordBatch]:
    """Read [from, until) of one hub partition as Arrow batches:
    hive pruning picks the one partition directory, footer stats prune
    row groups, and the receive contract — seqNo-sorted, exactly
    until-from rows (ref CachedEventHubsReceiver.scala:227-287) — is
    enforced before yielding."""
    ds = pads.dataset(p.hub_dir, format="parquet", partitioning=_partitioning())
    filt = (
        (pads.field("partition") == str(p.partition_id))
        & (pads.field("sequenceNumber") >= p.from_seq_no)
        & (pads.field("sequenceNumber") < p.until_seq_no)
    )
    tbl = ds.to_table(filter=filt)
    tbl = tbl.sort_by("sequenceNumber")
    n = tbl.num_rows
    if n != p.until_seq_no - p.from_seq_no:
        raise RuntimeError(
            f"receive contract violated: partition {p.partition_id} "
            f"[{p.from_seq_no},{p.until_seq_no}) expected "
            f"{p.until_seq_no - p.from_seq_no} events, got {n}"
        )
    out_schema = _arrow_out_schema()
    cols = [
        tbl.column(f.name).cast(f.type)
        if f.name != "partition"
        else pa.chunked_array([pa.array([str(p.partition_id)] * n, pa.string())])
        for f in out_schema
    ]
    yield from pa.table(cols, schema=out_schema).to_batches(max_chunksize=65536)


# ---------------------------------------------------------------------------
# batch reader (ref EventHubsRelation.scala:45-71)
# ---------------------------------------------------------------------------

class EventHubsBatchReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.options = options

    def partitions(self) -> Sequence[InputPartition]:
        hub_dir = _hub_dir_from_options(self.options)
        conf = _conf_from_options(self.options)
        bounds = hub_bounds(hub_dir, conf.partition_count)
        start = _resolve_positions(conf, hub_dir, bounds, use_start=True)
        end = _resolve_positions(conf, hub_dir, bounds, use_start=False)
        end = {pid: min(e, bounds[pid][1]) for pid, e in end.items()}
        parts = _plan_range_partitions(hub_dir, start, end, bounds)
        # an all-empty scan still needs one (empty) partition
        return parts or [RangeInputPartition(hub_dir, 0, 0, 0)]

    def read(self, partition: RangeInputPartition) -> Iterator[pa.RecordBatch]:
        if partition.until_seq_no <= partition.from_seq_no:
            yield from pa.table(
                {f.name: pa.array([], f.type) for f in _arrow_out_schema()}
            ).to_batches()
            return
        yield from _read_range(partition)


# ---------------------------------------------------------------------------
# streaming reader (ref EventHubsSource.scala)
# ---------------------------------------------------------------------------

class EventHubsStreamReader(DataSourceStreamReader):
    """Micro-batch source: latestOffset probes footer-stat bounds and
    applies the proportional rate limit (ref EventHubsSource.scala
    getOffset :206-244 + rateLimit :263-319); partitions() diffs two
    offsets into per-partition ranges (getBatch :329-420). Offsets are
    the reference's JSON shape {"<hub>": {"<pid>": seqNo}}
    (JsonUtils.scala:63-100).

    **Cursor file.** Spark serves initialOffset/latestOffset/partitions/
    commit from more than one python worker process, so admission-control
    state cannot live on the instance. The throttle cursor is a JSON file
    under ``<hub>/_cursors/<consumerGroup>.json`` — the file-backed
    analogue of the service's per-consumer-group receiver cursor — with
    per-partition **monotonic max-merge** on every update, which makes
    the sequence of latestOffset answers non-decreasing across processes:
    the engine's offset log can never regress, so no event is planned
    twice. Two concurrent queries should use distinct consumer groups,
    exactly as the reference requires for two receivers
    (docs/structured-streaming-eventhubs-integration.md).

    **Trigger.AvailableNow + maxEventsPerTrigger.** Spark's Python
    streaming API exposes no SupportsTriggerAvailableNow hook, so an
    availableNow run snapshots ONE (rate-limited) latestOffset answer
    and stops after that single admission-controlled batch — the same
    semantics the reference has under Trigger.Once
    (EventHubsSource.scala getOffset applies the rate limit there
    too). Repeated availableNow runs against the same checkpoint
    resume from the offset log and drain the backlog incrementally
    with no duplicates (pinned in tests/test_datasource.py); for a
    full drain in one run either leave maxEventsPerTrigger unset or
    use a processingTime trigger + processAllAvailable()."""

    def __init__(self, options) -> None:
        self.options = options
        self.hub_dir = _hub_dir_from_options(options)
        self._conf = _conf_from_options(options)
        self.name = self._conf.name or os.path.basename(self.hub_dir.rstrip("/")) or "events"
        group = self._conf.consumer_group.replace("$", "_")
        self._cursor_path = os.path.join(self.hub_dir, "_cursors", f"{group}.json")

    def _pack(self, seq_nos: Dict[int, int]) -> dict:
        return {self.name: {str(p): int(s) for p, s in sorted(seq_nos.items())}}

    def _unpack(self, offset: dict) -> Dict[int, int]:
        (_, inner), = offset.items()
        return {int(p): int(s) for p, s in inner.items()}

    # -- cursor file ops --
    def _cursor_read(self) -> Optional[Dict[int, int]]:
        try:
            with open(self._cursor_path) as fh:
                return {int(k): int(v) for k, v in json.load(fh).items()}
        except (OSError, ValueError):
            return None

    def _cursor_write(self, seq_nos: Dict[int, int], merge: bool = True) -> Dict[int, int]:
        os.makedirs(os.path.dirname(self._cursor_path), exist_ok=True)
        if merge:
            cur = self._cursor_read() or {}
            for pid, s in seq_nos.items():
                cur[pid] = max(cur.get(pid, 0), s)
        else:
            cur = dict(seq_nos)
        tmp = self._cursor_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({str(p): s for p, s in cur.items()}, fh)
        os.replace(tmp, self._cursor_path)
        return cur

    def initialOffset(self) -> dict:
        bounds = hub_bounds(self.hub_dir, self._conf.partition_count)
        start = _resolve_positions(self._conf, self.hub_dir, bounds, use_start=True)
        # a fresh query = a fresh consumer: reset (not merge) the cursor
        self._cursor_write(start, merge=False)
        return self._pack(start)

    def latestOffset(self) -> dict:
        from spark_eventhubs_spark.streaming.ratelimit import rate_limit

        bounds = hub_bounds(self.hub_dir, self._conf.partition_count)
        latest = {pid: b[1] for pid, b in bounds.items()}
        # bare key first, prefixed alias second (EventHubsConf.scala:711-712)
        raw = self._conf.get("maxEventsPerTrigger") or self._conf.get(
            "eventhubs.maxEventsPerTrigger"
        )
        cursor = self._cursor_read()
        if cursor is None and raw is not None:
            # the engine calls latestOffset before initialOffset on a
            # fresh stream: seed the cursor from the configured start so
            # the very first trigger is already throttled
            cursor = self._cursor_write(
                _resolve_positions(self._conf, self.hub_dir, bounds, use_start=True)
            )
        if raw is None:
            target = latest
        else:
            earliest = {pid: b[0] for pid, b in bounds.items()}
            start = {pid: max(cursor.get(pid, 0), earliest[pid]) for pid in latest}
            target = rate_limit(int(raw), start, latest, earliest, None)
        # monotonic merge guarantees this answer is >= every previous one
        merged = self._cursor_write(target)
        return self._pack({pid: merged.get(pid, s) for pid, s in target.items()})

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        s, e = self._unpack(start), self._unpack(end)
        bounds = hub_bounds(self.hub_dir, self._conf.partition_count)
        # the offset log is authoritative: fold it into the cursor
        self._cursor_write({pid: max(s.get(pid, 0), e.get(pid, 0)) for pid in set(s) | set(e)})
        # new partitions appearing mid-stream start at their default
        # translated position (ref EventHubsSource.scala:183-192,350-366)
        for pid in set(e) - set(s):
            pos = self._conf.starting_position_for(pid)
            s[pid] = pos.seq_no if pos.seq_no is not None else bounds[pid][0]
        parts = _plan_range_partitions(self.hub_dir, s, e, bounds)
        return parts or [RangeInputPartition(self.hub_dir, 0, 0, 0)]

    def read(self, partition: RangeInputPartition) -> Iterator[pa.RecordBatch]:
        if partition.until_seq_no <= partition.from_seq_no:
            yield from pa.table(
                {f.name: pa.array([], f.type) for f in _arrow_out_schema()}
            ).to_batches()
            return
        yield from _read_range(partition)

    def commit(self, end: dict) -> None:
        self._cursor_write(self._unpack(end))

    def stop(self) -> None:
        pass


# ---------------------------------------------------------------------------
# write path (ref EventHubsWriter/EventHubsWriteTask/EventHubsSink)
# ---------------------------------------------------------------------------

@dataclass
class StagedFileMessage(WriterCommitMessage):
    path: str
    num_rows: int


def _validate_write_schema(schema: StructType) -> Dict[str, Optional[str]]:
    """body (string|binary) required; partition/partitionId, partitionKey,
    properties optional — ref EventHubsWriter.scala:41-62."""
    names = {f.name: f.dataType.simpleString() for f in schema.fields}
    body_t = names.get("body")
    if body_t is None:
        raise ValueError("required attribute 'body' not found")
    if body_t not in ("string", "binary"):
        raise ValueError(f"'body' must be string or binary, got {body_t}")
    part_col = "partition" if "partition" in names else (
        "partitionId" if "partitionId" in names else None)
    if part_col and names[part_col] != "string":
        raise ValueError(f"'{part_col}' must be string, got {names[part_col]}")
    if "partitionKey" in names and names["partitionKey"] != "string":
        raise ValueError("'partitionKey' must be string")
    if "properties" in names and not names["properties"].startswith("map<string,string"):
        raise ValueError("'properties' must be map<string,string>")
    return {
        "body": body_t,
        "partition": part_col,
        "partitionKey": "partitionKey" if "partitionKey" in names else None,
        "properties": "properties" if "properties" in names else None,
    }


class EventHubsWriterBase:
    def __init__(self, options, schema: StructType) -> None:
        self.options = options
        self.schema = schema
        self.hub_dir = _hub_dir_from_options(options)
        self.cols = _validate_write_schema(schema)
        self.partition_count = int(
            options.get("eventhubs.partitioncount") or 4
        )

    # -- executor side: stage rows as a small parquet file --
    def write(self, iterator) -> StagedFileMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        tid = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else 0
        bodies, parts, keys, props = [], [], [], []
        c = self.cols
        for row in iterator:
            body = row["body"]
            if isinstance(body, str):
                body = body.encode("utf-8")
            elif body is None:
                raise ValueError("null body")
            bodies.append(bytes(body))
            pid = row[c["partition"]] if c["partition"] else None
            key = row[c["partitionKey"]] if c["partitionKey"] else None
            if pid is not None and key is not None:
                # ref EventHubsWriteTask.scala:146-149
                raise ValueError(
                    "both partition and partitionKey are set; they are "
                    "mutually exclusive"
                )
            parts.append(pid)
            keys.append(key)
            pr = row[c["properties"]] if c["properties"] else None
            props.append(list(pr.items()) if pr else [])
        tbl = pa.table(
            {
                "body": pa.array(bodies, pa.binary()),
                "partition": pa.array(parts, pa.string()),
                "partitionKey": pa.array(keys, pa.string()),
                "properties": pa.array(props, pa.map_(pa.string(), pa.string())),
            }
        )
        staging = os.path.join(self.hub_dir, "_staging")
        os.makedirs(staging, exist_ok=True)
        path = os.path.join(staging, f"stage-{tid:05d}-{attempt}.parquet")
        papq.write_table(tbl, path)
        return StagedFileMessage(path, tbl.num_rows)

    # -- driver side: assign seqNos and append to the log --
    def _commit_staged(self, messages, commit_tag: str) -> None:
        paths = sorted(m.path for m in messages if m is not None)
        commit_staged_paths(self.hub_dir, paths, commit_tag, self.partition_count)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def commit_staged_paths(
    hub_dir: str, paths: List[str], commit_tag: str, partition_count: int
) -> int:
    """Assign dense per-partition sequence numbers to staged event files
    and append them to the hub log — the broker role the service plays
    on arrival. Used by the DataSource writers and the ForeachWriter
    sink. Returns the number of events committed."""
    bounds = hub_bounds(hub_dir, partition_count)
    next_seq = {pid: hi for pid, (_, hi) in bounds.items()}
    total = sum(hi - lo for lo, hi in bounds.values())
    rr = total  # round-robin cursor (ref SimulatedEventHubs.scala:86-101)
    now_us = int(time.time() * 1_000_000)
    buckets: Dict[int, Dict[str, list]] = {}
    n_events = 0

    for path in paths:
        tbl = papq.read_table(path)
        for i in range(tbl.num_rows):
            pid_s = tbl.column("partition")[i].as_py()
            key = tbl.column("partitionKey")[i].as_py()
            if pid_s is not None:
                pid = int(pid_s)
            elif key is not None:
                pid = _hash_partition_key(key, partition_count)
            else:
                pid = rr % partition_count
                rr += 1
            seq = next_seq.setdefault(pid, 0)
            next_seq[pid] = seq + 1
            n_events += 1
            b = buckets.setdefault(
                pid,
                {"body": [], "offset": [], "sequenceNumber": [],
                 "enqueuedTime": [], "publisher": [], "partitionKey": [],
                 "properties": [], "systemProperties": []},
            )
            b["body"].append(tbl.column("body")[i].as_py())
            b["offset"].append(str(seq))
            b["sequenceNumber"].append(seq)
            b["enqueuedTime"].append(now_us)
            b["publisher"].append(None)
            b["partitionKey"].append(key)
            b["properties"].append(tbl.column("properties")[i].as_py() or [])
            b["systemProperties"].append([])

    fs = _arrow_file_schema()
    for pid, b in buckets.items():
        pdir = os.path.join(hub_dir, f"partition={pid}")
        os.makedirs(pdir, exist_ok=True)
        out = pa.table(
            {
                "body": pa.array(b["body"], pa.binary()),
                "offset": pa.array(b["offset"], pa.string()),
                "sequenceNumber": pa.array(b["sequenceNumber"], pa.int64()),
                "enqueuedTime": pa.array(b["enqueuedTime"], pa.timestamp("us", tz="UTC")),
                "publisher": pa.array(b["publisher"], pa.string()),
                "partitionKey": pa.array(b["partitionKey"], pa.string()),
                "properties": pa.array(b["properties"], pa.map_(pa.string(), pa.string())),
                "systemProperties": pa.array(b["systemProperties"], pa.map_(pa.string(), pa.string())),
            },
            schema=fs,
        )
        # Write-then-RENAME (never write the visible name in place):
        # readers scan partition dirs for footer stats on every
        # micro-batch — at a 5 ms trigger cadence a reader reliably
        # catches an in-place write mid-flight and dies with "Parquet
        # magic bytes not found in footer" (reproduced at sf10,
        # round 12). The dot-prefix keeps the in-flight file invisible
        # to _parquet_files; os.replace is atomic within a directory,
        # so a committed file is only ever seen complete — which is
        # also what the _RG_STATS_CACHE immutability contract
        # (top of file) has always assumed of this path.
        final = os.path.join(pdir, f"commit-{commit_tag}.parquet")
        tmp = os.path.join(pdir, f".inprogress-commit-{commit_tag}.parquet")
        papq.write_table(out, tmp)
        os.replace(tmp, final)
    for path in paths:
        if os.path.exists(path):
            os.remove(path)
    return n_events


class EventHubsBatchWriter(EventHubsWriterBase, DataSourceWriter):
    def commit(self, messages) -> None:
        cdir = os.path.join(self.hub_dir, "_commits")
        os.makedirs(cdir, exist_ok=True)
        idx = len([f for f in os.listdir(cdir) if f.startswith("batch-")])
        self._commit_staged(messages, f"b{idx:06d}")
        open(os.path.join(cdir, f"batch-{idx:06d}"), "w").close()


class EventHubsStreamWriter(EventHubsWriterBase, DataSourceStreamWriter):
    """At-least-once sink with batchId idempotence
    (ref EventHubsSink.addBatch skips batchId <= latestBatchId,
    EventHubsSink.scala:35-42)."""

    def commit(self, messages, batchId: int) -> None:
        cdir = os.path.join(self.hub_dir, "_commits")
        os.makedirs(cdir, exist_ok=True)
        marker = os.path.join(cdir, f"epoch-{batchId:010d}")
        if os.path.exists(marker):  # re-delivered batch: drop staged rows
            self.abort(messages)
            return
        self._commit_staged(messages, f"e{batchId:010d}")
        open(marker, "w").close()

    def abort(self, messages, batchId: Optional[int] = None) -> None:
        EventHubsWriterBase.abort(self, messages)


def _hash_partition_key(key: str, partition_count: int) -> int:
    import hashlib

    h = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")
    return h % partition_count


# ---------------------------------------------------------------------------
# the DataSource
# ---------------------------------------------------------------------------

class EventHubsDataSource(DataSource):
    """``format("eventhubs")`` — fixed 9-column schema, batch + stream,
    read + write (ref EventHubsSourceProvider.scala:56-141)."""

    @classmethod
    def name(cls) -> str:
        return "eventhubs"

    def schema(self) -> str:
        return HUB_SCHEMA_DDL

    def reader(self, schema: StructType) -> EventHubsBatchReader:
        return EventHubsBatchReader(self.options)

    def streamReader(self, schema: StructType) -> EventHubsStreamReader:
        return EventHubsStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> EventHubsBatchWriter:
        if overwrite:
            # ref EventHubsSourceProvider.scala:108-141 — Append only
            raise ValueError("eventhubs sink supports SaveMode.Append only")
        return EventHubsBatchWriter(self.options, schema)

    def streamWriter(self, schema: StructType, overwrite: bool) -> EventHubsStreamWriter:
        return EventHubsStreamWriter(self.options, schema)


def register_eventhubs(spark) -> None:
    """Register format("eventhubs") on this session."""
    spark.dataSource.register(EventHubsDataSource)


# ---------------------------------------------------------------------------
# materialization: events table -> hub directory
# ---------------------------------------------------------------------------

def materialize_hub(spark, sf_dir_or_events: str, hub_dir: str,
                    partition_count: int = 4) -> str:
    """Write the canonical hub log layout from the driver's events
    parquet: hive ``partition=<pid>/`` dirs, one sorted file per
    partition. This is the one-time ingest that a real hub performs at
    write time (see plans/hubview.py scale note); all steady-state
    reads then plan from footer stats alone."""
    from pyspark.sql import functions as F

    from spark_eventhubs_spark.plans.hubview import configure_session, hub_view

    src = sf_dir_or_events
    if not src.endswith(".parquet"):
        src = os.path.join(src, "events.parquet")
    configure_session(spark)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    events = spark.read.parquet(src)
    hub = hub_view(events, partition_count)
    (
        hub.repartition(partition_count, F.col("partition"))
        .sortWithinPartitions("partition", "sequenceNumber")
        .write.mode("overwrite")
        .partitionBy("partition")
        .parquet(hub_dir)
    )
    return hub_dir


def compact_hub_log(spark, hub_dir: str, partition_count: int = 4) -> dict:
    """Compact the hub log: fold each partition's accumulated
    ``commit-*.parquet`` files (one per streaming micro-batch commit —
    the classic small-files problem of any streaming sink) back into
    one sorted file per partition.

    Rewrites via a staging dir then swaps, preserving the metadata
    side-dirs (``_commits`` batchId ledger, ``_cursors`` consumer
    cursors) and the two invariants planning depends on: per-partition
    seqNo density and footer-stat min/max (files stay sorted by
    sequenceNumber). Readers planned BEFORE the swap may fail and must
    replan — same contract as any file-compaction job; at scale this
    runs partition-aligned with no shuffle wider than the repartition.
    Returns {partition_id: n_files_before}.
    """
    import shutil

    from pyspark.sql import functions as F

    from spark_eventhubs_spark.plans.hubview import configure_session

    configure_session(spark)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    before = {}
    for name in os.listdir(hub_dir):
        if name.startswith("partition="):
            pid = int(name.split("=", 1)[1])
            before[pid] = len([
                f for f in os.listdir(os.path.join(hub_dir, name))
                if f.endswith(".parquet")
            ])
    tmp = hub_dir.rstrip("/") + ".compact-tmp"
    old = hub_dir.rstrip("/") + ".pre-compact"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        spark.read.parquet(hub_dir)
        .repartition(partition_count, F.col("partition"))
        .sortWithinPartitions("partition", "sequenceNumber")
        .write.mode("overwrite")
        .partitionBy("partition")
        .parquet(tmp)
    )
    # carry metadata side-dirs over before the swap
    for meta in ("_commits", "_cursors"):
        src = os.path.join(hub_dir, meta)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(tmp, meta), dirs_exist_ok=True)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(hub_dir, old)
    os.rename(tmp, hub_dir)
    shutil.rmtree(old, ignore_errors=True)
    _evict_rg_stats(hub_dir)
    return before


def truncate_hub_log(
    spark, hub_dir: str, keep_from: Dict[int, int], partition_count: int = 4
) -> Dict[int, int]:
    """Retention: drop events below ``keep_from[pid]`` per partition —
    the file-backed analogue of the service's retention period expiring
    old events. After truncation ``hub_bounds`` reports the new
    earliest from footer stats, and the data-loss guard (S5,
    ``_adjust_starting_offset``) clamps any older checkpoint/start
    position forward with a warning, exactly as the reference does when
    a consumer falls behind retention.

    Refuses to empty a partition completely (the seqNo high-water mark
    lives in the data files; an empty partition would forget it —
    the reference keeps earliest = last+1 for empty partitions, which
    footer stats cannot represent without rows). Returns the rows
    dropped per partition.
    """
    import shutil

    from pyspark.sql import functions as F

    from spark_eventhubs_spark.plans.hubview import configure_session

    bounds = hub_bounds(hub_dir, partition_count)
    for pid, k in keep_from.items():
        lo, hi = bounds.get(pid, (0, 0))
        if k >= hi:
            raise ValueError(
                f"truncating partition {pid} to {k} would empty it "
                f"(latest {hi}); full truncation is unsupported"
            )
    configure_session(spark)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    keep_map = F.create_map(
        *[x for pid, k in sorted(keep_from.items())
          for x in (F.lit(str(pid)), F.lit(k))]
    )
    df = spark.read.parquet(hub_dir)
    kept = df.where(
        F.col("sequenceNumber")
        >= F.coalesce(F.element_at(keep_map, F.col("partition").cast("string")), F.lit(0))
    )
    dropped_rows = {
        int(r["partition"]): r["n"]
        for r in df.where(
            F.col("sequenceNumber")
            < F.coalesce(F.element_at(keep_map, F.col("partition").cast("string")), F.lit(0))
        ).groupBy("partition").agg(F.count("*").alias("n")).collect()
    }
    tmp = hub_dir.rstrip("/") + ".truncate-tmp"
    old = hub_dir.rstrip("/") + ".pre-truncate"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        kept.repartition(partition_count, F.col("partition"))
        .sortWithinPartitions("partition", "sequenceNumber")
        .write.mode("overwrite")
        .partitionBy("partition")
        .parquet(tmp)
    )
    for meta in ("_commits", "_cursors"):
        src = os.path.join(hub_dir, meta)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(tmp, meta), dirs_exist_ok=True)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(hub_dir, old)
    os.rename(tmp, hub_dir)
    shutil.rmtree(old, ignore_errors=True)
    _evict_rg_stats(hub_dir)
    return dropped_rows
