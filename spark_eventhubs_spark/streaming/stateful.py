"""Stateful streaming operators over the 9-column hub stream.

The reference delegates everything downstream of the source to Spark
(README.md:23-24: "map, reduce, join, window"); its own test surface
exercises watermark + tumbling window aggregation
(T/sql/eventhubs/EventHubsSourceSuite.scala:737-778). This module
completes that surface with the Structured Streaming stateful
operators an event-hub pipeline needs, each as a thin, tested
composition (north-star: streaming halves of the SURVEY §2.3 dedup /
sessionization operators):

- :func:`streaming_dedup` — exactly-once-per-key events within the
  watermark horizon (``dropDuplicatesWithinWatermark``): the streaming
  twin of operators/dedup.exact_dedup, and the standard cure for the
  sink's at-least-once redelivery (EventHubsSink.scala:35-42 dedups by
  batchId only; per-event ids dedup across retries too).
- :func:`streaming_sessionize` — event-time session windows with a
  gap timeout (``session_window``): the streaming twin of the batch
  ``hub_sessionization`` catalog query.
- :func:`running_counters` — arbitrary per-key running state via
  ``applyInPandasWithState`` (count + last-seen per user), the
  template for custom stateful operators that none of the built-ins
  express.
- :func:`streaming_interval_join` — stream-stream inner join with an
  event-time band (watermarks on BOTH sides bound join state): the
  streaming twin of the batch ``hub_interval_join`` catalog query.
- :func:`streaming_asof_join` — per-key carry-forward as-of join via
  ``applyInPandasWithState`` (state = last left-side event time): the
  streaming twin of the batch ``hub_asof_join`` catalog query, which
  the reference has no native operator for either.
- :func:`streaming_heavy_hitters` — running top-N values per group
  with a bounded Misra-Gries summary as the state (the streaming twin
  of the batch ``text_heavy_hitters``): O(groups * k) state forever,
  vs O(vocabulary) for a naive count stream.

Scale notes: all three shuffle once on their key and keep state in the
state store — state size is O(distinct keys in horizon), bounded by
the watermark (dedup, sessions) or explicit timeouts (running
counters). State-store backend and RocksDB spill are Spark configs,
not code concerns.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def streaming_dedup(
    sdf: DataFrame,
    key_cols: Iterable[str] = ("partition", "sequenceNumber"),
    watermark_col: str = "enqueuedTime",
    delay: str = "1 hour",
) -> DataFrame:
    """Drop redelivered events by key within the watermark horizon.

    With (partition, sequenceNumber) keys this makes an at-least-once
    upstream effectively-once for downstream aggregation, holding state
    only for ``delay`` of event time.
    """
    return sdf.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def streaming_sessionize(
    sdf: DataFrame,
    gap: str = "30 minutes",
    delay: str = "1 hour",
    user_key: str = "user_id",
) -> DataFrame:
    """Per-user session aggregation with a ``gap`` inactivity timeout.

    Expects the hub schema; the user key is read from the properties
    map. Emits one row per closed session: (user, session start/end,
    n_events).
    """
    keyed = sdf.select(
        F.col("properties").getItem(user_key).alias("user_id"),
        F.col("enqueuedTime"),
    )
    return (
        keyed.withWatermark("enqueuedTime", delay)
        .groupBy(
            F.session_window("enqueuedTime", gap).alias("w"),
            F.col("user_id"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


_COUNTER_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("last_us", LongType())]
)
_COUNTER_OUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("n_events", LongType()),
        StructField("last_seen_us", LongType()),
    ]
)


def _update_counters(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, last_us = state.get
    else:
        n, last_us = 0, 0
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last_us = max(last_us, int(pdf["enq_us"].max()))
    state.update((n, last_us))
    yield pd.DataFrame(
        [[user_id, n, last_us]], columns=["user_id", "n_events", "last_seen_us"]
    )


_COUNTERB_STATE_SCHEMA = StructType(
    [
        StructField("users", ArrayType(StringType())),
        StructField("ns", ArrayType(LongType())),
        StructField("lasts", ArrayType(LongType())),
    ]
)


def _counters_bucket_update(
    key: Tuple[int], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-BUCKET running counters (the :func:`_scd2_bucket_update`
    pattern): every user's (count, last-seen) carry lives in ONE state
    row of parallel arrays; the batch slice merges with the carry in a
    single vectorized groupby (state rows enter with their running
    totals, batch rows with weight 1, sum/max aggregates both at
    once). Emits — exactly like the per-user path — one row per user
    PRESENT in this trigger, with the running totals after it; users
    only in the carry stay silent. Null user (event without the
    property) is a real key: ``dropna=False`` groups it, and the
    None-not-'nan' store rule keeps its carry across triggers."""
    import numpy as np

    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        yield pd.DataFrame(
            {
                "user_id": pd.array([], dtype=object),
                "n_events": pd.array([], dtype="int64"),
                "last_seen_us": pd.array([], dtype="int64"),
            }
        )
        return
    batch = pd.concat(frames, ignore_index=True).drop(
        columns=["bucket"], errors="ignore"
    )
    parts = [
        pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "n": np.int64(1),
                "last": batch["enq_us"].to_numpy(np.int64),
                "inb": np.int8(1),
            }
        )
    ]
    if state.exists:
        users, ns, lasts = state.get
        parts.append(
            pd.DataFrame(
                {
                    "user_id": pd.array(users, dtype=object),
                    "n": np.asarray(ns, dtype=np.int64),
                    "last": np.asarray(lasts, dtype=np.int64),
                    "inb": np.int8(0),
                }
            )
        )
    agg = (
        pd.concat(parts, ignore_index=True)
        .groupby("user_id", dropna=False, sort=False)
        .agg(n=("n", "sum"), last=("last", "max"), inb=("inb", "max"))
        .reset_index()
    )
    state.update(
        (
            # NaN-safe like the other bucketed kernels: a null user
            # must round-trip as None, never the string 'nan'
            agg["user_id"].astype(object).where(
                agg["user_id"].notna(), None
            ).tolist(),
            agg["n"].to_numpy(np.int64).tolist(),
            agg["last"].to_numpy(np.int64).tolist(),
        )
    )
    out = agg[agg["inb"] == 1]
    yield pd.DataFrame(
        {
            "user_id": out["user_id"],
            "n_events": out["n"].to_numpy(np.int64),
            "last_seen_us": out["last"].to_numpy(np.int64),
        }
    )


def running_counters(
    sdf: DataFrame,
    user_key: str = "user_id",
    n_buckets: int | None = 64,
) -> DataFrame:
    """Running per-user event count + last-seen, via
    ``applyInPandasWithState`` — the custom-stateful-operator template:
    Arrow-batched updates against the state store, one output row per
    user present in each trigger.

    ``n_buckets`` (default 64) applies the :func:`streaming_scd2`
    bucketing recipe: applyInPandasWithState pays a fixed Arrow/state
    round trip per GROUP per trigger, so per-user grouping is O(active
    users) fixed costs per trigger while ``hash(user) % n_buckets``
    caps it at n_buckets and merges each bucket's slice with its carry
    in one vectorized groupby (:func:`_counters_bucket_update`).
    Output rows are identical to the per-user path (``n_buckets=None``,
    two-path equality pinned in tests) — only the state layout
    changes."""
    keyed = sdf.select(
        F.col("properties").getItem(user_key).alias("user_id"),
        F.unix_micros(F.col("enqueuedTime")).alias("enq_us"),
    )
    if n_buckets is None:
        return keyed.groupBy("user_id").applyInPandasWithState(
            _update_counters,
            outputStructType=_COUNTER_OUT_SCHEMA,
            stateStructType=_COUNTER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    bucketed = keyed.withColumn(
        "bucket", F.pmod(F.xxhash64("user_id"), F.lit(n_buckets))
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _counters_bucket_update,
        outputStructType=_COUNTER_OUT_SCHEMA,
        stateStructType=_COUNTERB_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_type: str = "purchase",
    right_type: str = "error",
    band: str = "10 minutes",
    delay: str = "30 minutes",
    user_key: str = "user_id",
) -> DataFrame:
    """Errors within ``band`` before each purchase, per user — the
    stream-stream twin of the batch ``hub_interval_join`` query.

    Both inputs are hub streams (may be two readers of the same hub).
    The join is an EQUI-join on the user key with the time band as a
    range condition; watermarks on BOTH sides let Spark drop join state
    older than ``delay + band``, so state is bounded regardless of
    stream length — the scale property the batch query's docstring
    promises. Emits one row per (purchase, error) pair in append mode.
    """
    a = (
        left.where(F.col("properties").getItem("event_type") == left_type)
        .select(
            F.col("properties").getItem(user_key).alias("user_id"),
            F.col("enqueuedTime").alias("a_time"),
        )
        .withWatermark("a_time", delay)
    )
    b = (
        right.where(F.col("properties").getItem("event_type") == right_type)
        .select(
            F.col("properties").getItem(user_key).alias("b_user"),
            F.col("enqueuedTime").alias("b_time"),
        )
        .withWatermark("b_time", delay)
    )
    return a.join(
        b,
        F.expr(
            f"user_id = b_user AND "
            f"b_time >= a_time - INTERVAL {band} AND b_time < a_time"
        ),
    ).select(
        "user_id",
        F.unix_micros("a_time").alias("a_us"),
        F.unix_micros("b_time").alias("b_us"),
    )


_ASOF_STATE_SCHEMA = StructType([StructField("last_left_us", LongType())])
_ASOF_OUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("purchase_us", LongType()),
        StructField("last_click_us", LongType()),
    ]
)


def _asof_update(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    last = state.get[0] if state.exists else None
    frames = [pdf for pdf in pdfs if len(pdf)]
    out = []
    if frames:
        batch = pd.concat(frames, ignore_index=True).sort_values(
            ["enq_us", "side", "sequenceNumber"], kind="mergesort"
        )
        for enq_us, side in zip(batch["enq_us"], batch["side"]):
            if side == 0:
                last = int(enq_us)
            else:
                out.append((user_id, int(enq_us), last))
    state.update((last,))
    yield pd.DataFrame(
        out, columns=["user_id", "purchase_us", "last_click_us"]
    ).astype({"purchase_us": "int64", "last_click_us": "Int64"})


_ASOFB_STATE_SCHEMA = StructType(
    [
        StructField("users", ArrayType(StringType())),
        StructField("last_left_us", ArrayType(LongType())),
    ]
)


def _asof_bucket_update(
    key: Tuple[int], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-BUCKET as-of update (the :func:`_scd2_bucket_update`
    pattern): every user's last-click carry in one state row of
    parallel arrays, the bucket's batch slice forward-filled in one
    vectorized pass. Only users WITH a click are stored — a user with
    no click yet behaves identically to an unseen user (NULL carry),
    exactly the per-user path's ``(None,)`` state. Timestamps ride a
    float64 ffill: micro-epoch values (< 2^53) are exact in float64.
    """
    import numpy as np

    cols = ["user_id", "purchase_us", "last_click_us"]
    if state.exists:
        users, lasts = state.get
        st = pd.DataFrame(
            {
                "user_id": pd.array(users, dtype=object),
                "enq_us": np.asarray(lasts, dtype=np.int64),
                "side": np.int64(0),
                "rank": 0,
                "sequenceNumber": np.int64(-1),
            }
        )
    else:
        st = None
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        yield pd.DataFrame(columns=cols).astype(
            {"purchase_us": "int64", "last_click_us": "Int64"}
        )
        return
    batch = pd.concat(frames, ignore_index=True).drop(
        columns=["bucket"], errors="ignore"
    )
    batch["rank"] = 1
    allr = pd.concat([st, batch], ignore_index=True) if st is not None else batch
    allr = allr.sort_values(
        ["user_id", "rank", "enq_us", "side", "sequenceNumber"],
        kind="mergesort",
    )
    ucode = pd.factorize(allr["user_id"], use_na_sentinel=False)[0]
    enq = allr["enq_us"].to_numpy(dtype=np.int64)
    side = allr["side"].to_numpy(dtype=np.int64)
    clicks = pd.Series(np.where(side == 0, enq.astype(np.float64), np.nan))
    filled = clicks.groupby(ucode).ffill()
    is_purchase = side == 1
    out = pd.DataFrame(
        {
            "user_id": allr["user_id"].to_numpy()[is_purchase],
            "purchase_us": enq[is_purchase],
            # vectorized NaN->NA masked construction (no per-purchase
            # Python loop in the kernel whose point is replacing
            # per-user Python): float64 micro-epochs < 2^53 are exact,
            # so the Float64->Int64 cast is lossless
            "last_click_us": pd.array(
                filled.to_numpy()[is_purchase], dtype="Float64"
            ).astype("Int64"),
        }
    )
    last_click = filled.groupby(ucode).last()  # last non-null per user
    first_user = (
        pd.Series(allr["user_id"].to_numpy()).groupby(ucode).first()
    )
    keep = last_click.notna()
    state.update(
        (
            # NaN-safe like _scd2_bucket_update: a null user (event with
            # no user_id property) must round-trip as None, not the
            # string 'nan', or its carry is lost across triggers
            [None if pd.isna(u) else str(u) for u in first_user[keep]],
            [int(v) for v in last_click[keep]],
        )
    )
    yield out.astype({"purchase_us": "int64", "last_click_us": "Int64"})


def streaming_asof_join(
    sdf: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    user_key: str = "user_id",
    n_buckets: int | None = 64,
) -> DataFrame:
    """For every purchase, the most recent click at-or-before it, per
    user — the streaming twin of the batch ``hub_asof_join`` query
    (same (enq_us, side, sequenceNumber) total order, clicks sorting
    before simultaneous purchases).

    Carry-forward state is ONE long per user (the last click's event
    time), updated by an Arrow-batched ``applyInPandasWithState``; a
    window over unbounded history in the batch form becomes O(keys)
    state here. A purchase that precedes every click emits NULL
    last_click_us, like the batch query. As-of semantics tolerate
    in-order streams only (a late click cannot retro-fill an emitted
    purchase) — the hub source replays per-partition in seqNo order,
    which is per-user order, so the twin is exact on replay.

    ``n_buckets`` (default 64) applies the :func:`streaming_scd2`
    bucketing: applyInPandasWithState's fixed per-group round trip
    makes per-user grouping O(active users) fixed costs per trigger;
    hash(user) % n_buckets caps it at n_buckets with a vectorized
    forward-fill per bucket (:func:`_asof_bucket_update`), emitting
    identical rows. ``n_buckets=None`` keeps the per-user layout.
    """
    keyed = sdf.where(
        F.col("properties").getItem("event_type").isin(left_type, right_type)
    ).select(
        F.col("properties").getItem(user_key).alias("user_id"),
        F.unix_micros("enqueuedTime").alias("enq_us"),
        F.col("sequenceNumber"),
        F.when(
            F.col("properties").getItem("event_type") == right_type, F.lit(1)
        ).otherwise(F.lit(0)).alias("side"),
    )
    if n_buckets is None:
        return keyed.groupBy("user_id").applyInPandasWithState(
            _asof_update,
            outputStructType=_ASOF_OUT_SCHEMA,
            stateStructType=_ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    bucketed = keyed.withColumn(
        "bucket", F.pmod(F.xxhash64("user_id"), F.lit(n_buckets))
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _asof_bucket_update,
        outputStructType=_ASOF_OUT_SCHEMA,
        stateStructType=_ASOFB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HH_STATE_SCHEMA = StructType(
    [
        StructField("toks", ArrayType(StringType())),
        StructField("cnts", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)
_HH_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("token", StringType()),
        StructField("cnt_lb", LongType()),
        StructField("rank", LongType()),
        # cumulative rows processed for the group — strictly grows per
        # trigger, so MAX(n_seen) identifies a group's FINAL emission
        # in an update-mode sink (the catalog contract check needs the
        # final summary, not the union of all triggers' heads)
        StructField("n_seen", LongType()),
    ]
)


def _hh_update_fn(k: int, top_n: int):
    def fn(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (etype,) = key
        counters: dict = {}
        n_seen = 0
        if state.exists:
            toks, cnts, n_seen = state.get
            counters = dict(zip(toks, cnts))
            n_seen = int(n_seen or 0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_seen += len(pdf)
            for tok, c in pdf["token"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - sub for t, c in counters.items() if c > sub}
        state.update(
            (list(counters.keys()), [int(v) for v in counters.values()], n_seen)
        )
        head = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
        yield pd.DataFrame(
            [(etype, t, int(c), i + 1, n_seen) for i, (t, c) in enumerate(head)],
            columns=["event_type", "token", "cnt_lb", "rank", "n_seen"],
        ).astype({"cnt_lb": "int64", "rank": "int64", "n_seen": "int64"})

    return fn


def streaming_heavy_hitters(
    sdf: DataFrame,
    value_key: str = "k",
    k: int = 64,
    top_n: int = 5,
) -> DataFrame:
    """Running top-``top_n`` property values per event type — the
    streaming twin of the batch ``text_heavy_hitters`` operator, with
    the SAME Misra-Gries summary as its per-group state.

    State per group is a bounded (<= ~2k entries) token->lower-bound
    map carried in the state store and compressed by the
    mergeable-summaries rule whenever it exceeds ``k`` — so state
    stays O(groups * k) forever, no matter how large the value
    vocabulary grows (a naive groupBy(value).count() stream holds
    O(vocabulary) state). Every trigger emits the group's current head
    with its lower-bound count; the MG guarantee carries over: any
    value whose true count in the group exceeds N_group/(k+1) is
    present in the summary.
    """
    keyed = sdf.select(
        F.col("properties").getItem("event_type").alias("event_type"),
        F.col("properties").getItem(value_key).alias("token"),
    ).where(F.col("token").isNotNull())
    return keyed.groupBy("event_type").applyInPandasWithState(
        _hh_update_fn(k, top_n),
        outputStructType=_HH_OUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------
# SCD2 compaction (streaming twin of the batch scd2_state_history)
# ---------------------------------------------------------------------

_SCD2_STATE_SCHEMA = StructType(
    [
        StructField("cur_type", StringType()),
        StructField("valid_from", LongType()),
        StructField("n_run", LongType()),
    ]
)
_SCD2_OUT_SCHEMA = StructType(
    [
        StructField("user_id_str", StringType()),
        StructField("state", StringType()),
        StructField("valid_from_us", LongType()),
        StructField("valid_to_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _scd2_update(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user,) = key
    if state.exists:
        cur, vfrom, nrun = state.get
    else:
        cur, vfrom, nrun = None, None, 0
    frames = [pdf for pdf in pdfs if len(pdf)]
    out = []
    if frames:
        batch = pd.concat(frames, ignore_index=True).sort_values(
            ["enq_us", "sequenceNumber"], kind="mergesort"
        )
        for et, enq in zip(batch["event_type"], batch["enq_us"]):
            # NULL event_type is a real run state (the bucketed kernel
            # factorizes NA as its own code and emits NULL), so the
            # no-open-run sentinel is vfrom — valid_from can never be
            # None for a live run — not cur
            etn = None if pd.isna(et) else str(et)
            if vfrom is None:
                cur, vfrom, nrun = etn, int(enq), 1
            elif etn != cur:
                out.append((user, cur, vfrom, int(enq), nrun))
                cur, vfrom, nrun = etn, int(enq), 1
            else:
                nrun += 1
    state.update((cur, vfrom, nrun))
    yield pd.DataFrame(
        out,
        columns=[
            "user_id_str", "state", "valid_from_us", "valid_to_us", "n_events",
        ],
    ).astype(
        {"valid_from_us": "int64", "valid_to_us": "int64", "n_events": "int64"}
    )


_SCD2B_STATE_SCHEMA = StructType(
    [
        StructField("users", ArrayType(StringType())),
        StructField("cur_types", ArrayType(StringType())),
        StructField("valid_froms", ArrayType(LongType())),
        StructField("n_runs", ArrayType(LongType())),
    ]
)


def _scd2_bucket_update(
    key: Tuple[int], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-BUCKET SCD2 update: the open run of every user hashing into
    this bucket lives in ONE state row (parallel arrays), and the
    whole bucket's micro-batch slice is run-length-encoded in a single
    vectorized pass — no per-user Python, no per-user state-store
    round trip. Semantically identical to :func:`_scd2_update` run
    per user (same sort order, same closed intervals); see
    :func:`streaming_scd2` for why this is the scale path."""
    import numpy as np

    cols = [
        "user_id_str", "state", "valid_from_us", "valid_to_us", "n_events",
    ]
    if state.exists:
        users, cts, vfs, nrs = state.get
        st = pd.DataFrame(
            {
                "user_id_str": pd.array(users, dtype=object),
                "event_type": pd.array(cts, dtype=object),
                "enq_us": np.asarray(vfs, dtype=np.int64),
                "w": np.asarray(nrs, dtype=np.int64),
            }
        )
        st["rank"] = 0  # open-run rows order before any new event
        st["sequenceNumber"] = np.int64(-1)
    else:
        st = None
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        yield pd.DataFrame(columns=cols).astype(
            {"valid_from_us": "int64", "valid_to_us": "int64",
             "n_events": "int64"}
        )
        return
    # drop the grouping column so state and batch frames align exactly
    # (concat with a column absent on one side makes all-NA columns —
    # deprecated dtype behavior in pandas >= 2.1)
    batch = pd.concat(frames, ignore_index=True).drop(
        columns=["bucket"], errors="ignore"
    )
    batch["w"] = np.int64(1)
    batch["rank"] = 1
    allr = pd.concat([st, batch], ignore_index=True) if st is not None else batch
    allr = allr.sort_values(
        ["user_id_str", "rank", "enq_us", "sequenceNumber"], kind="mergesort"
    )
    ucode = pd.factorize(allr["user_id_str"], use_na_sentinel=False)[0]
    tcode = pd.factorize(allr["event_type"], use_na_sentinel=False)[0]
    change = np.ones(len(allr), dtype=bool)
    change[1:] = (ucode[1:] != ucode[:-1]) | (tcode[1:] != tcode[:-1])
    run_id = np.cumsum(change) - 1
    runs = (
        pd.DataFrame(
            {
                "run_id": run_id,
                "user_id_str": allr["user_id_str"].to_numpy(),
                "event_type": allr["event_type"].to_numpy(),
                "enq_us": allr["enq_us"].to_numpy(),
                "w": allr["w"].to_numpy(),
            }
        )
        .groupby("run_id", sort=True)
        .agg(
            user_id_str=("user_id_str", "first"),
            event_type=("event_type", "first"),
            valid_from_us=("enq_us", "first"),
            n_events=("w", "sum"),
        )
        .reset_index(drop=True)
    )
    same_user_next = np.zeros(len(runs), dtype=bool)
    rcode = pd.factorize(runs["user_id_str"], use_na_sentinel=False)[0]
    same_user_next[:-1] = rcode[1:] == rcode[:-1]
    closed = runs[same_user_next].copy()
    closed["valid_to_us"] = runs["valid_from_us"].to_numpy()[
        np.flatnonzero(same_user_next) + 1
    ]
    open_runs = runs[~same_user_next]
    state.update(
        (
            [None if pd.isna(u) else str(u)
             for u in open_runs["user_id_str"]],
            [None if pd.isna(t) else str(t)
             for t in open_runs["event_type"]],
            [int(v) for v in open_runs["valid_from_us"]],
            [int(v) for v in open_runs["n_events"]],
        )
    )
    yield closed.rename(columns={"event_type": "state"})[cols].astype(
        {"valid_from_us": "int64", "valid_to_us": "int64",
         "n_events": "int64"}
    )


def streaming_scd2(
    sdf: DataFrame,
    user_key: str = "user_id",
    n_buckets: int | None = 64,
) -> DataFrame:
    """SCD type-2 compaction as a stream (the CDC shape): per user,
    the current (state, valid_from, run_count) is the ONLY state; a
    closed validity interval is emitted the moment the user's
    event_type changes. The streaming twin of the batch
    ``scd2_state_history`` catalog query restricted to CLOSED
    intervals — the still-open run per user lives in the state store,
    exactly as a warehouse CDC pipeline keeps the open SCD2 row
    outside the immutable history.

    Exact under ANY micro-batch boundary: processing is pure
    carry-forward with no lookahead, and the hub replays per-partition
    in seqNo order, which is per-user (enq_us, sequenceNumber) order —
    the same total order the batch oracle sorts by.

    ``n_buckets`` (default 64) groups by ``hash(user) % n_buckets``
    instead of per-user: Spark's applyInPandasWithState pays a fixed
    Arrow/state-store round trip per GROUP per trigger (profiled at
    ~0.2-0.25 ms — the whole cost of the sf1 drain, round-7 verdict
    item 4), so per-user grouping is O(active users) fixed costs
    per trigger while bucketing caps it at ``n_buckets`` and
    processes each bucket's slice in one vectorized RLE pass
    (:func:`_scd2_bucket_update`). Output and state CONTENT are
    identical to the per-user path (``n_buckets=None``) — only the
    state layout changes (per-user rows vs per-bucket parallel
    arrays). Scale: state is one (string, long, long) per user either
    way; at 100 TB size n_buckets ~ a few x shuffle parallelism so
    buckets stay cache-sized while the per-trigger constant stays
    flat."""
    keyed = sdf.select(
        F.col("properties").getItem(user_key).alias("user_id_str"),
        F.col("properties").getItem("event_type").alias("event_type"),
        F.unix_micros("enqueuedTime").alias("enq_us"),
        F.col("sequenceNumber"),
    )
    if n_buckets is None:
        return keyed.groupBy("user_id_str").applyInPandasWithState(
            _scd2_update,
            outputStructType=_SCD2_OUT_SCHEMA,
            stateStructType=_SCD2_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    bucketed = keyed.withColumn(
        "bucket", F.pmod(F.xxhash64("user_id_str"), F.lit(n_buckets))
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _scd2_bucket_update,
        outputStructType=_SCD2_OUT_SCHEMA,
        stateStructType=_SCD2B_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------
# Event-time-timeout state eviction (inactivity flagging)
# ---------------------------------------------------------------------

_IDLE_STATE_SCHEMA = StructType(
    [
        StructField("last_seen_us", LongType()),
        StructField("n_events", LongType()),
    ]
)
_IDLE_OUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("last_seen_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _idle_update_fn(idle_us: int):
    def fn(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            # watermark passed last_seen + idle horizon: emit the
            # inactivity record and EVICT the state — the pattern that
            # keeps per-key state bounded by the active-key set, not
            # the all-time key set
            last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user, int(last), int(n))],
                columns=["user_id", "last_seen_us", "n_events"],
            ).astype({"last_seen_us": "int64", "n_events": "int64"})
            return
        last, n = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf):
                last = max(int(last), int(pdf["enq_us"].max()))
                n += len(pdf)
        state.update((int(last), int(n)))
        # timeout fires when the event-time watermark passes this
        state.setTimeoutTimestamp(int(last) // 1000 + idle_us // 1000)
        yield pd.DataFrame(
            [], columns=["user_id", "last_seen_us", "n_events"]
        ).astype(
            {"user_id": "object", "last_seen_us": "int64", "n_events": "int64"}
        )

    return fn


_INTERVAL_US = {
    "microsecond": 1, "millisecond": 1_000, "second": 1_000_000,
    "minute": 60_000_000, "hour": 3_600_000_000, "day": 86_400_000_000,
}


def _interval_to_us(interval: str) -> int:
    """Parse a Spark watermark-delay interval string ('1 hour',
    '30 minutes', ...) into microseconds, so the watermark delay and
    the state-timeout horizon share ONE source of truth."""
    total, parts = 0, interval.strip().lower().split()
    if len(parts) % 2 or not parts:
        raise ValueError(f"unsupported interval string: {interval!r}")
    for val, unit in zip(parts[::2], parts[1::2]):
        unit = unit.rstrip("s")
        if unit not in _INTERVAL_US:
            raise ValueError(f"unsupported interval unit in {interval!r}: {unit}")
        total += int(val) * _INTERVAL_US[unit]
    return total


def streaming_idle_users(
    sdf: DataFrame,
    idle: str = "1 hour",
    user_key: str = "user_id",
) -> DataFrame:
    """Inactivity detection via EVENT-TIME state timeouts: a user's
    (last_seen, count) state times out — and is REMOVED — once the
    watermark passes their last event plus the idle horizon, emitting
    one inactivity record. This is the state-eviction pattern that
    bounds applyInPandasWithState memory by the ACTIVE key set at any
    watermark, not the all-time key set — without it, 100 TB of
    history means state for every user ever seen. ``idle`` drives BOTH
    the watermark delay and the timeout horizon (derived via
    :func:`_interval_to_us`), so the two can never disagree."""
    idle_us = _interval_to_us(idle)
    keyed = sdf.select(
        F.col("properties").getItem(user_key).alias("user_id"),
        F.col("enqueuedTime").alias("ev_time"),
        F.unix_micros("enqueuedTime").alias("enq_us"),
    ).withWatermark("ev_time", idle)
    return keyed.groupBy("user_id").applyInPandasWithState(
        _idle_update_fn(idle_us),
        outputStructType=_IDLE_OUT_SCHEMA,
        stateStructType=_IDLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
