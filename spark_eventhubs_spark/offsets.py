"""Offset model: NameAndPartition, OffsetRange, EventHubsSourceOffset.

Re-implements:
- ``NameAndPartition(ehName, partitionId)``
  (ref core/.../eventhubs/NameAndPartition.scala:28-46)
- ``OffsetRange(nameAndPartition, fromSeqNo, untilSeqNo, preferredLoc)``,
  start-inclusive / end-exclusive, ``count = untilSeqNo - fromSeqNo``
  (ref eventhubs/rdd/OffsetRange.scala:53-83)
- ``EventHubsSourceOffset(partitionToSeqNos)`` with the JSON wire format
  ``{"ehName":{"0":23,"1":45}}`` (ref sql/eventhubs/EventHubsSourceOffset.scala:26-31,
  sql/eventhubs/JsonUtils.scala:63-100)
- the v1 metadata-log format: first line ``v1``, then the JSON; legacy
  raw-JSON (Spark 2.1 style) still parses; unknown versions rejected
  (ref sql/eventhubs/EventHubsSource.scala:118-146).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Dict, Optional

VERSION = 1


@dataclass(frozen=True, order=True)
class NameAndPartition:
    eh_name: str
    partition_id: int

    def __str__(self) -> str:  # ref NameAndPartition.scala:33 toString
        return f"EventHubNameAndPartition({self.eh_name}, {self.partition_id})"


@dataclass(frozen=True)
class OffsetRange:
    """[from_seq_no, until_seq_no) for one partition."""

    name_and_partition: NameAndPartition
    from_seq_no: int
    until_seq_no: int
    preferred_loc: Optional[str] = None

    def __post_init__(self) -> None:
        if self.until_seq_no < self.from_seq_no:
            raise ValueError(
                f"until_seq_no ({self.until_seq_no}) < from_seq_no ({self.from_seq_no}) "
                f"for {self.name_and_partition}"
            )

    @property
    def name(self) -> str:
        return self.name_and_partition.eh_name

    @property
    def partition_id(self) -> int:
        return self.name_and_partition.partition_id

    @property
    def count(self) -> int:  # ref OffsetRange.scala:70
        return self.until_seq_no - self.from_seq_no

    def __str__(self) -> str:  # ref OffsetRange.scala:76-80
        return (
            f"OffsetRange(partition: {self.name_and_partition} | "
            f"fromSeqNo: {self.from_seq_no} | untilSeqNo: {self.until_seq_no})"
        )


@dataclass(frozen=True)
class EventHubsSourceOffset:
    """Checkpoint token: map of (ehName, partitionId) -> seqNo."""

    partition_to_seq_nos: Dict[NameAndPartition, int] = field(default_factory=dict)

    # --- JSON wire format, byte-compatible with JsonUtils.scala:63-100 ---
    def json(self) -> str:
        result: Dict[str, Dict[str, int]] = {}
        for nap in sorted(self.partition_to_seq_nos):
            result.setdefault(nap.eh_name, {})[str(nap.partition_id)] = (
                self.partition_to_seq_nos[nap]
            )
        return json.dumps(result, separators=(",", ":"))

    @staticmethod
    def from_json(s: str) -> "EventHubsSourceOffset":
        try:
            raw = json.loads(s)
            out: Dict[NameAndPartition, int] = {}
            for name, parts in raw.items():
                for pid, seq in parts.items():
                    out[NameAndPartition(name, int(pid))] = int(seq)
            return EventHubsSourceOffset(out)
        except (ValueError, AttributeError) as e:
            raise ValueError(
                f"failed to parse partition seqNos map from {s!r}"
            ) from e

    # --- v1 metadata-log format (EventHubsSource.scala:118-146) ---
    def serialize_metadata(self) -> str:
        return f"v{VERSION}\n{self.json()}"

    @staticmethod
    def deserialize_metadata(content: str) -> "EventHubsSourceOffset":
        if not content:
            raise ValueError("empty metadata log")
        line, _, rest = content.partition("\n")
        m = re.fullmatch(r"v(\d+)", line.strip())
        if m:
            version = int(m.group(1))
            if version > VERSION:
                raise ValueError(
                    f"unsupported metadata log version v{version}; "
                    f"this reader supports up to v{VERSION}"
                )
            return EventHubsSourceOffset.from_json(rest)
        # legacy Spark-2.1-style raw JSON with no version header
        return EventHubsSourceOffset.from_json(content)
