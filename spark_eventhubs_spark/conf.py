"""EventHubsConf — case-insensitive options map with typed setters.

Re-implements the semantics of
``core/src/main/scala/org/apache/spark/eventhubs/EventHubsConf.scala``:
- case-insensitive string->string map with typed setters (lines 55-115)
- the option-key namespace (lines 697-722)
- precedence: per-partition maps override global scalars which override
  defaults (lines 242-245, 344-346)
- ``trimmed`` strips driver-only options before shipping to executors
  (lines 163-191)

Values are stored as strings (positions as JSON) exactly as PySpark
users of the reference build them
(docs/PySpark/structured-streaming-pyspark.md:52-120). Connection-string
encryption (EventHubsConf.scala:137-144) is intentionally out of scope:
no secrets exist for a file-backed hub.
"""

from __future__ import annotations

import json
from typing import Dict, Iterator, Mapping, Optional

from spark_eventhubs_spark.connstr import ConnectionStringBuilder
from spark_eventhubs_spark.position import EventPosition

# Option keys — ref EventHubsConf.scala:697-722 (same names for fidelity)
CONNECTION_STRING_KEY = "eventhubs.connectionString"
CONSUMER_GROUP_KEY = "eventhubs.consumerGroup"
STARTING_POSITION_KEY = "eventhubs.startingPosition"
STARTING_POSITIONS_KEY = "eventhubs.startingPositions"
ENDING_POSITION_KEY = "eventhubs.endingPosition"
ENDING_POSITIONS_KEY = "eventhubs.endingPositions"
MAX_RATE_PER_PARTITION_KEY = "eventhubs.maxRatePerPartition"
MAX_RATES_PER_PARTITION_KEY = "eventhubs.maxRatesPerPartition"
MAX_EVENTS_PER_TRIGGER_KEY = "eventhubs.maxEventsPerTrigger"
RECEIVER_TIMEOUT_KEY = "eventhubs.receiverTimeout"
OPERATION_TIMEOUT_KEY = "eventhubs.operationTimeout"
MAX_ACCEPTABLE_BATCH_RECEIVE_TIME_KEY = "eventhubs.maxAcceptableBatchReceiveTime"
PREFETCH_COUNT_KEY = "eventhubs.prefetchCount"
THREAD_POOL_SIZE_KEY = "eventhubs.threadPoolSize"
USE_SIMULATED_CLIENT_KEY = "useSimulatedClient"
SLOW_PARTITION_ADJUSTMENT_KEY = "eventhubs.slowPartitionAdjustment"
DYNAMIC_PARTITION_DISCOVERY_KEY = "eventhubs.dynamicPartitionDiscovery"
PARTITION_COUNT_KEY = "eventhubs.partitionCount"  # ours: partition count of the simulated hub

# Defaults — ref eventhubs/package.scala:37-59
DEFAULT_CONSUMER_GROUP = "$Default"
DEFAULT_MAX_RATE_PER_PARTITION = 1000
DEFAULT_RECEIVER_TIMEOUT_MS = 60_000
DEFAULT_OPERATION_TIMEOUT_MS = 300_000
DEFAULT_MAX_ACCEPTABLE_BATCH_RECEIVE_TIME_MS = 30_000
DEFAULT_PREFETCH_COUNT = 500
DEFAULT_THREAD_POOL_SIZE = 16
DEFAULT_PARTITION_COUNT = 4  # ref utils/EventHubsTestUtils.scala:189

# Driver-only keys stripped by trimmed() — ref EventHubsConf.scala:163-191
_DRIVER_ONLY_KEYS = {
    STARTING_POSITION_KEY.lower(),
    STARTING_POSITIONS_KEY.lower(),
    ENDING_POSITION_KEY.lower(),
    ENDING_POSITIONS_KEY.lower(),
    MAX_RATE_PER_PARTITION_KEY.lower(),
    MAX_RATES_PER_PARTITION_KEY.lower(),
    MAX_EVENTS_PER_TRIGGER_KEY.lower(),
}


class EventHubsConf(Mapping[str, str]):
    """Case-insensitive string->string map with typed accessors.

    Keys are matched case-insensitively but stored/echoed with their
    canonical casing, like the reference's CaseInsensitiveMap usage.
    """

    def __init__(self, connection_string: Optional[str] = None) -> None:
        self._map: Dict[str, str] = {}  # lowercased key -> value
        self._names: Dict[str, str] = {}  # lowercased key -> original casing
        if connection_string is not None:
            self.set(CONNECTION_STRING_KEY, connection_string)

    # ---- raw map API ----
    def set(self, key: str, value) -> "EventHubsConf":
        if value is None:
            raise ValueError(f"value for {key} must not be None")
        lk = key.lower()
        self._map[lk] = str(value)
        self._names[lk] = key
        return self

    def get(self, key: str, default: Optional[str] = None) -> Optional[str]:
        return self._map.get(key.lower(), default)

    def __getitem__(self, key: str) -> str:
        return self._map[key.lower()]

    def __iter__(self) -> Iterator[str]:
        return iter(self._names.values())

    def __len__(self) -> int:
        return len(self._map)

    def __contains__(self, key: object) -> bool:
        return isinstance(key, str) and key.lower() in self._map

    def to_map(self) -> Dict[str, str]:
        return {self._names[lk]: v for lk, v in self._map.items()}

    def clone(self) -> "EventHubsConf":
        c = EventHubsConf()
        c._map = dict(self._map)
        c._names = dict(self._names)
        return c

    def trimmed(self) -> "EventHubsConf":
        """Strip driver-only options (ref EventHubsConf.scala:163-191)."""
        c = EventHubsConf()
        for lk, v in self._map.items():
            if lk not in _DRIVER_ONLY_KEYS:
                c._map[lk] = v
                c._names[lk] = self._names[lk]
        return c

    # ---- typed setters/getters ----
    def set_connection_string(self, s: str) -> "EventHubsConf":
        return self.set(CONNECTION_STRING_KEY, s)

    @property
    def connection_string(self) -> Optional[str]:
        return self.get(CONNECTION_STRING_KEY)

    @property
    def name(self) -> Optional[str]:
        """Event hub entity name, parsed out of the connection string."""
        cs = self.connection_string
        if cs is None:
            return None
        return ConnectionStringBuilder.parse(cs).entity_path

    def set_consumer_group(self, g: str) -> "EventHubsConf":
        return self.set(CONSUMER_GROUP_KEY, g)

    @property
    def consumer_group(self) -> str:
        return self.get(CONSUMER_GROUP_KEY, DEFAULT_CONSUMER_GROUP)

    def set_starting_position(self, p: EventPosition) -> "EventHubsConf":
        return self.set(STARTING_POSITION_KEY, p.to_json())

    def set_starting_positions(self, per_partition: Dict[int, EventPosition]) -> "EventHubsConf":
        return self.set(
            STARTING_POSITIONS_KEY,
            json.dumps({str(k): json.loads(v.to_json()) for k, v in per_partition.items()},
                       sort_keys=True),
        )

    def set_ending_position(self, p: EventPosition) -> "EventHubsConf":
        return self.set(ENDING_POSITION_KEY, p.to_json())

    def set_ending_positions(self, per_partition: Dict[int, EventPosition]) -> "EventHubsConf":
        return self.set(
            ENDING_POSITIONS_KEY,
            json.dumps({str(k): json.loads(v.to_json()) for k, v in per_partition.items()},
                       sort_keys=True),
        )

    def _position(self, scalar_key: str, map_key: str, partition_id: int,
                  default: Optional[EventPosition]) -> Optional[EventPosition]:
        """Per-partition map overrides global scalar overrides default
        (ref EventHubsConf.scala:242-245,344-346)."""
        m = self.get(map_key)
        if m is not None:
            d = json.loads(m)
            if str(partition_id) in d:
                return EventPosition.from_json(json.dumps(d[str(partition_id)]))
        s = self.get(scalar_key)
        if s is not None:
            return EventPosition.from_json(s)
        return default

    def starting_position_for(self, partition_id: int) -> EventPosition:
        # default start = start of stream (ref EventHubsSource.scala default)
        p = self._position(STARTING_POSITION_KEY, STARTING_POSITIONS_KEY,
                           partition_id, EventPosition.from_start_of_stream())
        assert p is not None
        return p

    def ending_position_for(self, partition_id: int) -> EventPosition:
        p = self._position(ENDING_POSITION_KEY, ENDING_POSITIONS_KEY,
                           partition_id, EventPosition.from_end_of_stream())
        assert p is not None
        return p

    def set_max_events_per_trigger(self, n: int) -> "EventHubsConf":
        return self.set(MAX_EVENTS_PER_TRIGGER_KEY, int(n))

    def max_events_per_trigger(self, partition_count: int) -> int:
        """Default = partitionCount * 1000 (ref EventHubsSource.scala:91-96)."""
        v = self.get(MAX_EVENTS_PER_TRIGGER_KEY)
        if v is not None:
            return int(v)
        return partition_count * DEFAULT_MAX_RATE_PER_PARTITION

    def set_max_rate_per_partition(self, n: int) -> "EventHubsConf":
        return self.set(MAX_RATE_PER_PARTITION_KEY, int(n))

    def set_max_rates_per_partition(self, rates: Dict[int, int]) -> "EventHubsConf":
        return self.set(MAX_RATES_PER_PARTITION_KEY,
                        json.dumps({str(k): int(v) for k, v in rates.items()}, sort_keys=True))

    def max_rate_per_partition_for(self, partition_id: int) -> int:
        m = self.get(MAX_RATES_PER_PARTITION_KEY)
        if m is not None:
            d = json.loads(m)
            if str(partition_id) in d:
                return int(d[str(partition_id)])
        s = self.get(MAX_RATE_PER_PARTITION_KEY)
        if s is not None:
            return int(s)
        return DEFAULT_MAX_RATE_PER_PARTITION

    def set_slow_partition_adjustment(self, b: bool) -> "EventHubsConf":
        return self.set(SLOW_PARTITION_ADJUSTMENT_KEY, "true" if b else "false")

    @property
    def slow_partition_adjustment(self) -> bool:
        return self.get(SLOW_PARTITION_ADJUSTMENT_KEY, "false").lower() == "true"

    def set_max_acceptable_batch_receive_time_ms(self, ms: int) -> "EventHubsConf":
        return self.set(MAX_ACCEPTABLE_BATCH_RECEIVE_TIME_KEY, int(ms))

    @property
    def max_acceptable_batch_receive_time_ms(self) -> int:
        return int(self.get(MAX_ACCEPTABLE_BATCH_RECEIVE_TIME_KEY,
                            str(DEFAULT_MAX_ACCEPTABLE_BATCH_RECEIVE_TIME_MS)))

    def set_partition_count(self, n: int) -> "EventHubsConf":
        return self.set(PARTITION_COUNT_KEY, int(n))

    @property
    def partition_count(self) -> int:
        return int(self.get(PARTITION_COUNT_KEY, str(DEFAULT_PARTITION_COUNT)))

    def validate(self) -> None:
        if self.connection_string is None:
            raise ValueError(f"Must set {CONNECTION_STRING_KEY}")
        if STARTING_POSITION_KEY in self and STARTING_POSITIONS_KEY in self:
            # the reference allows both (map overrides); we keep that, so no error
            pass
