"""Connection-string builder/parser.

Re-implements the user-facing behavior of
``core/src/main/scala/org/apache/spark/eventhubs/ConnectionStringBuilder.scala:62-434``:
parse/build ``Endpoint=...;EntityPath=...;SharedAccessKeyName=...;
SharedAccessKey=...`` strings. For the file-backed simulated hub the
Endpoint carries the parquet directory (``file:///path``) and
EntityPath the table name (default ``events``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

_ENDPOINT = "Endpoint"
_ENTITY_PATH = "EntityPath"
_SAS_KEY_NAME = "SharedAccessKeyName"
_SAS_KEY = "SharedAccessKey"
_SAS_SIGNATURE = "SharedAccessSignature"
_OPERATION_TIMEOUT = "OperationTimeout"


@dataclass
class ConnectionStringBuilder:
    endpoint: Optional[str] = None
    entity_path: Optional[str] = None
    sas_key_name: Optional[str] = None
    sas_key: Optional[str] = None
    sas_signature: Optional[str] = None
    operation_timeout: Optional[str] = None
    _extra: Dict[str, str] = field(default_factory=dict)

    @staticmethod
    def parse(connection_string: str) -> "ConnectionStringBuilder":
        b = ConnectionStringBuilder()
        for token in connection_string.strip().split(";"):
            if not token:
                continue
            if "=" not in token:
                raise ValueError(f"invalid connection string segment: {token!r}")
            key, _, value = token.partition("=")
            key = key.strip()
            value = value.strip()
            kl = key.lower()
            if kl == _ENDPOINT.lower():
                b.endpoint = value
            elif kl == _ENTITY_PATH.lower():
                b.entity_path = value
            elif kl == _SAS_KEY_NAME.lower():
                b.sas_key_name = value
            elif kl == _SAS_KEY.lower():
                b.sas_key = value
            elif kl == _SAS_SIGNATURE.lower():
                b.sas_signature = value
            elif kl == _OPERATION_TIMEOUT.lower():
                b.operation_timeout = value
            else:
                b._extra[key] = value
        return b

    def set_event_hub_name(self, name: str) -> "ConnectionStringBuilder":
        self.entity_path = name
        return self

    def build(self) -> str:
        parts = []
        if self.endpoint:
            parts.append(f"{_ENDPOINT}={self.endpoint}")
        if self.entity_path:
            parts.append(f"{_ENTITY_PATH}={self.entity_path}")
        if self.sas_key_name:
            parts.append(f"{_SAS_KEY_NAME}={self.sas_key_name}")
        if self.sas_key:
            parts.append(f"{_SAS_KEY}={self.sas_key}")
        if self.sas_signature:
            parts.append(f"{_SAS_SIGNATURE}={self.sas_signature}")
        if self.operation_timeout:
            parts.append(f"{_OPERATION_TIMEOUT}={self.operation_timeout}")
        for k, v in self._extra.items():
            parts.append(f"{k}={v}")
        return ";".join(parts)

    def __str__(self) -> str:
        return self.build()


def file_hub_connection_string(directory: str, table: str = "events") -> str:
    """Build a connection string addressing a parquet-backed hub."""
    ep = directory if "://" in directory else f"file://{directory}"
    return f"{_ENDPOINT}={ep};{_ENTITY_PATH}={table}"
