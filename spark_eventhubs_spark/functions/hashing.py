"""Deterministic cross-engine hashing primitives.

Engine-native hash functions differ between Spark (xxhash64/murmur3)
and DuckDB (its own hash), so every operator whose *results* must be
oracle-checkable (minhash, simhash, LSH banding, fingerprints) builds
on one shared primitive: the first 15 hex digits of md5, read as a
60-bit integer. md5 is available and bit-identical in both engines,
and 60 bits stays inside a signed BIGINT.

Spark:   CAST(CONV(SUBSTRING(MD5(x), 1, 15), 16, 10) AS BIGINT)
DuckDB:  CAST(('0x' || SUBSTRING(MD5(x), 1, 15)) AS BIGINT)

Performance note: md5 here is JVM-side (whole-stage codegen), not a
Python UDF. It is ~2-3x slower than xxhash64; operators accept a
``fast=True`` flag to switch to xxhash64 when oracle parity is not
required (production path at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash64(col: Column, seed: int = 0) -> Column:
    """60-bit integer hash of (seed || value), identical in DuckDB."""
    base = F.concat(F.lit(f"s{seed}|"), col.cast("string")) if seed else col.cast("string")
    return F.conv(F.substring(F.md5(base), 1, 15), 16, 10).cast("bigint")


def oracle_md5_hash64(expr: str, seed: int = 0) -> str:
    """DuckDB SQL emitting the same value as :func:`md5_hash64`."""
    base = f"('s{seed}|' || CAST({expr} AS VARCHAR))" if seed else f"CAST({expr} AS VARCHAR)"
    return f"CAST(('0x' || SUBSTRING(MD5({base}), 1, 15)) AS BIGINT)"


# convenience constant documenting the pattern for raw SQL authors
ORACLE_MD5_HASH64 = "CAST(('0x' || SUBSTRING(MD5({expr}), 1, 15)) AS BIGINT)"
