"""Multimodal column plumbing — binary payloads + typed metadata.

North-star operator family (SURVEY §2.3): treat image/audio/video as
opaque ``binary`` columns with typed metadata, and run decode /
feature-extract / resize / frame-sample as Arrow-batched Pandas UDFs
over ``mapInPandas``.

The actual media codecs are NOT in this container, so the decode step
is a clearly-marked deterministic stub (`_fake_decode`): it derives
pseudo-metadata purely from the byte content (length, first bytes,
md5). Everything around it — schema handling, Arrow batching,
partition-preserving mapInPandas, column pruning — is real and is the
part that matters for the 100 TB plumbing. Swap `_fake_decode` for a
PIL/ffmpeg call in a container that has them.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("format_guess", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content_md5", StringType()),
    ]
)

REAL_DECODERS_AVAILABLE = False  # flipped when PIL/av are importable
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    REAL_DECODERS_AVAILABLE = True
except Exception:
    pass


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decode. NOT a real decoder:
    derives metadata from raw bytes so tests and oracles are stable."""
    n = len(payload)
    h = hashlib.md5(payload).hexdigest()
    return {
        "n_bytes": n,
        "format_guess": "png" if payload[:4] == b"\x89PNG" else
                        "jpeg" if payload[:2] == b"\xff\xd8" else "raw",
        "width": (n % 640) + 1,
        "height": ((n // 640) % 480) + 1,
        "content_md5": h,
    }


def as_media_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture a binary media column from text (the container has
    no real media); downstream plumbing treats it as opaque bytes."""
    return df.select(
        F.col("doc_id"), F.encode(F.col(text_col), "UTF-8").alias("media")
    )


def extract_media_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Arrow-batched metadata extraction over mapInPandas.

    Partition-preserving (no shuffle); batch size follows
    spark.sql.execution.arrow.maxRecordsPerBatch. The stub decode is
    CPU-trivial; a real decoder would bound batch size by memory
    (bytes per batch), which is why this is mapInPandas and not a
    scalar pandas_udf: the iterator form lets one output row batch be
    emitted per input batch without concatenating whole partitions.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(bytes(b)) for b in pdf[media_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[[f.name for f in MEDIA_META_SCHEMA.fields]]

    return df.mapInPandas(_extract, MEDIA_META_SCHEMA)


def oracle_media_metadata() -> str:
    """DuckDB twin of as_media_column >> extract_media_metadata over
    documents: the stub decode is pure byte math, so even the
    mapInPandas path is oracle-checkable."""
    return """SELECT doc_id,
  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
  'raw' AS format_guess,
  CAST((octet_length(CAST(text AS BLOB)) % 640) + 1 AS INTEGER) AS width,
  CAST(((octet_length(CAST(text AS BLOB)) // 640) % 480) + 1 AS INTEGER) AS height,
  md5(text) AS content_md5
FROM documents"""


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_offset", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_md5", StringType()),
    ]
)

DEFAULT_FRAME_STRIDE = 64
DEFAULT_FRAME_LEN = 32


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    stride: int = DEFAULT_FRAME_STRIDE,
    frame_len: int = DEFAULT_FRAME_LEN,
) -> DataFrame:
    """Frame sampling plumbing: one ``frame_len``-byte "frame" every
    ``stride`` bytes of the opaque payload — the one-to-many
    mapInPandas shape of real video frame extraction / audio chunking
    (a real decoder swaps the byte-slice for a codec call; the Spark
    side — schema, Arrow batching, row explosion, no shuffle — is
    identical). Deterministic byte math, so fully oracle-checkable.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FRAME_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf[media_col]):
                b = bytes(blob)
                n = len(b)
                for i in range((n + stride - 1) // stride):
                    off = i * stride
                    chunk = b[off:off + frame_len]
                    rows.append(
                        (int(did), i, off, len(chunk),
                         hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_sample, FRAME_SCHEMA)


def oracle_sample_frames(
    stride: int = DEFAULT_FRAME_STRIDE, frame_len: int = DEFAULT_FRAME_LEN
) -> str:
    """DuckDB twin of as_media_column >> sample_frames over documents
    (testdata text is pure ASCII, so string slicing == byte slicing)."""
    return f"""WITH m AS (
  SELECT doc_id, text, length(text) AS n FROM documents
), fr AS (
  SELECT doc_id, text, n,
    UNNEST(range(CAST(ceil(n * 1.0 / {stride}) AS BIGINT))) AS i
  FROM m WHERE n > 0
)
SELECT doc_id,
  CAST(i AS BIGINT) AS frame_idx,
  CAST(i * {stride} AS BIGINT) AS frame_offset,
  CAST(least({frame_len}, n - i * {stride}) AS BIGINT) AS frame_len,
  md5(substring(text, CAST(i * {stride} + 1 AS BIGINT), {frame_len})) AS frame_md5
FROM fr"""


def resize_stub(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Placeholder for a real resize: passes bytes through and records
    the requested op in a metadata column. Raises if someone expects a
    real pixel transform in this container."""
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real decoder path not wired yet")
    return df.withColumn("resize_op", F.lit("stub:keep-original"))
