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


def _audio_features_fn(media_col: str = "media"):
    """Kernel builder for :func:`audio_features` (see
    :func:`_image_stats_fn` for why these are module-level)."""
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

    return _features


def audio_features(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Real audio feature extraction over mapInPandas: decode each WAV
    payload and emit channel count, rate, frames, duration, and the RMS
    energy of the samples as an e6-scaled integer. Same Arrow-batched,
    partition-preserving, byte-bounded shape as the stubbed decoders —
    but the sample math is real."""
    return df.mapInPandas(_audio_features_fn(media_col), AUDIO_FEATURES_SCHEMA)


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


def _image_stats_fn(media_col: str = "media"):
    """Kernel builder for :func:`image_stats` — module-level so fused
    encode>>decode chains (r13) can compose it generator-to-generator
    with a ``_*_make_fn`` inside ONE Python worker pass."""

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

    return _stats


def image_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Real image statistics over mapInPandas: decode each payload
    (netpbm or BMP, sniffed per row) and emit dimensions plus integer pixel stats (mean scaled
    e2 via exact integer math — sum*100 // count — so results are
    engine- and batch-order-independent)."""
    return df.mapInPandas(_image_stats_fn(media_col), IMAGE_STATS_SCHEMA)


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


def _dib_raster(img) -> bytes:
    """(h, w, 3) RGB uint8 -> the raw DIB raster both BMP and
    uncompressed AVI store: bottom-up BGR rows padded to 4-byte
    boundaries."""
    import numpy as np

    img = np.asarray(img, dtype="u1")
    h, w, ch = img.shape
    if ch != 3:
        raise ValueError("DIB raster writer is 24-bit RGB only")
    pad = (-(w * 3)) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up row order
        rows.append(img[y, :, ::-1].tobytes() + b"\x00" * pad)
    return b"".join(rows)


def _dib_frame_decode(raster: bytes, w: int, h: int, ch: int):
    """Raw DIB raster -> (h, w, ch) uint8 RGB — the shared back half
    of :func:`decode_bmp`, reused verbatim by the AVI '00db' frame
    path (an uncompressed AVI frame IS a BMP raster without the file
    header)."""
    import numpy as np

    row_bytes = (w * ch + 3) & ~3
    if len(raster) < row_bytes * h:
        raise ValueError("truncated DIB raster")
    arr = np.frombuffer(
        raster, dtype="u1", count=row_bytes * h
    ).reshape(h, row_bytes)[:, : w * ch].reshape(h, w, ch)
    arr = arr[::-1]  # bottom-up storage
    if ch == 3:
        arr = arr[:, :, ::-1]  # stored BGR -> returned RGB
    return np.ascontiguousarray(arr)


def encode_bmp(img) -> bytes:
    """Real BMP encode (BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up):
    takes an (h, w, 3) RGB uint8 array, emits BGR rows padded to
    4-byte boundaries — the exact layout :func:`decode_bmp` parses,
    property-tested as a round-trip in tests/test_properties.py."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype="u1")
    h, w, ch = img.shape
    raster = _dib_raster(img)
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


def encode_avi(frames, rate: int = 10, scale: int = 1) -> bytes:
    """Real uncompressed-AVI encode (the video twin of
    :func:`encode_bmp`): a RIFF 'AVI ' container with the standard
    hdrl LIST (MainAVIHeader + one 'vids'/'DIB ' stream with a
    BITMAPINFOHEADER strf) and a movi LIST of '00db' chunks, each
    holding one frame's raw DIB raster (:func:`_dib_raster` — the
    exact bytes a BMP stores after its file header). ``frames`` is a
    non-empty list of same-shape (h, w, 3) RGB uint8 arrays; frame
    rate is ``rate/scale`` fps. Round-trip property-tested against
    :func:`_decode_avi`.

    Reference parity note: the reference connector treats event bodies
    as opaque bytes (M/eventhubs/EventHubsConf.scala — no media
    layer); this closes SURVEY §2.3's multimodal video sliver with a
    decoder that needs nothing beyond stdlib struct + numpy."""
    import struct

    import numpy as np

    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    first = np.asarray(frames[0], dtype="u1")
    h, w, ch = first.shape
    rasters = []
    for fr in frames:
        a = np.asarray(fr, dtype="u1")
        if a.shape != (h, w, ch):
            raise ValueError("encode_avi frames must share one shape")
        rasters.append(_dib_raster(a))
    frame_bytes = len(rasters[0])
    usec_per_frame = scale * 1_000_000 // rate

    def chunk(cc: bytes, body: bytes) -> bytes:
        return cc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    avih = struct.pack(
        "<14I",
        usec_per_frame,        # dwMicroSecPerFrame
        frame_bytes * rate,    # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0,                     # dwFlags (no idx1 index is written)
        len(rasters),          # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        frame_bytes,           # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,      # dwWidth, dwHeight, dwReserved[4]
    )
    strh = (
        b"vids" + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0,            # dwFlags, wPriority, wLanguage
            0,                  # dwInitialFrames
            scale, rate,        # dwScale, dwRate
            0, len(rasters),    # dwStart, dwLength (frames)
            frame_bytes,        # dwSuggestedBufferSize
            0xFFFFFFFF, 0,      # dwQuality, dwSampleSize
            0, 0, w, h,         # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    strl = b"LIST" + struct.pack(
        "<I", 4 + len(chunk(b"strh", strh)) + len(chunk(b"strf", strf))
    ) + b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl_body = b"hdrl" + chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi" + b"".join(chunk(b"00db", r) for r in rasters)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _decode_avi(payload: bytes) -> dict:
    """Dependency-free uncompressed-AVI decode — the byte-level twin
    of :func:`decode_bmp` at container scope. Walks the RIFF tree:
    hdrl's strh ('vids' stream: dwScale/dwRate) and strf
    (BITMAPINFOHEADER: dims, bit depth, BI_RGB check), then every
    '..db' movi chunk as a raw DIB frame via :func:`_dib_frame_decode`.
    Compressed streams (strf.biCompression != 0, non-DIB handlers, or
    '..dc' frame chunks) raise NotImplementedError so
    :func:`decode_video` can fall through to the guarded PyAV path.

    Returns the :func:`_decode_video_av` dict shape. Luma contract of
    THIS path: exact integer BT.601 full-range —
    ``mean_luma_e2 = 100 * sum(299 R + 587 G + 114 B) //
    (1000 * n_pixels)`` (8-bit frames use the sample directly), which
    a SQL oracle reproduces exactly; PyAV's swscale gray is a
    limited-range approximation and is deliberately NOT used here."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI magic)")

    def walk(buf: bytes, off: int, end: int):
        """Yield (fourcc, list_type_or_None, body_start, body_end)."""
        while off + 8 <= end:
            cc = buf[off:off + 4]
            (size,) = struct.unpack_from("<I", buf, off + 4)
            body, nxt = off + 8, off + 8 + size + (size % 2)
            if body + size > end:
                raise ValueError("truncated AVI chunk")
            if cc == b"LIST":
                yield cc, buf[body:body + 4], body + 4, body + size
            else:
                yield cc, None, body, body + size
            off = nxt

    scale = rate = 0
    w = h = bpp = comp = 0
    usec_per_frame = 0
    have_vids = False
    vids_stream = -1  # strl ordinal of the first 'vids' stream; movi
    strl_idx = -1     # chunk ids are '%02d' % stream, so only chunks
    frames = []       # with that prefix are video frames
    for cc, ltype, b0, b1 in walk(payload, 12, len(payload)):
        if cc == b"LIST" and ltype == b"hdrl":
            for cc2, ltype2, c0, c1 in walk(payload, b0, b1):
                if cc2 == b"avih":
                    usec_per_frame = struct.unpack_from("<I", payload, c0)[0]
                elif cc2 == b"LIST" and ltype2 == b"strl":
                    strl_idx += 1
                    fcc_type = fcc_handler = b""
                    s_scale = s_rate = 0
                    for cc3, _, d0, d1 in walk(payload, c0, c1):
                        if cc3 == b"strh":
                            fcc_type = payload[d0:d0 + 4]
                            fcc_handler = payload[d0 + 4:d0 + 8]
                            s_scale, s_rate = struct.unpack_from(
                                "<II", payload, d0 + 20
                            )
                        elif (
                            cc3 == b"strf"
                            and fcc_type == b"vids"
                            and not have_vids  # first vids strl wins
                        ):
                            _hs, w, h, _pl, bpp, comp = struct.unpack_from(
                                "<IiiHHI", payload, d0
                            )
                            have_vids = True
                            vids_stream = strl_idx
                            scale, rate = s_scale, s_rate
                            if comp != 0 or fcc_handler not in (
                                b"DIB ", b"\x00\x00\x00\x00", b"RGB "
                            ):
                                raise NotImplementedError(
                                    "compressed AVI stream (handler "
                                    f"{fcc_handler!r}, biCompression {comp}) "
                                    "— the dependency-free path decodes "
                                    "uncompressed DIB only; codec AVIs need "
                                    "PyAV"
                                )
                            if bpp not in (8, 24):
                                raise ValueError(
                                    f"unsupported DIB bit depth {bpp}"
                                )
        elif cc == b"LIST" and ltype == b"movi":
            # frames may be interleaved inside 'rec ' sub-lists (the
            # AVI interleaving unit) — walk one level down for those
            stack = [(b0, b1)]
            while stack:
                lo, hi = stack.pop()
                for cc2, ltype2, c0, c1 in walk(payload, lo, hi):
                    if cc2 == b"LIST" and ltype2 == b"rec ":
                        stack.append((c0, c1))
                    elif (
                        vids_stream >= 0
                        and cc2[:2] != b"%02d" % vids_stream
                    ):
                        continue  # another stream's data ('01wb' audio…)
                    elif cc2[2:4] == b"dc":
                        raise NotImplementedError(
                            "compressed AVI frame chunk — needs PyAV"
                        )
                    elif cc2[2:4] == b"db":
                        frames.append((c0, c1))
            frames.sort()  # 'rec ' recursion must not reorder frames
    if not have_vids:
        raise ValueError("AVI has no video stream header")
    if not frames:
        raise ValueError("AVI movi list has no frames")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad AVI dimensions {w}x{h}")
    ch = 1 if bpp == 8 else 3
    luma_num = 0  # sum of per-pixel (299R + 587G + 114B); 1000x scale
    n_px = 0
    for c0, c1 in frames:
        arr = _dib_frame_decode(payload[c0:c1], w, h, ch).astype(np.int64)
        if ch == 3:
            luma_num += int(
                299 * arr[:, :, 0].sum()
                + 587 * arr[:, :, 1].sum()
                + 114 * arr[:, :, 2].sum()
            )
        else:
            luma_num += 1000 * int(arr.sum())
        n_px += w * h
    if rate <= 0 or scale <= 0:
        # fall back to avih timing when strh carries no rate
        if usec_per_frame <= 0:
            raise ValueError("AVI has neither strh rate nor avih timing")
        scale, rate = usec_per_frame, 1_000_000
    return {
        "n_frames": len(frames),
        "duration_ms": len(frames) * scale * 1000 // rate,
        "width": w,
        "height": h,
        "fps_e3": rate * 1000 // scale,
        "mean_luma_e2": luma_num * 100 // (1000 * n_px),
    }


def decode_video(payload: bytes) -> dict:
    """Magic-byte dispatch for video: uncompressed DIB AVIs decode FOR
    REAL here (:func:`_decode_avi` — stdlib struct + numpy, the same
    dependency class as BMP/netpbm/WAV); codec containers (MP4/MOV,
    Matroska/WebM, compressed AVI) decode through PyAV WHEN the
    container ships it and raise an explicit NotImplementedError
    otherwise — exactly the :func:`decode_image` guard pattern.
    Anything without a video magic is rejected as not-a-video (a WAV
    or image payload reaching here is a caller bug worth a precise
    diagnosis)."""
    if not is_video_container(payload):
        raise ValueError(
            "payload has no MP4/MOV, Matroska/WebM, or AVI magic — "
            "not a video container (images: decode_image; WAV audio: "
            "decode_wav)"
        )
    if payload[:4] == b"RIFF":
        try:
            return _decode_avi(payload)
        except NotImplementedError:
            if not VIDEO_DECODERS_AVAILABLE:
                raise
            # compressed AVI with PyAV present: fall through
    if VIDEO_DECODERS_AVAILABLE:
        return _decode_video_av(payload)
    raise NotImplementedError(
        "MP4/MKV/WebM decode (and compressed AVI) needs PyAV (av), "
        "which this container does not ship; uncompressed DIB AVIs "
        "decode without it, and the frame-sampling plumbing "
        "(sample_frames) runs on opaque bytes regardless"
    )


def _video_stats_fn(media_col: str = "media"):
    """Kernel builder for :func:`video_stats` (see
    :func:`_image_stats_fn` for why these are module-level)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in VIDEO_STATS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf[media_col]):
                meta = decode_video(bytes(blob))
                rows.append((int(did),) + tuple(meta[c] for c in cols[1:]))
            yield pd.DataFrame(rows, columns=cols)

    return _stats


def video_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Video statistics over mapInPandas — same Arrow-batched,
    partition-preserving shape as :func:`image_stats`. Decodes each
    payload via :func:`decode_video`; in containers without PyAV the
    first row raises the loud NotImplementedError (pinned in tests)
    rather than fabricating stats."""
    return df.mapInPandas(_video_stats_fn(media_col), VIDEO_STATS_SCHEMA)


_MEDIA_OUT_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("media", BinaryType())]
)


def _bmp_make_fn(text_col: str = "text"):
    """Kernel builder for :func:`as_bmp_column` (see
    :func:`_image_stats_fn` for why these are module-level)."""
    import numpy as np

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

    return _make


def as_bmp_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture a REAL 24-bit BMP payload per document (the
    container has no image corpora): dimensions and the three constant
    channel values derive from the utf-8 byte length n —
    w=(n%31)+1, h=(n//31%17)+1, (r,g,b)=((13n)%251,(7n)%251,n%251).
    Every container feature is exercised (row padding, bottom-up
    order, BGR storage) while the decoded statistics stay a closed-
    form function of n that the SQL oracle reproduces exactly."""
    return df.select("doc_id", text_col).mapInPandas(
        _bmp_make_fn(text_col), _MEDIA_OUT_SCHEMA
    )


def bmp_image_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fused as_bmp_column >> image_stats (r13): the two kernels
    compose generator-to-generator inside ONE mapInPandas, so the
    manufactured media bytes never cross the Python/JVM boundary —
    pre-r13 the chained stages shipped every payload Python -> JVM ->
    Python between encode and decode (guide §4.1: control what
    crosses). Identical row-level math; both component operators stay
    public and separately tested."""
    make, stats = _bmp_make_fn(text_col), _image_stats_fn("media")
    return df.select("doc_id", text_col).mapInPandas(
        lambda it: stats(make(it)), IMAGE_STATS_SCHEMA
    )


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


def _wav_make_fn(text_col: str = "text"):
    """Kernel builder for :func:`as_wav_column` (see
    :func:`_image_stats_fn` for why these are module-level)."""
    import io
    import wave

    import numpy as np

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

    return _make


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
    return df.select("doc_id", text_col).mapInPandas(
        _wav_make_fn(text_col), _MEDIA_OUT_SCHEMA
    )


def wav_audio_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fused as_wav_column >> audio_features (r13): one mapInPandas,
    WAV bytes never cross the Python/JVM boundary (see
    :func:`bmp_image_stats`)."""
    make, feats = _wav_make_fn(text_col), _audio_features_fn("media")
    return df.select("doc_id", text_col).mapInPandas(
        lambda it: feats(make(it)), AUDIO_FEATURES_SCHEMA
    )


def _avi_make_fn(text_col: str = "text"):
    """Kernel builder for :func:`as_avi_column` (see
    :func:`_image_stats_fn` for why these are module-level)."""
    import numpy as np

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                n = len(str(t).encode("utf-8"))
                w, h = (n % 19) + 1, ((n // 19) % 13) + 1
                frames = []
                for f in range((n % 7) + 2):
                    px = np.empty((h, w, 3), dtype="u1")
                    px[:, :, 0] = (13 * n + 11 * f) % 251
                    px[:, :, 1] = (7 * n + 5 * f) % 251
                    px[:, :, 2] = (n + 3 * f) % 251
                    frames.append(px)
                payloads.append(encode_avi(frames, rate=10, scale=1))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "media": payloads}
            )

    return _make


def as_avi_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture a REAL uncompressed-AVI payload per document (the
    container has no video corpora) — the video leg of the
    as_bmp_column / as_wav_column triad. Dimensions, frame count and
    the per-frame constant RGB derive from the utf-8 byte length n:
    w=(n%19)+1, h=((n//19)%13)+1, F=(n%7)+2 frames at 10 fps, frame f
    painted (r,g,b)=((13n+11f)%251, (7n+5f)%251, (n+3f)%251). Every
    container feature is exercised for real (RIFF tree, stream
    headers, per-frame DIB rasters with row padding, bottom-up BGR),
    while the decoded statistics stay a closed-form function of n
    that the SQL oracle reproduces exactly — the frame-varying colors
    make the multi-frame luma accumulation actually bite."""
    return df.select("doc_id", text_col).mapInPandas(
        _avi_make_fn(text_col), _MEDIA_OUT_SCHEMA
    )


def avi_video_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fused as_avi_column >> video_stats (r13): one mapInPandas, AVI
    bytes never cross the Python/JVM boundary (see
    :func:`bmp_image_stats`)."""
    make, stats = _avi_make_fn(text_col), _video_stats_fn("media")
    return df.select("doc_id", text_col).mapInPandas(
        lambda it: stats(make(it)), VIDEO_STATS_SCHEMA
    )


def oracle_avi_stats() -> str:
    """DuckDB twin of as_avi_column >> video_stats: frame f's pixels
    are one constant RGB, so the per-frame luma sum is
    w*h*(299r+587g+114b) and the pixel count cancels exactly in the
    floor — mean_luma_e2 = 100 * SUM_f(L_f) // (1000 * F)."""
    return """WITH m AS (
  SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
  FROM documents
), lu AS (
  SELECT m.doc_id, MAX(m.n) AS n, MAX((m.n % 7) + 2) AS nf,
    SUM(299 * ((13 * m.n + 11 * t.f) % 251)
      + 587 * ((7 * m.n + 5 * t.f) % 251)
      + 114 * ((m.n + 3 * t.f) % 251)) AS lsum
  FROM m, range(8) t(f)  -- F = (n%7)+2 <= 8; DuckDB range() cannot
  WHERE t.f < (m.n % 7) + 2  -- take a lateral column parameter
  GROUP BY m.doc_id
)
SELECT doc_id,
  CAST(nf AS BIGINT) AS n_frames,
  CAST(nf * 100 AS BIGINT) AS duration_ms,
  CAST((n % 19) + 1 AS INTEGER) AS width,
  CAST(((n // 19) % 13) + 1 AS INTEGER) AS height,
  CAST(10000 AS BIGINT) AS fps_e3,
  CAST(lsum * 100 // (1000 * nf) AS BIGINT) AS mean_luma_e2
FROM lu"""


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
