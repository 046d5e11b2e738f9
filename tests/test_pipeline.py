"""Composed corpus-cleaning pipeline: invariants that must hold by
construction, independent of the oracle hash check."""

from pyspark.sql import functions as F

from spark_eventhubs_spark.operators import pipeline as P
from spark_eventhubs_spark.operators import dedup as D

from conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_clean_corpus_counts_bounded(spark):
    docs = _docs(spark)
    stats = P.clean_corpus(docs).collect()
    total_kept = sum(r["n_docs"] for r in stats)
    assert 0 < total_kept <= docs.count()
    # gate + dedup must actually drop something on the synthetic corpus
    # (it contains exact duplicates by construction)
    n_dupes = docs.count() - docs.select(
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    ).distinct().count()
    assert n_dupes == 0 or total_kept < docs.count()
    # every language bucket is a known label
    assert {r["lang_guess"] for r in stats} <= {"en", "en-ish"}


def test_clean_corpus_removes_near_dup_partners(spark):
    docs = _docs(spark)
    pairs = D.near_dup_pairs(docs).collect()
    if not pairs:
        return
    # survivors never include a doc_b of a verified pair
    dropped = {r["doc_b"] for r in pairs}
    # recompute the pre-stats survivor frame by re-running the pipeline
    # stages up to the anti join (white-box, same params)
    stats = P.clean_corpus(docs)
    # stats are aggregated; assert instead that token totals shrink when
    # the near-dup partners are force-kept (i.e. removal did something)
    kept_tokens = sum(r["total_tokens"] for r in stats.collect())
    no_removal = P.clean_corpus(docs, neardup_threshold_bp=10001)  # impossible bp
    kept_tokens_no_removal = sum(r["total_tokens"] for r in no_removal.collect())
    assert kept_tokens <= kept_tokens_no_removal
    assert dropped  # sanity: the synthetic corpus has near-dups


def test_near_dup_pairs_materialize_false_is_lazy_and_identical(spark):
    """materialize=False must build the plan without running any Spark
    job (explain-only callers) and return the same rows as the default
    eager-checkpoint path."""
    docs = _docs(spark)
    docs.count()  # settle any read-side jobs first
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup())
    lazy = D.near_dup_pairs(docs, materialize=False)
    assert set(tracker.getJobIdsForGroup()) == before, "construction ran a job"
    eager = D.near_dup_pairs(docs)
    key = lambda r: (r["doc_a"], r["doc_b"], r["jaccard_bp"])
    assert sorted(map(key, lazy.collect())) == sorted(map(key, eager.collect()))


def test_clean_corpus_single_lazy_plan_no_cross_join(spark):
    import io
    from contextlib import redirect_stdout

    plan_df = P.clean_corpus(_docs(spark))
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("simple")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """Docs sharing a run of >= k+w-1 tokens must share a fingerprint."""
    from spark_eventhubs_spark.operators.text import (
        WINNOW_K, WINNOW_W, winnowing_fingerprints)

    shared = " ".join(f"tok{i}" for i in range(WINNOW_K + WINNOW_W - 1))
    df = spark.createDataFrame(
        [(1, f"alpha beta {shared} gamma"),
         (2, f"{shared} delta epsilon zeta"),
         (3, "totally different words only here")],
        "doc_id LONG, text STRING",
    )
    fps = winnowing_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2]          # shared run -> shared fp
    assert not (by_doc[1] & by_doc[3])    # disjoint text -> disjoint fps


def test_fast_hash_path_same_guarantees(spark):
    """fast=True (xxhash64) changes the hash family, not the operator
    guarantees: exact duplicates still collide on every signature and
    verified near-dup pairs still clear the Jaccard threshold."""
    from spark_eventhubs_spark.operators.dedup import (
        minhash_signatures, near_dup_pairs)

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "the quick brown fox jumps over the lazy dog again and again"),
         (3, "a completely different document about spark and parquet files"),
         (4, "the quick brown fox jumps over the lazy dog again and often")],
        "doc_id LONG, text STRING",
    )
    sig = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(16))
           for r in minhash_signatures(df, fast=True).collect()}
    assert sig[1] == sig[2]          # identical docs -> identical signature
    assert sig[1] != sig[3]
    pairs = near_dup_pairs(df, fast=True).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} >= {(1, 2)}
    assert all(r["jaccard_bp"] >= 7000 for r in pairs)
    assert all({r["doc_a"], r["doc_b"]} != {1, 3} for r in pairs)


def test_resize_stub_passthrough_and_universal_hash(spark):
    """The documented multimodal resize stub keeps bytes intact and
    records the op; the universal-hash public primitive matches its
    oracle-side affine definition."""
    from spark_eventhubs_spark.functions.hashing import (
        MINHASH_PRIME, md5_hash64_py, minhash_params, universal_hash)
    from spark_eventhubs_spark.operators.multimodal import as_media_column, resize_stub

    docs = spark.createDataFrame([(1, "some text")], "doc_id LONG, text STRING")
    out = resize_stub(as_media_column(docs)).collect()[0]
    assert bytes(out["media"]) == b"some text"
    assert out["resize_op"] == "stub:keep-original"

    row = spark.range(1).select(
        universal_hash(F.lit("abc"), 3).alias("h")).collect()[0]
    a, b = minhash_params(3)
    assert row["h"] == ((md5_hash64_py("abc") % MINHASH_PRIME) * a + b) % MINHASH_PRIME


def test_near_dup_components_chain_clusters_transitively(spark):
    """A~B~C chains must land in ONE component even when A and C are
    not themselves a near-dup pair — the under-deletion case pairwise
    dropping misses."""
    from spark_eventhubs_spark.operators.dedup import (
        near_dup_components,
        near_dup_pairs,
    )

    # 40-token docs, one token changed per hop: A~B and B~C verify at
    # jaccard 9487 bp, A~C only at 9000 bp — threshold 9200 keeps the
    # chain INDIRECT (md5 hashes are deterministic, so these values
    # are stable)
    base = " ".join(f"tok{i}" for i in range(40))
    mid = base.replace("tok0 ", "CHANGED0 ")
    far = mid.replace("tok39", "CHANGED39")
    df = spark.createDataFrame(
        [(10, base), (11, mid), (12, far),
         (99, "entirely different content with no overlap whatsoever here")],
        "doc_id LONG, text STRING",
    )
    pair_keys = {(r["doc_a"], r["doc_b"])
                 for r in near_dup_pairs(df, threshold_bp=9200).collect()}
    assert pair_keys == {(10, 11), (11, 12)}  # A~C not a direct pair
    comp = {r["doc_id"]: r["component_id"]
            for r in near_dup_components(df, threshold_bp=9200).collect()}
    assert comp == {10: 10, 11: 10, 12: 10}
    assert 99 not in comp


def test_real_wav_decode_features(spark):
    """audio_features must run a REAL PCM decode: features computed by
    Spark over synthesized WAV payloads must equal independent numpy
    math on the same samples."""
    import io
    import math
    import wave

    import numpy as np

    from spark_eventhubs_spark.operators.multimodal import audio_features

    def make_wav(seed, rate=8000, nf=400, nch=1):
        rng = np.random.RandomState(seed)
        samples = (rng.randint(-3000, 3000, nf * nch)).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(samples.tobytes())
        return buf.getvalue(), samples

    payloads = {i: make_wav(i, nch=1 + i % 2) for i in range(4)}
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, (p, _) in payloads.items()],
        "doc_id long, media binary",
    )
    got = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert len(got) == 4
    for i, (_, samples) in payloads.items():
        r = got[i]
        assert r["n_channels"] == 1 + i % 2
        assert r["sample_rate"] == 8000
        assert r["n_frames"] * r["n_channels"] == len(samples)
        acc = 0.0
        for v in samples:
            acc += float(v) * float(v)
        want_rms = math.floor(math.sqrt(acc / len(samples)) * 1e6)
        assert r["rms_e6"] == want_rms
        assert r["duration_ms"] == (r["n_frames"] * 1000) // 8000


def test_real_netpbm_decode_stats_and_resize(spark):
    """image_stats must run a REAL pixel decode (P5 gray and P6 RGB,
    comment-bearing headers included), and resize_netpbm must halve
    dimensions with nearest-neighbor semantics."""
    import numpy as np

    from spark_eventhubs_spark.operators.multimodal import (
        decode_netpbm,
        image_stats,
        resize_netpbm,
    )

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (12, 10, 1)).astype("u1")
    rgb = rng.randint(0, 256, (9, 16, 3)).astype("u1")
    p5 = b"P5\n# a comment\n10 12\n255\n" + gray.tobytes()
    p6 = b"P6\n16 9\n255\n" + rgb.tobytes()

    df = spark.createDataFrame(
        [(0, bytearray(p5)), (1, bytearray(p6))], "doc_id long, media binary"
    )
    got = {r["doc_id"]: r for r in image_stats(df).collect()}
    for did, img, (w, h, ch) in [(0, gray, (10, 12, 1)), (1, rgb, (16, 9, 3))]:
        r = got[did]
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        flat = img.reshape(-1).astype("int64")
        assert r["mean_e2"] == int(flat.sum()) * 100 // flat.size
        assert (r["min_px"], r["max_px"]) == (int(flat.min()), int(flat.max()))

    small = decode_netpbm(resize_netpbm(p6, factor=2))
    assert small.shape == (5, 8, 3)
    assert (small == rgb[::2, ::2, :]).all()


def test_bmp_decode_is_real(spark):
    """decode_bmp must parse the actual container: an asymmetric 2x3
    RGB image survives encode->decode bit-for-bit (bottom-up row
    flip + BGR->RGB + row padding all exercised), top-down negative-
    height variants parse too, and malformed payloads raise."""
    import struct

    import numpy as np
    import pytest as _pytest

    from spark_eventhubs_spark.operators.multimodal import decode_bmp, encode_bmp

    img = np.arange(2 * 3 * 3, dtype="u1").reshape(2, 3, 3) * 11
    payload = encode_bmp(img)
    assert payload[:2] == b"BM"
    got = decode_bmp(payload)
    assert got.shape == (2, 3, 3)
    assert (got == img).all()

    # top-down: flip sign of height, reorder raster rows accordingly
    pixel_off = 54
    w, h = 3, 2
    row = (w * 3 + 3) & ~3
    raster = payload[pixel_off:]
    td_raster = b"".join(
        raster[y * row : (y + 1) * row] for y in range(h - 1, -1, -1)
    )
    td = bytearray(payload[:pixel_off] + td_raster)
    struct.pack_into("<i", td, 22, -h)
    assert (decode_bmp(bytes(td)) == img).all()

    with _pytest.raises(ValueError):
        decode_bmp(b"BM" + payload[2:40])  # truncated header
    with _pytest.raises(ValueError):
        decode_bmp(b"XX" + payload[2:])  # wrong magic
    bad = bytearray(payload)
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8 compression
    with _pytest.raises(ValueError):
        decode_bmp(bytes(bad))


def test_image_stats_dispatches_mixed_formats(spark):
    """One media column holding BOTH netpbm and BMP payloads: the
    magic-byte dispatch decodes each row with the right parser."""
    import numpy as np

    from spark_eventhubs_spark.operators.multimodal import encode_bmp, image_stats

    gray = b"P5\n4 2\n255\n" + bytes(range(8))
    rgb = encode_bmp(np.full((2, 2, 3), 9, dtype="u1"))
    df = spark.createDataFrame(
        [(1, bytearray(gray)), (2, bytearray(rgb))], "doc_id long, media binary"
    )
    got = {r["doc_id"]: r for r in image_stats(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (4, 2, 1)
    assert got[1]["mean_e2"] == sum(range(8)) * 100 // 8
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (2, 2, 3)
    assert got[2]["mean_e2"] == 900 and got[2]["min_px"] == 9 and got[2]["max_px"] == 9


def test_wav_container_round_trip():
    """as_wav_column's payloads are genuine RIFF/WAV: the stdlib-based
    decoder recovers exactly the square wave that was written."""
    import io
    import wave

    import numpy as np

    from spark_eventhubs_spark.operators.multimodal import decode_wav

    amp, nf = 3 * 256, 14
    samples = np.empty(nf, dtype="<i2")
    samples[0::2] = amp
    samples[1::2] = -amp
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    nch, rate, n, got = decode_wav(buf.getvalue())
    assert (nch, rate, n) == (1, 8000, nf)
    assert (got == samples).all()
    # RMS of the square wave is exactly the amplitude
    acc = 0.0
    for v in (float(x) * float(x) for x in got):
        acc += v
    import math

    assert math.floor(math.sqrt(acc / n) * 1e6) == amp * 1_000_000


def test_codec_decode_raises_without_pil():
    """PNG/JPEG magic bytes must fail LOUDLY when PIL is absent — the
    stub contract is explicit refusal, never fake pixels."""
    import pytest

    from spark_eventhubs_spark.operators import multimodal as M

    if M.REAL_DECODERS_AVAILABLE:
        pytest.skip("container ships PIL; covered by the PIL test")
    for magic in (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0JFIF"):
        with pytest.raises(NotImplementedError, match="PIL"):
            M.decode_image(magic + b"\x00" * 32)


def test_codec_decode_real_stats_with_pil(spark):
    """In a PIL-equipped container, image_stats serves REAL PNG pixel
    stats through the same contract as BMP/netpbm (skips here)."""
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import numpy as np
    import pandas as pd

    from spark_eventhubs_spark.operators import multimodal as M

    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    buf = io.BytesIO()
    PIL_Image.fromarray(arr, mode="RGB").save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "media": [bytearray(png)]})
    )
    row = M.image_stats(df).collect()[0]
    flat = arr.reshape(-1).astype("int64")
    assert (row["width"], row["height"], row["channels"]) == (3, 2, 3)
    assert row["mean_e2"] == int(flat.sum()) * 100 // flat.size
    assert (row["min_px"], row["max_px"]) == (int(flat.min()), int(flat.max()))


def test_riff_dispatch_webp_vs_wav():
    """RIFF disambiguation (r6 ADVICE item 1): only RIFF....WEBP is an
    image; a WAV (RIFF....WAVE) reaching decode_image gets a correct
    format diagnosis pointing at decode_wav — not a PIL refusal, not a
    misleading netpbm error."""
    import pytest

    from spark_eventhubs_spark.operators import multimodal as M

    webp = b"RIFF\x24\x00\x00\x00WEBPVP8 " + b"\x00" * 32
    assert M._is_webp(webp)
    if not M.REAL_DECODERS_AVAILABLE:
        with pytest.raises(NotImplementedError, match="PIL"):
            M.decode_image(webp)
    wav = b"RIFF\x24\x00\x00\x00WAVEfmt " + b"\x00" * 32
    with pytest.raises(ValueError, match="decode_wav"):
        M.decode_image(wav)
    # a REAL WAV payload still decodes through the audio path — and
    # decode_image diagnoses it instead of claiming it for PIL
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 8)
    payload = buf.getvalue()
    n_ch, rate, n_frames, _samples = M.decode_wav(payload)
    assert (n_ch, rate, n_frames) == (1, 8000, 8)
    with pytest.raises(ValueError, match="decode_wav"):
        M.decode_image(payload)


def test_video_decode_raises_without_av_and_rejects_non_video():
    """The guarded video path (r7, narrowed r9): codec containers
    (MP4/MKV/WebM-by-EBML, compressed AVI) refuse LOUDLY without PyAV;
    an AVI that parses but carries no video stream gets a precise
    corruption diagnosis (it now goes through the REAL RIFF walker,
    not the guard); payloads without a video magic are rejected as
    not-a-video."""
    import numpy as np
    import pytest

    from spark_eventhubs_spark.operators import multimodal as M

    mp4 = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32
    mkv = b"\x1a\x45\xdf\xa3" + b"\x00" * 32
    comp_avi = bytearray(
        M.encode_avi([np.zeros((2, 2, 3), dtype=np.uint8)])
    )
    i = bytes(comp_avi).find(b"DIB ")
    comp_avi[i:i + 4] = b"cvid"  # codec AVI: real handler sniff trips
    for payload in (mp4, mkv, bytes(comp_avi)):
        assert M.is_video_container(payload)
        if M.VIDEO_DECODERS_AVAILABLE:
            continue  # covered by the PyAV test where av exists
        with pytest.raises(NotImplementedError, match="PyAV"):
            M.decode_video(payload)
    # AVI magic with no parseable stream header: corruption, not guard
    with pytest.raises(ValueError, match="no video stream"):
        M.decode_video(b"RIFF\x24\x00\x00\x00AVI " + b"\x00" * 32)
    for payload in (
        b"RIFF\x24\x00\x00\x00WAVEfmt " + b"\x00" * 32,  # audio RIFF
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 32,             # image
        b"P6 2 2 255\n" + b"\x00" * 12,                  # netpbm
    ):
        assert not M.is_video_container(payload)
        with pytest.raises(ValueError, match="not a video"):
            M.decode_video(payload)


def test_video_stats_spark_plumbing_refuses_loudly(spark):
    """video_stats' mapInPandas plumbing (schema, Arrow batching) is
    real; execution in an av-less container surfaces the explicit
    refusal — never fabricated stats."""
    import pandas as pd
    import pytest

    from spark_eventhubs_spark.operators import multimodal as M

    if M.VIDEO_DECODERS_AVAILABLE:
        pytest.skip("container ships PyAV; covered by the PyAV test")
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1],
             "media": [bytearray(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 8)]}
        )
    )
    out = M.video_stats(df)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_frames", "duration_ms", "width", "height",
        "fps_e3", "mean_luma_e2",
    ]
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException, match="PyAV"):
        out.collect()


def test_video_decode_real_stats_with_av(spark):
    """In a PyAV-equipped container, video_stats serves REAL frame
    count / duration / luma stats through the guarded path (skips
    here)."""
    import pytest

    av = pytest.importorskip("av")
    import io

    import numpy as np
    import pandas as pd

    from spark_eventhubs_spark.operators import multimodal as M

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as c:
        stream = c.add_stream("mpeg4", rate=4)
        stream.width, stream.height = 16, 16
        stream.pix_fmt = "yuv420p"
        for i in range(8):
            arr = np.full((16, 16, 3), i * 16, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for pkt in stream.encode(frame):
                c.mux(pkt)
        for pkt in stream.encode():
            c.mux(pkt)
    payload = buf.getvalue()
    meta = M.decode_video(payload)
    assert meta["n_frames"] == 8
    assert (meta["width"], meta["height"]) == (16, 16)
    assert meta["fps_e3"] == 4000
    assert meta["mean_luma_e2"] > 0
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "media": [bytearray(payload)]})
    )
    row = M.video_stats(df).collect()[0]
    assert row["doc_id"] == 7 and row["n_frames"] == 8


def test_avi_video_stats_real_decode_in_spark(spark):
    """The dependency-free AVI path runs REAL per-frame pixel math
    end-to-end through video_stats' mapInPandas — no PyAV needed: a
    3-frame container with known constant frames must report the
    closed-form stats, and the batch shape must survive mixed frame
    counts across rows."""
    import numpy as np
    import pandas as pd

    from spark_eventhubs_spark.operators import multimodal as M

    def solid(v, h, w):
        px = np.empty((h, w, 3), dtype=np.uint8)
        px[:, :, 0], px[:, :, 1], px[:, :, 2] = v
        return px

    p1 = M.encode_avi(
        [solid((10, 20, 30), 3, 5), solid((40, 50, 60), 3, 5)], rate=10
    )
    p2 = M.encode_avi([solid((0, 0, 251 % 251), 2, 2)] * 3, rate=25)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2], "media": [bytearray(p1), bytearray(p2)]}
        )
    )
    rows = {r["doc_id"]: r for r in M.video_stats(df).collect()}
    l1 = (299 * 10 + 587 * 20 + 114 * 30) + (299 * 40 + 587 * 50 + 114 * 60)
    assert rows[1].asDict() == {
        "doc_id": 1, "n_frames": 2, "duration_ms": 200, "width": 5,
        "height": 3, "fps_e3": 10000, "mean_luma_e2": l1 * 100 // 2000,
    }
    assert rows[2]["n_frames"] == 3 and rows[2]["fps_e3"] == 25000
    assert rows[2]["mean_luma_e2"] == 0 and rows[2]["duration_ms"] == 120


def test_avi_decode_error_paths():
    """Truncation, 16-bit depth, and compressed frame chunks all get
    precise diagnoses; the compressed guard is NotImplementedError so
    decode_video can fall through to PyAV where it exists."""
    import struct

    import numpy as np
    import pytest

    from spark_eventhubs_spark.operators import multimodal as M

    good = M.encode_avi([np.zeros((2, 3, 3), dtype=np.uint8)] * 2)
    with pytest.raises(ValueError, match="truncated"):
        M._decode_avi(good[:40])
    with pytest.raises(ValueError, match="not an AVI"):
        M._decode_avi(b"RIFF\x08\x00\x00\x00WAVE")
    # 16-bit DIB: unsupported depth named precisely
    bad_bpp = bytearray(good)
    i = good.find(b"strf")
    struct.pack_into("<H", bad_bpp, i + 8 + 14, 16)
    with pytest.raises(ValueError, match="bit depth 16"):
        M._decode_avi(bytes(bad_bpp))
    # compressed frame chunk id ('00dc'): guard, not corruption
    dc = bytearray(good)
    j = good.find(b"00db")
    dc[j:j + 4] = b"00dc"
    with pytest.raises(NotImplementedError, match="PyAV"):
        M._decode_avi(bytes(dc))


def test_avi_audio_stream_does_not_hijack_video_timing():
    """ADVICE r9: an AVI whose audio strl FOLLOWS the video strl must
    not overwrite the video dwScale/dwRate (fps would read 44100 fps),
    and the audio stream's '01wb'/'01db'/'01dc' movi chunks must not
    count as — or be mistaken for compressed — video frames."""
    import struct

    import numpy as np

    from spark_eventhubs_spark.operators import multimodal as M

    def chunk(cc, body):
        return cc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    w = h = 2
    frames = [
        np.full((h, w, 3), 10, np.uint8), np.full((h, w, 3), 20, np.uint8)
    ]
    rasters = [M._dib_raster(f) for f in frames]
    fb = len(rasters[0])
    avih = struct.pack(
        "<14I", 100000, fb * 10, 0, 0, len(rasters), 0, 2, fb,
        w, h, 0, 0, 0, 0,
    )

    def strh(fcc, handler, scale, rate, length):
        return fcc + handler + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0, 0, scale, rate, 0, length, fb, 0xFFFFFFFF, 0,
            0, 0, w, h,
        )

    def strl(*chunks):
        body = b"strl" + b"".join(chunks)
        return b"LIST" + struct.pack("<I", len(body)) + body

    v_strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fb, 0, 0, 0, 0)
    a_strf = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)  # PCM fmt
    v_strl = strl(
        chunk(b"strh", strh(b"vids", b"DIB ", 1, 10, len(rasters))),
        chunk(b"strf", v_strf),
    )
    a_strl = strl(
        chunk(b"strh", strh(b"auds", b"\x00" * 4, 1, 44100, 88200)),
        chunk(b"strf", a_strf),
    )
    hdrl_body = b"hdrl" + chunk(b"avih", avih) + v_strl + a_strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    for audio_data_cc in (b"01wb", b"01db", b"01dc"):
        movi_body = (
            b"movi"
            + chunk(b"00db", rasters[0])
            + chunk(audio_data_cc, b"\x00" * 64)
            + chunk(b"00db", rasters[1])
        )
        movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
        riff_body = b"AVI " + hdrl + movi
        out = M._decode_avi(
            b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
        )
        assert out["n_frames"] == 2      # audio chunks are not frames
        assert out["fps_e3"] == 10000    # video 10 fps, not 44100
        assert out["duration_ms"] == 200
    ref = M._decode_avi(M.encode_avi(frames, rate=10))
    assert out["mean_luma_e2"] == ref["mean_luma_e2"]


def test_video_container_without_video_stream_precise_diagnosis():
    """ADVICE r7: a payload with valid video-container magic but no
    video stream (audio-only MP4) must raise a ValueError naming the
    condition, not a bare IndexError from streams.video[0]."""
    import io

    import pytest

    av = pytest.importorskip("av")

    from spark_eventhubs_spark.operators import multimodal as M

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as c:
        stream = c.add_stream("aac", rate=8000)
        import numpy as np

        frame = av.AudioFrame.from_ndarray(
            np.zeros((1, 1024), dtype=np.float32), format="fltp",
            layout="mono",
        )
        frame.sample_rate = 8000
        for pkt in stream.encode(frame):
            c.mux(pkt)
        for pkt in stream.encode():
            c.mux(pkt)
    payload = buf.getvalue()
    assert M.is_video_container(payload)  # ftyp magic present
    with pytest.raises(ValueError, match="no video stream"):
        M.decode_video(payload)
