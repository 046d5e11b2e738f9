"""Pure-Python tests for the bench tooling under scripts/ — no Spark.

These pin the measurement-honesty contracts the round-9/10 verdicts
asked for: the ratios-section classifier must not mask a streaming
scale regression behind the backlog-proportional shortcut, and the
replica builder must be deterministic enough that two independently
built replicas carry the same layout fingerprint.
"""

import importlib.util
import pathlib

SCRIPTS = pathlib.Path(__file__).resolve().parent.parent / "scripts"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, SCRIPTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_classify_streaming_superlinear_not_masked():
    """ADVICE r9: a stream_ entry whose ratio exceeds the data factor
    beyond replay slack must surface as superlinear, not be shortcut
    to backlog-proportional."""
    br = _load("bench_ratio")
    # replaying a 10x backlog at ~10x cost is the expected shape
    assert br.classify("stream_scd2", 9.0, 10.0) == "backlog-proportional"
    assert br.classify("stream_scd2", 14.0, 10.0) == "backlog-proportional"
    # 3x beyond the data factor is a real regression
    assert br.classify("stream_scd2", 30.0, 10.0) == "superlinear"
    # unknown factor: can't adjudicate, keep the honest default
    assert br.classify("stream_scd2", 30.0, None) == "backlog-proportional"
    # non-stream behavior unchanged
    assert br.classify("hub_take", 30.0, 10.0) == "superlinear"
    assert br.classify("hub_asof_join", 9.0, 10.0) == "output-bound"
    assert br.classify("q1_pricing_summary", 2.0, 10.0) == "at-or-below-linear"


def test_replica_build_is_deterministic(spark, tmp_path):
    """Round-9 verdict item 4: two independently built replicas of the
    same (source, k) must produce the same file counts and
    byte-identical part files — proven by the stamped layout
    fingerprint, which hashes per-table sorted file sizes."""
    import json
    import os

    os.environ["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    try:
        ss = _load("scale_stepup")
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        ss.build_upsampled(spark, 2, a)
        ss.build_upsampled(spark, 2, b)
        fa = json.load(open(f"{a}/_layout.json"))
        fb = json.load(open(f"{b}/_layout.json"))
        assert fa["fingerprint"] == fb["fingerprint"]
        assert fa["k"] == 2
        # replicated content, not just metadata parity
        n = spark.read.parquet(f"{a}/lineitem.parquet").count()
        assert n == 2 * spark.read.parquet(
            "/root/testdata/sf0.001/lineitem.parquet"
        ).count()
        # the fingerprint must actually react to a layout change
        fb["tables"]["lineitem"]["n_files"] += 1
        import hashlib
        assert fa["fingerprint"] != hashlib.md5(
            repr(sorted(fb["tables"].items())).encode()
        ).hexdigest()[:16]
    finally:
        os.environ.pop("SPARK_GRAFT_SF_DIR", None)
