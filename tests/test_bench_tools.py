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
