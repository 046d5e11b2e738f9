"""Golden physical-plan fingerprint guard (round-9 verdict item 7).

Every batch catalog entry's normalized plan skeleton — operator tree,
exchange partitionings, broadcast sides, pushed filters, read schemas
— is pinned in docs/PLAN_FINGERPRINTS.json. A lost broadcast, a new
Exchange, or a lost pushdown fails here without running any bench.

After a DELIBERATE plan change, regenerate with
    python scripts/plan_fingerprints.py --write
and review the JSON diff like code.
"""

import importlib.util
import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _tool():
    spec = importlib.util.spec_from_file_location(
        "plan_fingerprints", ROOT / "scripts" / "plan_fingerprints.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_guard_catches_a_lost_broadcast(spark):
    """Negative control (round-10 verdict item 1): the fingerprint must
    actually CHANGE when a broadcast is deliberately removed, else the
    guard guards nothing. a1_inactive_customers relies on
    auto-broadcast (no explicit hint), so disabling the threshold
    demotes its BroadcastHashJoin — the fingerprint must differ from
    golden and the golden must carry the BroadcastExchange."""
    import __spark_entry__ as entrymod

    from spark_eventhubs_spark.plans.hubview import clear_cached_plans

    pf = _tool()
    golden = json.load(open(pf.GOLDEN))["a1_inactive_customers"]
    assert any(f.startswith("BroadcastExchange") for f in golden)
    fn = entrymod.queries()["a1_inactive_customers"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    clear_cached_plans(spark, "query")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        got = pf.fingerprint_df(fn(spark, pf.SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        clear_cached_plans(spark, "query")
    assert got != golden
    assert not any(f.startswith("BroadcastExchange") for f in got)


def test_plan_fingerprints_match_golden(spark):
    pf = _tool()
    golden = json.load(open(pf.GOLDEN))
    got = pf.compute_all(spark)
    problems = []
    for name in sorted(set(golden) | set(got)):
        if name not in got:
            problems.append(f"{name}: in golden but not in catalog")
        elif name not in golden:
            problems.append(
                f"{name}: new entry — regenerate the golden file"
            )
        elif golden[name] != got[name]:
            old, new = golden[name], got[name]
            drift = [
                f"  -{a}\n  +{b}"
                for a, b in zip(old, new)
                if a != b
            ][:4]
            if len(old) != len(new):
                drift.append(f"  node count {len(old)} -> {len(new)}")
            problems.append(f"{name}:\n" + "\n".join(drift))
    assert not problems, (
        f"{len(problems)} plan fingerprint mismatches (deliberate "
        "change? run: python scripts/plan_fingerprints.py --write)\n"
        + "\n".join(problems)
    )
