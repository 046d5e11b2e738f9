"""Tripwire: pin the physical schemas of the driver-generated testdata.

The driver regenerates /root/testdata between rounds and physical
types HAVE drifted (events.ts went TIMESTAMP(NANOS) -> TIMESTAMP(MICROS)
between rounds 2 and 3, silently erroring 17 catalog queries and 49
tests with a cryptic DATATYPE_MISMATCH). This test turns the next
drift into one precise failure naming the table/column/type that
moved, so the fix starts at the cause instead of the symptoms.

Columns the code is deliberately dtype-adaptive for (events.ts — see
plans/hubview._enq_us) are asserted against the SET of encodings the
adapter handles, not a single type.
"""

import pyarrow.parquet as pq
import pytest

from conftest import SF_DIR

# expected physical types per table; a set means "any of these is fine"
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64", "c_name": "string", "c_nationkey": "int32",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64", "s_name": "string", "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int32", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64", "o_custkey": "int64", "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": {"timestamp[us]", "timestamp[ns]", "timestamp[ms]"},
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64", "l_partkey": "int64", "l_suppkey": "int64",
        "l_linenumber": "int32", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double", "l_tax": "double",
        "l_returnflag": "string", "l_linestatus": "string",
        "l_shipdate": {"timestamp[us]", "timestamp[ns]", "timestamp[ms]"},
    },
    "events": {
        "event_id": "int64",
        # hub view adapts to all of these (tests/test_hub_and_batch.py
        # pins row-level agreement across them)
        "ts": {"timestamp[us]", "timestamp[ns]", "timestamp[ms]", "int64"},
        "user_id": "int64", "event_type": "string", "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64", "text": "string", "lang": "string",
        "source": "string", "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64", "embedding": "list<element: float>", "label": "int32",
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_testdata_physical_schema(table):
    schema = pq.read_schema(f"{SF_DIR}/{table}.parquet")
    got = {f.name: str(f.type) for f in schema}
    exp = EXPECTED[table]
    assert set(got) == set(exp), (
        f"{table}: column set drifted — got {sorted(got)}, expected {sorted(exp)}"
    )
    for col, want in exp.items():
        ok = got[col] in want if isinstance(want, set) else got[col] == want
        assert ok, (
            f"TESTDATA DRIFT: {table}.{col} is now physical type {got[col]!r} "
            f"(expected {want!r}). The driver regenerated the parquet with a "
            f"new encoding — check every query reading this column (the "
            f"events.ts precedent: plans/hubview._enq_us)."
        )
