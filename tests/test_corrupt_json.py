"""Malformed-input JSON audit (sources/io.py::read_json_permissive) — PROMOTED round 8 as s19_corrupt_json_audit: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the per-shape pins probed against
Spark's actual from_json semantics (type mismatch keeps parsable
fields but quarantines; missing fields are NULL with NO quarantine) stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.sources.io import read_json_permissive

_SCHEMA = "o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE"
def test_corrupt_json_per_shape_pins(spark, tmp_path):
    path = str(tmp_path / "j")
    lines = [
        '{"o_orderkey": 1, "o_orderpriority": "HIGH", "o_totalprice": 2.5}',
        '{"o_orderkey": "xx", "o_orderpriority": "B", "o_totalprice": 1.0}',
        '{"o_orderkey": 3, "o_orderpriority": "C"',
        "garbage",
        '{"o_orderpriority": "D"}',
    ]
    spark.createDataFrame([(l,) for l in lines], "value string").coalesce(
        1
    ).write.mode("overwrite").text(path)
    got = {
        i: (r["o_orderkey"], r["o_orderpriority"],
            r["_corrupt_record"] is not None)
        for i, r in enumerate(
            read_json_permissive(spark, path, _SCHEMA)
            .withColumn("_line", F.monotonically_increasing_id())
            .orderBy("_line")
            .collect()
        )
    }
    assert got[0] == (1, "HIGH", False)   # clean
    assert got[1] == (None, "B", True)    # type fail: field kept, quarantined
    assert got[2] == (None, None, True)   # truncated: dead row
    assert got[3] == (None, None, True)   # bare text: dead row
    assert got[4] == (None, "D", False)   # missing fields: NO quarantine
