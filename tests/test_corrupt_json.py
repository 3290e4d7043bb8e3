"""Malformed-input JSON audit (sources/io.py::read_json_permissive) —
round-8 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL the future s19_corrupt_json_audit registration
will carry (orders slice round-tripped through JSON-lines with three
planted malformed lines), plus per-shape pins probed against Spark's
actual from_json semantics (type mismatch keeps parsable fields but
quarantines; missing fields are NULL with NO quarantine)."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.sources.io import (
    load_table,
    read_json_permissive,
)

from .conftest import SF_ORACLE
from .oracle import compare

_SCHEMA = "o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE"
_BAD = [
    '{"o_orderkey": "notanint", "o_orderpriority": "X"}',  # type fail
    '{"o_orderkey": 1, "o_orderpriority": "X"',            # truncated
    "not json at all",                                     # bare text
]

# Future s19 oracle, verbatim — the s18 stance: good rows from the
# originating fixture, corrupt count a planted constant, checksum an
# exact-integer key sum (JSON double round-trips never enter it).
S19_ORACLE = """
SELECT CAST(count(*) + 3 AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_good,
       CAST(3 AS BIGINT) AS n_corrupt,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
FROM orders WHERE o_orderkey % 11 = 0
"""


def _s19(spark, sf_dir, path):
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 11 == 0
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")
    orders.write.mode("overwrite").json(path)
    spark.createDataFrame(
        [(b,) for b in _BAD], "value string"
    ).coalesce(1).write.mode("append").text(path)
    parsed = read_json_permissive(spark, path, _SCHEMA)
    bad = F.col("_corrupt_record").isNotNull()
    return parsed.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum((~bad).cast("int")).cast("long").alias("n_good"),
        F.sum(bad.cast("int")).cast("long").alias("n_corrupt"),
        F.sum(F.when(~bad, F.col("o_orderkey")))
        .cast("long")
        .alias("key_checksum"),
    )


def test_corrupt_json_matches_duckdb_oracle(spark, duck, tmp_path):
    compare(_s19(spark, SF_ORACLE, str(tmp_path / "j")), duck, S19_ORACLE)


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
