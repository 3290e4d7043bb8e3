"""Malformed-input CSV audit (sources/io.py::read_csv_permissive) —
round-8 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL the future s18_corrupt_csv_audit registration
will carry (orders slice round-tripped through CSV with three planted
malformed lines; the audit counts and integer checksum recompute from
the originating fixture plus the planted constants), plus per-shape
corruption pins (type failure, column-count drift, quarantined raw
line)."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.sources.io import (
    load_table,
    read_csv_permissive,
)

from .conftest import SF_ORACLE
from .oracle import compare

_SCHEMA = "o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE"
_BAD = [
    "garbage,notanumber,xx",        # type failure
    "too,many,columns,here,1",      # column-count drift
    "-,-,-",                        # placeholder junk
]

# Future s18 oracle, verbatim: the good-row population is the
# originating fixture slice (keys % 7 == 0), the corrupt count is the
# planted constant; the checksum is an exact-integer key sum so CSV
# double round-tripping never enters the hash.
S18_ORACLE = """
SELECT CAST(count(*) + 3 AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_good,
       CAST(3 AS BIGINT) AS n_corrupt,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
FROM orders WHERE o_orderkey % 7 = 0
"""


def _s18(spark, sf_dir, path):
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 7 == 0
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")
    orders.write.mode("overwrite").csv(path)
    spark.createDataFrame(
        [(b,) for b in _BAD], "value string"
    ).coalesce(1).write.mode("append").text(path)
    parsed = read_csv_permissive(spark, path, _SCHEMA)
    bad = F.col("_corrupt_record").isNotNull()
    return parsed.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum((~bad).cast("int")).cast("long").alias("n_good"),
        F.sum(bad.cast("int")).cast("long").alias("n_corrupt"),
        F.sum(F.when(~bad, F.col("o_orderkey")))
        .cast("long")
        .alias("key_checksum"),
    )


def test_corrupt_csv_matches_duckdb_oracle(spark, duck, tmp_path):
    compare(_s18(spark, SF_ORACLE, str(tmp_path / "csv")), duck, S18_ORACLE)


def test_corrupt_csv_per_shape_pins(spark, tmp_path):
    """Each malformed shape lands in quarantine with its RAW line;
    an under-full row surfaces its parsable prefix AND the raw line
    (caller picks strictness); clean rows carry NULL quarantine."""
    path = str(tmp_path / "csv")
    lines = ["1,HIGH,2.5", "x,notanumber,y", "7,LOW", "2,MED,3.0,extra"]
    spark.createDataFrame([(l,) for l in lines], "value string").coalesce(
        1
    ).write.mode("overwrite").text(path)
    got = {
        r["_corrupt_record"]: (r["o_orderkey"], r["o_orderpriority"])
        for r in read_csv_permissive(spark, path, _SCHEMA).collect()
    }
    assert got[None] == (1, "HIGH")
    # PERMISSIVE keeps every PARSABLE field (the string column
    # survives; the failed numerics are NULL) and quarantines the line
    assert got["x,notanumber,y"] == (None, "notanumber")
    assert got["7,LOW"] == (7, "LOW")                  # short row: prefix + raw
    assert got["2,MED,3.0,extra"] == (2, "MED")        # long row: quarantined


def test_corrupt_csv_no_cache_no_restriction(spark, tmp_path):
    """Filtering/aggregating ON the corrupt column works directly —
    the reader-internal-column restriction (which demands a full
    cache) does not apply to the from_csv form."""
    path = str(tmp_path / "csv")
    spark.createDataFrame(
        [("1,A,1.0",), ("bad,row,x",)], "value string"
    ).coalesce(1).write.mode("overwrite").text(path)
    out = (
        read_csv_permissive(spark, path, _SCHEMA)
        .filter(F.col("_corrupt_record").isNotNull())
        .count()
    )
    assert out == 1
