"""Malformed-input CSV audit (sources/io.py::read_csv_permissive) — PROMOTED round 8 as s18_corrupt_csv_audit: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the per-shape corruption pins
(type failure, column-count drift, quarantined raw line) stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.sources.io import read_csv_permissive

_SCHEMA = "o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE"
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
