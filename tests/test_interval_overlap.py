"""Interval×interval overlap join
(operators/timeseries.py::interval_overlap_join) — promoted round 6: the oracle moved verbatim onto the r80_concurrent_activity registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps
(per-user click-activity spans overlapped against view-activity
spans — "when was the user doing both"), plus half-open touching
pins and the bucketed ≡ naive equivalence the claim-cell dedup
must uphold."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    interval_merge,
    interval_overlap_join,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def _spans(spark, sf_dir, tp):
    iv = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & (F.col("event_type") == tp))
        .select(
            "user_id",
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
        )
    )
    return interval_merge(iv, ["user_id"], "s", "e")


def _r80(spark, sf_dir, bucket="6 hours"):
    return interval_overlap_join(
        _spans(spark, sf_dir, "click"),
        _spans(spark, sf_dir, "view"),
        ["user_id"],
        "span_start",
        "span_end",
        bucket=bucket,
    )


def test_interval_overlap_bucketed_equals_naive(spark):
    """The claim-cell dedup must make the bucketed plan EXACTLY the
    naive plan's result — on the real fixture workload, for a bucket
    much smaller than many spans (so multi-bucket fan-out and
    multi-shared-bucket pairs genuinely occur)."""
    naive = {
        tuple(r)
        for r in _r80(spark, SF_ORACLE, bucket=None).collect()
    }
    bucketed = {
        tuple(r)
        for r in _r80(spark, SF_ORACLE, bucket="10 minutes").collect()
    }
    assert naive == bucketed and len(naive) > 0


def test_interval_overlap_touching_is_not_overlap(spark):
    a = spark.createDataFrame(
        [("u", 0.0, 10.0)], "k string, span_start double, span_end double"
    )
    b = spark.createDataFrame(
        [("u", 10.0, 20.0), ("u", 9.0, 12.0), ("u", 20.0, 30.0)],
        "k string, span_start double, span_end double",
    )
    got = interval_overlap_join(a, b, ["k"]).collect()
    # only [9, 12) overlaps [0, 10); the touching [10, 20) does not
    assert len(got) == 1
    r = got[0]
    assert (r["overlap_start"], r["overlap_end"]) == (9.0, 10.0)


def test_interval_overlap_claim_cell_no_duplicates(spark):
    """A pair sharing MANY buckets must appear exactly once — the
    whole point of claiming by the overlap's first instant."""
    a = spark.createDataFrame(
        [("u", 0.0, 100000.0)], "k string, span_start double, span_end double"
    )
    b = spark.createDataFrame(
        [("u", 50.0, 99999.0)], "k string, span_start double, span_end double"
    )
    got = interval_overlap_join(
        a, b, ["k"], bucket="1 minute"
    ).collect()
    assert len(got) == 1
    assert got[0]["overlap_start"] == 50.0


def test_interval_overlap_drops_null_and_empty_intervals(spark):
    a = spark.createDataFrame(
        [("u", None, 10.0), ("u", 5.0, 5.0), ("u", 1.0, 4.0)],
        "k string, span_start double, span_end double",
    )
    b = spark.createDataFrame(
        [("u", 0.0, 100.0)], "k string, span_start double, span_end double"
    )
    got = interval_overlap_join(a, b, ["k"]).collect()
    assert len(got) == 1 and got[0]["a_start"] == 1.0
