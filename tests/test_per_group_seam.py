"""The partition-level per-series seam (optimization r11):
`_per_group_map_over_sorted_partitions` replaced the per-key
`groupBy().applyInPandas` under ewma / holt_linear /
holt_winters_additive. Value equivalence vs the DuckDB oracles rides
tests/test_oracle_parity.py (r52/r82/r89/r90); THIS file pins the
seam machinery itself — group buffering across Arrow batch
boundaries, NULL-key grouping, and the RAISE contracts surviving a
split — by running the same input with the Arrow batch size capped
tiny (groups straddle batches) vs huge (they never do) and requiring
identical results.
"""

import math

import pytest

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    ewma,
    holt_linear,
    holt_winters_additive,
)

BATCH_CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"


def _with_batch_cap(spark, cap, thunk):
    old = spark.conf.get(BATCH_CONF)
    spark.conf.set(BATCH_CONF, str(cap))
    try:
        return thunk()
    finally:
        spark.conf.set(BATCH_CONF, old)


def _ewma_rows(spark):
    # 4 named keys + one NULL key, 37 rows each, single partition so
    # a 7-row Arrow cap forces every group to straddle batches; values
    # vary per key so a cross-key state leak changes results.
    rows = []
    for i, k in enumerate(["a", "b", "c", "d", None]):
        rows += [(k, t, float((t * 37 + i * 101) % 97)) for t in range(37)]
    return spark.createDataFrame(
        rows, "k string, t int, x double"
    ).coalesce(1)


def test_ewma_split_groups_match_unsplit(spark):
    df = _ewma_rows(spark)

    def run():
        return sorted(
            map(tuple, ewma(df, ["k"], "t", "x", 0.3).collect()),
            key=lambda r: (str(r[0]), r[1]),
        )

    got = _with_batch_cap(spark, 7, run)
    want = _with_batch_cap(spark, 1_000_000, run)
    assert got == want and len(got) == 5 * 37


def test_ewma_null_key_is_one_series(spark):
    """groupBy semantics: all NULL keys form ONE group — the seam's
    boundary detection must not split a NULL run, and the NULL
    series' recurrence must chain across a batch boundary."""
    df = _ewma_rows(spark).filter(F.col("k").isNull())
    out = _with_batch_cap(
        spark,
        5,
        lambda: {
            r["t"]: r["ewma"]
            for r in ewma(df, ["k"], "t", "x", 0.5).collect()
        },
    )
    # hand recurrence over the NULL series (i=4 in the fixture)
    x = [float((t * 37 + 4 * 101) % 97) for t in range(37)]
    y = x[0]
    assert out[0] == y
    for t in range(1, 37):
        y = 0.5 * x[t] + 0.5 * y
        assert math.isclose(out[t], y, rel_tol=0, abs_tol=0.0), t


def test_ewma_duplicate_raise_survives_batch_split(spark):
    """The RAISE-on-tied-order contract must fire even when the tied
    pair lands in different Arrow batches: the seam buffers the whole
    group, so the duplicate check still sees both rows."""
    rows = [("a", t, 1.0) for t in range(10)] + [("a", 5, 2.0)]
    df = spark.createDataFrame(
        rows, "k string, t int, x double"
    ).coalesce(1)
    with pytest.raises(Exception, match="duplicate"):
        _with_batch_cap(
            spark,
            2,
            lambda: ewma(df, ["k"], "t", "x", 0.5).collect(),
        )


def test_holt_split_groups_match_unsplit(spark):
    rows = []
    for i, k in enumerate(["p", "q", "r"]):
        rows += [(k, t, float((t * 13 + i * 7) % 31)) for t in range(25)]
    rows.append(("single", 0, 42.0))  # the n==1 NULL-trend contract
    df = spark.createDataFrame(
        rows, "k string, t int, x double"
    ).coalesce(1)

    def run():
        return sorted(
            (r["k"], r["t"], r["level"], r["trend"])
            for r in holt_linear(
                df, ["k"], "t", "x", alpha=0.2, beta=0.3
            ).collect()
        )

    got = _with_batch_cap(spark, 4, run)
    want = _with_batch_cap(spark, 1_000_000, run)
    assert got == want and len(got) == 3 * 25 + 1
    assert ("single", 0, 42.0, None) in got


def test_holt_winters_split_groups_match_unsplit(spark):
    rows = []
    for i, k in enumerate(["u", "v"]):
        rows += [(k, t, float((t * 11 + i * 5) % 23)) for t in range(20)]
    df = spark.createDataFrame(
        rows, "k string, t int, x double"
    ).coalesce(1)

    def run():
        return sorted(
            (
                r["k"],
                r["t"],
                r["level"],
                r["trend"],
                r["seasonal"],
                r["fitted"],
            )
            for r in holt_winters_additive(
                df, ["k"], "t", "x", period=3
            ).collect()
        )

    got = _with_batch_cap(spark, 3, run)
    want = _with_batch_cap(spark, 1_000_000, run)
    assert got == want and len(got) == 2 * 20
