"""Mergeable histogram-quantile rollup
(operators/relational.py::binned_quantile_rollup) — promoted round 6: the oracle moved verbatim onto the r54_histogram_quantiles registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps,
plus the two claims the oracle can't make — the merge level is
lossless (daily partials → same answer as direct binning) and the
estimate error is bounded by the bin width against the EXACT
quantile."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import (
    binned_quantile_rollup,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from miningfrequentpattern_spark.queries.registry import (
    QUERIES,
    load_all_packs,
)

load_all_packs()


def _r54(spark, sf_dir):
    return QUERIES["r54_histogram_quantiles"](spark, sf_dir)

QS = [0.5, 0.9, 0.99]
LO, HI, BINS = 0.0, 1000.0, 200  # events.value spans [0, ~560]


def _ev(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_daily_partial_merge_is_lossless(spark):
    """The whole point of the sketch: binning per (group, day) and
    merging MUST equal direct binning — bin counts are associative.
    At scale the daily level is the stored artifact; this certifies
    the rollup loses nothing."""
    ev = _ev(spark, SF_ORACLE).withColumn(
        "day", F.col("ts").cast("date")
    )
    direct = binned_quantile_rollup(
        ev, ["event_type"], "value", QS, LO, HI, BINS
    )
    via_daily = binned_quantile_rollup(
        ev, ["event_type"], "value", QS, LO, HI, BINS,
        partial_grain=["day"],
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, via_daily.collect())
    )


def test_estimate_error_bounded_by_bin_width(spark, duck):
    """|est − exact quantile| ≤ one bin width, for every group and
    q. (The interpolation convention differs from quantile_cont's
    (n−1)-rank form by < 1 rank, which stays inside one bin; the
    bound below is the operator's documented contract.)"""
    w = (HI - LO) / BINS
    est = {
        (r["event_type"], r["q"]): r["est"]
        for r in _r54(spark, SF_ORACLE).collect()
    }
    exact = duck.execute(
        f"""
        SELECT event_type,
               quantile_cont(value, 0.5) AS "0.5",
               quantile_cont(value, 0.9) AS "0.9",
               quantile_cont(value, 0.99) AS "0.99"
        FROM read_parquet('{SF_ORACLE}/events.parquet')
        GROUP BY 1
        """
    ).df()
    n_checked = 0
    for _, row in exact.iterrows():
        for q in QS:
            got = est[(row["event_type"], q)]
            assert abs(got - row[str(q)]) <= w, (
                row["event_type"], q, got, row[str(q)])
            n_checked += 1
    assert n_checked >= 15


def test_out_of_range_values_clamp(spark):
    """Values beyond [lo, hi] land in the edge bins instead of
    crashing or vanishing — the documented clamp."""
    df = spark.createDataFrame(
        [("a", -50.0), ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 99.0)],
        "g string, v double",
    )
    out = binned_quantile_rollup(
        df, ["g"], "v", [0.5], 0.0, 10.0, 10
    ).collect()
    assert len(out) == 1 and out[0]["n_rows"] == 5
    # Clamped −50 fills bin 0, so cum = [1,2,3,…]; target 0.5·5 = 2.5
    # crosses in bin 2 → est = 2 + (2.5−2)/1 = 2.5. Without the clamp
    # the −50 row would vanish and the median would shift.
    assert out[0]["est"] == 2.5


def test_nan_values_are_excluded_like_nulls(spark):
    """floor(NaN) casts to bin 0 in Spark, so an unguarded NaN would
    count as a phantom observation at `lo` and shift every quantile
    (review r5, confirmed by execution). NaN rows must be excluded
    exactly like NULLs."""
    df = spark.createDataFrame(
        [("a", float("nan")), ("a", 8.0), ("a", 9.0)],
        "g string, v double",
    )
    out = binned_quantile_rollup(
        df, ["g"], "v", [0.5], 0.0, 10.0, 10
    ).collect()
    assert len(out) == 1
    assert out[0]["n_rows"] == 2
    # target 0.5·2 = 1.0 fully traverses bin 8 → est = its upper
    # edge, 9.0. With the NaN counted, n_rows would be 3 and the
    # median would shift into bin 8's interior.
    assert out[0]["est"] == 9.0


def test_q_zero_is_rejected_not_silently_dropped(spark):
    """q = 0 has no crossing bin — the row would vanish from the
    output with no error (review r5). The operator must reject it."""
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    import pytest

    with pytest.raises(ValueError, match=r"\(0, 1\]"):
        binned_quantile_rollup(df, ["g"], "v", [0.0, 0.5], 0.0, 1.0, 4)


def test_binned_rollup_rejects_degenerate_grid(spark):
    """Hardening (e), r10: lo >= hi (zero/negative bin width — every
    value clamps into one bin, a silently useless sketch) and
    n_bins < 1 (division by zero at width computation) must raise
    named errors, not mis-sketch."""
    import pytest

    from miningfrequentpattern_spark.operators.relational import (
        binned_quantile_rollup,
    )

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="lo < hi"):
        binned_quantile_rollup(df, ["g"], "v", [0.5], 10.0, 10.0, 5)
    with pytest.raises(ValueError, match="lo < hi"):
        binned_quantile_rollup(df, ["g"], "v", [0.5], 10.0, 1.0, 5)
    with pytest.raises(ValueError, match="n_bins"):
        binned_quantile_rollup(df, ["g"], "v", [0.5], 0.0, 10.0, 0)
