"""Mergeable histogram-quantile rollup
(operators/relational.py::binned_quantile_rollup) — round-6 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL a future r54_histogram_quantiles registration will carry,
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
from .oracle import compare

QS = [0.5, 0.9, 0.99]
LO, HI, BINS = 0.0, 1000.0, 200  # events.value spans [0, ~560]

# Future r54 oracle, verbatim. Dialect pins: every float literal is
# ::DOUBLE (bare 5.0 is DECIMAL in DuckDB and would change the
# arithmetic the hash compares); the est expression is written in
# the operator's exact evaluation order so both engines stream
# identical float64 ops; window-sum HUGEINTs cast to BIGINT on
# output.
R54_ORACLE = """
WITH b AS (SELECT event_type,
                  least(greatest(CAST(floor((value - 0.0::DOUBLE)
                                            / 5.0::DOUBLE) AS BIGINT),
                                 0), 199) AS bin,
                  count(*) AS cnt
           FROM events WHERE value IS NOT NULL
           GROUP BY 1, 2),
c AS (SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type
                            ORDER BY bin) AS cum,
             coalesce(sum(cnt) OVER (PARTITION BY event_type
                                     ORDER BY bin
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING),
                      0) AS cum_below,
             sum(cnt) OVER (PARTITION BY event_type) AS n_rows
      FROM b),
qs AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q)
SELECT c.event_type, qs.q AS q,
       CAST(c.n_rows AS BIGINT) AS n_rows,
       round(0.0::DOUBLE + 5.0::DOUBLE *
             (c.bin + (qs.q * c.n_rows - c.cum_below) / c.cnt),
             4) AS est
FROM c CROSS JOIN qs
WHERE c.cum >= qs.q * c.n_rows AND c.cum_below < qs.q * c.n_rows
"""


def _ev(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _r54(spark, sf_dir):
    return binned_quantile_rollup(
        _ev(spark, sf_dir), ["event_type"], "value", QS, LO, HI, BINS
    )


def test_histogram_quantiles_match_duckdb_oracle(spark, duck):
    compare(_r54(spark, SF_ORACLE), duck, R54_ORACLE)


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
