"""CUPED variance reduction (operators/relational.py::cuped_adjust)
— round-6 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL a future r79_cuped_user_value registration
will carry (per-user H2 metric adjusted by the H1 covariate), plus
unbiasedness / variance-reduction / no-signal hand pins."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import cuped_adjust
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r79 oracle, verbatim. theta fits over rows where BOTH
# periods exist; rows with no pre-period keep adjusted = y (a unit
# with no history must not drop out of the analysis); covar_pop /
# var_pop / avg are the r57 co-moment pins, 4dp-rounded.
R79_ORACLE = """
WITH pc AS (
  SELECT user_id,
         round(sum(CASE WHEN ts < TIMESTAMP '2024-07-01'
                        THEN value END), 4) AS pre,
         round(sum(CASE WHEN ts >= TIMESTAMP '2024-07-01'
                        THEN value END), 4) AS post
  FROM events WHERE value IS NOT NULL GROUP BY 1),
f AS (SELECT covar_pop(pre, post) AS cov, var_pop(pre) AS var,
             avg(pre) AS mx
      FROM pc WHERE pre IS NOT NULL AND post IS NOT NULL)
SELECT pc.user_id, pc.post, pc.pre,
       round(CASE WHEN f.var > 0 THEN f.cov / f.var END, 4) AS theta,
       round(CASE WHEN pc.post IS NULL THEN NULL
                  WHEN pc.pre IS NOT NULL AND f.var > 0
                  THEN pc.post - (f.cov / f.var) * (pc.pre - f.mx)
                  ELSE pc.post END, 4) AS adjusted
FROM pc CROSS JOIN f
"""


def _r79(spark, sf_dir):
    split = F.lit("2024-07-01").cast("timestamp")
    pc = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.when(F.col("ts") < split, F.col("value"))), 4
            ).alias("pre"),
            F.round(
                F.sum(F.when(F.col("ts") >= split, F.col("value"))), 4
            ).alias("post"),
        )
    )
    return cuped_adjust(pc, "post", "pre", carry=["user_id"])


def test_cuped_matches_duckdb_oracle(spark, duck):
    compare(_r79(spark, SF_ORACLE), duck, R79_ORACLE)


def test_cuped_reduces_variance_keeps_mean(spark):
    """Correlated (pre, post) pairs: the adjusted metric keeps the
    mean (unbiased by construction) while its variance drops by
    roughly the squared correlation."""
    import statistics

    rows = []
    for i in range(40):
        pre = float((i * 7) % 23)
        noise = float((i * 13) % 5) - 2.0
        rows.append((i, pre, 2.0 * pre + 10.0 + noise))
    df = spark.createDataFrame(rows, "u long, pre double, post double")
    got = cuped_adjust(df, "post", "pre", carry=["u"]).collect()
    raw = [r["post"] for r in got]
    adj = [r["adjusted"] for r in got]
    # adjusted is 4dp-rounded per row, so the mean identity holds to
    # the rounding grain, not machine epsilon
    assert abs(statistics.mean(adj) - statistics.mean(raw)) < 1e-4
    assert statistics.pvariance(adj) < 0.1 * statistics.pvariance(raw)


def test_cuped_no_covariate_signal_is_identity(spark):
    """Constant covariate: zero variance, NULL theta, adjusted == y
    — never an IEEE blow-up, never a silent drop."""
    df = spark.createDataFrame(
        [(1, 5.0, 10.0), (2, 5.0, 20.0)], "u long, pre double, post double"
    )
    got = cuped_adjust(df, "post", "pre", carry=["u"]).collect()
    assert all(r["theta"] is None for r in got)
    assert {r["adjusted"] for r in got} == {10.0, 20.0}


def test_cuped_null_covariate_rows_pass_through(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 10.0), (2, 2.0, 20.0), (3, None, 30.0), (4, 1.0, None)],
        "u long, pre double, post double",
    )
    got = {
        r["u"]: (r["adjusted"], r["theta"])
        for r in cuped_adjust(df, "post", "pre", carry=["u"]).collect()
    }
    assert got[3][0] == 30.0  # no pre-period: unadjusted, not dropped
    assert got[4][0] is None  # no metric: NULL adjusted, row kept
    assert len(got) == 4
