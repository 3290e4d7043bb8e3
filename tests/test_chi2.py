"""Chi-square independence audit
(operators/relational.py::chi2_independence) — round-6 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL a future r77_type_dow_chi2 registration will carry (event
type × ISO weekday), plus a closed-form 2×2 hand pin and the
margins/unobserved-cell conventions."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import chi2_independence
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r77 oracle, verbatim. Dialect pins: ISO dow (the r69 shift);
# DuckDB's BIGINT sums go through HUGEINT but the float division
# lands on the same double; unobserved cells have no row on either
# side (the benford absent-digit stance).
R77_ORACLE = """
WITH c AS (
  SELECT event_type AS a,
         CAST(isodow(CAST(ts AS DATE)) AS INT) AS b,
         count(*) AS n_obs
  FROM events GROUP BY 1, 2)
SELECT a, b, n_obs,
       round(sum(n_obs) OVER (PARTITION BY a)
             * sum(n_obs) OVER (PARTITION BY b)
             / sum(n_obs) OVER (), 4) AS expected,
       round(pow(n_obs - sum(n_obs) OVER (PARTITION BY a)
                         * sum(n_obs) OVER (PARTITION BY b)
                         / sum(n_obs) OVER (), 2)
             / (sum(n_obs) OVER (PARTITION BY a)
                * sum(n_obs) OVER (PARTITION BY b)
                / sum(n_obs) OVER ()), 4) AS chi2_part
FROM c
"""


def _r77(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        ((F.dayofweek(F.col("ts").cast("date")) + 5) % 7 + 1)
        .cast("int")
        .alias("dow"),
    )
    return chi2_independence(ev, "event_type", "dow")


def test_chi2_matches_duckdb_oracle(spark, duck):
    compare(_r77(spark, SF_ORACLE), duck, R77_ORACLE)


def test_chi2_closed_form_2x2(spark):
    """The textbook 2×2: cells (10, 20 / 30, 40). Margins 30/70 and
    40/60, N = 100 — expected 12/18/28/42, X² = Σ(o−e)²/e = 0.7937."""
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20
        + [("y", "p")] * 30 + [("y", "q")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    got = {
        (r["a"], r["b"]): (r["n_obs"], r["expected"], r["chi2_part"])
        for r in chi2_independence(df, "a", "b").collect()
    }
    assert got[("x", "p")] == (10, 12.0, round(4 / 12, 4))
    assert got[("x", "q")] == (20, 18.0, round(4 / 18, 4))
    assert got[("y", "p")] == (30, 28.0, round(4 / 28, 4))
    assert got[("y", "q")] == (40, 42.0, round(4 / 42, 4))
    x2 = sum(v[2] for v in got.values())
    assert abs(x2 - 0.7937) < 1e-3


def test_chi2_independent_table_is_zero(spark):
    """A perfectly independent table (counts = product of margins):
    every chi2_part is exactly 0."""
    rows = []
    for a, na in (("x", 1), ("y", 3)):
        for b, nb in (("p", 2), ("q", 5)):
            rows += [(a, b)] * (na * nb)
    df = spark.createDataFrame(rows, "a string, b string")
    parts = [r["chi2_part"] for r in chi2_independence(df, "a", "b").collect()]
    assert parts == [0.0] * 4


def test_chi2_null_category_is_a_category(spark):
    df = spark.createDataFrame(
        [("x", "p"), (None, "p"), (None, "q")], "a string, b string"
    )
    got = {
        (r["a"], r["b"]): r["n_obs"]
        for r in chi2_independence(df, "a", "b").collect()
    }
    assert got[(None, "p")] == 1 and got[(None, "q")] == 1
