"""Growth accounting (operators/relational.py::growth_accounting) —
round-8 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL the future r88_growth_accounting registration
will carry (weekly new/retained/resurrected/churned decomposition of
events actives), plus a hand-traced lifecycle pin and the accounting
identities (new + retained + resurrected = active;
churned(p) = active(prev) − retained(p))."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import (
    growth_accounting,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r88 oracle, verbatim — the r85 calendar pins (ISO-Monday
# date_trunc, exact day/7 gaps) with a per-user lag classification
# and the predecessor self-join for churn.
R88_ORACLE = """
WITH e AS (SELECT user_id AS u, date_trunc('week', ts) AS p
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
up AS (SELECT DISTINCT u, p FROM e),
fu AS (SELECT u, min(p) AS first_p FROM up GROUP BY 1),
cl AS (SELECT up.u, up.p,
              CASE WHEN up.p = fu.first_p THEN 'new'
                   WHEN date_diff('day',
                        CAST(lag(up.p) OVER (PARTITION BY up.u
                                             ORDER BY up.p) AS DATE),
                        CAST(up.p AS DATE)) / 7 = 1 THEN 'retained'
                   ELSE 'resurrected' END AS s
       FROM up JOIN fu USING (u)),
c AS (SELECT p AS period,
             CAST(count(*) AS BIGINT) AS n_active,
             CAST(sum(CASE WHEN s = 'new' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN s = 'retained' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_retained,
             CAST(sum(CASE WHEN s = 'resurrected' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_resurrected
      FROM cl GROUP BY 1)
SELECT c.period, c.n_active, c.n_new, c.n_retained, c.n_resurrected,
       CAST(coalesce(pr.n_active, 0) - c.n_retained AS BIGINT)
         AS n_churned
FROM c LEFT JOIN c pr
  ON date_trunc('week', CAST(pr.period AS DATE) + INTERVAL 7 DAY)
     = c.period
"""


def _r88(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return growth_accounting(ev, "user_id", "ts", grain="week")


def test_growth_accounting_matches_duckdb_oracle(spark, duck):
    compare(_r88(spark, SF_ORACLE), duck, R88_ORACLE)


def test_growth_accounting_lifecycle_closed_form(spark):
    """u1 active W0, W1, W3 (new, retained, resurrected); u2 active
    W0 only (new, then churned into W1); u3 first appears W1 (new).
    W1: active {u1, u3} = 1 retained + 1 new; churned(W1) =
    active(W0)=2 − retained(W1)=1 = 1 (u2). W2: nobody — no row.
    W3: u1 resurrects; churned(W3) = 0 (W2 absent → predecessor
    count 0... the LEFT join yields 0 − 0: no W2 row means
    coalesce(0) − retained(W3)=0 = 0)."""
    rows = [
        ("u1", "2024-01-01"), ("u1", "2024-01-08"), ("u1", "2024-01-24"),
        ("u2", "2024-01-03"),
        ("u3", "2024-01-10"),
    ]
    df = spark.createDataFrame(rows, "user_id string, d string").select(
        "user_id", F.to_timestamp("d").alias("ts")
    )
    got = {
        r["period"].date().isoformat(): (
            r["n_active"], r["n_new"], r["n_retained"],
            r["n_resurrected"], r["n_churned"],
        )
        for r in growth_accounting(df, "user_id", "ts").collect()
    }
    assert got == {
        "2024-01-01": (2, 2, 0, 0, 0),
        "2024-01-08": (2, 1, 1, 0, 1),
        "2024-01-22": (1, 0, 0, 1, 0),
    }


def test_growth_accounting_identities(spark):
    """On the real fixture: new + retained + resurrected = active for
    every period, and every count is non-negative."""
    for r in _r88(spark, SF_ORACLE).collect():
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == r["n_active"]
        for c in ("n_active", "n_new", "n_retained",
                  "n_resurrected", "n_churned"):
            assert r[c] >= 0, (r["period"], c)


def test_growth_accounting_bad_grain(spark):
    import pytest

    df = spark.createDataFrame(
        [("u", "2024-01-01")], "user_id string, d string"
    ).select("user_id", F.to_timestamp("d").alias("ts"))
    with pytest.raises(ValueError, match="grain"):
        growth_accounting(df, "user_id", "ts", "day")
