"""Growth accounting (operators/relational.py::growth_accounting) — PROMOTED round 8 as r88_growth_accounting: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the hand-traced lifecycle pin and
the accounting identities (new + retained + resurrected = active;
churned(p) = active(prev) − retained(p)) stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import (
    growth_accounting,
)
from .conftest import SF_ORACLE
from miningfrequentpattern_spark.queries.registry import (
    QUERIES,
    load_all_packs,
)

load_all_packs()

def _r88(spark, sf_dir):
    return QUERIES["r88_growth_accounting"](spark, sf_dir)



def test_growth_accounting_lifecycle_closed_form(spark):
    """u1 active W0, W1, W3 (new, retained, resurrected); u2 active
    W0 only (new, then churned into W1); u3 first appears W1 (new).
    W1: active {u1, u3} = 1 retained + 1 new; churned(W1) =
    active(W0)=2 − retained(W1)=1 = 1 (u2). W2: nobody active — the
    row still EXISTS on the calendar spine and carries the churn of
    W1's actives (2: u1 and u3 both sat out W2) — the code-review r8
    fix; the old inner-spine form dropped the row and silently lost
    exactly-total churn. W3: u1 resurrects; churned(W3) = active(W2)=0
    − retained(W3)=0 = 0."""
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
        "2024-01-15": (0, 0, 0, 0, 2),
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
