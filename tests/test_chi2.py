"""Chi-square independence audit
(operators/relational.py::chi2_independence) — promoted round 6: the oracle moved verbatim onto the r77_type_dow_chi2 registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (event
type × ISO weekday), plus a closed-form 2×2 hand pin and the
margins/unobserved-cell conventions."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import chi2_independence
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


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


def test_chi2_grand_total_has_no_empty_window(spark):
    """The grand total rides a 1-row aggregate broadcast-crossJoin,
    never an empty-spec window that would funnel the whole cell
    relation through ONE WindowExec task (code-review r9) — and the
    values are unchanged by the rewrite."""
    from miningfrequentpattern_spark.operators.relational import (
        chi2_independence,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "x")], "u string, v string"
    )
    out = chi2_independence(df, "u", "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # every Window node must carry partition keys
    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\]", plan):
        assert m.group(2).strip(), f"empty-partition window in plan: {m.group(0)}"
    got = {(r["a"], r["b"]): (r["n_obs"], r["expected"]) for r in out.collect()}
    assert got[("a", "x")] == (1, 1.5) and got[("b", "x")] == (2, 1.5)
