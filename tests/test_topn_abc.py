"""Top-N-plus-OTHER rollup and ABC contribution analysis
(operators/relational.py::topn_with_others / ::abc_classification) —
promoted round 6: the oracle moved verbatim onto the r63/r64 registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps
boundary-semantics hand checks (the crossing-item class pin, the
mass-conservation invariant)."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import (
    abc_classification,
    topn_with_others,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare



def _brand_rev(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    return li.join(
        F.broadcast(pa.select("p_partkey", "p_brand")),
        li["l_partkey"] == pa["p_partkey"],
    )


def test_topn_conserves_mass_and_cuts_deterministically(spark):
    """5 categories, n=2: exactly 3 output rows (2 named + OTHER) and
    the parts sum to the grand total; the boundary tie (b vs c, both
    20) cuts by label ascending — b stays named, c folds into
    OTHER."""
    rows = [("a", 50.0), ("b", 20.0), ("c", 20.0), ("d", 7.0), ("e", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["label"], r["is_other"]): r["total"]
        for r in topn_with_others(df, "g", F.sum("v"), 2).collect()
    }
    assert set(got) == {("a", False), ("b", False), ("OTHER", True)}
    assert got[("OTHER", True)] == 30.0
    assert math.isclose(sum(got.values()), 100.0)


def test_abc_boundary_item_takes_higher_class(spark):
    """Shares 0.5 / 0.3 / 0.15 / 0.05: the 0.3 item CROSSES 0.8
    (cum 0.5 → 0.8) and must be A (decided by the share BEFORE it);
    the 0.15 item crosses 0.95 and must be B; the last is C. A
    single-item group is always A."""
    rows = [("g", "w", 50.0), ("g", "x", 30.0), ("g", "y", 15.0),
            ("g", "z", 5.0), ("h", "solo", 1.0)]
    df = spark.createDataFrame(rows, "grp string, item string, v double")
    got = {
        (r["grp"], r["item"]): (r["abc_class"], r["cum_share"])
        for r in abc_classification(
            df, ["grp"], "item", F.sum("v")
        ).collect()
    }
    assert got[("g", "w")][0] == "A"
    assert got[("g", "x")] == ("A", 0.8)
    assert got[("g", "y")] == ("B", 0.95)
    assert got[("g", "z")][0] == "C"
    assert got[("h", "solo")] == ("A", 1.0)


def test_topn_abc_empty(spark):
    empty = spark.createDataFrame([], "g string, v double")
    assert topn_with_others(empty, "g", F.sum("v"), 3).count() == 0
    assert abc_classification(empty, [], "g", F.sum("v")).count() == 0


def test_topn_real_category_named_other_stays_separate(spark):
    """A REAL category named OTHER must never merge with the tail
    bucket: the is_other flag, not the label, is the bucket identity
    (review r5)."""
    rows = [("OTHER", 100.0), ("b", 50.0), ("c", 10.0), ("d", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["label"], r["is_other"]): r["total"]
        for r in topn_with_others(df, "g", F.sum("v"), 2).collect()
    }
    assert got[("OTHER", False)] == 100.0
    assert got[("OTHER", True)] == 15.0
    assert got[("b", False)] == 50.0


def test_abc_zero_grand_total_yields_nulls_not_c(spark):
    """A net-zero group has no contribution structure: NULL shares
    and classes, never a silent all-C fall-through (review r5)."""
    df = spark.createDataFrame(
        [("g", "a", 5.0), ("g", "b", -5.0)],
        "grp string, item string, v double",
    )
    got = {
        r["item"]: (r["share"], r["cum_share"], r["abc_class"])
        for r in abc_classification(df, ["grp"], "item", F.sum("v")).collect()
    }
    assert got["a"] == (None, None, None)
    assert got["b"] == (None, None, None)
