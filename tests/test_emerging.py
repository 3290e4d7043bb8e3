"""Emerging-pattern pair mining
(operators/mining.py::emerging_pair_patterns) —
PROMOTED round 7 as m27_emerging_pairs: the DuckDB oracle moved VERBATIM
into the @query registration (tests/test_oracle_parity.py now
carries the compare); the property/edge/hand pins stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.mining import (
    emerging_pair_patterns,
)
from miningfrequentpattern_spark.sources.io import load_table


def test_emerging_pairs_closed_form(spark):
    """BEFORE: 4 baskets — {1,2} × 2, {1,3}, {2,3}. AFTER: 4 baskets —
    {1,2}, {1,3} × 2, {4,5} × 1... wait make counts explicit below:
    (1,2): 2 → 1 (growth 0.5), (1,3): 1 → 2 (growth 2.0, kept via
    after-count), (2,3): vanished (1 → 0, kept only if min_count=1),
    (4,5): NEW (0 → 2, NULL growth, is_new)."""
    b = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3),
         (13, 2), (13, 3)],
        "bk long, it long",
    )
    a = spark.createDataFrame(
        [(20, 1), (20, 2), (21, 1), (21, 3), (22, 1), (22, 3),
         (23, 4), (23, 5), (24, 4), (24, 5)],
        "bk long, it long",
    )
    got = {
        (r["item_a"], r["item_b"]): r
        for r in emerging_pair_patterns(b, a, "bk", "it", 2).collect()
    }
    # N_before = 4 baskets, N_after = 5 baskets
    r12 = got[(1, 2)]
    assert (r12["n_before"], r12["n_after"]) == (2, 1)
    assert r12["support_before"] == 0.5 and r12["support_after"] == 0.2
    assert r12["growth"] == 0.4 and r12["is_new"] is False
    r13 = got[(1, 3)]
    assert (r13["n_before"], r13["n_after"]) == (1, 2)
    assert r13["growth"] == round((2 / 5) / (1 / 4), 4)
    r45 = got[(4, 5)]
    assert (r45["n_before"], r45["n_after"]) == (0, 2)
    assert r45["growth"] is None and r45["is_new"] is True
    assert (2, 3) not in got  # 1 -> 0 never reaches min_count=2


def test_emerging_pairs_vanished_kept_at_min_count(spark):
    b = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y")], "bk long, it string"
    )
    a = spark.createDataFrame([(9, "z")], "bk long, it string")
    got = emerging_pair_patterns(b, a, "bk", "it", 2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["item_a"], r["item_b"]) == ("x", "y")
    assert r["n_after"] == 0 and r["support_after"] == 0.0
    assert r["growth"] == 0.0 and r["is_new"] is False


def test_emerging_pairs_null_keys_excluded(spark):
    b = spark.createDataFrame(
        [(1, "x"), (1, "y"), (None, "x"), (1, None),
         (2, "x"), (2, "y")],
        "bk long, it string",
    )
    a = spark.createDataFrame([(9, "x"), (9, "y")], "bk long, it string")
    got = emerging_pair_patterns(b, a, "bk", "it", 2).collect()
    assert len(got) == 1 and got[0]["n_before"] == 2
