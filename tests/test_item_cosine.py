"""Item-item cosine co-occurrence
(operators/mining.py::item_cosine_pairs) — promoted round 6: the oracle moved verbatim onto the m22_item_cosine registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps a hand-computed
cosine check. All inputs to the cosine are exact integers, so both
engines compute bitwise-identical doubles (sqrt/÷ are correctly
rounded IEEE ops) — rounding at 4dp then ordering is cross-engine
stable."""

import math

from miningfrequentpattern_spark.operators.mining import item_cosine_pairs
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_item_cosine_hand_computed(spark):
    """Baskets {1,2}, {1,2}, {1,3}: n_1=3, n_2=2, n_3=1,
    n_12=2, n_13=1 → cosine(1,2) = 2/√6 ≈ 0.8165,
    cosine(1,3) = 1/√3 ≈ 0.5774 (kept only at min_shared=1);
    duplicate items within a basket must NOT inflate counts."""
    rows = [
        (10, 1), (10, 1), (10, 2),
        (20, 1), (20, 2),
        (30, 1), (30, 3),
    ]
    df = spark.createDataFrame(rows, "bk long, it long")
    got = {
        (r["item_a"], r["item_b"]): (r["n_shared"], r["cosine"])
        for r in item_cosine_pairs(df, "bk", "it", 1, 10).collect()
    }
    assert got[(1, 2)][0] == 2
    assert math.isclose(got[(1, 2)][1], round(2 / math.sqrt(6), 4))
    assert got[(1, 3)][0] == 1
    assert math.isclose(got[(1, 3)][1], round(1 / math.sqrt(3), 4))
    # min_shared=2 prunes the (1,3) singleton pair
    only = item_cosine_pairs(df, "bk", "it", 2, 10).collect()
    assert [(r["item_a"], r["item_b"]) for r in only] == [(1, 2)]


def test_item_cosine_empty(spark):
    empty = spark.createDataFrame([], "bk long, it long")
    assert item_cosine_pairs(empty, "bk", "it").count() == 0
