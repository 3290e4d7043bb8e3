"""Emerging-pattern pair mining
(operators/mining.py::emerging_pair_patterns) — round-7 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL the future m27_emerging_pairs registration will carry
(part pairs in orders BEFORE vs AFTER 1998-01-01 — the contrast
dimension M4's single-corpus itemsets lack), plus closed-form
growth/new/vanished hand pins and a NULL-key exclusion check."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.mining import (
    emerging_pair_patterns,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future m27 oracle, verbatim. Supports divide exact integers (the
# m22 parity stance); growth is the same two-divisions-then-divide
# order as the operator; a pair unseen BEFORE lands NULL growth +
# is_new; vanished pairs keep n_after = 0 rows.
M27_ORACLE = """
WITH li AS (SELECT DISTINCT l.l_orderkey AS bk, l.l_partkey AS it,
                   (o.o_orderdate >= TIMESTAMP '1998-01-01') AS late
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
nb AS (SELECT count(DISTINCT bk) AS n FROM li WHERE NOT late),
na AS (SELECT count(DISTINCT bk) AS n FROM li WHERE late),
pb AS (SELECT a.it AS item_a, b.it AS item_b, count(*) AS n_before
       FROM li a JOIN li b
         ON a.bk = b.bk AND a.it < b.it AND NOT a.late AND NOT b.late
       GROUP BY 1, 2),
pa AS (SELECT a.it AS item_a, b.it AS item_b, count(*) AS n_after
       FROM li a JOIN li b
         ON a.bk = b.bk AND a.it < b.it AND a.late AND b.late
       GROUP BY 1, 2),
j AS (SELECT coalesce(pb.item_a, pa.item_a) AS item_a,
             coalesce(pb.item_b, pa.item_b) AS item_b,
             coalesce(pb.n_before, 0) AS n_before,
             coalesce(pa.n_after, 0) AS n_after
      FROM pb FULL JOIN pa
        ON pb.item_a = pa.item_a AND pb.item_b = pa.item_b)
SELECT j.item_a, j.item_b,
       CAST(j.n_before AS BIGINT) AS n_before,
       CAST(j.n_after AS BIGINT) AS n_after,
       round(j.n_before * 1.0 / nb.n, 4) AS support_before,
       round(j.n_after * 1.0 / na.n, 4) AS support_after,
       round(CASE WHEN j.n_before > 0
                  THEN (j.n_after * 1.0 / na.n)
                       / (j.n_before * 1.0 / nb.n) END, 4) AS growth,
       j.n_before = 0 AS is_new
FROM j CROSS JOIN nb CROSS JOIN na
WHERE j.n_before >= 2 OR j.n_after >= 2
"""


def _m27(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    tagged = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        "l_orderkey",
        "l_partkey",
        (
            F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
        ).alias("late"),
    )
    before = tagged.filter(~F.col("late"))
    after = tagged.filter(F.col("late"))
    return emerging_pair_patterns(
        before, after, "l_orderkey", "l_partkey", min_count=2
    )


def test_emerging_pairs_match_duckdb_oracle(spark, duck):
    compare(_m27(spark, SF_ORACLE), duck, M27_ORACLE)


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
