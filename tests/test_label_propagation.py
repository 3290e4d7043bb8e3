"""Label-propagation communities
(operators/graph.py::label_propagation) — round-8 window candidate,
locally certified NOW: the DuckDB oracle below is the exact SQL the
future m28_part_communities registration will carry (3 synchronous
min-tiebreak rounds over the co-purchase graph, the m13/m25
unrolled-CTE stance), plus the two-triangles-one-bridge closed form
where connected components would merge what LPA keeps apart."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.graph import label_propagation
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future m28 oracle, verbatim. Each round: neighbor-label counts +
# per-node rank-1 on (count DESC, label ASC) — a pure function of the
# previous labeling, so the unrolled chain IS the operator's
# synchronous recurrence.
_ROUND = """
l{k} AS (
  SELECT id, lab FROM (
    SELECT e.v AS id, l{j}.lab, count(*) AS n,
           row_number() OVER (PARTITION BY e.v
                              ORDER BY count(*) DESC, l{j}.lab) AS r
    FROM e JOIN l{j} ON e.u = l{j}.id
    GROUP BY e.v, l{j}.lab)
  WHERE r = 1)"""

M28_ORACLE = (
    """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
p AS (SELECT DISTINCT a.pk AS s, b.pk AS d
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
e AS MATERIALIZED (SELECT s AS u, d AS v FROM p
                   UNION ALL SELECT d, s FROM p),
l0 AS (SELECT DISTINCT v AS id, v AS lab FROM e),"""
    + ",".join(_ROUND.format(k=k, j=k - 1) for k in (1, 2, 3))
    + """
SELECT id AS part_id, lab AS community FROM l3
"""
)


def _m28(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok"))
               & (F.col("a.pk") < F.col("b.pk")))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )
    return label_propagation(pairs, iterations=3).select(
        F.col("id").alias("part_id"), "community"
    )


def test_label_propagation_matches_duckdb_oracle(spark, duck):
    compare(_m28(spark, SF_ORACLE), duck, M28_ORACLE)


def test_label_propagation_two_triangles_one_bridge(spark):
    """Triangles {1,2,3} and {4,5,6} joined by the single bridge 3-4:
    after 3 synchronous min-tiebreak rounds the labeling is exactly
    {1,2,3} -> 1 and {4,5,6} -> 3 (hand-traced) — two communities
    where connected components would report ONE."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    got = {
        r["id"]: r["community"]
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}
    from miningfrequentpattern_spark.operators.dedup import (
        connected_components,
    )

    cc = connected_components(
        edges.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
    )
    assert {r["component"] for r in cc.collect()} == {1}  # CC merges


def test_label_propagation_clique_converges_to_min(spark):
    """A clique converges to its minimum node id and stays there
    (a fixpoint — more rounds change nothing)."""
    edges = spark.createDataFrame(
        [(i, j) for i in range(10, 15) for j in range(i + 1, 15)],
        "src long, dst long",
    )
    for iters in (3, 5):
        got = {
            r["id"]: r["community"]
            for r in label_propagation(edges, iterations=iters).collect()
        }
        assert set(got.values()) == {10}


def test_label_propagation_deterministic(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    a = sorted(map(tuple, label_propagation(edges, 3).collect()))
    b = sorted(map(tuple, label_propagation(edges, 3).collect()))
    assert a == b
