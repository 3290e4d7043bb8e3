"""Degree assortativity (operators/graph.py::degree_assortativity) —
round-6 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL a future m24_part_assortativity registration
will carry (the Newman coefficient of the co-purchase graph, built
with the m14-certified edge construction), plus closed-form star /
regular / normalization hand pins and a numpy reference."""

import numpy as np

from miningfrequentpattern_spark.operators.graph import degree_assortativity
from miningfrequentpattern_spark.sources.io import load_table

from pyspark.sql import functions as F

from .conftest import SF_ORACLE
from .oracle import compare

# Future m24 oracle, verbatim. Edge construction is m14's verbatim
# (DISTINCT co-purchase pairs oriented s < d); stubs carry BOTH
# orientations — the standard symmetrization, without which the
# canonical order biases the correlation; corr is sample Pearson in
# both engines, NULL at zero variance (the r44 pin, normalized
# operator-side from Spark's NaN).
M24_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
e AS (SELECT a.pk AS s, b.pk AS d FROM li a
      JOIN li b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
deg AS (SELECT v, count(*) AS deg FROM (
          SELECT s AS v FROM e UNION ALL SELECT d FROM e)
        GROUP BY 1),
stubs AS (SELECT s AS u, d AS v FROM e
          UNION ALL SELECT d AS u, s AS v FROM e),
paired AS (SELECT du.deg AS deg_u, dv.deg AS deg_v
           FROM stubs
           JOIN deg du ON du.v = stubs.u
           JOIN deg dv ON dv.v = stubs.v)
SELECT (SELECT count(*) FROM deg) AS n_nodes,
       CAST((SELECT count(*) FROM stubs) / 2 AS BIGINT) AS n_edges,
       round(corr(deg_u, deg_v), 4) AS assortativity
FROM paired
"""


def _m24(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )
    return degree_assortativity(pairs)


def test_assortativity_matches_duckdb_oracle(spark, duck):
    compare(_m24(spark, SF_ORACLE), duck, M24_ORACLE)


def test_assortativity_star_is_minus_one(spark):
    """K_{1,3}: hub degree 3, leaves degree 1 — every stub pairs a 3
    with a 1, perfectly disassortative."""
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    row = degree_assortativity(edges).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["assortativity"]) == (
        4,
        3,
        -1.0,
    )


def test_assortativity_regular_graph_is_null(spark):
    """C4 cycle: every degree 2 — zero variance, NULL (never NaN)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    row = degree_assortativity(edges).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["assortativity"]) == (
        4,
        4,
        None,
    )


def test_assortativity_normalizes_duplicates_loops_direction(spark):
    """(1,2), (2,1), (1,1) is ONE undirected edge — duplicates,
    reversed duplicates, and self-loops all vanish in the canonical
    form (the m14 seam)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1)], "src long, dst long"
    )
    row = degree_assortativity(edges).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["assortativity"]) == (
        2,
        1,
        None,  # both endpoints degree 1: zero variance
    )


def test_assortativity_matches_numpy_on_small_graph(spark):
    edges_py = [(0, 1), (0, 2), (0, 3), (1, 2), (3, 4), (4, 5)]
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    got = degree_assortativity(edges).collect()[0]
    deg: dict[int, int] = {}
    for s, d in edges_py:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    du = [deg[s] for s, d in edges_py] + [deg[d] for s, d in edges_py]
    dv = [deg[d] for s, d in edges_py] + [deg[s] for s, d in edges_py]
    want = round(float(np.corrcoef(du, dv)[0, 1]), 4)
    assert got["assortativity"] == want
    assert got["n_nodes"] == 6 and got["n_edges"] == 6


def test_assortativity_empty_graph_still_emits_a_row(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    row = degree_assortativity(edges).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["assortativity"]) == (
        0,
        0,
        None,
    )
