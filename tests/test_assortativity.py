"""Degree assortativity (operators/graph.py::degree_assortativity) —
promoted round 6: the oracle moved verbatim onto the m24_part_assortativity registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (the Newman coefficient of the co-purchase graph, built
with the m14-certified edge construction), plus closed-form star /
regular / normalization hand pins and a numpy reference."""

import numpy as np

from miningfrequentpattern_spark.operators.graph import degree_assortativity
from miningfrequentpattern_spark.sources.io import load_table

from pyspark.sql import functions as F

from .conftest import SF_ORACLE
from .oracle import compare


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
