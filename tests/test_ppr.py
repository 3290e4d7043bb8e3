"""Personalized PageRank (operators/graph.py::personalized_pagerank)
— promoted round 6: the oracle moved verbatim onto the m26_part_ppr registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps
(3-iteration PPR over the symmetrized co-purchase graph, seeded at
its 10 lowest part ids — the related-items query), plus
reduces-to-uniform, seed-concentration, and seed-validation hand
pins."""

import pytest
from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.graph import (
    pagerank,
    personalized_pagerank,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def _copurchase_edges(spark, sf_dir):
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
    return pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def test_ppr_all_nodes_seeded_is_uniform_pagerank(spark):
    """Seeding EVERY node with uniform teleport reduces PPR to the
    global operator exactly — the p = 1/N special case."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3), (3, 4), (4, 3)],
        "src long, dst long",
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    pr = {r["id"]: r["pagerank"] for r in pagerank(edges, 4).collect()}
    ppr = {
        r["id"]: r["ppr"]
        for r in personalized_pagerank(edges, nodes, 4).collect()
    }
    assert pr == ppr


@pytest.mark.slow  # driver test budget (VERDICT r11 item 2):
# heavyweight property/stream-twin cert, full-suite-only
def test_ppr_concentrates_near_the_seed(spark):
    """A 6-cycle seeded at one node, run to (damping-geometric)
    convergence: scores decay with hop distance — seed > 1-hop >
    2-hop > antipode — and mirror symmetrically around the ring.
    Values cross-checked against a numpy power iteration (30 rounds,
    0.85³⁰ ≈ 0.8% residual; FEWER rounds show the bipartite parity
    wobble where the antipode transiently outranks a 2-hop node —
    which is why this pin runs to convergence)."""
    ring = [(i, (i % 6) + 1) for i in range(1, 7)]
    edges = spark.createDataFrame(
        ring + [(d, s) for s, d in ring], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    got = {
        r["id"]: r["ppr"]
        for r in personalized_pagerank(edges, seeds, 30).collect()
    }
    assert got[1] > got[2] > got[3] > got[4]
    assert got[2] == got[6] and got[3] == got[5]  # ring symmetry
    # numpy power-iteration reference, same 30 rounds
    assert got[1] == 1.8204 and got[4] == 0.6007


def test_ppr_raises_when_no_seed_in_graph(spark):
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(99,)], "id long")
    with pytest.raises(ValueError, match="no seed is a graph node"):
        personalized_pagerank(edges, seeds, 3)


def test_ppr_empty_graph(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "id long")
    assert personalized_pagerank(edges, seeds, 3).count() == 0


def test_ppr_rejects_degenerate_damping(spark):
    """r10 sweep: damping=0 crashed with ZeroDivisionError before any
    Spark work and damping=1 silently returned all-zero ppr (the
    teleport weights vanish, so the rank init finds no seeds). Both
    now raise with the parameter named."""
    import pytest

    from miningfrequentpattern_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "id long")
    for d in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="damping"):
            personalized_pagerank(edges, seeds, damping=d)
