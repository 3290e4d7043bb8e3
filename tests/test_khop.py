"""Multi-source k-hop BFS (operators/graph.py::khop_distances) —
promoted round 6: the oracle moved verbatim onto the m21_part_khop_reach registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (chained-CTE BFS over the same co-purchase graph family as
m13/m14, seeds = top-3 parts by degree), plus synthetic-graph
semantics checks the sf0.01 fixture cannot exercise (exact distance
layering, beyond-k exclusion, frontier-exhaustion early exit,
absent-seed behavior, durable-pin equality)."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.graph import khop_distances
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def _copurchase_edges(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )
    return pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def test_khop_distance_layers_on_a_path(spark):
    """Directed path 1→2→3→4→5→6, seed {1}, k=3: exact layers 0..3
    and nodes 5, 6 absent (beyond-k exclusion)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "src long, dst long"
    )
    got = sorted(
        (r["id"], r["dist"])
        for r in khop_distances(
            edges, spark.createDataFrame([(1,)], "id long"), 3
        ).collect()
    )
    assert got == [(1, 0), (2, 1), (3, 2), (4, 3)]


def test_khop_frontier_exhaustion_stops_early(spark):
    """Undirected star (center 0, leaves 1-4), seed = one leaf,
    max_hops 5: everything is within 2 hops, later hops must
    short-circuit (empty frontier), and min-dist semantics hold (the
    seed leaf is NOT rediscovered at dist 2 via the center)."""
    pairs = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    got = sorted(
        (r["id"], r["dist"])
        for r in khop_distances(
            edges, spark.createDataFrame([(1,)], "id long"), 5
        ).collect()
    )
    assert got == [(0, 1), (1, 0), (2, 2), (3, 2), (4, 2)]


def test_khop_seed_absent_from_graph(spark):
    """A seed with no edges still appears at dist 0 — an upstream
    filter matching an isolated id must not crash or vanish."""
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = khop_distances(
        edges, spark.createDataFrame([(99,)], "id long"), 3
    ).collect()
    assert [(r["id"], r["dist"]) for r in got] == [(99, 0)]


def test_khop_durable_twin_matches(spark):
    """durable=True (reliable checkpoint) must be result-identical to
    the default localCheckpoint pins — same contract as the other
    iterative operators' durable modes."""
    edges = _copurchase_edges(spark, SF_ORACLE).filter(
        (F.col("src") % 7 == 0) & (F.col("dst") % 7 == 0)
    )
    seeds = edges.orderBy("src", "dst").limit(1).select(
        F.col("src").alias("id")
    )
    a = sorted(map(tuple, khop_distances(edges, seeds, 2).collect()))
    b = sorted(
        map(tuple, khop_distances(edges, seeds, 2, durable=True).collect())
    )
    assert a == b and len(a) > 0
