"""A/B evidence for the m28 LPA shave (VERDICT r8 item 4) at a given
SF, kept runnable so the registry re-certification comment points at
live code, not a one-off transcript:

A. iterations=2 vs 3 — communities parity on the fixture? (measured:
   NO — 2-round LPA diverges on ~73% of sf0.1 nodes; iteration count
   is semantics, not tuning)
B. single-exchange round body (SHIPPED in operators/graph.py::
   label_propagation): explicit repartition(id) before the
   (id, label) count so BOTH aggregations ride one hash(id) exchange
   (HashPartitioning([id]) satisfies ClusteredDistribution([id, lab]))
   instead of two (hash(id, lab) for the count, then hash(id) for the
   argmax). Trades away the count's map-side combine — worthless in
   round 1 anyway, where every (node, neighbor-label) pair is unique
   by construction. Measured 7.1 -> 4.2 s at sf0.1, bit-identical.

The baseline here is the PRE-shave two-exchange round body (kept as a
local variant for the A/B); the shave side and the parity check run
the SHIPPED operator, and the graph comes from the SHARED
mining_pack builder m28 itself uses (code-review r9: the first cut
re-copied both, so 'parity' never exercised the operator).

Usage: python scripts/m28_ab.py [sf_dir]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.graph import (
    _undirected,
    label_propagation,
)
from miningfrequentpattern_spark.queries.mining_pack import (
    _copurchase_pairs,
)
from miningfrequentpattern_spark.session import get_session


def lpa_two_exchange_baseline(pairs, iterations):
    """The PRE-r9 round body (groupBy-driven exchanges), verbatim
    except for reusing the operator's _undirected normalization —
    the A/B baseline the shave was measured against."""
    und = _undirected(pairs, "src", "dst")
    stubs = (
        und.select(F.col("s").alias("_u"), F.col("d").alias("_v"))
        .unionAll(und.select(F.col("d").alias("_u"), F.col("s").alias("_v")))
        .repartition("_u")
        .cache()
    )
    try:
        labels = stubs.select(F.col("_v").alias("id")).distinct().select(
            "id", F.col("id").alias("_lab")
        )
        for _ in range(iterations):
            labels = (
                stubs.join(labels, stubs["_u"] == labels["id"])
                .select(F.col("_v").alias("id"), "_lab")
                .groupBy("id", "_lab")
                .agg(F.count(F.lit(1)).alias("_n"))
                .groupBy("id")
                .agg(
                    F.min_by(
                        "_lab", F.struct(-F.col("_n"), F.col("_lab"))
                    ).alias("_lab")
                )
                .localCheckpoint(eager=True)
            )
        return labels.select("id", F.col("_lab").alias("community"))
    finally:
        stubs.unpersist()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("m28-ab")
    spark.sparkContext.setLogLevel("ERROR")
    pairs = _copurchase_pairs(spark, sf_dir).localCheckpoint(eager=True)

    def run(tag, fn):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{tag}: {best:.2f}s")
        return best

    run("baseline iters=3 two-exchange (pre-r9)",
        lambda: lpa_two_exchange_baseline(pairs, 3))
    run("SHIPPED  iters=3 one-exchange        ",
        lambda: label_propagation(pairs, iterations=3))
    run("variantA iters=2 (shipped body)      ",
        lambda: label_propagation(pairs, iterations=2))

    as_set = lambda df: {(r["id"], r["community"]) for r in df.collect()}
    base = as_set(lpa_two_exchange_baseline(pairs, 3))
    ship = as_set(label_propagation(pairs, iterations=3))
    two = as_set(label_propagation(pairs, iterations=2))
    print("parity shipped one-exchange vs pre-r9 baseline:", base == ship)
    diff = len(base ^ two) // 2
    print(f"parity 2 vs 3 rounds: {base == two} "
          f"(nodes differing: {diff} of {len(base)})")
    spark.stop()


if __name__ == "__main__":
    main()
