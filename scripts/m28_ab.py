"""A/B the m28 LPA shave candidates (VERDICT r8 item 4) at a given SF:

A. iterations=2 vs 3 — communities parity on the fixture?
B. single-exchange round body: explicit repartition(id) before the
   (id, label) count so BOTH aggregations ride one hash(id) exchange
   (HashPartitioning([id]) satisfies ClusteredDistribution([id, lab]))
   instead of the default two exchanges (hash(id, lab) for the count,
   then hash(id) for the argmax). Trades away the count's map-side
   combine — worthless in round 1 anyway, where every (node,
   neighbor-label) pair is unique by construction.

Usage: python scripts/m28_ab.py [sf_dir]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from miningfrequentpattern_spark.session import get_session


def lpa_variant(stubs, iterations, single_exchange):
    labels = stubs.select(F.col("_v").alias("id")).distinct().select(
        "id", F.col("id").alias("_lab")
    )
    for _ in range(iterations):
        joined = stubs.join(labels, stubs["_u"] == labels["id"]).select(
            F.col("_v").alias("id"), "_lab"
        )
        if single_exchange:
            joined = joined.repartition("id")
        labels = (
            joined.groupBy("id", "_lab")
            .agg(F.count(F.lit(1)).alias("_n"))
            .groupBy("id")
            .agg(
                F.min_by("_lab", F.struct(-F.col("_n"), F.col("_lab"))).alias(
                    "_lab"
                )
            )
        )
        labels = labels.localCheckpoint(eager=True)
    return labels.select("id", F.col("_lab").alias("community"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("m28-ab")
    spark.sparkContext.setLogLevel("ERROR")
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )
    und = pairs.select(
        F.least("src", "dst").alias("s"), F.greatest("src", "dst").alias("d")
    ).distinct().filter(F.col("s") != F.col("d"))
    stubs = (
        und.select(F.col("s").alias("_u"), F.col("d").alias("_v"))
        .unionAll(und.select(F.col("d").alias("_u"), F.col("s").alias("_v")))
        .repartition("_u")
        .cache()
    )
    stubs.count()  # warm

    def run(tag, iters, single):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            lpa_variant(stubs, iters, single).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{tag}: {best:.2f}s")
        return best

    run("baseline  iters=3 two-exchange ", 3, False)
    run("variantB  iters=3 one-exchange ", 3, True)
    run("variantA  iters=2 two-exchange ", 2, False)
    run("variantAB iters=2 one-exchange ", 2, True)

    # parity: 2 vs 3 rounds on this fixture
    l3 = {(r["id"], r["community"]) for r in lpa_variant(stubs, 3, False).collect()}
    l2 = {(r["id"], r["community"]) for r in lpa_variant(stubs, 2, False).collect()}
    lb = {(r["id"], r["community"]) for r in lpa_variant(stubs, 3, True).collect()}
    print("parity 3-round two-exchange vs one-exchange:", l3 == lb)
    diff = len(l3 ^ l2) // 2
    print(f"parity 2 vs 3 rounds: {l3 == l2} (nodes differing: {diff} of {len(l3)})")
    spark.stop()


if __name__ == "__main__":
    main()
