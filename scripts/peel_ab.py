"""A/B equivalence + timing for the r11 kcore/ktruss peel-loop fix
(pin the per-round relation BEFORE the convergence count so the
degree aggregate / triangle enumeration runs once per round, not
twice). OLD formulations inlined verbatim from the pre-change
operators; compared value-for-value (exceptAll both directions) on
the registered m18/m25 inputs, timed interleaved (alternating forms
so a noisy-host window hits both; min-of-N is the estimator).

Run: python scripts/peel_ab.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F

from miningfrequentpattern_spark.operators.ckpt import pin, release
from miningfrequentpattern_spark.operators.graph import (
    _degrees, _edge_support, _undirected, kcore, ktruss,
)
from miningfrequentpattern_spark.session import get_session


def old_kcore(edges, k, max_iter=50, src="src", dst="dst"):
    e = pin(_undirected(edges, src, dst))
    prev_nodes = None
    try:
        for _ in range(max_iter):
            keep = _degrees(e).filter(F.col("deg") >= k).select("v")
            n = keep.count()
            if n == 0:
                from pyspark.sql import types as ST
                id_type = e.schema["s"].dataType
                empty = e.sparkSession.createDataFrame(
                    [], ST.StructType([
                        ST.StructField("id", id_type),
                        ST.StructField("core_degree", ST.LongType()),
                    ]))
                release(e)
                return empty
            if n == prev_nodes:
                deg = _degrees(e)
                out = pin(
                    deg.select(
                        F.col("v").alias("id"),
                        F.col("deg").alias("core_degree"),
                    )
                )
                release(e)
                return out
            prev_nodes = n
            nxt = (
                e.join(keep.withColumnRenamed("v", "s"), "s", "semi")
                .join(keep.withColumnRenamed("v", "d"), "d", "semi")
                .select("s", "d")
            )
            nxt = pin(nxt)
            release(e)
            e = nxt
        raise RuntimeError("did not stabilize")
    except Exception:
        release(e)
        raise


def old_ktruss(edges, k, max_iter=30, src="src", dst="dst"):
    need = k - 2
    e = pin(_undirected(edges, src, dst))
    prev = None
    try:
        for _ in range(max_iter):
            sup = _edge_support(e)
            keep = (
                e.join(sup, ["s", "d"], "left")
                .select(
                    "s",
                    "d",
                    F.coalesce(F.col("support"), F.lit(0)).alias("support"),
                )
                .filter(F.col("support") >= need)
            )
            n = keep.count()
            if n == 0:
                from pyspark.sql import types as ST
                id_type = e.schema["s"].dataType
                empty = e.sparkSession.createDataFrame(
                    [], ST.StructType([
                        ST.StructField("s", id_type),
                        ST.StructField("d", id_type),
                        ST.StructField("support", ST.LongType()),
                    ]))
                release(e)
                return empty
            if n == prev:
                out = pin(keep)
                release(e)
                return out
            prev = n
            nxt = pin(keep.select("s", "d"))
            release(e)
            e = nxt
        raise RuntimeError("did not stabilize")
    except Exception:
        release(e)
        raise


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("peel-ab")
    spark.sparkContext.setLogLevel("ERROR")

    from miningfrequentpattern_spark.queries.mining_pack import (
        _copurchase_counted_pairs,
    )

    def pairs():
        return (
            _copurchase_counted_pairs(spark, sf_dir)
            .filter(F.col("n_co") >= 2)
            .select("src", "dst")
        )

    def noop(df: DataFrame):
        df.write.format("noop").mode("overwrite").save()

    # equivalence first (exceptAll both directions, exact values)
    for name, old_fn, new_fn, key in (
        ("kcore k=3", lambda: old_kcore(pairs(), 3),
         lambda: kcore(pairs(), 3), ["id", "core_degree"]),
        ("ktruss k=3", lambda: old_ktruss(pairs(), 3),
         lambda: ktruss(pairs(), 3), ["s", "d", "support"]),
    ):
        a, b = old_fn().select(*key), new_fn().select(*key)
        d1, d2 = a.exceptAll(b).count(), b.exceptAll(a).count()
        print(f"{name} exceptAll diffs: {d1} / {d2}", flush=True)
        assert d1 == 0 and d2 == 0, name

    # interleaved timing
    for name, old_fn, new_fn in (
        ("kcore", lambda: old_kcore(pairs(), 3), lambda: kcore(pairs(), 3)),
        ("ktruss", lambda: old_ktruss(pairs(), 3), lambda: ktruss(pairs(), 3)),
    ):
        runs_o, runs_n = [], []
        for _ in range(4):
            t0 = time.perf_counter()
            noop(old_fn())
            runs_o.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            noop(new_fn())
            runs_n.append(time.perf_counter() - t0)
        print(
            f"{name}: old min {min(runs_o):.2f} {[round(r,2) for r in runs_o]}"
            f" | new min {min(runs_n):.2f} {[round(r,2) for r in runs_n]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
