"""A/B equivalence + timing for the r11 assume_canonical contract on
the undirected graph operators (m14 triangle counts, m17 clustering
coefficient, m28 LPA): operator with the full normalize dedup vs the
rename-only canonical path, on the registered _copurchase_pairs
input, exceptAll both directions per SF, then interleaved timing.

Run: python scripts/canonical_ab.py [sf_dir ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame

from miningfrequentpattern_spark.operators.graph import (
    clustering_coefficient, label_propagation, triangle_counts,
)
from miningfrequentpattern_spark.session import get_session


def main():
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_session("canonical-ab")
    spark.sparkContext.setLogLevel("ERROR")

    from miningfrequentpattern_spark.queries.mining_pack import (
        _copurchase_pairs,
    )

    def noop(df: DataFrame):
        df.write.format("noop").mode("overwrite").save()

    ops = (
        ("triangle_counts", lambda p, ac: triangle_counts(
            p, assume_canonical=ac)),
        ("clustering_coeff", lambda p, ac: clustering_coefficient(
            p, assume_canonical=ac)),
        ("label_propagation", lambda p, ac: label_propagation(
            p, iterations=3, assume_canonical=ac)),
    )
    for sf_dir in dirs:
        for name, fn in ops:
            a = fn(_copurchase_pairs(spark, sf_dir), False)
            b = fn(_copurchase_pairs(spark, sf_dir), True)
            d1, d2 = a.exceptAll(b).count(), b.exceptAll(a).count()
            print(f"{sf_dir} {name}: exceptAll {d1} / {d2}", flush=True)
            assert d1 == 0 and d2 == 0, (sf_dir, name)

    # interleaved timing at the benched SF (LPA = the headline m28)
    sf_dir = dirs[-1]
    for name, fn in ops:
        runs_o, runs_n = [], []
        for _ in range(4):
            t0 = time.perf_counter()
            noop(fn(_copurchase_pairs(spark, sf_dir), False))
            runs_o.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            noop(fn(_copurchase_pairs(spark, sf_dir), True))
            runs_n.append(time.perf_counter() - t0)
        print(
            f"{name}: normalize min {min(runs_o):.2f} "
            f"{[round(r,2) for r in runs_o]} | canonical min "
            f"{min(runs_n):.2f} {[round(r,2) for r in runs_n]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
