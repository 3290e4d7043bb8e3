"""Component probe for r76_robust_trend (optimization r11, second
session): time each leg of theil_sen_trend in isolation with the noop
sink, so the next change targets the measured cost center instead of
a guess (guide §1.1).

Legs at sf0.1 (min-of-3 each, one warm session):
  A. base daily aggregate alone (the pinned input materialization)
  B. pair join -> slopes rows alone (no aggregate)
  C. slopes -> groupBy(percentile) (the med relation)
  D. full operator (current form)
  E. full operator, window-rank median variant (if --variant)

Run: python scripts/theil_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from miningfrequentpattern_spark.session import get_session
from miningfrequentpattern_spark.sources.io import load_table

SF_DIR = "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, build, n=3):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        noop(build())
        runs.append(time.perf_counter() - t0)
    print(f"{label:50s} min {min(runs):.3f}  runs {[round(r,3) for r in runs]}")
    return min(runs)


def daily(spark):
    return (
        load_table(spark, SF_DIR, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .select(
            "priority",
            F.datediff("day", F.lit("1970-01-01")).cast("double").alias("t"),
            "n",
        )
    )


def build_base(spark):
    df = daily(spark)
    t = F.col("t").cast("double")
    x = F.col("n").cast("double")
    return df.filter(t.isNotNull() & x.isNotNull()).select(
        "priority", t.alias("_t"), x.alias("_x")
    )


def build_slopes(base):
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.priority").eqNullSafe(F.col("b.priority")) & (
        F.col("a._t") < F.col("b._t")
    )
    return a.join(b, cond).select(
        F.col("a.priority").alias("priority"),
        (
            (F.col("b._x") - F.col("a._x"))
            / (F.col("b._t") - F.col("a._t"))
        ).alias("_s"),
    )


def med_percentile(spark):
    base = build_base(spark).localCheckpoint(eager=False)
    return build_slopes(base).groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.percentile("_s", F.lit(0.5)).alias("_slope"),
    )


def main():
    spark = get_session("theil-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm
    noop(daily(spark))

    timed("A base daily agg", lambda: build_base(spark))

    def slopes_only():
        base = build_base(spark).localCheckpoint(eager=False)
        return build_slopes(base)

    timed("B slopes rows (pair join)", slopes_only)

    def med_windowrank():
        from pyspark.sql import Window

        base = build_base(spark).localCheckpoint(eager=False)
        slopes = build_slopes(base)
        w = Window.partitionBy("priority").orderBy("_s")
        wcnt = w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        idx = (F.col("_n") - F.lit(1)) * F.lit(0.5)
        ranked = (
            slopes.withColumn("_rn", F.row_number().over(w))
            .withColumn("_n", F.count(F.lit(1)).over(wcnt))
            .withColumn("_lo", F.floor(idx))
            .withColumn("_hi", F.ceil(idx))
            .filter(
                (F.col("_rn") == F.col("_lo") + 1)
                | (F.col("_rn") == F.col("_hi") + 1)
            )
        )
        pos = (F.col("_n") - F.lit(1)) * F.lit(0.5)
        vlo = F.min(F.when(F.col("_rn") == F.col("_lo") + 1, F.col("_s")))
        vhi = F.max(F.when(F.col("_rn") == F.col("_hi") + 1, F.col("_s")))
        return ranked.groupBy("priority").agg(
            F.first("_n").alias("n_pairs"),
            F.when(
                F.first("_lo") == F.first("_hi"), vlo
            ).otherwise(
                (F.first("_hi") - F.first(pos)) * vlo
                + (F.first(pos) - F.first("_lo")) * vhi
            ).alias("_slope"),
        )

    def med_freq_percentile():
        base = build_base(spark).localCheckpoint(eager=False)
        vc = (
            build_slopes(base)
            .groupBy("priority", "_s")
            .agg(F.count(F.lit(1)).alias("_f"))
        )
        return vc.groupBy("priority").agg(
            F.sum("_f").alias("n_pairs"),
            F.percentile("_s", F.lit(0.5), F.col("_f")).alias("_slope"),
        )

    # Interleaved A/B/C (the box oscillates: alternate forms so a slow
    # window hits all; min-of-N per form is the estimator).
    runs_a, runs_b, runs_c = [], [], []
    for _ in range(6):
        t0 = time.perf_counter()
        noop(med_percentile(spark))
        runs_a.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        noop(med_windowrank())
        runs_b.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        noop(med_freq_percentile())
        runs_c.append(time.perf_counter() - t0)
    print(
        f"C  med percentile   min {min(runs_a):.3f} "
        f"{[round(r, 2) for r in runs_a]}"
    )
    print(
        f"C' med window-rank  min {min(runs_b):.3f} "
        f"{[round(r, 2) for r in runs_b]}"
    )
    print(
        f"C'' med freq-perc   min {min(runs_c):.3f} "
        f"{[round(r, 2) for r in runs_c]}"
    )
    # dedup factor: distinct slope values vs pair rows
    base = build_base(spark).localCheckpoint(eager=False)
    sl = build_slopes(base)
    n_all = sl.count()
    n_dist = sl.distinct().count()
    print(f"slope rows {n_all}  distinct (priority,_s) {n_dist}")

    # equivalence spot-check of the two med forms (exact, pre-round)
    a = med_percentile(spark).select(
        "priority", "n_pairs", F.col("_slope").alias("s")
    )
    b = med_windowrank().select(
        "priority", "n_pairs", F.col("_slope").alias("s")
    )
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(f"med equivalence exceptAll diffs (exact doubles): {d1} / {d2}")


if __name__ == "__main__":
    main()
