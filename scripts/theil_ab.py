"""A/B equivalence check for the r11 theil_sen_trend rewrite: the OLD
self-join + percentile formulation (inlined verbatim below) vs the new
grouped-map operator, compared value-for-value (bitwise on the rounded
outputs, which is what the driver hashes) on the r76 input at every SF.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F

from miningfrequentpattern_spark.functions.rounding import round4


def old_theil(df: DataFrame, keys, t_col, value_col) -> DataFrame:
    t = F.col(t_col).cast("double")
    x = F.col(value_col).cast("double")
    base = df.filter(t.isNotNull() & x.isNotNull()).select(
        *keys, t.alias("_t"), x.alias("_x")
    )
    a, b = base.alias("a"), base.alias("b")
    cond = None
    for g in keys:
        c = F.col(f"a.{g}").eqNullSafe(F.col(f"b.{g}"))
        cond = c if cond is None else cond & c
    cond = cond & (F.col("a._t") < F.col("b._t"))
    slopes = a.join(b, cond).select(
        *[F.col(f"a.{g}") for g in keys],
        ((F.col("b._x") - F.col("a._x")) / (F.col("b._t") - F.col("a._t"))).alias("_s"),
    )
    med = slopes.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.percentile("_s", F.lit(0.5)).alias("_slope"),
    )
    for g in keys:
        med = med.withColumnRenamed(g, f"_m_{g}")
    jcond = None
    for g in keys:
        c = F.col(g).eqNullSafe(F.col(f"_m_{g}"))
        jcond = c if jcond is None else jcond & c
    joined = base.join(F.broadcast(med), jcond, "left").drop(
        *[f"_m_{g}" for g in keys]
    )
    return joined.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.coalesce(F.first("n_pairs"), F.lit(0)).alias("n_pairs"),
        round4(F.first("_slope")).alias("sen_slope"),
        round4(
            F.percentile(F.col("_x") - F.col("_slope") * F.col("_t"), F.lit(0.5))
        ).alias("sen_intercept"),
    )


def daily(spark, sf_dir):
    from miningfrequentpattern_spark.sources.io import load_table

    return (
        load_table(spark, sf_dir, "orders")
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


def main() -> None:
    import struct

    from miningfrequentpattern_spark.operators.timeseries import theil_sen_trend
    from miningfrequentpattern_spark.session import get_session

    spark = get_session("theil-ab")
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    for sf in ("0.001", "0.01", "0.1"):
        d = daily(spark, f"/root/testdata/sf{sf}")
        old = {
            r["priority"]: r for r in old_theil(d, ["priority"], "t", "n").collect()
        }
        new = {
            r["priority"]: r
            for r in theil_sen_trend(d, ["priority"], "t", "n").collect()
        }
        assert set(old) == set(new), (sf, set(old) ^ set(new))
        for k in old:
            o, n = old[k], new[k]
            for c in ("n_obs", "n_pairs"):
                assert o[c] == n[c], (sf, k, c, o[c], n[c])
            for c in ("sen_slope", "sen_intercept"):
                ob = struct.pack("<d", o[c]) if o[c] is not None else None
                nb = struct.pack("<d", n[c]) if n[c] is not None else None
                if ob != nb:
                    ok = False
                    print(f"MISMATCH sf{sf} {k} {c}: {o[c]!r} vs {n[c]!r}")
        print(f"sf{sf}: {len(old)} series compared — bitwise equal")
    print("A/B", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
