"""A/B equivalence check for the r11 emerging_pair_patterns rewrite:
the OLD formulation (per-period DISTINCT-postings self-join + pair
full-outer, inlined verbatim below) vs the NEW union-tagged
collect_set expansion, compared with exceptAll BOTH directions at
every SF — zero diff rows required."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F


def old_emerging(
    before: DataFrame,
    after: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
) -> DataFrame:
    def _postings(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
            )
            .filter(F.col("bk").isNotNull() & F.col("it").isNotNull())
            .distinct()
        )

    def _pairs(iu: DataFrame, out: str) -> DataFrame:
        a, b = iu.alias("a"), iu.hint("shuffle_hash").alias("b")
        return (
            a.join(
                b,
                (F.col("a.bk") == F.col("b.bk"))
                & (F.col("a.it") < F.col("b.it")),
            )
            .groupBy(
                F.col("a.it").alias("item_a"), F.col("b.it").alias("item_b")
            )
            .agg(F.count(F.lit(1)).alias(out))
        )

    iu_b, iu_a = _postings(before), _postings(after)
    nb = iu_b.agg(F.countDistinct("bk").alias("_n_before"))
    na = iu_a.agg(F.countDistinct("bk").alias("_n_after"))
    joined = (
        _pairs(iu_b, "n_before")
        .join(_pairs(iu_a, "n_after"), ["item_a", "item_b"], "full_outer")
        .select(
            "item_a",
            "item_b",
            F.coalesce("n_before", F.lit(0)).alias("n_before"),
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
        )
        .filter(
            (F.col("n_before") >= min_count)
            | (F.col("n_after") >= min_count)
        )
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(na))
    )
    sup_b = F.col("n_before") * 1.0 / F.col("_n_before")
    sup_a = F.col("n_after") * 1.0 / F.col("_n_after")
    return joined.select(
        "item_a",
        "item_b",
        "n_before",
        "n_after",
        F.round(sup_b, 4).alias("support_before"),
        F.round(sup_a, 4).alias("support_after"),
        F.round(
            F.when(F.col("n_before") > 0, sup_a / sup_b), 4
        ).alias("growth"),
        (F.col("n_before") == 0).alias("is_new"),
    )


def _m27_inputs(spark, sf_dir):
    from miningfrequentpattern_spark.sources.io import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    tagged = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        "l_orderkey",
        "l_partkey",
        (
            F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
        ).alias("late"),
    )
    return tagged.filter(~F.col("late")), tagged.filter(F.col("late"))


if __name__ == "__main__":
    from miningfrequentpattern_spark.operators.mining import (
        emerging_pair_patterns,
    )
    from miningfrequentpattern_spark.session import get_session

    spark = get_session("emerging-ab")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        b, a = _m27_inputs(spark, d)
        old = old_emerging(b, a, "l_orderkey", "l_partkey", 2)
        new = emerging_pair_patterns(b, a, "l_orderkey", "l_partkey", 2)
        extra = new.exceptAll(old).count()
        missing = old.exceptAll(new).count()
        n = new.count()
        print(f"{sf}: rows={n} extra={extra} missing={missing}")
        assert extra == 0 and missing == 0, sf
    print("A/B OK: identical at every SF")
