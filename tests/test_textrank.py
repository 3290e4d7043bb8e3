"""Composed TextRank keyword extraction —
PROMOTED round 7 as l53_textrank_keywords: the DuckDB oracle moved VERBATIM
into the @query registration (tests/test_oracle_parity.py now
carries the compare); the property/edge/hand pins stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators import text as T
from miningfrequentpattern_spark.operators.graph import pagerank

from .conftest import SF_ORACLE


def test_textrank_hub_word_outranks_leaves(spark):
    """A star vocabulary — 'core' adjacent to 6 distinct words, the
    leaves only ever adjacent to 'core' — must rank the hub first;
    a repeated word ('dup dup') contributes NO self-edge."""
    rows = [(1, f"core w{i}") for i in range(6)] + [(2, "dup dup")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = df.select(T.tokens("text").alias("t"))
    pairs = (
        toks.select(
            F.explode(
                T.shifted_pairs(
                    F.col("t"),
                    lambda a, b: F.struct(
                        F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
                    ),
                )
            ).alias("p")
        )
        .filter(F.col("p.a") != F.col("p.b"))
        .select(F.col("p.a").alias("src"), F.col("p.b").alias("dst"))
        .distinct()
    )
    edges = pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    got = {r["id"]: r["pagerank"] for r in pagerank(edges, 5).collect()}
    assert "dup" not in got  # self-pair dropped, no phantom node
    assert all(got["core"] > got[f"w{i}"] for i in range(6))


def test_textrank_top25_is_deterministic(spark):
    from miningfrequentpattern_spark.queries.registry import (
        QUERIES,
        load_all_packs,
    )

    load_all_packs()
    q = QUERIES["l53_textrank_keywords"]
    a = [tuple(r) for r in q(spark, SF_ORACLE).collect()]
    b = [tuple(r) for r in q(spark, SF_ORACLE).collect()]
    assert a == b and len(a) == 25
