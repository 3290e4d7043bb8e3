"""Per-benchmark contamination attribution
(operators/dedup.py::decontaminate_attribution) —
PROMOTED round 7 as l54_contamination_attribution: the DuckDB oracle moved VERBATIM
into the @query registration (tests/test_oracle_parity.py now
carries the compare); the property/edge/hand pins stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators import text as T
from miningfrequentpattern_spark.operators.dedup import (
    decontaminate_attribution,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE

def test_contamination_attr_closed_form(spark):
    """Train doc sharing 2 of its 3 shingles with suite X and 1 with
    suite Y: two rows, X is_top; a clean doc is ABSENT (the broadcast
    join is the filter); suite-name tiebreak on equal hits."""
    train = spark.createDataFrame(
        [(1, "a b c d e"),      # shingles: abc, bcd, cde
         (2, "zz yy xx ww")],   # clean
        "doc_id long, text string",
    ).withColumn("tokens", T.tokens("text"))
    bench = spark.createDataFrame(
        [(100, "X", "a b c d"),     # abc, bcd -> 2 hits on doc 1
         (101, "Y", "c d e f")],    # cde -> 1 hit on doc 1
        "doc_id long, bench string, text string",
    ).withColumn("tokens", T.tokens("text"))
    got = {
        (r["doc_id"], r["benchmark"]): (
            r["n_shingles"], r["n_hit_shingles"], r["hit_frac"], r["is_top"]
        )
        for r in decontaminate_attribution(
            train, bench, "bench", n=3
        ).collect()
    }
    assert got == {
        (1, "X"): (3, 2, round(2 / 3, 4), True),
        (1, "Y"): (3, 1, round(1 / 3, 4), False),
    }
    # equal hits -> suite-name ascending wins is_top
    bench2 = spark.createDataFrame(
        [(100, "B", "a b c z"), (101, "A", "a b c q")],
        "doc_id long, bench string, text string",
    ).withColumn("tokens", T.tokens("text"))
    got2 = {
        r["benchmark"]: r["is_top"]
        for r in decontaminate_attribution(
            train, bench2, "bench", n=3
        ).collect()
    }
    assert got2 == {"A": True, "B": False}


def test_contamination_attr_agrees_with_single_pool(spark):
    """Summed per-suite DISTINCT hits can overcount a shingle shared
    by several suites, but the PER-DOC contaminated set must equal
    l31's single-pool operator exactly — attribution refines, never
    adds or drops docs."""
    from miningfrequentpattern_spark.operators.dedup import (
        decontaminate_frac,
    )

    docs = load_table(spark, SF_ORACLE, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    bench = docs.filter(F.col("doc_id") % 40 == 0).withColumn(
        "bench",
        F.when(F.col("doc_id") % 80 == 0, F.lit("benchA")).otherwise(
            F.lit("benchB")
        ),
    )
    train = docs.filter(F.col("doc_id") % 40 != 0)
    attributed = {
        r["doc_id"]
        for r in decontaminate_attribution(train, bench, "bench", n=3)
        .select("doc_id").distinct().collect()
    }
    pooled = {
        r["doc_id"]
        for r in decontaminate_frac(
            train, bench, n=3, min_frac=0.5
        ).collect()
    }
    assert pooled == attributed
