"""Per-source rank-calibrated quality gate
(operators/text.py::rank_calibrated_gate) — round-6 window candidate,
locally certified NOW: the DuckDB oracle below is the exact SQL a
future l47_calibrated_gate registration will carry (keep the top 80%
of each SOURCE by type-token ratio — the cross-source calibration
l20's global deciles cannot do), plus strata-independence and
single-row-stratum hand checks."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.text import rank_calibrated_gate
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future l47 oracle, verbatim. Dialect pins: percent_rank is
# (rank−1)/(n−1) in both engines; best-first ordering (score DESC,
# doc_id ASC) is a total order (0 = best, keep pr <= 0.8); the
# distinct-ratio score reuses the certified l06-family string_split
# arithmetic under the single-space fixture invariant.
L47_ORACLE = """
WITH s AS (
  SELECT doc_id, source,
         round(len(list_distinct(string_split(trim(text), ' '))) * 1.0
               / len(string_split(trim(text), ' ')), 4) AS ttr
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
r AS (
  SELECT doc_id, source, ttr,
         percent_rank() OVER (PARTITION BY source
                              ORDER BY ttr DESC, doc_id) AS pr
  FROM s)
SELECT doc_id, source, ttr, round(pr, 4) AS pct_rank,
       pr <= 0.8 AS is_kept
FROM r
"""


def _l47(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select(
            "doc_id",
            "source",
            F.round(
                F.size(F.array_distinct(F.split(F.trim("text"), " ")))
                / F.size(F.split(F.trim("text"), " ")),
                4,
            ).alias("ttr"),
        )
    )
    return rank_calibrated_gate(
        docs, ["source"], "ttr", keep_frac=0.8, tiebreak_col="doc_id"
    )


def test_calibrated_gate_matches_duckdb_oracle(spark, duck):
    compare(_l47(spark, SF_ORACLE), duck, L47_ORACLE)


def test_calibrated_gate_strata_are_independent(spark):
    """A strict source whose scores all run low must still keep its
    top fraction — the whole point vs a global threshold. Source A
    scores 1..10, source B scores 101..110; keep_frac=0.3 keeps the
    top 3 of EACH."""
    rows = [("A", i, float(i)) for i in range(1, 11)] + [
        ("B", 100 + i, float(100 + i)) for i in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "src string, doc_id long, s double")
    got = rank_calibrated_gate(
        df, ["src"], "s", keep_frac=0.3, tiebreak_col="doc_id"
    )
    kept = {
        (r["src"], r["doc_id"])
        for r in got.filter(F.col("is_kept")).collect()
    }
    assert kept == {("A", 8), ("A", 9), ("A", 10),
                    ("B", 108), ("B", 109), ("B", 110)}


def test_calibrated_gate_single_row_stratum_kept(spark):
    df = spark.createDataFrame(
        [("solo", 1, 0.5)], "src string, doc_id long, s double"
    )
    got = rank_calibrated_gate(
        df, ["src"], "s", keep_frac=0.1, tiebreak_col="doc_id"
    ).collect()[0]
    assert got["pct_rank"] == 0.0 and got["is_kept"] is True


def test_calibrated_gate_rejects_bad_frac(spark):
    import pytest

    df = spark.createDataFrame([("a", 1, 1.0)], "src string, doc_id long, s double")
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            rank_calibrated_gate(df, ["src"], "s", bad, "doc_id")
