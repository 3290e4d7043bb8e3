"""Per-source rank-calibrated quality gate
(operators/text.py::rank_calibrated_gate) — promoted round 6: the oracle moved verbatim onto the l47_calibrated_gate registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (keep the top 80%
of each SOURCE by type-token ratio — the cross-source calibration
l20's global deciles cannot do), plus strata-independence and
single-row-stratum hand checks."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.text import rank_calibrated_gate
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


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
