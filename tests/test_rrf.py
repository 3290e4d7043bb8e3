"""Reciprocal-rank fusion (operators/similarity.py::rrf_fuse) —
promoted round 6: the oracle moved verbatim onto the l49_hybrid_rrf registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (per-source fusion of the l48 BM25 ranking with a type-token-
ratio quality ranking — the lexical+quality hybrid), plus
closed-form rank arithmetic and missing-item hand pins."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.similarity import rrf_fuse
from miningfrequentpattern_spark.operators.text import bm25_scores
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


QUERY_TERMS = ["scan", "merge", "window", "stream"]


def test_rrf_closed_form_and_missing_items(spark):
    """Run A ranks x > y; run B ranks y > z (x missing). Fused:
    x = 1/61 (one run), y = 1/62 + 1/61, z = 1/62."""
    a = spark.createDataFrame(
        [("q", "x", 9.0), ("q", "y", 1.0)], "k string, id string, score double"
    )
    b = spark.createDataFrame(
        [("q", "y", 5.0), ("q", "z", 2.0)], "k string, id string, score double"
    )
    got = {
        r["id"]: (r["n_runs"], r["rrf_score"])
        for r in rrf_fuse([a, b], ["k"], "id", "score").collect()
    }
    assert got["x"] == (1, round(1 / 61, 4))
    assert got["y"] == (2, round(1 / 62 + 1 / 61, 4))
    assert got["z"] == (1, round(1 / 62, 4))


def test_rrf_tiebreak_is_deterministic(spark):
    """Equal scores rank by id ascending: 'a' gets rank 1 in BOTH
    permutations of the input."""
    for rows in (
        [("q", "b", 1.0), ("q", "a", 1.0)],
        [("q", "a", 1.0), ("q", "b", 1.0)],
    ):
        run = spark.createDataFrame(rows, "k string, id string, score double")
        got = {
            r["id"]: r["rrf_score"]
            for r in rrf_fuse([run, run], ["k"], "id", "score").collect()
        }
        assert got["a"] == round(2 / 61, 4)
        assert got["b"] == round(2 / 62, 4)


def test_rrf_rejects_bad_args(spark):
    import pytest

    run = spark.createDataFrame([("q", "a", 1.0)], "k string, id string, score double")
    with pytest.raises(ValueError):
        rrf_fuse([run], ["k"], "id", "score")
    with pytest.raises(ValueError):
        rrf_fuse([run, run], ["k"], "id", "score", k=0)
