"""Retrieval-quality metrics
(operators/similarity.py::ranking_metrics) — promoted round 6: the oracle moved verbatim onto the l46_quantized_recall registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps —
recall@5/MRR of the DETERMINISTIC int8-reconstruction tier against
the exact cosine ranking (the one ANN-family comparison that is
fully oracle-able: no KMeans, no LSH randomness — quantization is
pure arithmetic on both engines, the l24 parity), plus hand-built
metric-semantics cases."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.similarity import (
    cosine_topk_exact,
    ranking_metrics,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_ranking_metrics_hand_cases(spark):
    """q1: truth {a,b,c}, cand ranks (b@1, x@2, c@3) → 2 hits,
    recall 2/3, MRR 1. q2: nothing retrieved → 0s. q3: first hit at
    rank 3 → MRR 1/3. Items beyond k in either list are ignored."""
    truth = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3),
         (2, "z", 1),
         (3, "m", 1),
         (1, "deep", 9)],
        "query_id long, neighbor_id string, rank long",
    )
    cand = spark.createDataFrame(
        [(1, "b", 1), (1, "x", 2), (1, "c", 3),
         (3, "n", 1), (3, "o", 2), (3, "m", 3),
         (1, "a", 8)],
        "query_id long, neighbor_id string, rank long",
    )
    got = {
        r["query_id"]: (
            r["n_relevant"], r["n_hits"], r["recall_at_k"], r["mrr"]
        )
        for r in ranking_metrics(cand, truth, k=3).collect()
    }
    assert got[1] == (3, 2, 0.6667, 1.0)
    assert got[2] == (1, 0, 0.0, 0.0)
    assert got[3] == (1, 1, 1.0, 0.3333)


def test_ranking_metrics_empty(spark):
    empty = spark.createDataFrame(
        [], "query_id long, neighbor_id string, rank long"
    )
    assert ranking_metrics(empty, empty, k=5).count() == 0
