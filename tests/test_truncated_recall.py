"""Matryoshka truncation recall
(operators/similarity.py::truncated_dim_recall) — PROMOTED round 8 as l56_truncated_recall: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the full-width-identity,
average-monotonicity, and bad-dims pins stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.similarity import (
    truncated_dim_recall,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE

def test_truncated_recall_full_width_is_one(spark):
    """Truncating to the FULL width is the identity: recall@k = 1.0
    for every query."""
    emb = load_table(spark, SF_ORACLE, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 10)
    out = truncated_dim_recall(q, emb, k=5, trunc_dims=(64,)).collect()
    assert out and all(r["recall_at_k"] == 1.0 for r in out)
    assert all(r["n_hits"] == 5 for r in out)


def test_truncated_recall_multiple_widths_monotone_on_average(spark):
    """Average recall should not DEGRADE as the kept width grows
    (16 -> 32 -> 64); per-query noise is allowed, the mean is not."""
    emb = load_table(spark, SF_ORACLE, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 20)
    out = truncated_dim_recall(
        q, emb, k=5, trunc_dims=(16, 32, 64)
    ).collect()
    by_dim = {}
    for r in out:
        by_dim.setdefault(r["trunc_dim"], []).append(r["recall_at_k"])
    means = {d: sum(v) / len(v) for d, v in by_dim.items()}
    assert set(means) == {16, 32, 64}
    assert means[16] <= means[32] + 1e-9 <= means[64] + 2e-9
    assert means[64] == 1.0


def test_truncated_recall_rejects_bad_dims(spark):
    import pytest

    emb = load_table(spark, SF_ORACLE, "embeddings")
    with pytest.raises(ValueError, match="trunc_dims"):
        truncated_dim_recall(emb, emb, trunc_dims=())
    with pytest.raises(ValueError, match="trunc_dims"):
        truncated_dim_recall(emb, emb, trunc_dims=(0,))
