"""Matryoshka truncation recall
(operators/similarity.py::truncated_dim_recall) — round-8 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL the future l56_truncated_recall registration will carry
(recall@5 of 16-dim-truncated exact search vs full 64-dim exact
search over the embeddings fixture), plus identity/degenerate pins.
Fully deterministic (both rankings order by rounded-cosine DESC,
neighbor id), so unlike the ANN family this one is hash-oracle-able."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.similarity import (
    truncated_dim_recall,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future l56 oracle, verbatim — two l03-shaped ranked top-5 CTEs
# (full vectors; first-16-dim slices) and a per-query overlap count.
L56_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 20),
fp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_sum(list_transform(list_zip(q.v, c.v),
                                       s -> s[1]*s[2]))
               / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x*x)))), 4)
           AS cs
  FROM q JOIN e c ON c.vec_id != q.vec_id),
f5 AS (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cs DESC, neighbor_id) AS r
       FROM fp QUALIFY r <= 5),
tp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_sum(list_transform(list_zip(q.v[1:16], c.v[1:16]),
                                       s -> s[1]*s[2]))
               / (sqrt(list_sum(list_transform(q.v[1:16], x -> x*x)))
                  * sqrt(list_sum(list_transform(c.v[1:16], x -> x*x)))),
               4) AS cs
  FROM q JOIN e c ON c.vec_id != q.vec_id),
t5 AS (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cs DESC, neighbor_id) AS r
       FROM tp QUALIFY r <= 5)
SELECT CAST(16 AS INT) AS trunc_dim,
       f.query_id,
       CAST(count(t.neighbor_id) AS BIGINT) AS n_hits,
       round(count(t.neighbor_id) * 1.0 / count(*), 4) AS recall_at_k
FROM f5 f LEFT JOIN t5 t
  ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
GROUP BY f.query_id
"""


def _l56(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 20)
    return truncated_dim_recall(q, emb, k=5, trunc_dims=(16,))


def test_truncated_recall_matches_duckdb_oracle(spark, duck):
    compare(_l56(spark, SF_ORACLE), duck, L56_ORACLE)


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
