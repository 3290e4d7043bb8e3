"""Retrieval-quality metrics
(operators/similarity.py::ranking_metrics) — round-6 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL a future l46_quantized_recall registration will carry —
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

# Future l46 oracle, verbatim. truth = l03's exact top-5 CTE; cand =
# the same ranking over int8-RECONSTRUCTED vectors (l24's
# scale/round arithmetic, bit-stable cross-engine); both rank on the
# 4dp-rounded similarity with an id tiebreak (the l03 pin), so the
# top-5 SETS are engine-identical and the metrics hash exactly.
L46_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
recon AS (
  SELECT vec_id,
         list_transform(
           list_transform(v, x -> round(
             x / (list_max(list_transform(v, y -> abs(y))) / 127.0))),
           q -> q * (list_max(list_transform(v, y -> abs(y))) / 127.0))
           AS rv
  FROM e),
q AS (SELECT * FROM e WHERE vec_id < 20),
tp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_sum(list_transform(list_zip(q.v, c.v), s -> s[1]*s[2]))
               / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x*x)))), 4)
           AS cos_sim
  FROM q JOIN e c ON c.vec_id != q.vec_id),
truth AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rnk
  FROM tp QUALIFY rnk <= 5),
cp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_sum(list_transform(list_zip(q.v, c.rv), s -> s[1]*s[2]))
               / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(c.rv, x -> x*x)))), 4)
           AS cos_sim
  FROM q JOIN recon c ON c.vec_id != q.vec_id),
cand AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rnk
  FROM cp QUALIFY rnk <= 5)
SELECT t.query_id, count(*) AS n_relevant,
       CAST(count(c.rnk) AS BIGINT) AS n_hits,
       round(count(c.rnk) * 1.0 / count(*), 4) AS recall_at_k,
       round(coalesce(1.0 / min(c.rnk), 0.0), 4) AS mrr
FROM truth t LEFT JOIN cand c
  ON t.query_id = c.query_id AND t.neighbor_id = c.neighbor_id
GROUP BY t.query_id
"""


def _l46(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(x))) / F.lit(
        127.0
    )
    recon = emb.select(
        "vec_id",
        F.transform(
            F.transform("embedding", lambda x: F.round(x / scale)),
            lambda q: q * scale,
        ).alias("embedding"),
    )
    queries_df = emb.filter(F.col("vec_id") < 20).limit(20)
    truth = cosine_topk_exact(queries_df, emb, k=5)
    cand = cosine_topk_exact(queries_df, recon, k=5)
    return ranking_metrics(cand, truth, k=5)


def test_quantized_recall_matches_duckdb_oracle(spark, duck):
    compare(_l46(spark, SF_ORACLE), duck, L46_ORACLE)


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
