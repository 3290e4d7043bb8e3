"""Similarity search over embedding columns (SURVEY.md §2.4 L3).

Two tiers, same output contract (query_id, neighbor_id, cos_sim, rank):

- `cosine_topk_exact`: brute force — query set × corpus cross join with
  the native-expression cosine, per-query top-k window. Correctness
  baseline and perfectly fine when |queries| is small (the common
  "probe a corpus" case): the corpus side streams, nothing collects.
- `ann_lsh_topk`: BucketedRandomProjectionLSH (random hyperplane
  projection, euclidean buckets). On unit-normalized vectors,
  euclidean distance is monotone in cosine (d² = 2 - 2cos), so
  bucketing by euclidean LSH IS cosine ANN. This is the 100 TB path:
  candidate generation touches only same-bucket pairs.

An IVF variant (KMeans coarse quantizer → per-centroid shortlists)
would slot in identically; RP-LSH is preferred here because it needs
no training pass over the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, l2_normalize


def cosine_topk_exact(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Excludes self-matches (same id). Deterministic tiebreak on
    neighbor id. The corpus side is broadcast only if Spark deems it
    small; the join is a crossJoin so AQE cannot help — keep |queries|
    bounded (that's the operator's contract, documented here).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    sim = F.round(cosine(F.col("_qv"), F.col("_cv")), 4)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via random-projection LSH.

    Vectors are L2-normalized first so euclidean LSH ≡ cosine ANN.
    Re-ranks LSH candidates with the exact cosine, so results are a
    subset of the exact operator's (recall < 1, precision = 1 on the
    returned pairs). Seeded → deterministic, but registered rows-only.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    def prep(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            l2_normalize(vec_col).alias("_arr"),
        ).withColumn("_v", array_to_vector("_arr"))

    q = prep(queries, "query_id")
    c = prep(corpus, "neighbor_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v",
        outputCol="_h",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(c)
    # Euclidean threshold 1.2 on unit vectors ≡ cosine ≥ 1 - 1.2²/2 = 0.28.
    cand = lsh.approxSimilarityJoin(q, c, 1.2, distCol="_d")
    sim = F.round(
        1 - F.col("_d") * F.col("_d") / 2, 4
    )  # cos = 1 - d²/2 on unit vectors
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        cand.select(
            F.col("datasetA.query_id").alias("query_id"),
            F.col("datasetB.neighbor_id").alias("neighbor_id"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
