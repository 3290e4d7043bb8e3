"""STAGED round-12 candidate: a full value-hash DuckDB oracle for the
l03b RP-LSH pipeline (registry booking (o), round 11).

Since the r6 native rewrite, ann_lsh_topk's randomness is a
deterministic function of seed 42: the projection directions are
numpy-seeded LITERAL arrays baked into the plan, bucket ids are
floor(dot/bucket_length) over sequential-fold dot products, and
candidate generation + rerank are deterministic joins/ranks. Every
float step has an exact DuckDB twin:

- norm / dot are `F.aggregate(..., 0.0, acc + x)` sequential folds —
  mirrored by `list_reduce(list_prepend(0.0, ...), (a, b) -> a + b)`
  (the l60/l04d bit-parity argument);
- normalization divides element-wise (exactly rounded IEEE on both);
- bucket_length = 0.5 is a power of two, so dot/0.5 is exact and
  floor() agrees wherever the dots are bit-identical;
- the rerank cosine is round4-pinned with the id tiebreak (the l03
  stance), so the top-k SETS are engine-identical.

ONE precondition the current l03b registration does NOT meet: the
fold must run on array<double>. The fixture embedding is
array<float>, and Spark's `v * v` on FloatType multiplies in float32
before the double accumulate, which no portable SQL reproduces — so
the r12 promotion must add `.cast("array<double>")` at the query
boundary (the l03/l02d convention) alongside this oracle. The test
certifies exactly that future shape: ann_lsh_topk over the
double-cast fixture vs this generated SQL, value-for-value.

Promotion flow (the r5-r7 staging pattern): move
`ann_lsh_oracle_sql()` verbatim into queries/llm_pack.py on the l03b
registration (with the double cast) once a rotation slot re-certifies
it — registry.py ROUND 12 BOOKED (o).
"""

from __future__ import annotations

import numpy as np

from .conftest import SF_ORACLE
from .oracle import compare


def ann_lsh_oracle_sql(
    k: int = 5,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
    dim: int = 64,
    max_query_id: int = 20,
    admission_floor: float = 0.28,
) -> str:
    """Generate the all-in-SQL RP-LSH oracle over the `embeddings`
    view with the operator's OWN seeded projections interpolated at
    full repr precision (the _l60_oracle pattern)."""
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((num_hash_tables, dim))
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)

    fold = "list_reduce(list_prepend(0.0, {terms}), (a, b) -> a + b)"
    sq = fold.format(terms="list_transform(v, x -> x * x)")
    bucket_arms = []
    for t, d in enumerate(proj):
        lits = ", ".join(repr(float(x)) for x in d)
        dott = fold.format(
            terms=f"list_transform(list_zip(u, [{lits}]),"
            " s -> s[1] * s[2])"
        )
        bucket_arms.append(
            f"SELECT vec_id, {t} AS t,\n"
            f"       CAST(floor(({dott}) / {bucket_length!r}) AS BIGINT)"
            f" AS h\nFROM nv"
        )
    buckets = "\nUNION ALL\n".join(bucket_arms)
    dot_vv = fold.format(
        terms="list_transform(list_zip(q.v, c.v), s -> s[1] * s[2])"
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE embedding IS NOT NULL),
    n AS (SELECT vec_id, v, sqrt({sq}) AS nrm FROM e),
    nv AS (SELECT vec_id, v,
             list_transform(
               v, x -> x / CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END) AS u
           FROM n),
    b AS ({buckets}),
    cand AS (
      SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
      FROM b qb JOIN b cb ON qb.t = cb.t AND qb.h = cb.h
      WHERE qb.vec_id < {max_query_id}
        AND qb.vec_id != cb.vec_id),
    scored AS (
      -- q.nrm/c.nrm are the SAME sequential folds cosine() recomputes
      -- from the raw vectors, so reusing them is value-identical
      SELECT cand.query_id, cand.neighbor_id,
             round(CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
                        ELSE ({dot_vv}) / (q.nrm * c.nrm) END,
                   4) + 0.0 AS cos_sim
      FROM cand
      JOIN n q ON q.vec_id = cand.query_id
      JOIN n c ON c.vec_id = cand.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id)
               AS rank
      FROM scored WHERE cos_sim >= {admission_floor!r})
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def test_ann_lsh_oracle_matches_double_cast_operator(spark, duck):
    """The staged r12 shape: ann_lsh_topk over the DOUBLE-cast fixture
    embeddings hash-matches the generated all-in-SQL oracle —
    certifying projections, normalization, bucket floors, candidate
    set, admission floor, and ranking value-for-value."""
    from pyspark.sql import functions as F

    from miningfrequentpattern_spark.operators.similarity import (
        ann_lsh_topk,
    )
    from miningfrequentpattern_spark.sources.io import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries_df = emb.filter(F.col("vec_id") < 20)
    got = ann_lsh_topk(queries_df, emb, k=5, seed=42, dim=64)
    compare(got, duck, ann_lsh_oracle_sql())
