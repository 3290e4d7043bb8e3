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

PROMOTED round 12: the generator moved verbatim into
queries/llm_pack.py (`_l03b_ann_lsh_oracle_sql`, now the registered
l03b oracle) and the registration gained the double cast; this test
imports the production generator so the certification can't drift
from what ships.
"""

from __future__ import annotations

import numpy as np

from .conftest import SF_ORACLE
from .oracle import compare


from miningfrequentpattern_spark.queries.llm_pack import (  # noqa: E402
    _l03b_ann_lsh_oracle_sql as ann_lsh_oracle_sql,
)


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
