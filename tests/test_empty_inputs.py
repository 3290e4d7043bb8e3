"""Empty-input safety sweep: every registered query must RUN (not
crash) when every fixture table is empty — the schemas are real, the
row counts are zero.

Why this is a first-class contract at 100 TB: empty relations are
routine in production (a filter that matches nothing, a new partition
before data lands, a replayed day with no events), and the failure
mode this sweep guards against is a CRASHED pipeline stage, not a
wrong answer. Historical catches, each fixed at the operator level:
MLlib LSH/KMeans `.fit` throws on empty datasets (ann_lsh_topk,
ivf_topk, semantic_neardup_pairs now short-circuit to their empty
output contract), and schema-inferred reads of an empty round-trip
directory throw UNABLE_TO_INFER_SCHEMA (s04/s05/s08 now carry the
writer's schema through the read)."""

import tempfile

import pytest

from miningfrequentpattern_spark.queries.registry import (
    QUERIES,
    load_all_packs,
)

from .conftest import SF_SMOKE

load_all_packs()

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def empty_sf_dir(spark):
    """Fixture dir with every table present but zero rows (real
    schemas copied from the smoke fixtures)."""
    tmp = tempfile.mkdtemp(prefix="empty_sf_")
    for t in TABLES:
        (
            spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
            .limit(0)
            .write.mode("overwrite")
            .parquet(f"{tmp}/{t}.parquet")
        )
    return tmp


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_inputs(spark, empty_sf_dir, name):
    # Any row count is fine (constant-producing queries may emit
    # rows from literals); the contract is "no crash".
    assert QUERIES[name](spark, empty_sf_dir).count() >= 0


# ~10% of values nulled per column, deterministically by key hash.
# Keys stay intact (a null join key is a data-model violation; null
# PAYLOAD values are everyday reality).
NULLABLE = {
    "documents": ["text", "lang", "source"],
    "embeddings": ["embedding", "label"],
    "events": ["event_type"],
    "orders": ["o_orderpriority", "o_orderstatus"],
    "lineitem": ["l_shipmode", "l_returnflag"],
    "customer": ["c_mktsegment"],
    "supplier": ["s_acctbal"],
    "part": ["p_brand"],
}


@pytest.fixture(scope="session")
def nulled_sf_dir(spark):
    """Fixture dir with ~10% NULLs injected into nullable payload
    columns (text, embeddings, categorical strings)."""
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="null_sf_")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        first = df.columns[0]
        for c in [c for c in NULLABLE.get(t, []) if c in df.columns]:
            df = df.withColumn(
                c,
                F.when(
                    F.abs(F.hash(F.col(first), F.lit(c))) % 10 == 0, None
                ).otherwise(F.col(c)),
            )
        df.write.mode("overwrite").parquet(f"{tmp}/{t}.parquet")
    return tmp


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_null_values(spark, nulled_sf_dir, name):
    """NULL payload values must not crash any query. Historical
    catches, each fixed at the operator boundary: MLlib transformers
    and array_to_vector throw on null inputs (similarity/dedup
    operators now drop null vectors, with an optimizer barrier where
    join-constraint inference would push the null-intolerant hash UDF
    below the filter); a self-cogroup whose sides shared expression
    ids lost the right side's data columns to mis-resolved pruning
    (embedding_neardup_pairs re-aliases its b side); media operators
    skip payload-less rows."""
    assert QUERIES[name](spark, nulled_sf_dir).count() >= 0
