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
