"""Normalization dedup uplift
(operators/dedup.py::normalized_dedup_uplift) — PROMOTED round 8 as l57_normalized_dedup: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the closed-form normalization pins
and the raw ⊆ normalized containment invariant stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.dedup import (
    normalized_dedup_uplift,
)
from .conftest import SF_ORACLE
from miningfrequentpattern_spark.queries.registry import (
    QUERIES,
    load_all_packs,
)

load_all_packs()

def _l57(spark, sf_dir):
    return QUERIES["l57_normalized_dedup"](spark, sf_dir)



def test_norm_dedup_closed_form(spark):
    """'Foo,  bar!' and 'foo bar' are normalized-dups but not
    raw-dups; two identical raw docs are both; a NULL text counts in
    n_docs but never as a duplicate; cross-source dup counts for
    BOTH sources."""
    rows = [
        (1, "A", "Foo,  bar!"),
        (2, "B", "foo bar"),     # norm-dup with 1 (cross-source)
        (3, "A", "same text"),
        (4, "A", "same text"),   # raw-dup pair with 3
        (5, "A", None),
        (6, "B", "unique doc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: (
            r["n_docs"], r["n_raw_dup"], r["n_norm_dup"], r["uplift"]
        )
        for r in normalized_dedup_uplift(docs).collect()
    }
    assert got["A"] == (4, 2, 3, 1)  # docs 3,4 raw; 1,3,4 norm
    assert got["B"] == (2, 0, 1, 1)  # doc 2 norm-dups with doc 1


def test_norm_dedup_raw_implies_norm(spark):
    """Raw duplication implies normalized duplication (same raw text
    ⇒ same normalized text), so per source n_norm_dup ≥ n_raw_dup
    and uplift ≥ 0 — on the real fixture."""
    for r in _l57(spark, SF_ORACLE).collect():
        assert r["n_norm_dup"] >= r["n_raw_dup"]
        assert r["uplift"] >= 0
        assert 0 <= r["norm_dup_rate"] <= 1.0
