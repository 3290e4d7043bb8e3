"""Normalization dedup uplift
(operators/dedup.py::normalized_dedup_uplift) — round-8 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL the future l57_normalized_dedup registration will carry
(per-source raw vs normalized duplicate-doc counts over documents),
plus closed-form normalization pins and the raw ⊆ normalized
containment invariant."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.dedup import (
    normalized_dedup_uplift,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future l57 oracle, verbatim. Normalization pin shared with the
# operator: lower -> every [^a-z0-9]+ run to ONE space -> trim
# (DuckDB regexp_replace needs the explicit 'g' flag; Spark replaces
# globally by default). Duplicate keys are corpus-wide; attribution
# is by the doc's own source.
L57_ORACLE = """
WITH b AS (
  SELECT doc_id, source, text AS raw,
         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
           AS norm
  FROM documents),
rc AS (SELECT raw, count(*) AS c FROM b
       WHERE raw IS NOT NULL GROUP BY 1),
nc AS (SELECT norm, count(*) AS c FROM b
       WHERE norm IS NOT NULL GROUP BY 1)
SELECT b.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN coalesce(rc.c, 0) >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_raw_dup,
       CAST(sum(CASE WHEN coalesce(nc.c, 0) >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_norm_dup,
       CAST(sum(CASE WHEN coalesce(nc.c, 0) >= 2 THEN 1 ELSE 0 END)
            - sum(CASE WHEN coalesce(rc.c, 0) >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS uplift,
       round(sum(CASE WHEN coalesce(nc.c, 0) >= 2 THEN 1 ELSE 0 END)
             * 1.0 / count(*), 4) AS norm_dup_rate
FROM b
LEFT JOIN rc ON rc.raw = b.raw
LEFT JOIN nc ON nc.norm = b.norm
GROUP BY 1
"""


def _l57(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return normalized_dedup_uplift(docs, "source", "doc_id", "text")


def test_norm_dedup_matches_duckdb_oracle(spark, duck):
    compare(_l57(spark, SF_ORACLE), duck, L57_ORACLE)


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
