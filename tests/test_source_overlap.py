"""Source-level shingle overlap matrix
(operators/dedup.py::source_shingle_overlap) — round-8 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL the future l55_source_overlap registration will carry
(pairwise Jaccard + both containments between the documents fixture's
sources), plus a closed-form two-source pin, symmetry/identity
invariants, and the n_common ≤ min(n_a, n_b) sanity bound."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators import text as T
from miningfrequentpattern_spark.operators.dedup import (
    source_shingle_overlap,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future l55 oracle, verbatim — the l54 shingle CTE shape at SOURCE
# grain. DISTINCT (source, shingle) before the pair join on both
# sides; pair counts are exact integers, ratios rounded 4dp
# (structurally non-negative, no sign pin needed).
L55_ORACLE = """
WITH t AS (SELECT source, string_split(text, ' ') AS l FROM documents),
sh AS (SELECT DISTINCT source,
              unnest(list_filter(
                list_transform(list_zip(l, l[2:], l[3:]),
                               s -> s[1] || ' ' || s[2] || ' ' || s[3]),
                x -> x IS NOT NULL)) AS s
       FROM t),
sz AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
c AS (SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
      GROUP BY 1, 2)
SELECT c.source_a, c.source_b,
       CAST(za.n AS BIGINT) AS n_a,
       CAST(zb.n AS BIGINT) AS n_b,
       CAST(c.n_common AS BIGINT) AS n_common,
       round(c.n_common * 1.0 / (za.n + zb.n - c.n_common), 4)
         AS jaccard,
       round(c.n_common * 1.0 / za.n, 4) AS containment_a,
       round(c.n_common * 1.0 / zb.n, 4) AS containment_b
FROM c JOIN sz za ON za.source = c.source_a
       JOIN sz zb ON zb.source = c.source_b
"""


def _l55(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    return source_shingle_overlap(docs, "source", "tokens", n=3)


def test_source_overlap_matches_duckdb_oracle(spark, duck):
    compare(_l55(spark, SF_ORACLE), duck, L55_ORACLE)


def test_source_overlap_closed_form(spark):
    """Source A: shingles {abc, bcd} ∪ {xyz yzw...}; B shares exactly
    one shingle with A; C shares none. Hand counts below."""
    rows = [
        (1, "A", "a b c d"),    # shingles: 'a b c', 'b c d'
        (2, "B", "b c d e"),    # shingles: 'b c d', 'c d e'
        (3, "C", "p q r s"),    # shingles: 'p q r', 'q r s'
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).withColumn("tokens", T.tokens("text"))
    got = {
        (r["source_a"], r["source_b"]): r
        for r in source_shingle_overlap(docs).collect()
    }
    ab = got[("A", "B")]
    assert (ab["n_a"], ab["n_b"], ab["n_common"]) == (2, 2, 1)
    assert ab["jaccard"] == round(1 / 3, 4)
    assert ab["containment_a"] == 0.5 and ab["containment_b"] == 0.5
    # C shares nothing: no row at all (the join IS the filter)
    assert ("A", "C") not in got and ("B", "C") not in got


def test_source_overlap_identical_sources(spark):
    """Two sources with identical shingle sets: jaccard = both
    containments = 1."""
    rows = [(1, "X", "a b c d"), (2, "Y", "a b c d")]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).withColumn("tokens", T.tokens("text"))
    r = source_shingle_overlap(docs).collect()[0]
    assert r["jaccard"] == 1.0
    assert r["containment_a"] == 1.0 and r["containment_b"] == 1.0


def test_source_overlap_bounds(spark):
    """On the real fixture: canonical pair order, n_common ≤
    min(n_a, n_b), jaccard ≤ min(containment_a, containment_b)."""
    for r in _l55(spark, SF_ORACLE).collect():
        assert r["source_a"] < r["source_b"]
        assert r["n_common"] <= min(r["n_a"], r["n_b"])
        assert r["jaccard"] <= min(r["containment_a"], r["containment_b"])
