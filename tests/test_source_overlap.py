"""Source-level shingle overlap matrix
(operators/dedup.py::source_shingle_overlap) — PROMOTED round 8 as l55_source_overlap: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the closed-form two-source pin,
symmetry/identity invariants, and the n_common ≤ min(n_a, n_b)
sanity bound stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators import text as T
from miningfrequentpattern_spark.operators.dedup import (
    source_shingle_overlap,
)

from .conftest import SF_ORACLE
from miningfrequentpattern_spark.queries.registry import (
    QUERIES,
    load_all_packs,
)

load_all_packs()

def _l55(spark, sf_dir):
    return QUERIES["l55_source_overlap"](spark, sf_dir)



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


def test_source_overlap_include_disjoint_emits_zero_rows(spark):
    """r10 sweep: the operator docstring promised one row per source
    pair while the inner join omitted disjoint pairs entirely —
    consumers could not distinguish 'disjoint' from 'missing'. The
    default keeps the registered inner-join scale shape; opting in
    emits explicit zero rows for the full (a < b) grid."""
    from pyspark.sql import functions as F

    from miningfrequentpattern_spark.operators.dedup import (
        source_shingle_overlap,
    )

    docs = spark.createDataFrame(
        [
            ("s1", "a b c d e"),
            ("s2", "a b c x y"),
            ("s3", "p q r s t"),
        ],
        "source string, text string",
    ).withColumn("tokens", F.split("text", " "))
    dflt = source_shingle_overlap(docs)
    assert dflt.count() == 1  # only (s1, s2) overlap
    full = source_shingle_overlap(docs, include_disjoint=True)
    rows = {(r["source_a"], r["source_b"]): r for r in full.collect()}
    assert set(rows) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert rows[("s1", "s3")]["n_common"] == 0
    assert rows[("s1", "s3")]["jaccard"] == 0.0
    # overlapping pair identical between the two modes
    assert rows[("s1", "s2")]["n_common"] == dflt.collect()[0]["n_common"]
