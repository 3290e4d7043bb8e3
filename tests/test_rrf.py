"""Reciprocal-rank fusion (operators/similarity.py::rrf_fuse) —
round-6 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL a future l49_hybrid_rrf registration will
carry (per-source fusion of the l48 BM25 ranking with a type-token-
ratio quality ranking — the lexical+quality hybrid), plus
closed-form rank arithmetic and missing-item hand pins."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.similarity import rrf_fuse
from miningfrequentpattern_spark.operators.text import bm25_scores
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future l49 oracle, verbatim. Run 1 is l48's BM25 SQL re-keyed by
# source; run 2 is the certified l47 TTR arithmetic. Docs absent
# from a run (BM25 matched no query term) contribute nothing — the
# classic RRF convention — so n_runs is the signal-agreement count.
# Ranks order by (score DESC, doc_id ASC): deterministic ties, the
# calibrated-gate stance.
L49_ORACLE = """
WITH t AS (
  SELECT doc_id, source, string_split(trim(text), ' ') AS toks
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
m AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM t),
h AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t),
q AS (SELECT doc_id, dl, term FROM h
      WHERE term IN ('scan', 'merge', 'window', 'stream')),
df AS (SELECT term, count(DISTINCT doc_id) AS dfreq FROM q GROUP BY 1),
tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM q GROUP BY 1, 2, 3),
bm AS (SELECT tf.doc_id, sum(
         ln((m.n_docs - df.dfreq + 0.5) / (df.dfreq + 0.5) + 1.0)
         * ((tf.tf * 2.2)
            / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / m.avgdl)))) AS score
       FROM tf JOIN df USING (term) CROSS JOIN m GROUP BY 1),
run1 AS (SELECT t.source, bm.doc_id,
                row_number() OVER (PARTITION BY t.source
                                   ORDER BY bm.score DESC, bm.doc_id)
                  AS rnk
         FROM bm JOIN t ON t.doc_id = bm.doc_id),
ttr AS (SELECT doc_id, source,
               len(list_distinct(toks)) * 1.0 / len(toks) AS score
        FROM t),
run2 AS (SELECT source, doc_id,
                row_number() OVER (PARTITION BY source
                                   ORDER BY score DESC, doc_id) AS rnk
         FROM ttr),
u AS (SELECT source, doc_id, 1.0 / (60 + rnk) AS c FROM run1
      UNION ALL SELECT source, doc_id, 1.0 / (60 + rnk) FROM run2)
SELECT source, doc_id, count(*) AS n_runs,
       round(sum(c), 4) AS rrf_score
FROM u GROUP BY 1, 2
"""

QUERY_TERMS = ["scan", "merge", "window", "stream"]


def _l49(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    dim = docs.select("doc_id", "source")
    run1 = (
        bm25_scores(docs, "doc_id", "text", QUERY_TERMS)
        .join(F.broadcast(dim), "doc_id")
        .select("source", "doc_id", "score")
    )
    toks = F.split(F.trim("text"), " ")
    run2 = docs.select(
        "source",
        "doc_id",
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("score"),
    )
    return rrf_fuse([run1, run2], ["source"], "doc_id", "score")


def test_rrf_matches_duckdb_oracle(spark, duck):
    compare(_l49(spark, SF_ORACLE), duck, L49_ORACLE)


def test_rrf_closed_form_and_missing_items(spark):
    """Run A ranks x > y; run B ranks y > z (x missing). Fused:
    x = 1/61 (one run), y = 1/62 + 1/61, z = 1/62."""
    a = spark.createDataFrame(
        [("q", "x", 9.0), ("q", "y", 1.0)], "k string, id string, score double"
    )
    b = spark.createDataFrame(
        [("q", "y", 5.0), ("q", "z", 2.0)], "k string, id string, score double"
    )
    got = {
        r["id"]: (r["n_runs"], r["rrf_score"])
        for r in rrf_fuse([a, b], ["k"], "id", "score").collect()
    }
    assert got["x"] == (1, round(1 / 61, 4))
    assert got["y"] == (2, round(1 / 62 + 1 / 61, 4))
    assert got["z"] == (1, round(1 / 62, 4))


def test_rrf_tiebreak_is_deterministic(spark):
    """Equal scores rank by id ascending: 'a' gets rank 1 in BOTH
    permutations of the input."""
    for rows in (
        [("q", "b", 1.0), ("q", "a", 1.0)],
        [("q", "a", 1.0), ("q", "b", 1.0)],
    ):
        run = spark.createDataFrame(rows, "k string, id string, score double")
        got = {
            r["id"]: r["rrf_score"]
            for r in rrf_fuse([run, run], ["k"], "id", "score").collect()
        }
        assert got["a"] == round(2 / 61, 4)
        assert got["b"] == round(2 / 62, 4)


def test_rrf_rejects_bad_args(spark):
    import pytest

    run = spark.createDataFrame([("q", "a", 1.0)], "k string, id string, score double")
    with pytest.raises(ValueError):
        rrf_fuse([run], ["k"], "id", "score")
    with pytest.raises(ValueError):
        rrf_fuse([run, run], ["k"], "id", "score", k=0)
