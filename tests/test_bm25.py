"""Okapi BM25 lexical retrieval scoring
(operators/text.py::bm25_scores) — promoted round 6: the oracle moved verbatim onto the l48_bm25_scores registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (a 4-term query over the
documents table), plus a closed-form hand check and the no-match /
duplicate-term pins."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.text import bm25_scores
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


QUERY_TERMS = ["scan", "merge", "window", "stream"]


def _l48(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(docs, "doc_id", "text", QUERY_TERMS)


def test_bm25_closed_form_hand_check(spark):
    """3-doc corpus, query {a, c}: every idf/tf/length term is small
    enough to evaluate the Robertson/Lucene formula directly."""
    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "b d"), (3, "c c c")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["score"])
        for r in bm25_scores(df, "doc_id", "text", ["a", "c"]).collect()
    }
    n, avgdl = 3, 3.0
    idf_a = math.log((n - 1 + 0.5) / (1 + 0.5) + 1.0)
    idf_c = math.log((n - 2 + 0.5) / (2 + 0.5) + 1.0)

    def sat(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    want1 = round(idf_a * sat(2, 4) + idf_c * sat(1, 4), 4)
    want3 = round(idf_c * sat(3, 3), 4)
    assert got[1] == (2, want1)
    assert got[3] == (1, want3)
    assert 2 not in got  # no query term: omitted, not scored 0


def test_bm25_rejects_bad_query_terms(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_scores(df, "doc_id", "text", [])
    with pytest.raises(ValueError):
        bm25_scores(df, "doc_id", "text", ["a", "a"])


def test_bm25_whitespace_runs_and_empty_docs(spark):
    """Tokenization must ride the shared tokens() helper (ADVICE r5):
    whitespace runs mint NO phantom '' tokens (doc length, and so
    the BM25 length normalization, matches the single-spaced twin
    exactly) and an empty-string doc contributes dl = 0 — it is
    absent from the corpus-moment average rather than counted as a
    one-token document."""
    spaced = spark.createDataFrame(
        [(1, "a b a c"), (2, "c d")], "doc_id long, text string"
    )
    messy = spark.createDataFrame(
        [(1, "a\tb  a \n c"), (2, "c d")], "doc_id long, text string"
    )
    want = {
        r["doc_id"]: (r["n_terms_matched"], r["score"])
        for r in bm25_scores(spaced, "doc_id", "text", ["a", "c"]).collect()
    }
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["score"])
        for r in bm25_scores(messy, "doc_id", "text", ["a", "c"]).collect()
    }
    assert got == want
    # empty doc: no tokens -> excluded from avgdl, never matched
    with_empty = spark.createDataFrame(
        [(1, "a b a c"), (2, "c d"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got3 = {
        r["doc_id"]
        for r in bm25_scores(
            with_empty, "doc_id", "text", ["a", "c"]
        ).collect()
    }
    assert got3 == {1, 2}
