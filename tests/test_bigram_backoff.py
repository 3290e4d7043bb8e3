"""Bigram Stupid-Backoff LM scoring
(operators/text.py::bigram_backoff_score) — promoted round 6: the oracle moved verbatim onto the l52_bigram_backoff registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (train on the
English subset, score the whole multilingual pool — the CCNet
framing, and the configuration where the backoff branch genuinely
fires), plus closed-form seen/backoff/OOV hand pins and the
self-train dead-branch pin."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.text import bigram_backoff_score
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_bigram_backoff_closed_form(spark):
    """Train on {"a b", "b a"}; score "a b" (seen: 1/2), "b c"
    (unseen pair, c OOV: 0.4·1/4), "a b a" (two seen pairs)."""
    train = spark.createDataFrame(
        [(100, "a b"), (101, "b a")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(1, "a b"), (2, "b c"), (3, "a b a")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_neg_log2p"])
        for r in bigram_backoff_score(score, train_docs=train).collect()
    }
    # training counts: c(a)=2, c(b)=2, N=4; bigrams (a,b):1, (b,a):1
    assert got[1] == (1, round(-math.log2(1 / 2), 4))
    assert got[2] == (1, round(-math.log2(0.4 * 1 / 4), 4))
    want3 = (-math.log2(1 / 2) - math.log2(1 / 2)) / 2
    assert got[3] == (2, round(want3, 4))


def test_bigram_backoff_self_train_branch_is_dead(spark):
    """Self-trained (default): every scored bigram trained its own
    count, so NO pair can hit the backoff branch and every score is
    a pure conditional probability — the documented dead-branch
    pin."""
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b b")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["avg_neg_log2p"]
        for r in bigram_backoff_score(docs).collect()
    }
    # c(a)=2, c(b)=3; bigrams: (a,b):1, (b,a):1, (b,b):1
    want1 = (-math.log2(1 / 2) - math.log2(1 / 3)) / 2
    assert got[1] == round(want1, 4)
    assert got[2] == round(-math.log2(1 / 3), 4)


def test_bigram_backoff_short_docs_omitted(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    got = bigram_backoff_score(docs).collect()
    assert [r["doc_id"] for r in got] == [3]


def test_bigram_backoff_scrambled_order_scores_worse(spark):
    """The context signal: score a fluent doc and its SCRAMBLED twin
    under the same training corpus — same unigrams, so l15 can't
    tell them apart, but the bigram model penalizes the scramble."""
    train = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["avg_neg_log2p"]
        for r in bigram_backoff_score(score, train_docs=train).collect()
    }
    assert got[2] > got[1]
