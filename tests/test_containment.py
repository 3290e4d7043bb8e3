"""Asymmetric n-gram containment join
(operators/dedup.py::ngram_containment_pairs) — promoted round 6: the oracle moved verbatim onto the l42_containment_pairs registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps,
plus the quote-in-document case that separates containment from
Jaccard, and a guard-neutrality check on the shared pair-stats core."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )


def test_containment_finds_the_quote_jaccard_cannot(spark):
    """A 6-token quote embedded verbatim in a 60-token document:
    containment(quote ⊆ doc) = 1.0 while Jaccard ≈ 0.07 — the
    asymmetric operator must flag the pair at 0.9 and the symmetric
    one must NOT at 0.5 (the structural blind spot this operator
    exists for)."""
    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(18))
    df = spark.createDataFrame(
        [(1, "en", quote), (2, "en", filler + " " + quote)],
        "doc_id long, lang string, text string",
    )
    cont = ngram_containment_pairs(
        df, threshold=0.9, max_shingle_df=None
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["cont_a_in_b"]) for r in cont] == [
        (1, 2, 1.0)
    ]
    assert (
        ngram_jaccard_pairs(df, threshold=0.5, max_shingle_df=None).count()
        == 0
    )


def test_containment_guard_neutral_on_fixtures(spark):
    """The default hot-shingle guard must be a no-op on the fixtures
    (max shingle df 5 ≪ cap 1000) — guarded and unguarded scores
    identical, certifying the shared core's post-guard denominators
    flow through the containment score unchanged."""
    docs = _docs(spark, SF_ORACLE)
    on = {
        (r["doc_a"], r["doc_b"]): (r["cont_a_in_b"], r["cont_b_in_a"])
        for r in ngram_containment_pairs(docs, threshold=0.6).collect()
    }
    off = {
        (r["doc_a"], r["doc_b"]): (r["cont_a_in_b"], r["cont_b_in_a"])
        for r in ngram_containment_pairs(
            docs, threshold=0.6, max_shingle_df=None
        ).collect()
    }
    assert on == off and len(on) > 0
