"""Asymmetric n-gram containment join
(operators/dedup.py::ngram_containment_pairs) — round-6 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL a future l42_containment_pairs registration will carry,
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

# Future l42 oracle, verbatim (same shingle CTE family as l31's;
# single-space split per the fixture invariant).
L42_ORACLE = """
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS l
           FROM documents
           WHERE text IS NOT NULL AND lang IS NOT NULL),
sh AS (SELECT doc_id, lang,
              list_distinct(list_filter(
                list_transform(list_zip(l, l[2:], l[3:]),
                               s -> s[1] || ' ' || s[2] || ' ' || s[3]),
                x -> x IS NOT NULL)) AS g
       FROM t),
e AS (SELECT doc_id, lang, len(g) AS n, unnest(g) AS s FROM sh),
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n AS n_a, b.n AS n_b, count(*) AS c
      FROM e a JOIN e b
        ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
SELECT doc_a, doc_b,
       round(c * 1.0 / n_a, 4) AS cont_a_in_b,
       round(c * 1.0 / n_b, 4) AS cont_b_in_a
FROM p
WHERE greatest(round(c * 1.0 / n_a, 4), round(c * 1.0 / n_b, 4)) >= 0.6
"""


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )


def test_containment_matches_duckdb_oracle(spark, duck):
    got = ngram_containment_pairs(
        _docs(spark, SF_ORACLE), threshold=0.6, max_shingle_df=None
    )
    compare(got, duck, L42_ORACLE)


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
