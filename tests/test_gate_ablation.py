"""Quality-gate ablation (operators/text.py::quality_gate_ablation) —
round-8 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL the future l58_gate_ablation registration will
carry (per-gate fail and sole-fail counts over documents), plus
closed-form pins, the sole ≤ fail invariant, and consistency with
quality_features' verdict."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.text import (
    quality_features,
    quality_gate_ablation,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future l58 oracle, verbatim. Gate expressions mirror the l06
# verdict conjuncts: whitespace tokens ('' filtered), mean word
# length as exact char-sum / token-count, n_chars from the fixture
# column. All counters are exact integers; rates rounded 4dp
# (non-negative — no sign pin needed).
L58_ORACLE = """
WITH t AS (
  SELECT n_chars,
         list_filter(string_split(trim(text), ' '), x -> x != '') AS l
  FROM documents),
g AS (
  SELECT len(l) >= 5 AS p_min_tokens,
         n_chars BETWEEN 20 AND 10000 AS p_char_bounds,
         coalesce(list_sum(list_transform(l, x -> len(x))) * 1.0
                  / nullif(len(l), 0), 0.0) BETWEEN 2 AND 12
           AS p_word_len_bounds,
         coalesce(len(list_distinct(l)) * 1.0 / nullif(len(l), 0), 0.0)
           > 0.1 AS p_distinct_ratio
  FROM t),
w AS (
  SELECT count(*) AS n,
         sum(CASE WHEN NOT p_min_tokens THEN 1 ELSE 0 END) AS f1,
         sum(CASE WHEN NOT p_min_tokens AND p_char_bounds
                   AND p_word_len_bounds AND p_distinct_ratio
                  THEN 1 ELSE 0 END) AS s1,
         sum(CASE WHEN NOT p_char_bounds THEN 1 ELSE 0 END) AS f2,
         sum(CASE WHEN NOT p_char_bounds AND p_min_tokens
                   AND p_word_len_bounds AND p_distinct_ratio
                  THEN 1 ELSE 0 END) AS s2,
         sum(CASE WHEN NOT p_word_len_bounds THEN 1 ELSE 0 END) AS f3,
         sum(CASE WHEN NOT p_word_len_bounds AND p_min_tokens
                   AND p_char_bounds AND p_distinct_ratio
                  THEN 1 ELSE 0 END) AS s3,
         sum(CASE WHEN NOT p_distinct_ratio THEN 1 ELSE 0 END) AS f4,
         sum(CASE WHEN NOT p_distinct_ratio AND p_min_tokens
                   AND p_char_bounds AND p_word_len_bounds
                  THEN 1 ELSE 0 END) AS s4
  FROM g)
SELECT u.gate,
       CAST(w.n AS BIGINT) AS n_docs,
       CAST(u.f AS BIGINT) AS n_fail,
       CAST(u.s AS BIGINT) AS n_sole_fail,
       round(u.f * 1.0 / w.n, 4) AS fail_rate,
       round(u.s * 1.0 / w.n, 4) AS sole_rate
FROM w, LATERAL (
  SELECT 'min_tokens' AS gate, f1 AS f, s1 AS s
  UNION ALL SELECT 'char_bounds', f2, s2
  UNION ALL SELECT 'word_len_bounds', f3, s3
  UNION ALL SELECT 'distinct_ratio', f4, s4) u
"""


def _l58(spark, sf_dir):
    return quality_gate_ablation(load_table(spark, sf_dir, "documents"))


def test_gate_ablation_matches_duckdb_oracle(spark, duck):
    compare(_l58(spark, SF_ORACLE), duck, L58_ORACLE)


def test_gate_ablation_closed_form(spark):
    """Four docs: one passes everything; one fails ONLY min_tokens
    ('hi ok go', 3 tokens but n_chars/word-len/distinct fine); one
    fails ONLY char_bounds (long enough tokens, n_chars 5); one fails
    min_tokens AND char_bounds (sole-fail neither)."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", 36),
        (2, "hi ok go xx", 20),            # 4 tokens -> min_tokens only
        (3, "abcd efgh ijkl mnop qrst", 5),  # n_chars 5 -> char_bounds only
        (4, "hi", 2),                        # fails both -> sole neither
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long"
    )
    got = {
        r["gate"]: (r["n_fail"], r["n_sole_fail"])
        for r in quality_gate_ablation(docs).collect()
    }
    assert got["min_tokens"] == (2, 1)
    assert got["char_bounds"] == (2, 1)
    assert got["word_len_bounds"] == (0, 0)
    assert got["distinct_ratio"] == (0, 0)


def test_gate_ablation_consistent_with_quality_features(spark):
    """Structural invariants on the real fixture: n_sole_fail ≤
    n_fail per gate, and total sole-fails ≤ the number of docs
    quality_features rejects (each sole-failing doc is rejected)."""
    docs = load_table(spark, SF_ORACLE, "documents")
    rows = {r["gate"]: r for r in quality_gate_ablation(docs).collect()}
    assert set(rows) == {
        "min_tokens", "char_bounds", "word_len_bounds", "distinct_ratio"
    }
    n_rejected = (
        quality_features(docs).filter(~F.col("quality_pass")).count()
    )
    for r in rows.values():
        assert r["n_sole_fail"] <= r["n_fail"]
    assert sum(r["n_sole_fail"] for r in rows.values()) <= n_rejected
