"""Quality-gate ablation (operators/text.py::quality_gate_ablation) — PROMOTED round 8 as l58_gate_ablation: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the closed-form pins, the sole ≤ fail
invariant, and consistency with quality_features' verdict stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.text import (
    quality_features,
    quality_gate_ablation,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE

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
