"""Embedding projection drift
(operators/embeddings.py::embedding_projection_drift) — PROMOTED round 8 as l60_embedding_drift: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the identical-corpora ≈ zero-drift
pin and the planted-mean-shift alarm (the oracle GENERATOR lives in
queries/llm_pack.py::_l60_oracle — same seeded numpy projections as
the operator) stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.embeddings import (
    embedding_projection_drift,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from miningfrequentpattern_spark.queries.registry import (
    QUERIES,
    load_all_packs,
)

load_all_packs()


def _l60(spark, sf_dir):
    return QUERIES["l60_embedding_drift"](spark, sf_dir)



def test_embedding_drift_identical_corpora_near_zero(spark):
    """Same-distribution halves: every direction's PSI must sit in
    small-sample-noise territory. NOTE the bound is 0.2, not the
    production 0.1 rule-of-thumb: PSI's null expectation is
    ~(B−1)·(1/n_ref + 1/n_cur) — the fixture's few-hundred vectors
    per side put the noise floor near 0.1 by itself; at production n
    the same statistic concentrates far below it. The REAL signal
    check is the planted-shift test's order-of-magnitude separation."""
    out = _l60(spark, SF_ORACLE).collect()
    psi = {}
    for r in out:
        psi[r["direction"]] = psi.get(r["direction"], 0.0) + r["psi_part"]
    assert set(psi) == {0, 1, 2, 3}
    for d, v in psi.items():
        assert v < 0.2, (d, v)


def test_embedding_drift_detects_planted_mean_shift(spark):
    """Shift the current corpus by +0.8 along dimension 0: at least
    one projection direction must cross the 0.25 'investigate'
    threshold (Cramér–Wold: a real shift shows on almost every
    projection)."""
    emb = load_table(spark, SF_ORACLE, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    shifted = emb.filter(F.col("vec_id") % 2 == 1).withColumn(
        "embedding",
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.8)),
            F.slice("embedding", 2, 63),
        ),
    )
    out = embedding_projection_drift(ref, shifted, "embedding", dim=64)
    psi = {}
    for r in out.collect():
        psi[r["direction"]] = psi.get(r["direction"], 0.0) + r["psi_part"]
    # well above both the 0.25 'investigate' threshold and the
    # fixture's measured null noise (~0.12)
    assert max(psi.values()) > 0.4, psi


def test_embedding_drift_malformed_inputs_raise(spark):
    """Partial-result-is-wrong-result stance (code-review r9: ragged
    vectors and NULL elements were silently DROPPED from the shares —
    understating exactly the drift the monitor exists to catch):
    ragged vectors raise naming the dim, NULL elements raise, NULL
    vectors are filtered as documented, and n_directions < 1 is a
    named ValueError instead of returning None."""
    import pytest
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    ok = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="n_directions"):
        embedding_projection_drift(ok, ok, dim=2, n_directions=0)

    # single-partition malformed inputs: with 32 concurrent tasks the
    # raising task cancels its siblings, and the driver-side error can
    # surface as a cancellation artifact without the cause text under
    # heavy host load (observed once in a full-suite run at loadavg
    # ~12); one task = deterministic error propagation.
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0])],
        "vec_id long, embedding array<double>",
    ).repartition(1)
    with pytest.raises(Exception, match="ragged"):
        embedding_projection_drift(ragged, ok, dim=2, n_directions=2).collect()

    holey = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, None])],
        "vec_id long, embedding array<double>",
    ).repartition(1)
    with pytest.raises(Exception, match="null/NaN element"):
        embedding_projection_drift(ok, holey, dim=2, n_directions=2).collect()

    # NULL vectors stay filtered (the documented contract): same
    # drift rows as the corpus without them
    with_null = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)] + [(99, None)],
        "vec_id long, embedding array<double>",
    )
    a = embedding_projection_drift(ok, ok, dim=2, n_directions=2)
    b = embedding_projection_drift(with_null, with_null, dim=2,
                                   n_directions=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
