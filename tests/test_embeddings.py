"""Embedding second-moment analytics (operators/embeddings.py) —
promoted round 6: the oracle moved verbatim onto the l43_embedding_corr_matrix registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps; embedding_spectrum (eigendecomposition, not
SQL-expressible → rows-only by design if registered) is certified
against a local numpy eigh on the same parquet instead. Plus the
guards the fixture can't exercise: constant-dimension NULL pin,
ragged-vector raise."""

import duckdb
import numpy as np
import pytest

from miningfrequentpattern_spark.operators.embeddings import (
    embedding_correlation,
    embedding_spectrum,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_embedding_spectrum_matches_numpy_eigh(spark):
    """The grouped-map eigh must reproduce a single-process numpy
    reference bit-for-bit at the 4dp contract: same population
    covariance, same participation-ratio definition."""
    row = embedding_spectrum(_emb(spark, SF_ORACLE), dim=64).collect()
    assert len(row) == 1
    got = row[0]

    m = np.stack(
        duckdb.sql(
            "SELECT embedding FROM "
            f"read_parquet('{SF_ORACLE}/embeddings.parquet') "
            "WHERE embedding IS NOT NULL"
        ).fetchnumpy()["embedding"]
    ).astype(np.float64)
    cov = (m.T @ m) / len(m) - np.outer(m.mean(0), m.mean(0))
    lam = np.clip(np.linalg.eigvalsh(cov)[::-1], 0.0, None)
    tot = lam.sum()
    assert got["n_vectors"] == len(m)
    assert got["total_var"] == pytest.approx(round(float(tot), 4), abs=1e-4)
    assert got["top1_share"] == pytest.approx(
        round(float(lam[0] / tot), 4), abs=1e-4
    )
    assert got["effective_rank"] == pytest.approx(
        round(float(tot**2 / (lam @ lam)), 4), abs=1e-4
    )
    assert got["n_components_90"] == int(
        np.searchsorted(np.cumsum(lam) / tot, 0.9) + 1
    )


def test_constant_dimension_yields_null_corr(spark):
    """A constant dimension (sd = 0) must produce NULL correlations —
    never NaN, never a crash (the r44 divide-semantics pin)."""
    rows = [(i, [float(i), 5.0, float(i % 3)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["i"], r["j"]): r["corr"]
        for r in embedding_correlation(df, dim=3).collect()
    }
    assert len(got) == 6
    assert got[(2, 2)] is None and got[(1, 2)] is None and got[(2, 3)] is None
    assert got[(1, 1)] == 1.0 and got[(3, 3)] == 1.0


def test_ragged_vectors_raise(spark):
    """Mixed-dim vectors must fail loudly, not silently corrupt the
    moments (partial-result-is-wrong-result stance)."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="ragged|dim"):
        embedding_correlation(df, dim=2).collect()


def test_fp_constant_dimension_yields_null_not_nan(spark):
    """A dimension constant at 0.1 (NOT fp-exact: E[x²]−μ² ≈ −1e−18)
    must still produce NULL — the one-pass cancellation residue used
    to reach sqrt() as a negative, return NaN, and sail through the
    sd guard because Spark orders NaN above every number (review r5,
    confirmed by execution). The relative variance floor clamps it."""
    rows = [(i, [0.1, float(i), 5.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["i"], r["j"]): r["corr"]
        for r in embedding_correlation(df, dim=3).collect()
    }
    assert got[(1, 1)] is None and got[(1, 2)] is None
    assert got[(2, 2)] == 1.0


def test_nan_element_inside_vector_raises(spark):
    """A NULL element inside a vector becomes NaN in the batch
    matrix; its partial sums would come back as Arrow NULLs that
    F.sum silently SKIPS while n still counts the row —
    partition-dependent silent corruption (review r5). Must raise."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [None, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="[Nn]a[Nn]|null"):
        embedding_correlation(df, dim=2).collect()


def test_spectrum_zero_variance_corpus_is_all_null_stats(spark):
    """An all-constant corpus has NO variance: every spectrum
    statistic is undefined, INCLUDING n_components_90 (code-review
    r9: it reported 1 — 'one component covers 90%' reads as
    maximally-collapsed-but-well-defined, the opposite of
    no-variance-at-all)."""
    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    row = embedding_spectrum(df, dim=3).collect()[0]
    assert row["n_vectors"] == 5 and row["total_var"] == 0.0
    assert row["top1_share"] is None
    assert row["effective_rank"] is None
    assert row["n_components_90"] is None
