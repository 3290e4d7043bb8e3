"""Per-label centroid cosine matrix
(operators/embeddings.py::label_centroid_similarity) — promoted round 6: the oracle moved verbatim onto the l51_label_centroids registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps
(class-geometry monitor over the embeddings table), plus orthogonal/
identical/zero-centroid hand pins and a numpy reference."""

import numpy as np

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.embeddings import (
    label_centroid_similarity,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_label_centroids_closed_form(spark):
    """Label 0 centroids to (1,0), label 1 to (0,1) — orthogonal,
    cosine 0; label 2 is a scaled copy of label 0 — cosine 1."""
    rows = [
        (0, [2.0, 0.0]),
        (0, [0.0, 0.0]),  # centroid (1, 0)
        (1, [0.0, 3.0]),
        (1, [0.0, 1.0]),  # centroid (0, 2)
        (2, [6.0, 0.0]),  # centroid (6, 0) — parallel to label 0
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    got = {
        (r["label_a"], r["label_b"]): (r["n_a"], r["n_b"], r["cosine"])
        for r in label_centroid_similarity(df, "label", "embedding").collect()
    }
    assert got[(0, 1)] == (2, 2, 0.0)
    assert got[(0, 2)] == (2, 1, 1.0)
    assert got[(1, 2)] == (2, 1, 0.0)


def test_embeddings_fixture_is_fixed_dim():
    """The fixed-dimensionality contract the operator's docstring
    declares: the pos equi-join dots over SHARED positions only, so
    ragged vectors would silently truncate the geometry. Assert the
    fixture invariant once, loudly, DuckDB-only (the
    test_fixture_invariants pattern)."""
    import duckdb

    from .conftest import SF_SMOKE

    con = duckdb.connect()
    for sf in (SF_SMOKE, SF_ORACLE):
        ndims = con.execute(
            f"""
            SELECT count(DISTINCT len(embedding))
            FROM read_parquet('{sf}/embeddings.parquet')
            WHERE embedding IS NOT NULL
            """
        ).fetchone()[0]
        assert ndims == 1, (
            f"{sf}/embeddings.parquet is ragged ({ndims} distinct "
            "dims) — label_centroid_similarity's shared-position dot "
            "product and l29/l43's dim explodes all assume fixed d"
        )


def test_label_centroids_zero_norm_is_null(spark):
    rows = [(0, [0.0, 0.0]), (1, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    got = label_centroid_similarity(df, "label", "embedding").collect()
    assert len(got) == 1 and got[0]["cosine"] is None


def test_label_centroids_match_numpy(spark):
    rng_rows = []
    for lab in range(3):
        for i in range(4):
            vec = [((lab * 7 + i * 3 + d) % 11) / 10.0 for d in range(5)]
            rng_rows.append((lab, vec))
    df = spark.createDataFrame(rng_rows, "label int, embedding array<double>")
    got = {
        (r["label_a"], r["label_b"]): r["cosine"]
        for r in label_centroid_similarity(df, "label", "embedding").collect()
    }
    cents = {}
    for lab in range(3):
        vs = np.array([v for l, v in rng_rows if l == lab])
        cents[lab] = vs.mean(axis=0)
    for a in range(3):
        for b in range(a + 1, 3):
            want = float(
                cents[a] @ cents[b]
                / (np.linalg.norm(cents[a]) * np.linalg.norm(cents[b]))
            )
            assert abs(got[(a, b)] - round(want, 4)) <= 1e-9
