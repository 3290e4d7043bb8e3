"""Embedding projection drift
(operators/embeddings.py::embedding_projection_drift) — round-8
window candidate, locally certified NOW: the DuckDB oracle below is
the exact SQL the future l60_embedding_drift registration will carry
(r74's PSI machinery over four SEEDED 1-D projections of the
embedding column; the projection constants are baked into the SQL at
full repr precision so both engines dot the identical doubles, and
the oracle reduces each dot with list_reduce — a SEQUENTIAL
left-to-right fold matching Spark's aggregate()), plus the
identical-corpora ≈ zero-drift pin and a planted mean-shift alarm."""

import numpy as np

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.embeddings import (
    embedding_projection_drift,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def _directions(seed=42, n_directions=4, dim=64):
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((n_directions, dim))
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)
    return proj


def _oracle():
    """The future l60 oracle, generated — one r74-shaped PSI block per
    seeded direction, UNION ALL'd. Same generation at registration
    time; the driver sees the expanded static string."""
    blocks = []
    for t, d in enumerate(_directions()):
        lits = ", ".join(repr(float(v)) for v in d)
        blocks.append(f"""
SELECT CAST({t} AS INT) AS direction, q.bin, q.n_ref, q.n_cur,
       q.ref_share, q.cur_share, q.psi_part
FROM (
  WITH pr AS (
    SELECT vec_id,
           round(list_reduce(
             list_transform(list_zip(CAST(embedding AS DOUBLE[]),
                                     [{lits}]),
                            s -> s[1] * s[2]),
             (a, b) -> a + b), 6) + 0.0 AS p
    FROM embeddings WHERE embedding IS NOT NULL),
  ref AS (SELECT p FROM pr WHERE vec_id % 2 = 0),
  cur AS (SELECT p FROM pr WHERE vec_id % 2 = 1),
  e AS (SELECT list_transform(
          quantile_cont(p, [0.1, 0.2, 0.3, 0.4, 0.5,
                            0.6, 0.7, 0.8, 0.9]),
          x -> round(x, 4)) AS edges FROM ref),
  rb AS (SELECT len(list_filter(e.edges, x -> r.p >= x)) AS bin,
                count(*) AS n_ref
         FROM ref r CROSS JOIN e GROUP BY 1),
  cb AS (SELECT len(list_filter(e.edges, x -> c.p >= x)) AS bin,
                count(*) AS n_cur
         FROM cur c CROSS JOIN e GROUP BY 1),
  j AS (SELECT coalesce(rb.bin, cb.bin) AS bin,
               coalesce(rb.n_ref, 0) AS n_ref,
               coalesce(cb.n_cur, 0) AS n_cur
        FROM rb FULL JOIN cb ON rb.bin = cb.bin),
  t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
  SELECT CAST(j.bin AS INT) AS bin, j.n_ref, j.n_cur,
         round(j.n_ref / t.tr, 4) AS ref_share,
         round(j.n_cur / t.tc, 4) AS cur_share,
         round((greatest(j.n_cur / t.tc, 0.0001)
                - greatest(j.n_ref / t.tr, 0.0001))
               * ln(greatest(j.n_cur / t.tc, 0.0001)
                    / greatest(j.n_ref / t.tr, 0.0001)), 4) + 0.0
           AS psi_part
  FROM j CROSS JOIN t) q""")
    return "\nUNION ALL\n".join(blocks)


L60_ORACLE = _oracle()


def _l60(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    return embedding_projection_drift(ref, cur, "embedding", dim=64)


def test_embedding_drift_matches_duckdb_oracle(spark, duck):
    compare(_l60(spark, SF_ORACLE), duck, L60_ORACLE)


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
