"""Population Stability Index drift
(operators/relational.py::psi_drift) — round-6 window candidate,
locally certified NOW: the DuckDB oracle below is the exact SQL a
future r74_value_psi registration will carry (event values, first
half of the year as reference vs second half as current), plus
identical-distribution, shifted-distribution, and empty-bin hand
pins."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import psi_drift
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r74 oracle, verbatim. Dialect pins: quantile_cont ≡ Spark
# percentile; edges 4dp-rounded on both sides (the _quantile_edges
# pin — unrounded interpolations differ in the last ulp and re-bin
# ties); values AT an edge take the higher bin (>=); floor-clamped
# shares feed the log (empty bins are maximal drift evidence, not a
# divide-by-zero).
R74_ORACLE = """
WITH ref AS (SELECT value FROM events
             WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-07-01'),
cur AS (SELECT value FROM events
        WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-07-01'),
e AS (SELECT list_transform(
        quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                              0.6, 0.7, 0.8, 0.9]),
        x -> round(x, 4)) AS edges FROM ref),
rb AS (SELECT len(list_filter(e.edges, x -> r.value >= x)) AS bin,
              count(*) AS n_ref
       FROM ref r CROSS JOIN e GROUP BY 1),
cb AS (SELECT len(list_filter(e.edges, x -> c.value >= x)) AS bin,
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
                  / greatest(j.n_ref / t.tr, 0.0001)), 4) AS psi_part
FROM j CROSS JOIN t
"""


def _r74(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-07-01").cast("timestamp")
    ref = ev.filter(F.col("ts") < split).select("value")
    cur = ev.filter(F.col("ts") >= split).select("value")
    return psi_drift(ref, cur, "value", n_bins=10)


def test_psi_matches_duckdb_oracle(spark, duck):
    compare(_r74(spark, SF_ORACLE), duck, R74_ORACLE)


def test_psi_identical_distribution_is_zero(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(100)], "v double"
    )
    rows = psi_drift(df, df, "v", n_bins=5).collect()
    assert len(rows) == 5
    total = sum(r["psi_part"] for r in rows)
    assert abs(total) < 1e-9
    assert all(r["ref_share"] == r["cur_share"] == 0.2 for r in rows)


def test_psi_shift_concentrates_in_edge_bins(spark):
    """Current sample shifted entirely above the reference range:
    everything lands in the TOP reference bin, the rest go empty —
    the floor clamp keeps every psi_part finite and the statistic
    large."""
    ref = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    cur = spark.createDataFrame(
        [(float(1000 + i),) for i in range(100)], "v double"
    )
    rows = {r["bin"]: r for r in psi_drift(ref, cur, "v", n_bins=5).collect()}
    assert rows[4]["cur_share"] == 1.0
    assert all(rows[b]["n_cur"] == 0 for b in range(4))
    total = sum(r["psi_part"] for r in rows.values())
    assert total > 1.0  # far beyond the 0.25 "investigate" rule
    assert all(r["psi_part"] is not None for r in rows.values())


def test_psi_rejects_bad_bins(spark):
    import pytest

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        psi_drift(df, df, "v", n_bins=1)
