"""Key-skew diagnostic (functions/skew.py::key_skew_profile) —
round-6 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL a future r53_skew_advisor registration will
carry, plus a synthetic hot-key case where the advisory numbers are
hand-checkable and a plan audit (top-k must be a bounded
TakeOrderedAndProject, never a global sort)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from miningfrequentpattern_spark.functions.skew import key_skew_profile
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r53 oracle, verbatim. Dialect pins: quantile_cont == Spark's
# exact interpolated `percentile` (the r10b pin); DuckDB sum() is
# HUGEINT → cast BIGINT; count DESC then key ASC makes the top-5
# deterministic under count ties.
R53_ORACLE = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
s AS (SELECT count(*) AS n_keys,
             CAST(sum(n) AS BIGINT) AS n_rows,
             avg(n) AS mean_n,
             quantile_cont(n, 0.5) AS p50_n,
             quantile_cont(n, 0.99) AS p99_n,
             max(n) AS max_n
      FROM c)
SELECT c.user_id, c.n AS n_rows_key,
       round(c.n * 1.0 / s.n_rows, 4) AS share,
       s.n_keys,
       round(s.mean_n, 4) AS mean_per_key,
       round(s.p50_n, 4) AS p50_per_key,
       round(s.p99_n, 4) AS p99_per_key,
       round(s.max_n / s.mean_n, 4) AS skew_factor
FROM c, s
ORDER BY c.n DESC, c.user_id
LIMIT 5
"""


def _r53(spark, sf_dir):
    return key_skew_profile(
        load_table(spark, sf_dir, "events"), ["user_id"], top_k=5
    )


def test_skew_profile_matches_duckdb_oracle(spark, duck):
    compare(_r53(spark, SF_ORACLE), duck, R53_ORACLE)


def test_skew_profile_flags_the_hot_key(spark):
    """9 uniform keys × 10 rows + one 910-row hot key: the hot key
    must lead with share 0.91 and skew_factor 9.1 (max 910 / mean
    100), and p50 stays at the uniform 10."""
    rows = [(k, i) for k in range(1, 10) for i in range(10)]
    rows += [(99, i) for i in range(910)]
    df = spark.createDataFrame(rows, "k long, payload long")
    out = key_skew_profile(df, ["k"], top_k=2).collect()
    assert [(r["k"], r["n_rows_key"]) for r in out] == [(99, 910), (1, 10)]
    hot = out[0]
    assert hot["share"] == 0.91
    assert hot["n_keys"] == 10
    assert hot["mean_per_key"] == 100.0
    assert hot["p50_per_key"] == 10.0
    assert hot["skew_factor"] == 9.1


def test_skew_profile_topk_is_bounded_not_global_sort(spark):
    df = _r53(spark, SF_ORACLE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "TakeOrderedAndProject" in p, p
    # No unbounded global Sort node feeding the limit.
    assert not any(
        ln.strip().startswith("Sort ") and "global=true" in ln
        for ln in p.splitlines()
    ), p
