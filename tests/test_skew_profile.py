"""Key-skew diagnostic (functions/skew.py::key_skew_profile) —
promoted round 6: the oracle moved verbatim onto the r53_skew_advisor registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps a synthetic hot-key case where the advisory numbers are
hand-checkable and a plan audit (top-k must be a bounded
TakeOrderedAndProject, never a global sort)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from miningfrequentpattern_spark.functions.skew import key_skew_profile
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from miningfrequentpattern_spark.queries.registry import (
    QUERIES,
    load_all_packs,
)

load_all_packs()


def _r53(spark, sf_dir):
    return QUERIES["r53_skew_advisor"](spark, sf_dir)


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


def test_skew_profile_rejects_colliding_key_names(spark):
    """r11 functions sweep: a key named like a computed output column
    (or a stats-side internal) must fail fast with the operator named,
    not emit a frame with two 'share' columns."""
    import pytest

    from miningfrequentpattern_spark.functions.skew import (
        key_skew_profile,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "share long, _mean string"
    )
    with pytest.raises(ValueError, match="key_skew_profile"):
        key_skew_profile(df, keys=["share"])
    with pytest.raises(ValueError, match="key_skew_profile"):
        key_skew_profile(df, keys=["_mean"])
