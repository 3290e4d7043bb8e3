"""Linear-interpolation gap fill
(operators/timeseries.py::gapfill_interpolate) —
PROMOTED round 7 as r83_gapfill_interp: the DuckDB oracle moved VERBATIM
into the @query registration (tests/test_oracle_parity.py now
carries the compare); the property/edge/hand pins stay here."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    gapfill_interpolate,
)
from miningfrequentpattern_spark.sources.io import load_table


def test_gapfill_interp_closed_form(spark):
    """[10, NULL, 20] fills the midpoint 15; [0, NULL, NULL, 30]
    fills the thirds 10 and 20; observed rows pass through."""
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, 20.0),
         ("b", 1, 0.0), ("b", 2, None), ("b", 3, None), ("b", 4, 30.0)],
        "k string, t int, v double",
    )
    got = {
        (r["k"], r["t"]): r["filled"]
        for r in gapfill_interpolate(df, ["k"], "t", "v").collect()
    }
    assert got[("a", 2)] == 15.0
    assert got[("b", 2)] == 10.0 and got[("b", 3)] == 20.0
    assert got[("a", 1)] == 10.0 and got[("b", 4)] == 30.0


def test_gapfill_interp_refuses_extrapolation(spark):
    """Leading and trailing gaps have one-sided evidence only — they
    stay NULL (extrapolation is the caller's explicit decision), and
    an all-NULL series stays all-NULL."""
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5.0), ("a", 3, None),
         ("z", 1, None), ("z", 2, None)],
        "k string, t int, v double",
    )
    got = {
        (r["k"], r["t"]): r["filled"]
        for r in gapfill_interpolate(df, ["k"], "t", "v").collect()
    }
    assert got[("a", 1)] is None and got[("a", 3)] is None
    assert got[("a", 2)] == 5.0
    assert got[("z", 1)] is None and got[("z", 2)] is None


def test_gapfill_interp_single_exchange_two_passes(spark):
    """Both IGNORE-NULLS passes share the (keys, t) sort: the plan
    must carry exactly ONE exchange keyed by the series, and no
    global (empty partition-spec) window."""
    import re

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("a", 3, 3.0)],
        "k string, t int, v double",
    )
    out = gapfill_interpolate(df, ["k"], "t", "v")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert p.count("Exchange") <= 2, p  # one node + one details mention
    specs = re.findall(r"windowspecdefinition\((\w+)#", p)
    assert specs and set(specs) == {"k"}, specs


def test_gapfill_rejects_out_col_collision(spark):
    """r10 sweep (the 73e18de class): withColumn(out_col) silently
    REPLACED an existing same-named user column."""
    import pytest

    from miningfrequentpattern_spark.operators.timeseries import (
        gapfill_interpolate,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 2.0, 99.0)],
        "k string, t double, v double, filled double",
    )
    with pytest.raises(ValueError, match="filled"):
        gapfill_interpolate(df, ["k"], "t", "v")
    # a different out_col on the same frame is fine
    assert gapfill_interpolate(df, ["k"], "t", "v", out_col="v2").count() == 1
