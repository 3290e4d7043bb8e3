"""Property-based certification, round-6 staged batch (hypothesis +
pure-Python references): emerging pairs vs a dict-counting reference,
linear gap-fill vs numpy.interp, and the Holt recurrence vs an
independent Python loop. Few examples by design (each is a Spark
job); the value is input SHAPE coverage — ragged groups, all-gap
series, one-sided periods, single-row series."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.mining import (
    emerging_pair_patterns,
)
from miningfrequentpattern_spark.operators.timeseries import (
    gapfill_interpolate,
    holt_linear,
)

import pytest

# Driver test budget (VERDICT r11 item 2, pytest.ini): this whole
# randomized-property suite is `slow` — excluded from the default
# driver-budget run, re-proven by the builder's full-suite close.
pytestmark = pytest.mark.slow

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ROW = st.tuples(st.integers(1, 5), st.integers(1, 4))  # (basket, item)


def _ref_pairs(rows):
    """Reference: distinct (basket, item) postings → per-pair distinct
    basket co-occurrence counts."""
    by_bk = {}
    for bk, it in set(rows):
        by_bk.setdefault(bk, set()).add(it)
    counts = {}
    for items in by_bk.values():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                counts[(s[i], s[j])] = counts.get((s[i], s[j]), 0) + 1
    return counts, len(by_bk)


@given(
    before=st.lists(ROW, min_size=1, max_size=20),
    after=st.lists(ROW, min_size=1, max_size=20),
)
@settings(**_SETTINGS)
def test_emerging_pairs_match_python_reference(spark, before, after):
    rb, nb = _ref_pairs(before)
    ra, na = _ref_pairs(after)
    want = {}
    for pair in set(rb) | set(ra):
        cb, ca = rb.get(pair, 0), ra.get(pair, 0)
        if cb < 1 and ca < 1:
            continue
        sb, sa = cb / nb, ca / na
        want[pair] = (
            cb,
            ca,
            round(sb, 4),
            round(sa, 4),
            round(sa / sb, 4) if cb > 0 else None,
            cb == 0,
        )
    b = spark.createDataFrame(before, "bk long, it long")
    a = spark.createDataFrame(after, "bk long, it long")
    got = {
        (r["item_a"], r["item_b"]): (
            r["n_before"], r["n_after"],
            r["support_before"], r["support_after"],
            r["growth"], r["is_new"],
        )
        for r in emerging_pair_patterns(b, a, "bk", "it", 1).collect()
    }
    assert got == want


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=12
    )
)
@settings(**_SETTINGS)
def test_gapfill_interp_matches_numpy(spark, vals):
    """Interior gaps equal numpy.interp over the observed points;
    leading/trailing gaps stay NULL; observations pass through."""
    import numpy as np

    rows = [("k", t, None if v is None else float(v))
            for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {
        r["t"]: r["filled"]
        for r in gapfill_interpolate(df, ["k"], "t", "v").collect()
    }
    obs_t = [t for t, v in enumerate(vals) if v is not None]
    obs_v = [float(v) for v in vals if v is not None]
    for t, v in enumerate(vals):
        if v is not None:
            assert got[t] == float(v)
        elif not obs_t or t < obs_t[0] or t > obs_t[-1]:
            assert got[t] is None  # one-sided: refuse extrapolation
        else:
            want = float(np.interp(t, obs_t, obs_v))
            assert math.isclose(got[t], want, abs_tol=1e-9), (t, vals)


@given(
    xs=st.lists(
        st.floats(-100, 100, allow_nan=False, width=32),
        min_size=1,
        max_size=15,
    ),
    alpha=st.sampled_from([0.25, 0.5, 0.75]),
    beta=st.sampled_from([0.25, 0.5]),
)
@settings(**_SETTINGS)
def test_holt_matches_python_loop(spark, xs, alpha, beta):
    """The grouped map equals an independent Python loop bitwise —
    guarding the Arrow/pandas seam (dtype coercions, sort stability),
    not the algebra."""
    df = spark.createDataFrame(
        [("k", t, float(x)) for t, x in enumerate(xs)],
        "k string, t int, x double",
    )
    got = {
        r["t"]: (r["level"], r["trend"])
        for r in holt_linear(df, ["k"], "t", "x", alpha, beta).collect()
    }
    if len(xs) == 1:
        assert got[0] == (float(xs[0]), None)
        return
    level, trend = float(xs[0]), float(xs[1]) - float(xs[0])
    want = {0: (level, trend)}
    for t in range(1, len(xs)):
        new_level = alpha * float(xs[t]) + (1.0 - alpha) * (level + trend)
        trend = beta * (new_level - level) + (1.0 - beta) * trend
        level = new_level
        want[t] = (level, trend)
    assert got == want
