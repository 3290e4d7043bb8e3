"""Property-based certification of the staged statistical operators
(hypothesis + numpy references): randomized inputs cover the shapes
the fixture-oracle pair never hits — ragged series, heavy ties,
constant groups, adversarial bin edges. Examples are deliberately
few (each one is a Spark job); the value is input SHAPE coverage.
"""

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest
# Driver test budget (VERDICT r11 item 2, pytest.ini): this whole
# randomized-property suite is `slow` — excluded from the default
# driver-budget run, re-proven by the builder's full-suite close.
pytestmark = pytest.mark.slow


_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small-integer-valued doubles: tie-heavy on purpose, and exact in
# float64 so references can compare without tolerance gymnastics
VAL = st.integers(-5, 5).map(float)


@given(xs=st.lists(VAL, min_size=2, max_size=14))
@settings(**_SETTINGS)
def test_theil_sen_matches_numpy_reference(spark, xs):
    from miningfrequentpattern_spark.operators.timeseries import (
        theil_sen_trend,
    )

    df = spark.createDataFrame(
        [("s", float(t), x) for t, x in enumerate(xs)],
        "k string, t double, x double",
    )
    got = theil_sen_trend(df, ["k"], "t", "x").collect()[0]
    slopes = sorted(
        (xs[j] - xs[i]) / (j - i)
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    )
    want_slope = float(np.percentile(slopes, 50))  # (n−1)p interpolation
    assert got["n_pairs"] == len(slopes)
    assert abs(got["sen_slope"] - round(want_slope, 4)) <= 1e-9
    resid = sorted(x - want_slope * t for t, x in enumerate(xs))
    want_icpt = float(np.percentile(resid, 50))
    assert abs(got["sen_intercept"] - round(want_icpt, 4)) <= 2e-4


@given(
    a=st.lists(VAL, min_size=1, max_size=10),
    b=st.lists(VAL, min_size=1, max_size=10),
)
@settings(**_SETTINGS)
def test_mannwhitney_matches_reference(spark, a, b):
    """Tie-corrected U/z against a direct midrank computation — the
    tie-heavy VAL domain exercises the Σ(t³−t) correction on nearly
    every example."""
    from miningfrequentpattern_spark.operators.relational import (
        mannwhitney_z,
    )

    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = mannwhitney_z(df, "g", "v", "a", "b").collect()[0]

    pooled = sorted((v, g) for g, v in rows)
    midrank: dict[float, float] = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        midrank[pooled[i][0]] = (i + 1 + j) / 2  # avg of ranks i+1..j
        i = j
    ra = sum(midrank[v] for v in a)
    na, nb, n = len(a), len(b), len(a) + len(b)
    u = ra - na * (na + 1) / 2
    ties = 0
    for v in set(a + b):
        t = (a + b).count(v)
        ties += t**3 - t
    var = na * nb / 12 * ((n + 1) - ties / (n * (n - 1))) if n > 1 else 0.0
    assert got["u_stat"] == round(u, 4)
    if var > 0:
        assert abs(got["z"] - round((u - na * nb / 2) / math.sqrt(var), 4)) <= 1e-9
    else:
        assert got["z"] is None


@given(
    rows=st.lists(
        st.tuples(st.sampled_from("xy"), st.sampled_from("pqr")),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_chi2_parts_sum_matches_reference(spark, rows):
    from miningfrequentpattern_spark.operators.relational import (
        chi2_independence,
    )

    df = spark.createDataFrame(rows, "a string, b string")
    got = chi2_independence(df, "a", "b").collect()
    n = len(rows)
    ra = {a: sum(1 for x, _ in rows if x == a) for a, _ in rows}
    cb = {b: sum(1 for _, y in rows if y == b) for _, b in rows}
    for r in got:
        e = ra[r["a"]] * cb[r["b"]] / n
        o = sum(1 for x, y in rows if (x, y) == (r["a"], r["b"]))
        assert r["n_obs"] == o
        assert abs(r["expected"] - round(e, 4)) <= 1e-9
        assert abs(r["chi2_part"] - round((o - e) ** 2 / e, 4)) <= 2e-4


@given(
    ref=st.lists(VAL, min_size=4, max_size=20),
    cur=st.lists(VAL, min_size=0, max_size=20),
    n_bins=st.integers(2, 5),
)
@settings(**_SETTINGS)
def test_psi_invariants(spark, ref, cur, n_bins):
    """Structural invariants on ANY input: counts conserve (every
    non-NULL row lands in exactly one bin), shares sum to 1 per
    populated side, psi_part is finite everywhere, and identical
    ref/cur give total PSI 0."""
    from miningfrequentpattern_spark.operators.relational import psi_drift

    rdf = spark.createDataFrame([(v,) for v in ref], "v double")
    cdf = spark.createDataFrame([(v,) for v in cur], "v double")
    rows = psi_drift(rdf, cdf, "v", n_bins=n_bins).collect()
    assert sum(r["n_ref"] for r in rows) == len(ref)
    assert sum(r["n_cur"] for r in rows) == len(cur)
    assert all(r["psi_part"] is not None for r in rows)
    assert abs(sum(r["ref_share"] for r in rows) - 1.0) <= 1e-3
    same = psi_drift(rdf, rdf, "v", n_bins=n_bins).collect()
    assert abs(sum(r["psi_part"] for r in same)) <= 1e-9


@given(xs=st.lists(VAL, min_size=1, max_size=12), k=st.integers(1, 4))
@settings(**_SETTINGS)
def test_acf_matches_numpy_on_any_series(spark, xs, k):
    from miningfrequentpattern_spark.operators.timeseries import (
        autocorrelation,
    )

    df = spark.createDataFrame(
        [("s", i, x) for i, x in enumerate(xs)], "k string, t int, x double"
    )
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in autocorrelation(df, ["k"], "t", "x", k).collect()
    }
    arr = np.array(xs)
    for lag in range(1, k + 1):
        n_pairs, acf = got[lag]
        assert n_pairs == max(0, len(xs) - lag)
        if n_pairs >= 2:
            with np.errstate(invalid="ignore"):
                want = np.corrcoef(arr[lag:], arr[:-lag])[0, 1]
            if math.isnan(want):
                assert acf is None  # flat leg: corr undefined
            else:
                assert abs(acf - round(float(want), 4)) <= 2e-4
        else:
            assert acf is None


def test_psi_drift_excludes_nan_like_null(spark):
    """NaN is excluded from both PSI sides like NULL (code-review r9:
    Spark sorts NaN above all reals, so reference NaN poisoned the
    top edges and a current-side NaN inflated the top bin — a sensor
    glitch read as maximal drift). Result equals the NaN-free run."""
    from miningfrequentpattern_spark.operators.relational import psi_drift

    clean_ref = spark.range(100).selectExpr("CAST(id AS DOUBLE) AS v")
    clean_cur = spark.range(100).selectExpr("CAST(id + 5 AS DOUBLE) AS v")
    nan = spark.sql("SELECT CAST('NaN' AS DOUBLE) AS v")
    a = psi_drift(clean_ref, clean_cur, "v").collect()
    b = psi_drift(
        clean_ref.unionAll(nan), clean_cur.unionAll(nan), "v"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
