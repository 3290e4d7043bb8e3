"""Property-based certification, second staged batch (hypothesis +
pure-Python references): k-truss vs a reference peel, bucketed
interval-overlap vs brute force, PPR stochastic-mass conservation,
and CUPED's variance inequality. Few examples by design (each is a
Spark job); the value is input SHAPE coverage."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

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

EDGE = st.tuples(st.integers(0, 7), st.integers(0, 7))


def _ref_ktruss(edges: set[tuple[int, int]], k: int) -> dict:
    """Reference peel: canonical undirected, iterate support filter."""
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        sup = {}
        for e in es:
            a, b = e
            common = sum(
                1
                for v in range(8)
                if (min(a, v), max(a, v)) in es
                and (min(b, v), max(b, v)) in es
                and v not in e
            )
            sup[e] = common
        keep = {e for e in es if sup[e] >= k - 2}
        if keep == es:
            return {e: sup[e] for e in es}
        es = keep


@given(edges=st.sets(EDGE, min_size=0, max_size=16), k=st.integers(3, 5))
@settings(**_SETTINGS)
def test_ktruss_matches_python_peel(spark, edges, k):
    from miningfrequentpattern_spark.operators.graph import ktruss

    df = spark.createDataFrame(
        list(edges) or [(0, 0)], "src long, dst long"
    )
    got = {
        (r["s"], r["d"]): r["support"] for r in ktruss(df, k).collect()
    }
    assert got == _ref_ktruss(edges, k), (sorted(edges), k)


IVL = st.tuples(
    st.integers(0, 40), st.integers(1, 15)
).map(lambda t: (float(t[0]), float(t[0] + t[1])))


@given(
    a=st.lists(IVL, min_size=0, max_size=6),
    b=st.lists(IVL, min_size=0, max_size=6),
)
@settings(**_SETTINGS)
def test_interval_overlap_bucketed_matches_brute_force(spark, a, b):
    """Bucketed claim-cell result == the brute-force half-open
    overlap pairs, for arbitrary interval sets and a bucket smaller
    than most spans (duplicate intervals make duplicate PAIRS — the
    join is a bag, like the naive one)."""
    from miningfrequentpattern_spark.operators.timeseries import (
        interval_overlap_join,
    )

    adf = spark.createDataFrame(
        [("k", s, e) for s, e in a] or [("k", 0.0, 0.0)],
        "k string, span_start double, span_end double",
    )
    bdf = spark.createDataFrame(
        [("k", s, e) for s, e in b] or [("k", 0.0, 0.0)],
        "k string, span_start double, span_end double",
    )
    got = sorted(
        (r["a_start"], r["a_end"], r["b_start"], r["b_end"])
        for r in interval_overlap_join(
            adf, bdf, ["k"], bucket="3 seconds"
        ).collect()
    )
    want = sorted(
        (sa, ea, sb, eb)
        for sa, ea in a
        for sb, eb in b
        if sa < eb and sb < ea
    )
    assert got == want


@given(edges=st.sets(EDGE, min_size=1, max_size=14))
@settings(**_SETTINGS)
def test_ppr_conserves_mass_on_symmetrized_graphs(spark, edges):
    """On a symmetrized graph (no dangling nodes) PPR is a proper
    probability distribution: Σ ppr/N == 1 to fp tolerance, whatever
    the seed set — the same conservation law the uniform operator's
    property test pins."""
    from miningfrequentpattern_spark.operators.graph import (
        personalized_pagerank,
    )

    und = {(a, b) for a, b in edges if a != b}
    if not und:
        return
    sym = list(und) + [(b, a) for a, b in und]
    df = spark.createDataFrame(sym, "src long, dst long")
    seed_id = min(min(a, b) for a, b in und)
    seeds = spark.createDataFrame([(seed_id,)], "id long")
    rows = personalized_pagerank(df, seeds, 6).collect()
    n = len(rows)
    total = sum(r["ppr"] for r in rows) / n
    assert abs(total - 1.0) < 1e-3, (sorted(und), total)


@given(
    rows=st.lists(
        st.tuples(st.integers(-5, 5), st.integers(-5, 5)),
        min_size=2,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_cuped_never_increases_variance(spark, rows):
    """var(adjusted) ≤ var(y) for ANY covariate: with the fitted
    theta, var(y − θ(x − x̄)) = var(y) − cov²/var(x) ≤ var(y) —
    checked to the 4dp rounding grain."""
    import statistics

    from miningfrequentpattern_spark.operators.relational import (
        cuped_adjust,
    )

    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(rows)],
        "u long, pre double, post double",
    )
    got = cuped_adjust(df, "post", "pre", carry=["u"]).collect()
    raw = [r["post"] for r in got]
    adj = [r["adjusted"] for r in got]
    assert statistics.pvariance(adj) <= statistics.pvariance(raw) + 1e-3
