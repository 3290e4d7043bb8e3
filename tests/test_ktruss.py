"""k-truss membership (operators/graph.py::ktruss) — promoted round
6 as m25_part_ktruss: the generated oracle now lives on the
registration (queries/mining_pack.py::_ktruss_oracle — imported here
so the slack test exercises the EXACT SQL the driver runs);
driver-grade value parity is mirrored by tests/test_oracle_parity.py.
This file keeps the oracle-strategy slack test (the chain must run
past the fixture's fixpoint) and the closed-form K4 / broken-K4 hand
pins covering the cascade a one-shot support filter misses."""

import pytest
from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.graph import ktruss
from miningfrequentpattern_spark.queries.mining_pack import (
    _KTRUSS_ORACLE_ROUNDS as _ROUNDS,
)
from miningfrequentpattern_spark.queries.mining_pack import (
    KTRUSS_ORACLE as M25_ORACLE,
)


def test_ktruss_oracle_chain_has_peel_depth_slack(duck):
    """The unrolled chain must run PAST the fixture's fixpoint: the
    last two rounds' edge sets are identical (so the chained oracle
    equals the peel-until-stable answer), with at least one spare
    round. A regenerated fixture that peels deeper fails HERE, not
    as a silent driver hash mismatch (the m18 stance)."""
    prefix = M25_ORACLE[: M25_ORACLE.rindex("SELECT")]
    n_last, n_prev = (
        duck.execute(
            prefix
            + f"SELECT (SELECT count(*) FROM e{_ROUNDS}), "
            + f"(SELECT count(*) FROM e{_ROUNDS - 1})"
        ).fetchone()
    )
    assert n_last == n_prev, (n_last, n_prev)
    # and the peel did REAL work: the raw thresholded graph is larger
    n0 = duck.execute(
        prefix + "SELECT count(*) FROM e0"
    ).fetchone()[0]
    assert n0 > n_last > 0, (n0, n_last)


def test_ktruss_k4_survives_broken_k4_cascades_to_empty(spark):
    """K4 IS a 4-truss (every edge in 2 triangles). Remove one edge:
    four edges drop to support 1, and after they peel the last edge
    has support 0 — the CASCADE a one-shot support filter misses
    (it would keep (1,2), whose 2 triangles both used doomed
    edges)."""
    k4 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)],
        "src long, dst long",
    )
    got = {
        (r["s"], r["d"]): r["support"] for r in ktruss(k4, 4).collect()
    }
    assert got == {(i, j): 2 for i in (1, 2, 3) for j in range(i + 1, 5)}
    broken = k4.filter(~((F.col("src") == 3) & (F.col("dst") == 4)))
    assert ktruss(broken, 4).count() == 0


def test_ktruss_triangle_is_a_3_truss(spark):
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    rows = ktruss(tri, 3).collect()
    assert len(rows) == 3 and all(r["support"] == 1 for r in rows)
    assert ktruss(tri, 4).count() == 0


def test_ktruss_empty_and_triangle_free(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert ktruss(empty, 4).count() == 0
    path = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert ktruss(path, 3).count() == 0


def test_ktruss_raises_on_truncation(spark):
    k4 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)],
        "src long, dst long",
    )
    # max_iter=0 cannot even compute the first round
    with pytest.raises(RuntimeError, match="did not stabilize"):
        ktruss(k4, 4, max_iter=0)
