"""k-truss membership (operators/graph.py::ktruss) — round-6 window
candidate, locally certified NOW: the generated DuckDB oracle below
is the exact SQL a future m25_part_ktruss registration will carry
(the 3-truss of the support-thresholded co-purchase graph — the m18
graph one cohesion notch denser; 3,445 edges peel to the 181 that
sit in mutually-surviving triangles, fixpoint at round 2, and the
4-truss of this graph is EMPTY — max within-set support is 2 — so
k = 3 is the largest non-vacuous certification), with the kcore
oracle strategy:
peel-until-stable on the Spark side vs a FIXED unrolled round chain
on the DuckDB side, plus a slack test proving the chain runs past
the fixture's fixpoint. Closed-form K4 / broken-K4 hand pins cover
the cascade a one-shot support filter misses."""

import pytest
from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.graph import ktruss
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

_KTRUSS_K = 3  # need >= 1 within-truss triangle per edge
_ROUNDS = 6


def _ktruss_oracle() -> str:
    """Generated, not hand-unrolled (the m18 stance): the round body
    exists once; every CTE is MATERIALIZED because each round
    references its predecessor multiple times and DuckDB's default
    inlining would expand the chain multiplicatively."""
    ctes = [
        """li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                  FROM lineitem),
    e0 AS MATERIALIZED (SELECT a.pk AS s, b.pk AS d FROM li a
           JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING count(*) >= 2)"""
    ]
    for i in range(1, _ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"""tri{i} AS MATERIALIZED (
             SELECT a.s AS x, a.d AS y, b.d AS z
             FROM e{p} a JOIN e{p} b ON a.d = b.s
             JOIN e{p} c ON c.s = a.s AND c.d = b.d),
    sup{i} AS MATERIALIZED (
             SELECT s, d, count(*) AS sup FROM (
               SELECT x AS s, y AS d FROM tri{i}
               UNION ALL SELECT y, z FROM tri{i}
               UNION ALL SELECT x, z FROM tri{i})
             GROUP BY 1, 2),
    e{i} AS MATERIALIZED (
             SELECT e.s, e.d FROM e{p} e
             JOIN sup{i} u ON u.s = e.s AND u.d = e.d
                          AND u.sup >= {_KTRUSS_K - 2})"""
        )
    last, lsup = f"e{_ROUNDS}", f"sup{_ROUNDS}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT e.s AS part_a, e.d AS part_b, u.sup AS support
    FROM {last} e JOIN {lsup} u ON u.s = e.s AND u.d = e.d"""
    )


M25_ORACLE = _ktruss_oracle()


def _thresholded_copurchase(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("src", "dst")
    )


def _m25(spark, sf_dir):
    return ktruss(_thresholded_copurchase(spark, sf_dir), _KTRUSS_K).select(
        F.col("s").alias("part_a"), F.col("d").alias("part_b"), "support"
    )


def test_ktruss_matches_duckdb_oracle(spark, duck):
    compare(_m25(spark, SF_ORACLE), duck, M25_ORACLE)


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
