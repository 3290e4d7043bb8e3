"""Point-in-time SCD2 dimension lookup — round-7 window candidate
(future r84_scd2_lookup), locally certified NOW: the DuckDB oracle
below is the exact SQL the future registration will carry (orders
joined to the r51 versioned user dimension AS OF o_orderdate — THE
warehouse correctness query: which version was true when the fact
happened), plus interval-boundary and tied-valid_from hand pins.

Containment (valid_from <= t < valid_to, NULL valid_to = open) is
used RATHER than an as-of rank: on tied valid_from values SCD2 mints
an empty [t, t) interval for the superseded version, and containment
provably never picks it, where a nearest-at-or-before rank needs a
tie policy. The join is a user-keyed equi-join with range
post-filters — fan-out bounded by versions-per-user (the r06/r08
family; bucket on valid_from at 100 TB if histories grow long)."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import scd2_versions
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r84 oracle, verbatim. The v CTEs are r51's certified
# fragment (version_id kept so every output row is traceable).
R84_ORACLE = """
WITH o AS (SELECT user_id, event_type, ts, event_id FROM events
           WHERE event_type IS NOT NULL),
c AS (SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                       IS DISTINCT FROM event_type
                    OR lag(event_id) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS nv
      FROM o),
v0 AS (SELECT user_id, event_type, ts AS valid_from, event_id
       FROM c WHERE nv = 1),
v AS (SELECT user_id, event_type, valid_from,
             lead(valid_from) OVER
               (PARTITION BY user_id ORDER BY valid_from, event_id)
               AS valid_to,
             event_id AS version_id
      FROM v0)
SELECT ord.o_orderkey, ord.o_custkey, ord.o_orderdate,
       v.event_type AS status_at_order,
       v.valid_from, v.version_id
FROM orders ord JOIN v ON v.user_id = ord.o_custkey
 AND v.valid_from <= ord.o_orderdate
 AND (v.valid_to IS NULL OR ord.o_orderdate < v.valid_to)
"""


def _r84(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    v = scd2_versions(ev, ["user_id"], ["event_type"], "ts", "event_id")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    return orders.join(
        v.hint("shuffle_hash"),
        (F.col("user_id") == F.col("o_custkey"))
        & (F.col("valid_from") <= F.col("o_orderdate"))
        & (
            F.col("valid_to").isNull()
            | (F.col("o_orderdate") < F.col("valid_to"))
        ),
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("event_type").alias("status_at_order"),
        "valid_from",
        "version_id",
    )


def _lookup(facts, versions):
    """Containment join of (f.k, f.t) facts against SCD2 versions."""
    return (
        facts.alias("f")
        .join(
            versions.alias("d"),
            (F.col("f.k") == F.col("d.k"))
            & (F.col("d.valid_from") <= F.col("f.t"))
            & (
                F.col("d.valid_to").isNull()
                | (F.col("f.t") < F.col("d.valid_to"))
            ),
        )
        .select("f.fid", F.col("d.attr").alias("status"))
    )


def test_scd2_lookup_matches_duckdb_oracle(spark, duck):
    compare(_r84(spark, SF_ORACLE), duck, R84_ORACLE)


def test_scd2_lookup_interval_boundaries(spark):
    """Versions for one key: A from t=1 (to 5), B from t=5 (open).
    Lookups: t=0 → no row (before history, never a fabricated
    match); t=1 → A (inclusive from); t=5 → B (half-open: A's
    valid_to excludes it); t=9 → B (open current version)."""
    dim = spark.createDataFrame(
        [(1, 1, "A", 10), (1, 5, "B", 20)],
        "k long, ts long, attr string, eid long",
    )
    v = scd2_versions(dim, ["k"], ["attr"], "ts", "eid")
    facts = spark.createDataFrame(
        [(100, 1, 0), (101, 1, 1), (102, 1, 5), (103, 1, 9)],
        "fid long, k long, t long",
    )
    got = {r["fid"]: r["status"] for r in _lookup(facts, v).collect()}
    assert got == {101: "A", 102: "B", 103: "B"}  # 100: no version yet


def test_scd2_lookup_never_returns_an_empty_interval(spark):
    """Tied valid_from (C then D both at t=5, ordered by version id):
    SCD2 mints the empty [5, 5) interval for C; containment must
    return exactly D at t=5 — the tie case where an as-of
    nearest-at-or-before rank would need a policy."""
    tied = spark.createDataFrame(
        [(1, 5, "C", 1), (1, 5, "D", 2)],
        "k long, ts long, attr string, eid long",
    )
    tv = scd2_versions(tied, ["k"], ["attr"], "ts", "eid")
    probe = spark.createDataFrame([(7, 1, 5)], "fid long, k long, t long")
    got = [r["status"] for r in _lookup(probe, tv).collect()]
    assert got == ["D"]
