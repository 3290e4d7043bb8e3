"""Point-in-time SCD2 dimension lookup —
PROMOTED round 7 as r84_scd2_lookup: the DuckDB oracle moved VERBATIM
into the @query registration (tests/test_oracle_parity.py now
carries the compare); the property/edge/hand pins stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import scd2_versions
from miningfrequentpattern_spark.sources.io import load_table


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
