"""STAGED round-12 candidate: range-bucketed z-order keys (registry
booking (n), round 11).

spread16 truncates to 16 bits, so s09's wide-domain inputs (hour
≈ 490k, unbounded user_id) alias 65536 apart — both engines agree, so
no hash ever failed, but file-level min/max pruning quietly weakens.
The staged fix (functions/zorder.py::bucket16 / morton2_bucketed)
range-buckets each dimension onto the full 16-bit domain from
data-derived bounds. These tests certify the staged r12 shape of the
s09 registration: the Spark expression vs the identical SQL (oracle
parity), monotonicity (locality preserved), full-domain coverage (no
aliasing), and the clamp for out-of-bounds stragglers.

PROMOTED round 12: s09_zorder_key's registered body + oracle now ARE
these staged forms (sources_pack.py) — these tests stay as the
independent certification of the shape and of bucket16's properties.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_ORACLE
from .oracle import compare


def _staged_s09_spark(spark, sf_dir):
    """The r12 shape: z-order key over range-bucketed (user_id, hour)."""
    from miningfrequentpattern_spark.functions.zorder import (
        morton2_bucketed,
    )
    from miningfrequentpattern_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < 2000
    )
    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    base = ev.select("event_id", F.col("user_id").alias("u"), hour.alias("h"))
    bounds = base.agg(
        F.min("u").alias("ulo"), F.max("u").alias("uhi"),
        F.min("h").alias("hlo"), F.max("h").alias("hhi"),
    )
    return base.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        morton2_bucketed(
            F.col("u"), F.col("h"),
            F.col("ulo"), F.col("uhi"), F.col("hlo"), F.col("hhi"),
        ).alias("zval"),
    )


def _staged_s09_oracle() -> str:
    from miningfrequentpattern_spark.functions.zorder import (
        bucket16_sql,
        morton2_sql,
    )

    bx = bucket16_sql("u", "(SELECT ulo FROM b)", "(SELECT uhi FROM b)")
    by = bucket16_sql("h", "(SELECT hlo FROM b)", "(SELECT hhi FROM b)")
    return f"""
    WITH e AS (SELECT event_id, user_id AS u,
                      CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h
               FROM events WHERE event_id < 2000),
    b AS (SELECT min(u) AS ulo, max(u) AS uhi,
                 min(h) AS hlo, max(h) AS hhi FROM e)
    SELECT event_id, {morton2_sql(bx, by)} AS zval FROM e
    """


def test_bucketed_zorder_oracle_parity(spark, duck):
    """The staged r12 s09 shape hash-matches its SQL twin at sf0.01 —
    bounds derivation, floor-of-double bucketing, clamp, and the
    Morton interleave, value-for-value."""
    compare(_staged_s09_spark(spark, SF_ORACLE), duck, _staged_s09_oracle())


def test_bucket16_monotone_full_domain_and_clamp(spark):
    """bucket16 is monotone (z-order locality preserved), surjective
    onto the 16-bit endpoints (lo -> 0, hi -> 65535 — no truncation
    aliasing), and clamps out-of-bounds values instead of wrapping."""
    from miningfrequentpattern_spark.functions.zorder import bucket16

    lo, hi = 1_000_000, 2_000_000  # a 20-bit-wide domain
    vals = [lo, lo + 1, 1_234_567, 1_765_432, hi - 1, hi,
            lo - 50, hi + 50]  # last two: out-of-bounds stragglers
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: r["b"]
        for r in df.select(
            "v",
            bucket16(F.col("v"), F.lit(lo), F.lit(hi)).alias("b"),
        ).collect()
    }
    assert got[lo] == 0 and got[hi] == 65535
    in_domain = [got[v] for v in sorted(vals[:6])]
    assert in_domain == sorted(in_domain)  # monotone
    assert all(0 <= b <= 65535 for b in got.values())
    assert got[lo - 50] == 0 and got[hi + 50] == 65535  # clamped
    # distinct in-domain values 65536 apart can no longer alias:
    # the map is monotone over the live domain, so equal buckets can
    # only come from values inside the same (span/65536)-wide cell
    wide = spark.createDataFrame(
        [(v,) for v in (lo, lo + 65536, lo + 2 * 65536)], "v long"
    )
    bs = [
        r["b"]
        for r in wide.select(
            bucket16(F.col("v"), F.lit(lo), F.lit(hi)).alias("b")
        ).collect()
    ]
    assert len(set(bs)) == 3
