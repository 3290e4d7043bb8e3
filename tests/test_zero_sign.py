"""Sign-of-zero pinning (the round-6 l43 driver hash failure class).

The driver's value-hash distinguishes IEEE +0.0 from -0.0; rounded
fp-noise around zero can land on opposite signs in Spark vs DuckDB.
The repo-wide discipline is the PAIRED pin `round(x, 4) + 0.0` on both
engines (functions/rounding.py). These tests prove the mirror itself
can no longer mask the class (it used to fold -0.0 into 0.0 before
hashing — exactly why round 6's l43 was locally green and driver-red),
and that round4 performs the IEEE pin.
"""

import math

import pytest

from miningfrequentpattern_spark.functions.rounding import round4
from .oracle import _norm_cell, compare


def test_norm_cell_distinguishes_negative_zero():
    """The mirror must hash -0.0 differently from +0.0 (driver parity)."""
    assert _norm_cell(-0.0) == "-0.0000"
    assert _norm_cell(0.0) == "0.0000"
    assert _norm_cell(-0.0) != _norm_cell(0.0)


def test_compare_fails_on_planted_negative_zero(spark, duck):
    """A planted -0.0 — agreed on by BOTH engines — still fails the
    mirror: unpinned signed zeros are one fixture away from a driver
    hash split, so the tripwire fires before luck runs out."""
    sdf = spark.createDataFrame([(-0.0,)], "x double")
    with pytest.raises(AssertionError, match="-0.0"):
        # NB: a bare -0.0 literal is DECIMAL in DuckDB (+0.0); the
        # round-of-double path is how real -0.0s reach outputs.
        compare(sdf, duck, "SELECT round(CAST(-1e-9 AS DOUBLE), 4) AS x")


def test_compare_catches_cross_engine_sign_split(spark, duck):
    """The exact l43 failure shape: Spark +0.0 vs DuckDB -0.0 — equal
    as numbers, different to the driver hash — must mismatch locally."""
    sdf = spark.createDataFrame([(0.0,)], "x double")
    with pytest.raises(AssertionError):
        compare(sdf, duck, "SELECT round(CAST(-1e-9 AS DOUBLE), 4) AS x")


def test_round4_pins_negative_zero(spark):
    """round4 = round(x, 4) + 0.0: identity on every double except
    -0.0 -> +0.0; NULL passes through."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(-0.00004,), (-0.7,), (0.12345,), (None,)], "x double"
    ).select(round4("x").alias("y"))
    got = [r.y for r in df.collect()]
    assert not math.copysign(1.0, got[0]) < 0  # -0.00004 rounds to +0.0
    assert got[0] == 0.0
    assert got[1] == -0.7
    assert got[2] == 0.1234 or got[2] == 0.1235  # banker's vs half-up
    assert got[3] is None


def test_round4_matches_duckdb_pin(duck):
    """The oracle-side `round(x, 4) + 0.0` lands +0.0 for -0.0 too."""
    raw = duck.execute(
        "SELECT round(CAST(-1e-9 AS DOUBLE), 4) AS y"
    ).df().y[0]
    assert math.copysign(1.0, float(raw)) < 0  # unpinned: -0.0
    v = duck.execute(
        "SELECT round(CAST(-1e-9 AS DOUBLE), 4) + 0.0 AS y"
    ).df().y[0]
    assert v == 0.0 and not math.copysign(1.0, float(v)) < 0


def test_pack_round_sites_are_ratcheted():
    """Static ratchet (VERDICT r7 task): every `F.round(` in a query
    pack is a reviewed decision. A SIGNED rounded output must use
    functions/rounding.py::round4 (which never matches `F.round(`)
    plus the paired oracle `+ 0.0` pin; a structurally non-negative
    output may use plain F.round. Adding a new F.round( site fails
    here until the author confirms the output cannot be negative and
    bumps the baseline — so the l43 class can only recur past an
    explicit review, never by habit."""
    from pathlib import Path

    packs_dir = (
        Path(__file__).resolve().parents[1]
        / "miningfrequentpattern_spark"
        / "queries"
    )
    baseline = {
        "llm_pack.py": 20,
        "mining_pack.py": 16,
        "relational_pack.py": 59,
        # 10 -> 12 in round 9: u04 emb_norm and u05 centroid_norm
        # moved from numpy/Python rounding into F.round (half-even vs
        # the oracle's half-away ties) — both are L2 norms, i.e.
        # structurally NON-NEGATIVE, so the signed sign-of-zero pin
        # (round4 + oracle `+ 0.0`) is not needed; reviewed r9.
        "sources_pack.py": 12,
        "streaming_pack.py": 0,
    }
    got = {
        name: (packs_dir / name).read_text().count("F.round(")
        for name in baseline
    }
    assert got == baseline, (
        "F.round( site count changed in a query pack. New rounded "
        "outputs: if the value can be negative, use round4 (signed "
        "pin) + `round(...,4) + 0.0` in the oracle; if it is "
        "structurally non-negative, review and update this baseline. "
        f"baseline={baseline} got={got}"
    )


def test_oracle_zero_pins_are_paired_with_round():
    """Every `+ 0.0` pin in an oracle SQL must sit directly on a
    round(...) expression — a bare `x + 0.0` pin without rounding
    suggests a one-sided or misplaced pin."""
    import re

    from miningfrequentpattern_spark.queries.registry import (
        ORACLES,
        load_all_packs,
    )

    load_all_packs()
    bad = []
    for name, sql in ORACLES.items():
        sql = re.sub(r"--[^\n]*", "", sql)  # pins in comments don't count
        for m in re.finditer(r"\+\s*0\.0", sql):
            prefix = sql[: m.start()].rstrip()
            if not prefix.endswith(")"):
                bad.append((name, sql[max(0, m.start() - 40): m.end()]))
    assert not bad, f"unpaired zero pins (pin belongs on round(...)): {bad}"
