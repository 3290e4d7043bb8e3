"""Rotation-window invariants: the driver hash-checks only the FIRST
50 registry entries per round, and the window rotates so every query
cumulatively earns a driver row (queries/registry.py PRIORITY). These
tests keep future rotations honest mechanically, instead of trusting
the comment above PRIORITY."""

import glob
import json
from pathlib import Path

from miningfrequentpattern_spark.queries.registry import (
    ORACLES,
    QUERIES,
    load_all_packs,
)

ROOT = Path(__file__).resolve().parents[1]
WINDOW = 50

load_all_packs()


def _driver_proven() -> tuple[set, set]:
    """(hash-proven, run-proven) query names across all recorded
    CORRECTNESS_r*.json driver rounds."""
    hashed, ran = set(), set()
    for f in glob.glob(str(ROOT / "CORRECTNESS_r*.json")):
        for name, row in json.load(open(f)).items():
            if row.get("hash_match"):
                hashed.add(name)
            if row.get("spark_rows") is not None:
                ran.add(name)
    return hashed, ran


def test_priority_fits_the_window():
    """Every PRIORITY name must actually land inside the driver's
    50-row window — a 51st entry is a silently dead slot (this
    caught a real overflow in round 4)."""
    from miningfrequentpattern_spark.queries.registry import PRIORITY

    assert len(PRIORITY) <= WINDOW, (
        f"PRIORITY has {len(PRIORITY)} entries; the driver checks "
        f"only the first {WINDOW} — trailing entries are dead slots: "
        f"{PRIORITY[WINDOW:]}"
    )


def test_window_is_all_oracle_bearing():
    """Wasting a window slot on a rows-only query is only justified
    when that query has never been run-proven, OR when the rotation
    deliberately re-promotes it for a FRESH run-proof and says so in
    registry.ROWS_ONLY_REFRESH (round-5 policy: the 11 rows-only
    queries' last driver rows were r3). Anything else is an
    accidental wasted slot and fails here."""
    from miningfrequentpattern_spark.queries.registry import (
        ROWS_ONLY_REFRESH,
    )

    _, ran = _driver_proven()
    window = list(QUERIES)[:WINDOW]
    weak = [
        n
        for n in window
        if n not in ORACLES and n in ran and n not in ROWS_ONLY_REFRESH
    ]
    assert not weak, (
        f"window slots spent on rows-only queries already run-proven: {weak}"
    )
    # The refresh list must itself be honest: only rows-only names.
    assert not (ROWS_ONLY_REFRESH & set(ORACLES)), (
        "ROWS_ONLY_REFRESH contains oracle-bearing queries: "
        f"{sorted(ROWS_ONLY_REFRESH & set(ORACLES))}"
    )


def test_every_oracle_query_proven_or_windowed():
    """No oracle-bearing query may be left in limbo: each one either
    already has a green driver hash row in some recorded round, or is
    inside the current first-50 window so it earns one next round."""
    hashed, _ = _driver_proven()
    window = set(list(QUERIES)[:WINDOW])
    limbo = [n for n in ORACLES if n not in hashed and n not in window]
    assert not limbo, (
        "oracle-bearing queries neither driver-proven nor scheduled "
        f"in the verification window: {limbo}"
    )


def test_every_rows_only_query_run_proven_or_windowed():
    """Rows-only-by-design queries (randomized/engine-specific) still
    need a driver RUN proof: each either has a recorded driver row or
    sits in the window."""
    _, ran = _driver_proven()
    window = set(list(QUERIES)[:WINDOW])
    limbo = [
        n for n in QUERIES
        if n not in ORACLES and n not in ran and n not in window
    ]
    assert not limbo, (
        f"rows-only queries never run in the driver env nor scheduled: {limbo}"
    )


def test_canaries_always_in_window():
    """The three cross-pack drift canaries stay in every round's
    window to catch driver-environment changes."""
    window = list(QUERIES)[:WINDOW]
    for canary in ("m01_basketize_orders", "r01_filter_project",
                   "l01_exact_dedup"):
        assert canary in window, f"drift canary {canary} rotated out"
