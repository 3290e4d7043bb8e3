"""Z-order (Morton) layout keys — multi-dimensional data clustering
for scan pruning (SURVEY.md §2 S-extensions).

The 100 TB problem this solves: parquet min/max (and partition) stats
prune scans on ONE sort dimension; a table sorted by time answers
time filters but full-scans for user filters. Interleaving the bits
of two (or more) dimension keys into one Morton value and
range-sorting by it bounds EVERY dimension's span within each file,
so min/max stats prune on all of them — the same technique Delta
OPTIMIZE ZORDER BY and Iceberg's z-ordered rewrites apply; here it is
just an expression + `repartitionByRange(zval)` + sorted write, no
table format required.

Pure native bit arithmetic (shifts/and/or are JVM intrinsics inside
codegen), expressible identically in any engine with 64-bit ints —
the DuckDB oracle runs the same formula.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Magic-constant bit spreading (the standard Morton encode): after
# each step the value's set bits move to even positions.
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread16(col: Column) -> Column:
    """Spread the low 16 bits of `col` onto even bit positions
    (b15..b0 -> bit 30, 28, ..., 0)."""
    v = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def morton2(x: Column, y: Column) -> Column:
    """Interleave two 16-bit keys into one 32-bit Morton (z-order)
    value: x on even bits, y on odd. Sort/range-partition by this to
    cluster both dimensions at once."""
    return spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1))


def morton2_sql(x_expr: str, y_expr: str) -> str:
    """The identical Morton formula as engine-portable SQL text (used
    verbatim by the DuckDB oracle so both engines compute the same
    key)."""

    def spread(e: str) -> str:
        v = f"(({e}) & 65535)"
        for shift, mask in _SPREAD_STEPS:
            v = f"(({v} | ({v} << {shift})) & {mask})"
        return v

    return f"({spread(x_expr)} | ({spread(y_expr)} << 1))"


# --- STAGED round-12 candidate (registry booking (n), round 11) ----
# spread16 TRUNCATES inputs to 16 bits, so dimension values 65536
# apart interleave identically — file-level min/max pruning quietly
# weakens on wide-domain keys (s09 already feeds hour ≈ 490k and
# unbounded user_id). The fix: RANGE-BUCKET each dimension onto the
# full 16-bit domain first, from data-derived bounds. Staged here
# (s09's registered formula is untouched until its r12 re-cert slot);
# certified by tests/test_zorder_bucketed_staged.py.


def bucket16(col: Column, lo: Column, hi: Column) -> Column:
    """Monotone range-bucket of an integer column onto [0, 65535]:
    floor((col - lo) * 65536 / (hi - lo + 1)), clamped. `lo`/`hi` are
    the dimension's (broadcast) data bounds; in-range values never
    need the clamp (the index is < 65536 by construction), which
    exists for out-of-bounds late rows when bounds come from a stale
    profile. Monotone ⇒ z-order locality is preserved; surjective
    onto the full 16-bit domain ⇒ no truncation aliasing. Arithmetic
    parity: (col-lo)*65536 stays an exact BIGINT for spans < 2^47,
    the division is one correctly-rounded double op, and floor() of
    the identical double agrees on every engine (the oracle mirrors
    the same floor-of-double form — DuckDB `/` is float division)."""
    idx = F.floor(
        ((col.cast("long") - lo.cast("long")) * F.lit(65536))
        / (hi.cast("long") - lo.cast("long") + F.lit(1))
    ).cast("long")
    return F.least(F.greatest(idx, F.lit(0)), F.lit(65535))


def bucket16_sql(e: str, lo: str, hi: str) -> str:
    """bucket16's engine-portable SQL text (floor of FLOAT division,
    matching Spark's `/` — NOT DuckDB's integer `//`, whose
    truncation could disagree with the double rounding at exact-
    multiple boundaries)."""
    return (
        f"least(greatest(CAST(floor(((({e}) - ({lo})) * 65536)"
        f" / (({hi}) - ({lo}) + 1)) AS BIGINT), 0), 65535)"
    )


def morton2_bucketed(
    x: Column, y: Column,
    x_lo: Column, x_hi: Column,
    y_lo: Column, y_hi: Column,
) -> Column:
    """Morton key over range-bucketed dimensions — the wide-domain
    z-order form: each dimension is mapped onto the FULL 16-bit
    domain before interleaving, so min/max pruning keeps resolution
    however wide the raw key domains are."""
    return morton2(bucket16(x, x_lo, x_hi), bucket16(y, y_lo, y_hi))
