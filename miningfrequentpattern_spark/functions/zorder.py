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
