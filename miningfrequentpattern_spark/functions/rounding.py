"""Sign-of-zero-pinned rounding for cross-engine hash parity.

The driver's value-hash distinguishes IEEE +0.0 from -0.0. A rounded
float that is fp-noise around zero (a near-orthogonal correlation, a
near-flat slope, a residual of near-equal aggregates) can round to
-0.0 in one engine and +0.0 in the other — the round-6
l43_embedding_corr_matrix driver failure was exactly this: cell
(6, 10) was +0.0 in Spark and -0.0 in DuckDB, values otherwise equal.

The fix is an IEEE identity: ``x + 0.0`` is a no-op for every double
EXCEPT -0.0, which becomes +0.0 (round-to-nearest: -0.0 + 0.0 = +0.0;
NULL and NaN pass through). Pin BOTH sides — ``round4()`` here and
``round(expr, 4) + 0.0`` in the DuckDB oracle SQL — at the same
columns. Paired pinning can never break parity (it maps both engines'
-0.0 to the same +0.0); one-sided pinning can.

Only outputs that can land on exact zero FROM BELOW need the pin
(signed quantities: correlations, slopes, residuals, z-scores, PSI
terms, deviations). Structurally non-negative outputs (counts,
shares of non-negative sums, squared terms) cannot be -0.0 in either
engine and are left unpinned.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round4(col: Column | str, scale: int = 4) -> Column:
    """Round to `scale` decimals and pin -0.0 to +0.0 (IEEE x + 0.0).

    Use for any signed float output; pair with ``round(..., 4) + 0.0``
    in the query's oracle SQL.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale) + F.lit(0.0)
