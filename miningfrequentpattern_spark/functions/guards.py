"""Input-contract guards shared by operators.

`reject_working_cols` — hardening (h) of the r9 relational review
sweep: the ranked/joined operator family projects internal working
columns (`_rn`, `_lid`, `_bk`, `_mid`, `_pid`, `_salt`, ...) onto the
caller's relation. A user column that happens to carry one of those
names would be silently shadowed, joined on, or dropped — corrupting
results with no error. Failing fast with the colliding names beats
both silent outcomes; the caller renames and retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def reject_working_cols(
    df: DataFrame, working: tuple[str, ...], op: str
) -> None:
    """Raise a named ValueError when `df` carries a column an
    operator uses internally.

    Names compare CASEFOLDED (r10 review): Spark's default resolver
    is case-insensitive (spark.sql.caseSensitive=false, never set in
    this repo), so a user `_SALT` column is exactly as shadowed by
    withColumn("_salt", ...) as a lowercase one — an exact-string
    intersection would wave it through into the silent corruption
    this guard exists to stop."""
    wset = {w.casefold() for w in working}
    clash = sorted(c for c in df.columns if c.casefold() in wset)
    if clash:
        raise ValueError(
            f"{op}: input column(s) {clash} collide with internal "
            f"working columns {sorted(working)} — rename them before "
            f"calling"
        )
