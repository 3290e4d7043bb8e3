"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a named
query `(spark, sf_dir) -> DataFrame`, optionally paired with a DuckDB
oracle SQL string. `__spark_entry__.queries()` / `oracle_sql()` are
thin views over this registry.

Registration is via the @query decorator:

    @query("r9_agg", oracle="SELECT ... AS sum_qty FROM lineitem ...")
    def r9_agg(spark, sf_dir): ...

Contract rules enforced by convention here and asserted in
tests/test_registry.py:
- every computed column is aliased IDENTICALLY in the Spark plan and
  the oracle SQL (driver hashes columns sorted by name);
- float aggregates rounded to 4dp on BOTH sides;
- array columns sorted on both sides (value-hash is row-order
  insensitive, not element-order insensitive);
- nondeterministic ops (approx_*, LSH, xxhash64) never get an oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str, **kw: Any) -> DataFrame:
            # Harden runtime conf on whatever session the driver hands us
            # (UTC tz, Arrow, AQE) — oracle parity depends on it.
            from ..session import harden

            harden(spark)
            return fn(spark, sf_dir, **kw)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def load_all_packs() -> None:
    """Import every query pack so registration side effects run."""
    from . import mining_pack  # noqa: F401
    from . import relational_pack  # noqa: F401
    from . import llm_pack  # noqa: F401
    from . import streaming_pack  # noqa: F401
    from . import sources_pack  # noqa: F401
