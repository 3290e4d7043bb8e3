"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``miningfrequentpattern_spark`` package;
this module is a thin adapter over its query registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from miningfrequentpattern_spark.queries import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Frequent-itemset mining (the reference's core capability) over the
    documents token corpus: basketize text → MLlib FP-Growth (PFP) →
    deterministically-ordered frequent itemsets.
    """
    from miningfrequentpattern_spark.operators.baskets import token_baskets
    from miningfrequentpattern_spark.operators.mining import (
        fit_fpgrowth,
        freq_itemsets,
    )
    from miningfrequentpattern_spark.session import SMOKE_SF_DIR, harden
    from miningfrequentpattern_spark.sources.io import load_table

    harden(spark)
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    model = fit_fpgrowth(
        token_baskets(docs), min_support=0.45, min_confidence=0.6
    )
    return freq_itemsets(model)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    _registry.load_all_packs()
    return dict(_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI oracle SQL for every SQL-expressible query;
    rows-only entries are intentionally absent (SURVEY.md §2 'Oracle'
    column marks which)."""
    _registry.load_all_packs()
    return dict(_registry.ORACLES)
