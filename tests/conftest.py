"""Shared fixtures: one SparkSession per test run, fixture loaders,
and a DuckDB oracle mirror of the driver's t2 comparison."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from miningfrequentpattern_spark.session import get_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("mfp-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views,
    mirroring the driver's oracle setup (__spark_entry__.py docstring)."""
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{name}.parquet')"
        )
    yield con
    con.close()


def assert_time_domains_overlap(fact_df, fact_ts, dim_df, dim_ts):
    """Standing rule from the r84_scd2_lookup lesson (VERDICT r7): a
    temporal join certified on DISJOINT date domains compares 0 rows
    vs 0 rows — trivially, meaninglessly green. Call this in any test
    that certifies an as-of/SCD2/containment/TTL join: it asserts the
    two sides' [min, max] timestamp ranges actually intersect in the
    fixture, so the join provably selects."""
    from pyspark.sql import functions as F

    fa = fact_df.agg(
        F.min(fact_ts).alias("lo"), F.max(fact_ts).alias("hi")
    ).collect()[0]
    da = dim_df.agg(
        F.min(dim_ts).alias("lo"), F.max(dim_ts).alias("hi")
    ).collect()[0]
    assert fa["lo"] is not None and da["lo"] is not None, (
        "empty side in a temporal-join fixture"
    )
    assert fa["lo"] <= da["hi"] and da["lo"] <= fa["hi"], (
        f"temporal-join fixture domains are DISJOINT: "
        f"facts [{fa['lo']}, {fa['hi']}] vs dim [{da['lo']}, {da['hi']}] "
        "— the certified query compares empty against empty"
    )
