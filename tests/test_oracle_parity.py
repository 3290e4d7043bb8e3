"""Mirror of the driver's t2 gate: every registry query that declares
an oracle must hash-match DuckDB at sf0.01; every query (oracle or
not) must at least run and return a stable schema."""

import pytest

import __spark_entry__ as e
from .conftest import SF_ORACLE
from .oracle import compare

QUERIES = e.queries()
ORACLES = e.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, name):
    compare(QUERIES[name](spark, SF_ORACLE), duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0
