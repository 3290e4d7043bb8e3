"""Iterator-form scalar pandas UDF
(functions/vectors.py::int8_roundtrip_error_iter) — PROMOTED round 8 as u09_iter_quantize: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the multi-batch stream proof (tiny
Arrow batches re-compared via the registered oracle) and the
closed-form zero-vector / exact-grid pins stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.functions.vectors import (
    int8_roundtrip_error_iter,
)
from .conftest import SF_ORACLE
from .oracle import compare
from miningfrequentpattern_spark.queries.registry import (
    ORACLES,
    QUERIES,
    load_all_packs,
)

load_all_packs()

def _u09(spark, sf_dir):
    return QUERIES["u09_iter_quantize"](spark, sf_dir)



def test_iter_udf_streams_multiple_batches(spark, duck):
    """Force tiny Arrow batches so the iterator sees MANY batches in
    one stream — the iterator form's whole point — and the output is
    unchanged."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        compare(
            _u09(spark, SF_ORACLE).filter(F.col("vec_id") < 100),
            duck,
            ORACLES["u09_iter_quantize"] + " WHERE vec_id < 100",
        )
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )


def test_iter_udf_closed_form(spark):
    """A vector already ON the int8 grid round-trips exactly
    (err 0); the zero vector pins (scale 0, err 0); max component
    maps to 127 so its error is 0 by construction."""
    rows = [
        (1, [127.0, -63.5, 0.0]),   # scale 1.0? max=127 -> scale=1; -63.5 rounds to -64 -> err 0.5
        (2, [0.0, 0.0]),
        (3, [12.7, 5.0]),           # scale 0.1; both on-grid -> err ~0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["scale"], r["max_abs_err"])
        for r in int8_roundtrip_error_iter(df).collect()
    }
    assert got[2] == (0.0, 0.0)
    assert got[1][0] == 1.0 and got[1][1] == 0.5
    assert got[3] == (0.1, 0.0)


def test_iter_udf_null_vector_and_null_element_match_oracle(spark):
    """NULL/NaN contract, registry booking (m) pin (r12 re-cert): a
    NULL VECTOR yields NULL scale/err on BOTH engines (code-review
    r9: np.asarray(None) degraded to a 0-d NaN that slipped past the
    zero guard and emitted NaN where DuckDB emits NULL); an empty
    vector is NULL on both too (list_max([]) IS NULL). A NaN or NULL
    ELEMENT inside a stored vector RAISES — corrupt data; the old
    skip-NaN semantics silently computed over it and diverged from
    DuckDB's list_max (which orders NaN above every finite) at
    scale. Same stance as embeddings._moment_partials."""
    import duckdb
    import math
    import pandas as pd
    import pytest

    rows = [
        (1, [127.0, -63.5, 0.0]),
        (2, None),
        (5, []),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["scale"], r["max_abs_err"])
        for r in int8_roundtrip_error_iter(df).collect()
    }
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": [r[0] for r in rows],
             "embedding": [r[1] for r in rows]}
        ),
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(ORACLES["u09_iter_quantize"]).fetchall()
    }
    norm = lambda t: tuple(
        None if x is None or (isinstance(x, float) and math.isnan(x))
        else round(x, 4)
        for x in t
    )
    # the Spark side must produce true NULLs, not NaN
    assert got[2] == (None, None) and got[5] == (None, None)
    assert {k: norm(v) for k, v in got.items()} == {
        k: norm(v) for k, v in want.items()
    }
    # NULL element and NaN element both RAISE (Arrow collapses both
    # to np.nan on the pandas side — one check catches both)
    for bad in ([1.0, None, -254.0], [float("nan")], [None]):
        bad_df = spark.createDataFrame(
            [(9, bad)], "vec_id long, embedding array<double>"
        )
        with pytest.raises(Exception, match="null/NaN element"):
            int8_roundtrip_error_iter(bad_df).collect()
