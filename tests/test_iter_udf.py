"""Iterator-form scalar pandas UDF
(functions/vectors.py::int8_roundtrip_error_iter) — round-8 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL the future u09_iter_quantize registration will carry
(int8 symmetric quantization round-trip error per embedding — exact
float64 arithmetic both engines, so this UDF surface is
hash-oracle-able), plus a multi-batch run under a tiny Arrow batch
size proving the iterator actually streams batches, and closed-form
zero-vector / exact-grid pins."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.functions.vectors import (
    int8_roundtrip_error_iter,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future u09 oracle, verbatim (the l24 arithmetic at error grain):
# scale = max|x|/127, q = round(x/scale) clamped, err = max|x - q*s|.
U09_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
s AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM e)
SELECT vec_id,
       round(scale, 4) AS scale,
       round(list_max(list_transform(v,
             x -> abs(x - least(greatest(round(x / scale), -127), 127)
                          * scale))), 4) AS max_abs_err
FROM s
"""


def _u09(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return int8_roundtrip_error_iter(emb, "embedding")


def test_iter_udf_matches_duckdb_oracle(spark, duck):
    compare(_u09(spark, SF_ORACLE), duck, U09_ORACLE)


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
            U09_ORACLE + " WHERE vec_id < 100",
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
