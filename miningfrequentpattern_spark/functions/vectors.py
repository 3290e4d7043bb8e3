"""Vector math as native Spark column expressions (SURVEY.md §2.4 L3).

Embeddings live as ARRAY<FLOAT> (not VectorUDT) so the same parquet is
readable by the DuckDB oracle; conversion to MLlib vectors happens only
at LSH boundaries (pyspark.ml.functions.array_to_vector).

Everything here compiles to Catalyst `transform`/`zip_with`/`aggregate`
higher-order functions — JVM-side, codegen'd, no Python boundary. On
64-dim floats this is within ~2× of a pandas-UDF BLAS dot and avoids
Arrow serialization entirely; at 1000+ dims switch to a pandas UDF
(numpy dot) — the seam is isolated here on purpose.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

from .guards import reject_working_cols as _reject_working_cols


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length float arrays."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    """L2 norm."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity. Zero vectors score 0.0 (not NULL): under
    ANSI-off Spark the raw division would yield NULL, which every
    downstream comparison silently filters — a zero embedding would
    vanish from top-k results with no trace. Defining cos(0, x) = 0
    matches the numpy-side guard the GEMM operators use."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize an array<float> column. A zero vector divides by
    1 instead of 0 and stays all-zeros — NULL elements would crash
    array_to_vector at the MLlib boundary (LSH fit/transform); the
    same convention as the numpy norms[norms == 0] = 1 guard in
    dedup.semantic_neardup_pairs."""
    a = F.col(a) if isinstance(a, str) else a
    n = norm(a)
    safe = F.when(n == 0, F.lit(1.0)).otherwise(n)
    return F.transform(a, lambda x: x / safe)


def int8_roundtrip_error_iter(df, vec_col: str = "embedding"):
    """Iterator-form scalar pandas UDF (U1's third shape beside the
    plain scalar form and mapInArrow): per-vector int8 symmetric
    quantization round-trip error — (scale, max_abs_err) — computed
    by an `Iterator[pd.Series] -> Iterator[pd.Series]` UDF.

    WHY the iterator form exists (and why it's certified here): the
    function body runs ONCE per Python worker with the batch stream,
    so expensive one-time setup (loading a codebook, warming a
    tokenizer, opening a model file) amortizes across every batch
    instead of re-running per batch — the plain scalar form re-enters
    per batch. The setup here (the clamp table) is cheap by design;
    the certified contract is the FORM (iterator in, iterator out,
    exercised across multiple Arrow batches via a small
    maxRecordsPerBatch in the test) plus exact value parity.

    Arithmetic contract (the l24 fixture pin): scale = max|x| / 127,
    q = round(x / scale) clamped to [-127, 127], err = max|x − q·scale|
    — exact float64 both engines, so unlike most UDF surfaces this
    one is DuckDB-oracle-able.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_t = StructType(
        [
            StructField("scale", DoubleType()),
            StructField("max_abs_err", DoubleType()),
        ]
    )

    @pandas_udf(out_t)
    def quant_err(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time per-worker setup — runs ONCE for the whole stream
        levels = np.arange(-127, 128, dtype=np.float64)
        for s in batches:
            scales, errs = [], []
            for v in s:
                # NULL-VECTOR semantics match the u09 DuckDB oracle
                # exactly (code-review r9: the old body let
                # np.asarray(None) degrade to a 0-d NaN that slipped
                # past the m == 0.0 guard and emitted NaN where the
                # oracle emits NULL): a NULL vector has no scale
                # (NULL out). A NaN or NULL ELEMENT inside a stored
                # vector RAISES (registry booking (m), r12 re-cert):
                # it is corrupt data, and both propagate-NaN and
                # skip-NaN silently compute over it — worse, the
                # engines would then DIVERGE at scale (np.isnan
                # filtering vs DuckDB list_max ordering NaN above
                # every finite). Same partial-result-is-wrong-result
                # stance as embeddings.py::_moment_partials. Arrow →
                # pandas collapses NULL elements and IEEE NaN to
                # np.nan, so one check catches both. Fixture is
                # NaN-free (verified at all 3 SFs), so u09's oracle
                # results are unchanged.
                if v is None:
                    scales.append(None)
                    errs.append(None)
                    continue
                x = np.asarray(v, dtype=np.float64)
                if x.size == 0:
                    scales.append(None)
                    errs.append(None)
                    continue
                if np.isnan(x).any():
                    raise ValueError(
                        "null/NaN element inside vector: filter or "
                        "repair corrupt embeddings before "
                        "int8_roundtrip_error_iter"
                    )
                m = float(np.max(np.abs(x)))
                if m == 0.0:
                    scales.append(0.0)
                    errs.append(0.0)
                    continue
                scale = m / 127.0
                q = np.clip(np.round(x / scale), levels[0], levels[-1])
                errs.append(float(np.max(np.abs(x - q * scale))))
                scales.append(scale)
            yield pd.DataFrame({"scale": scales, "max_abs_err": errs})

    # withColumn REPLACES an existing _q; a user scale/max_abs_err
    # column would duplicate the output names (r10 audit)
    _reject_working_cols(
        df, ("_q", "scale", "max_abs_err"), "int8_roundtrip_error_iter"
    )
    res = df.withColumn("_q", quant_err(F.col(vec_col)))
    return res.select(
        *[c for c in df.columns if c != vec_col],
        F.round(F.col("_q.scale"), 4).alias("scale"),
        F.round(F.col("_q.max_abs_err"), 4).alias("max_abs_err"),
    )
