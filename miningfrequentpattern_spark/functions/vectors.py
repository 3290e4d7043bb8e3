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

from pyspark.sql import Column
from pyspark.sql import functions as F


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
