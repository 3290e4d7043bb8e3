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
    """Cosine similarity (safe on zero vectors → NULL via 0-division
    semantics of ANSI-off Spark)."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize an array<float> column."""
    a = F.col(a) if isinstance(a, str) else a
    n = norm(a)
    return F.transform(a, lambda x: x / n)
