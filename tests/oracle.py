"""Local mirror of the driver's t2 comparison: run a registry query on
Spark and its oracle SQL on DuckDB, then compare row count, column
names, and an order-insensitive value multiset."""

from __future__ import annotations

import math
from datetime import datetime

import pandas as pd


def _norm_cell(v):
    import numpy as np

    if isinstance(v, np.generic):
        v = v.item()
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        # Queries are required to pre-round AND pin the sign of zero
        # (`round(x, 4) + 0.0` on both sides). No -0.0 fold here: the
        # driver's hash distinguishes +-0.0 (the r6 l43 failure), so
        # the mirror must too or it masks exactly that class.
        return f"{v:.4f}"
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_norm_cell(x) for x in seq) + "]"
    return str(v)


def _normalize(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    return sorted(rows)


def compare(spark_df, duck_con, sql: str) -> None:
    # Complex-type tripwire (the r9 l62 red row): the DRIVER's hash
    # canonicalizer sorts a pandas frame, and numpy object arrays are
    # unhashable — an ARRAY/MAP/STRUCT output column fails there with
    # `TypeError: unhashable type` before any value comparison, while
    # this mirror's _norm_cell would happily stringify lists and pass.
    # House rule: registered oracle-bearing queries emit SCALAR columns
    # only (stringify arrays, e.g. _itemset_str / concat_ws("\t", ...)).
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"complex-typed output columns {complex_cols} would break the "
        f"driver's pandas hash canonicalizer (unhashable numpy arrays) "
        f"— stringify them (array_to_string / concat_ws) on BOTH sides"
    )
    spark_pdf = spark_df.toPandas()
    duck_pdf = duck_con.execute(sql).df()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    for c in spark_pdf.columns:
        sk, dk = spark_pdf[c].dtype.kind, duck_pdf[c].dtype.kind
        # Nullable int comes back as object/float in pandas on either
        # side; only flag clearly-incompatible kinds.
        compat = {sk, dk} <= {"i", "u"} or sk == dk or "O" in (sk, dk) or (
            {sk, dk} <= {"f", "i", "u"} and (spark_pdf[c].isna().any() or duck_pdf[c].isna().any())
        )
        assert compat, f"dtype kind mismatch on {c}: spark={sk} duck={dk}"
    assert len(spark_pdf) == len(duck_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    # -0.0 tripwire: even when BOTH sides agree on -0.0 today, an
    # unpinned signed-zero output is one fixture away from the r6 l43
    # driver hash-fail (engines disagree on the sign of a rounded
    # fp-noise zero). Fail loudly so the query gets the paired
    # `round(...) + 0.0` pin instead of passing on luck.
    for side, rows in (("spark", s), ("duckdb", d)):
        hits = [r for r in rows if any("-0.0000" in str(c) for c in r)]
        assert not hits, (
            f"unpinned -0.0 in {side} output (pin BOTH sides with "
            f"round(...) + 0.0), first 3 rows: {hits[:3]}"
        )
    mismatches = [
        (a, b) for a, b in zip(s, d) if a != b
    ]
    assert not mismatches, f"value mismatch, first 3: {mismatches[:3]}"
