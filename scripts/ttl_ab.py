"""A/B equivalence check for the r11 ttl_dedup rewrite: the OLD
per-key applyInPandas formulation (inlined verbatim below) vs the new
partition-level mapInPandas operator, compared row-for-row on the r87
input at every SF.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as ST

from miningfrequentpattern_spark.functions.durations import duration_us


def old_ttl(
    df: DataFrame,
    keys,
    ts_col: str,
    ttl: str = "10 minutes",
    tiebreak_col: str | None = None,
    carry=(),
) -> DataFrame:
    ttl_us = duration_us(ttl, what="ttl")
    extra = (
        [tiebreak_col]
        if tiebreak_col and tiebreak_col not in (*keys, *carry, ts_col)
        else []
    )
    base = df.filter(F.col(ts_col).isNotNull()).select(
        *keys,
        *extra,
        *carry,
        F.col(ts_col).alias(ts_col),
        F.unix_micros(F.col(ts_col)).alias("_us"),
    )
    schema = ST.StructType(
        list(base.schema.fields) + [ST.StructField("is_kept", ST.BooleanType())]
    )
    sort_cols = ["_us"] + (
        [tiebreak_col] if tiebreak_col and tiebreak_col != ts_col else []
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        if pdf.duplicated(sort_cols).any():
            raise ValueError("duplicate sort key")
        kept = []
        anchor = None
        for us in pdf["_us"]:
            k = anchor is None or us >= anchor + ttl_us
            if k:
                anchor = us
            kept.append(k)
        pdf["is_kept"] = kept
        return pdf

    out = base.groupBy(*keys).applyInPandas(fn, schema)
    return out.drop("_us")


def main() -> None:
    from miningfrequentpattern_spark.operators.timeseries import ttl_dedup
    from miningfrequentpattern_spark.session import get_session
    from miningfrequentpattern_spark.sources.io import load_table

    spark = get_session("ttl-ab")
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    for sf in ("0.001", "0.01", "0.1"):
        ev = load_table(spark, f"/root/testdata/sf{sf}", "events")
        kw = dict(ttl="10 minutes", tiebreak_col="event_id")
        sel = ["user_id", "ts", "event_id", "is_kept"]
        old = {
            (r["user_id"], r["event_id"]): (r["ts"], r["is_kept"])
            for r in old_ttl(ev, ["user_id"], "ts", **kw).select(*sel).collect()
        }
        new = {
            (r["user_id"], r["event_id"]): (r["ts"], r["is_kept"])
            for r in ttl_dedup(ev, ["user_id"], "ts", **kw)
            .select(*sel)
            .collect()
        }
        assert len(old) == len(new), (sf, len(old), len(new))
        diff = {k for k in old if old[k] != new.get(k)}
        if diff:
            ok = False
            for k in sorted(diff)[:5]:
                print(f"MISMATCH sf{sf} {k}: {old[k]} vs {new.get(k)}")
        print(f"sf{sf}: {len(old)} rows compared — {'equal' if not diff else 'DIFF'}")
    print("A/B", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
