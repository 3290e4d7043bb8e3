"""Interleaved A/B: t05's old per-key applyInPandas seam vs the
partition-level mapInPandas seam, on a synthetic many-user regime
(the 100 TB shape: Python-call count linear in users). Same per-group
function both sides; results compared exactly."""
import sys, time
sys.path.insert(0, '/root/repo')
import pandas as pd
from pyspark.sql import functions as F
from miningfrequentpattern_spark.session import get_session
from miningfrequentpattern_spark.operators.timeseries import (
    _per_group_map_over_sorted_partitions,
)

spark = get_session("t05-ab"); spark.sparkContext.setLogLevel("ERROR")

N_USERS, EV_PER_USER = 200_000, 12
ev = (
    spark.range(N_USERS * EV_PER_USER)
    .select(
        (F.col("id") % N_USERS).alias("user_id"),
        F.when(F.col("id") % 7 == 0, "purchase").otherwise("view").alias("event_type"),
    )
    .localCheckpoint()  # pin the input so both forms read the same materialization
)

def counts(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": [pdf["user_id"].iloc[0]],
        "n_events": [len(pdf)],
        "n_purchases": [int((pdf["event_type"] == "purchase").sum())],
    })

SCHEMA = "user_id BIGINT, n_events BIGINT, n_purchases BIGINT"

def old_form():
    return ev.groupBy("user_id").applyInPandas(counts, schema=SCHEMA)

def new_form():
    return _per_group_map_over_sorted_partitions(
        ev.select("user_id", "event_type"), keys=["user_id"],
        sort_cols=[], group_fn=counts, schema=SCHEMA)

# equivalence first
diff = old_form().exceptAll(new_form()).count() + new_form().exceptAll(old_form()).count()
print("exceptAll diff rows:", diff); assert diff == 0

times = {"old_applyInPandas": [], "new_mapInPandas": []}
for it in range(3):
    for name, fn in (("old_applyInPandas", old_form), ("new_mapInPandas", new_form)):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        times[name].append(time.perf_counter() - t0)
for k, v in times.items():
    print(k, "min", round(min(v), 2), [round(x, 2) for x in v])
