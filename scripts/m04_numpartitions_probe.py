"""Interleaved A/B: MLlib FP-Growth fit wall time vs PFP numPartitions.
Results of FP-Growth are exact (partition-independent); only timing may move.
"""
import sys, time
sys.path.insert(0, '/root/repo')
from miningfrequentpattern_spark.session import get_session
from miningfrequentpattern_spark.sources.io import load_table
from miningfrequentpattern_spark.operators.mining import fit_fpgrowth, freq_itemsets
from miningfrequentpattern_spark.operators.baskets import token_baskets

spark = get_session("m04-probe"); spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
docs = load_table(spark, sf, "documents")
bk = token_baskets(docs)
bk.write.format("noop").mode("overwrite").save()  # warm

def run(np_):
    t0 = time.perf_counter()
    m = fit_fpgrowth(token_baskets(docs), min_support=0.5, num_partitions=np_)
    out = freq_itemsets(m)
    out.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    return dt, sorted(map(tuple, out.collect()))

forms = {"default": None, "np8": 8, "np32": 32, "np128": 128}
times = {k: [] for k in forms}
ref = None
for it in range(4):
    for k, v in forms.items():
        dt, rows = run(v)
        times[k].append(dt)
        if ref is None: ref = rows
        assert rows == ref, f"MISMATCH {k}"
for k, v in times.items():
    print(k, "min", round(min(v),3), [round(x,2) for x in v])
