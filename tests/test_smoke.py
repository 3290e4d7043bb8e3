"""End-to-end smoke: package imports, fixtures load, flagship runs."""

from miningfrequentpattern_spark.sources.io import TABLES, load_table
from miningfrequentpattern_spark.operators.baskets import order_baskets
from miningfrequentpattern_spark.operators.mining import fit_fpgrowth, freq_itemsets

from .conftest import SF_SMOKE


def test_all_tables_load(spark):
    for name in TABLES:
        df = load_table(spark, SF_SMOKE, name)
        assert df.count() > 0, name


def test_flagship_fpgrowth(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    baskets = order_baskets(li)
    # No duplicate items inside any basket (FPGrowth hard requirement).
    model = fit_fpgrowth(baskets, min_support=0.01, min_confidence=0.3)
    out = freq_itemsets(model)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"items", "freq"}
    # Anti-monotonicity spot check: top itemset's freq <= n_baskets.
    assert rows[0]["freq"] <= baskets.count()


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_salted_aggregates_match_plain(spark):
    """Skew-proof salted aggregates must equal their plain forms."""
    from miningfrequentpattern_spark.functions.skew import (
        salted_collect_set,
        salted_count,
    )
    from pyspark.sql import functions as F

    li = load_table(spark, SF_SMOKE, "lineitem")
    plain_n = {
        r.l_orderkey: r.n
        for r in li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted_n = {
        r.l_orderkey: r.n
        for r in salted_count(li, ["l_orderkey"], n_salts=8).collect()
    }
    assert plain_n == salted_n

    plain_s = {
        r.l_orderkey: tuple(r.items) for r in order_baskets(li).collect()
    }
    salted_s = {
        r.l_orderkey: tuple(r.items)
        for r in salted_collect_set(li, "l_orderkey", "l_partkey", 8).collect()
    }
    assert plain_s == salted_s


def test_salted_join_matches_plain(spark):
    """salted_join must return exactly the rows of the plain equi-join
    (inner and left), including null-key fact rows on the left form."""
    from miningfrequentpattern_spark.functions.skew import salted_join
    from pyspark.sql import functions as F

    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    for how in ("inner", "left"):
        plain = {
            tuple(r)
            for r in o.join(c, "o_custkey", how)
            .select("o_orderkey", "o_custkey", "c_mktsegment")
            .collect()
        }
        salted = {
            tuple(r)
            for r in salted_join(o, c, "o_custkey", n_salts=8, how=how)
            .select("o_orderkey", "o_custkey", "c_mktsegment")
            .collect()
        }
        assert plain == salted, how


def test_hll_sketch_accuracy(spark):
    """r29: HLL estimates must land within 3% of exact distinct counts
    (lgConfigK default 12 -> ~1.6% RSE)."""
    from miningfrequentpattern_spark.queries.registry import (
        QUERIES,
        load_all_packs,
    )
    from miningfrequentpattern_spark.sources.io import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_ORACLE

    load_all_packs()
    got = {
        r.l_returnflag: r.approx_parts
        for r in QUERIES["r29_hll_sketches"](spark, SF_ORACLE).collect()
    }
    exact = {
        r.l_returnflag: r.d
        for r in load_table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] <= 0.03, (k, est, exact[k])


def test_zorder_bounds_both_dimensions(spark):
    """s09's reason to exist: range-bucketing by the Morton key must
    bound BOTH dimensions' span per bucket, where single-column
    sorting bounds only its own. Checked on a synthetic 64×64 grid
    split into 16 z-range buckets: every bucket's user-span AND
    hour-span must be ≤ 1/2 of the full domain (z-order guarantees
    ~sqrt tiling; a time-sorted layout gives full-domain user spans)."""
    from miningfrequentpattern_spark.functions.zorder import morton2
    from pyspark.sql import functions as F

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("user"),
        (F.col("id") / 64).cast("long").alias("hour"),
    )
    z = grid.select(
        "user", "hour", morton2(F.col("user"), F.col("hour")).alias("zval")
    )
    # 16 equal z-range buckets == 16 files of a range-partitioned write.
    b = z.withColumn("bucket", F.floor(F.col("zval") / (64 * 64 / 16)))
    spans = (
        b.groupBy("bucket")
        .agg(
            (F.max("user") - F.min("user")).alias("user_span"),
            (F.max("hour") - F.min("hour")).alias("hour_span"),
        )
        .collect()
    )
    assert len(spans) == 16
    for r in spans:
        assert r.user_span <= 32, r
        assert r.hour_span <= 32, r


def test_approx_topk_matches_exact_counts(spark):
    """r33: with maxItemsTracked far above the item cardinality the
    sketch degenerates to exact counting — every reported (flag, part)
    count must equal the exact aggregate, and each flag's top-5 counts
    must be the 5 largest exact counts (item ties may reorder)."""
    from miningfrequentpattern_spark.queries.registry import (
        QUERIES,
        load_all_packs,
    )
    from miningfrequentpattern_spark.sources.io import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_ORACLE

    load_all_packs()
    got = QUERIES["r33_approx_topk"](spark, SF_ORACLE).collect()
    exact = {
        (r.l_returnflag, r.l_partkey): r.c
        for r in load_table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_returnflag", "l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    by_flag: dict = {}
    for r in got:
        assert exact[(r.l_returnflag, r.l_partkey)] == r.approx_count, r
        by_flag.setdefault(r.l_returnflag, []).append(r.approx_count)
    for flag, counts in by_flag.items():
        top5 = sorted(
            (c for (f, _), c in exact.items() if f == flag), reverse=True
        )[:5]
        assert sorted(counts, reverse=True) == top5, (flag, counts, top5)


def test_approx_aggregates_accuracy(spark):
    """r10: the single-pass sketches must track exact values — HLL++
    distinct count within 3% (rsd=0.01), approx p50 within 1% of the
    exact median."""
    from miningfrequentpattern_spark.queries.registry import (
        QUERIES,
        load_all_packs,
    )
    from miningfrequentpattern_spark.sources.io import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_ORACLE

    load_all_packs()
    got = {
        r.l_returnflag: r
        for r in QUERIES["r10_approx_aggregates"](spark, SF_ORACLE).collect()
    }
    exact = {
        r.l_returnflag: r
        for r in load_table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        )
        .collect()
    }
    for flag, e in exact.items():
        assert abs(got[flag].approx_parts - e.parts) <= 0.03 * e.parts
        assert abs(got[flag].approx_p50 - e.p50) <= 0.01 * e.p50


def test_asof_bucket_rejects_bad_widths():
    """Zero-width buckets would divide by zero (NULL bucket ids under
    non-ANSI conf → silently empty joins); zero/negative/fractional
    counts and unknown units must all raise the format error."""
    import pytest

    from miningfrequentpattern_spark.operators.relational import (
        _bucket_seconds,
    )

    assert _bucket_seconds("1 hour") == 3600
    assert _bucket_seconds("30 minutes") == 1800
    for bad in ("0 hours", "-1 hour", "1.5 hours", "1 fortnight", "hour"):
        with pytest.raises(ValueError, match="bucket must be"):
            _bucket_seconds(bad)


def test_hll_rollup_merge_within_error_envelope(spark, duck):
    """r48: re-aggregating persisted per-year sketches must agree
    with direct aggregation within the estimator's envelope (the
    union path promotes target types, so bit-equality does NOT hold
    — measured ~1%), and BOTH must sit within ±3% of the exact
    distinct count."""
    import __spark_entry__ as e

    SF = "/root/testdata/sf0.01"
    rows = {
        r["l_returnflag"]: r
        for r in e.queries()["r48_hll_rollup_merge"](spark, SF).collect()
    }
    exact = dict(
        duck.execute(
            "SELECT l_returnflag, count(DISTINCT l_partkey) "
            f"FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1"
        ).fetchall()
    )
    assert rows and set(rows) == set(exact)
    for flag, r in rows.items():
        assert r["rel_diff"] <= 0.02, (flag, r["rel_diff"])
        for col in ("approx_parts_merged", "approx_parts_direct"):
            assert abs(r[col] - exact[flag]) / exact[flag] <= 0.03, (
                flag, col, r[col], exact[flag],
            )


def test_concurrent_queries_match_serial(spark):
    """Registry queries must be thread-safe on one shared session —
    a driver (or notebook user) running queries concurrently is
    routine, and the hazards are real: harden() mutates session
    conf, iterative operators cache/checkpoint/unpersist, and AQE
    reuses exchanges. Run a cross-pack sample serially, then on 6
    concurrent threads, and require identical result sets.
    (Sink-writing queries are excluded: their scratch dirs are
    per-tag, so the SAME query racing itself would collide — a
    documented single-writer contract, not a thread-safety bug.)"""
    from concurrent.futures import ThreadPoolExecutor

    import __spark_entry__ as e

    SF = "/root/testdata/sf0.01"
    names = [
        "r02_pricing_summary",
        "r08_asof_last_click_before_purchase",
        "m03_frequent_items",
        "l21_source_mixing",
        "r41_correlation_matrix",
        "l33_vocab_growth",
        "m18_part_kcore",
        "l36_weighted_sample",
    ]
    qs = e.queries()

    def run(name):
        return sorted(map(tuple, qs[name](spark, SF).collect()))

    serial = {n: run(n) for n in names}
    with ThreadPoolExecutor(max_workers=6) as pool:
        concurrent = dict(zip(names, pool.map(run, names)))
    for n in names:
        assert concurrent[n] == serial[n], f"{n} diverged under concurrency"


def test_observed_metrics_ride_the_action(spark):
    """functions/telemetry.observed: the quality counters must (a)
    appear as a CollectMetrics node with NO extra exchange/scan in
    the plan, and (b) equal a standalone aggregate over the same
    relation — the zero-cost in-flight form of r42's audit."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from miningfrequentpattern_spark.functions.telemetry import observed
    from miningfrequentpattern_spark.sources.io import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").filter(
        F.col("l_quantity") >= 10
    )
    inst, obs = observed(
        li,
        "gate",
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("disc_viol"),
        F.min("l_shipdate").alias("min_ship"),
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        inst.explain("formatted")
    p = buf.getvalue()
    assert "CollectMetrics" in p, p
    assert p.count("Scan parquet") <= 2, p  # tree + details of ONE node
    assert "Exchange" not in p.split("CollectMetrics")[0], p

    n_written = inst.count()  # the action the metrics ride
    m = obs.get
    direct = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("disc_viol"),
        F.min("l_shipdate").alias("min_ship"),
    ).collect()[0]
    assert m["n_rows"] == n_written == direct["n_rows"]
    assert m["disc_viol"] == direct["disc_viol"]
    assert m["min_ship"] == direct["min_ship"]


def test_bench_headline_names_resolve_and_dedupe():
    """Every bench.py HEADLINE name must exist in the registry and
    appear exactly once — a typo or duplicate here breaks (or
    double-counts) the driver's per-round bench, which is graded."""
    import bench

    import __spark_entry__ as e

    qs = e.queries()
    unknown = [n for n in bench.HEADLINE if n not in qs]
    assert not unknown, f"bench names not in registry: {unknown}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
    assert len(set(bench.LIKE_FOR_LIKE)) == len(bench.LIKE_FOR_LIKE) == 24
