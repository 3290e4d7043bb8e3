"""Hot-key skew stress (VERDICT r4 task 5): the 100×-scale claims lean
on the salted/bucketed guards, but until this file they were
property-checked on UNIFORM data only. Here a pathological key — one
order/user carrying ~10⁴ rows while every other key has a handful —
runs through each guard and its plain twin, asserting (a) result
equality row-for-row and (b) the plan shape that makes the guard work
(the salt in the shuffle key, the two-phase aggregate, the bucket
equi-key in the join) — so a regression that silently drops the guard
while keeping the API fails here, on the data shape the guard exists
for."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


HOT = 10_000  # rows on the hot key
TAIL = 50  # uniform keys
ITEMS = 400  # distinct items cycled through the hot key


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _skewed_rows(spark):
    """(k, item): key 0 holds HOT rows cycling ITEMS distinct items
    (with heavy duplication — collect_set must dedup); keys 1..TAIL
    hold 3 rows each. Generated engine-side from range() so the
    fixture scales without a driver-side list."""
    hot = spark.range(HOT).select(
        F.lit(0).alias("k"), (F.col("id") % ITEMS).alias("item")
    )
    tail = spark.range(3 * TAIL).select(
        (F.col("id") % TAIL + 1).alias("k"),
        (F.col("id") + 1000).alias("item"),
    )
    return hot.unionByName(tail)


def test_salted_basketize_equals_plain_on_hot_key(spark):
    from miningfrequentpattern_spark.operators.baskets import basketize

    df = _skewed_rows(spark)
    plain = {
        r["k"]: tuple(r["items"])
        for r in basketize(df, "k", "item").collect()
    }
    salted_df = basketize(df, "k", "item", n_salts=16)
    salted = {r["k"]: tuple(r["items"]) for r in salted_df.collect()}
    assert salted == plain
    assert len(plain[0]) == ITEMS  # hot basket fully deduplicated
    # Plan shape: phase-1 partials shuffle on (k, _salt) — the hot
    # key spread over 16 shards — then the merge shuffles on k alone.
    p = _plan(salted_df)
    assert "hashpartitioning(k" in p, p
    assert "_salt" in p, p
    assert p.count("HashAggregate") >= 4, p  # partial+final × 2 phases


def test_salted_join_equals_plain_on_hot_key(spark):
    from miningfrequentpattern_spark.functions.skew import salted_join

    fact = _skewed_rows(spark)
    dim = spark.range(TAIL + 1).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("attr")
    )
    plain = sorted(
        map(tuple, fact.join(dim, "k").select("k", "item", "attr").collect())
    )
    salted_out = salted_join(fact, dim, key="k", n_salts=8).select(
        "k", "item", "attr"
    )
    assert sorted(map(tuple, salted_out.collect())) == plain
    assert len(plain) == HOT + 3 * TAIL
    # Plan shape: the join's shuffle key must include the salt (that
    # IS the guard — without it the hot key lands on one task), and
    # the dim side must carry the explode that replicates it per salt.
    p = _plan(salted_out)
    assert "_salt" in p, p
    assert "Generate explode" in p or "explode(" in p, p


def test_bucketed_asof_equals_plain_on_hot_key(spark):
    """One user with 10⁴ right-side events: the plain as-of fans each
    left row out to the full 10⁴-row history before the range filter;
    the bucketed form must produce the IDENTICAL matches while joining
    on the coarse time-bucket equi-key (tolerance ≤ bucket width)."""
    from miningfrequentpattern_spark.operators.relational import asof_join

    # Right: hot user 0 gets HOT events 1s apart; users 1..TAIL get 3.
    right = (
        spark.range(HOT)
        .select(
            F.lit(0).alias("uid"),
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("_t0"),
            F.col("id").alias("_off"),
        )
        .unionByName(
            spark.range(3 * TAIL).select(
                (F.col("id") % TAIL + 1).alias("uid"),
                F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("_t0"),
                (F.col("id") * 97).alias("_off"),
            )
        )
        .select(
            "uid",
            (F.col("_t0") + F.make_interval(secs=F.col("_off"))).alias(
                "ev_ts"
            ),
            (F.col("_off") * 3).alias("payload"),
        )
    )
    # Left: 40 probe rows per stripe across hot and tail users, offset
    # so matches straddle bucket boundaries.
    left = spark.range(200).select(
        (F.col("id") % (TAIL + 1)).alias("uid"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.col("id") * 53 + 1)
        ).alias("probe_ts"),
    )
    tol = F.lit(600.0)  # 10 min ≤ 1 hour bucket
    kw = dict(
        on="uid",
        left_ts="probe_ts",
        right_ts="ev_ts",
        direction="backward",
        tolerance_expr=tol,
        right_cols=["ev_ts", "payload"],
    )
    plain = sorted(
        map(tuple, asof_join(left, right, **kw).collect())
    )
    bucketed_df = asof_join(left, right, bucket="1 hour", **kw)
    assert sorted(map(tuple, bucketed_df.collect())) == plain
    assert len(plain) > 0
    # Plan shape: the bucketed join must be an EQUI-join carrying the
    # bucket key (_bk) — not a pure range/cartesian probe.
    p = _plan(bucketed_df)
    assert "_bk" in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_salted_count_equals_plain_on_hot_key(spark):
    from miningfrequentpattern_spark.functions.skew import salted_count

    df = _skewed_rows(spark)
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["k"]: r["n"] for r in salted_count(df, ["k"], n_salts=16).collect()
    }
    assert salted == plain
    assert plain[0] == HOT  # the hot key's full count survives both phases


def test_cdc_apply_correct_on_hot_entity(spark):
    """One entity carrying 10⁴ changes while the tail has 3 each:
    last-writer-wins must still pick the single max-seq change for
    the hot key (the window sorts one partition's worth of that key —
    the documented skew exposure, measurable via r53 — but the RESULT
    is exact)."""
    from miningfrequentpattern_spark.operators.relational import cdc_apply

    hot = spark.range(HOT).select(
        F.lit(0).alias("k"),
        F.col("id").alias("seq"),
        F.when(F.col("id") % 7 == 0, F.lit("D")).otherwise(F.lit("U")).alias(
            "op"
        ),
    )
    tail = spark.range(3 * TAIL).select(
        (F.col("id") % TAIL + 1).alias("k"),
        (F.col("id") / TAIL).cast("long").alias("seq"),
        F.lit("U").alias("op"),
    )
    got = {
        r["k"]: r["seq"]
        for r in cdc_apply(
            hot.unionByName(tail), ["k"], ["seq"], "op"
        ).collect()
    }
    # hot key's max seq is HOT-1 = 9999; 9999 % 7 != 0 so it's an
    # upsert and must survive with exactly that seq.
    assert got[0] == HOT - 1
    assert len(got) == TAIL + 1


def test_interval_merge_correct_on_hot_series(spark):
    """10⁴ unit intervals on one key at stride 2 (all disjoint) must
    yield 10⁴ spans, while an overlapping tail key still merges to
    one — gaps-and-islands stays exact under series-length skew."""
    from miningfrequentpattern_spark.operators.timeseries import (
        interval_merge,
    )

    hot = spark.range(HOT).select(
        F.lit("hot").alias("k"),
        (F.col("id") * 2).alias("s"),
        (F.col("id") * 2 + 1).alias("e"),
    )
    tail = spark.range(10).select(
        F.lit("t").alias("k"),
        F.col("id").alias("s"),
        (F.col("id") + 2).alias("e"),
    )
    out = interval_merge(hot.unionByName(tail), ["k"], "s", "e")
    counts = {
        r["k"]: r["n"]
        for r in out.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"hot": HOT, "t": 1}


def test_cusum_correct_on_hot_series(spark):
    """A 10⁴-step flat series at exactly the target must hold S ≡ 0
    at every step (no fp drift into phantom drift flags), while a
    step-change tail series still alarms."""
    from miningfrequentpattern_spark.operators.timeseries import cusum_drift

    hot = spark.range(HOT).select(
        F.lit("flat").alias("k"), F.col("id").alias("t"), F.lit(5.0).alias("x")
    )
    tail = spark.range(20).select(
        F.lit("step").alias("k"),
        F.col("id").alias("t"),
        F.when(F.col("id") >= 10, F.lit(9.0)).otherwise(F.lit(5.0)).alias("x"),
    )
    out = cusum_drift(
        hot.unionByName(tail), ["k"], "t", "x", target=5.0, threshold=10.0
    )
    agg = {
        (r["k"], r["drifted"]): r["n"]
        for r in out.groupBy("k", "drifted")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert agg[("flat", False)] == HOT and ("flat", True) not in agg
    # step series: S after t>=10 grows by 4/step; crosses 10 at t=12.
    assert agg[("step", True)] == 8


def test_label_propagation_correct_on_hot_hub(spark):
    """A 2000-leaf star is LPA's worst skew (the hub's (node, label)
    count relation is degree-sized and its argmax aggregates 2000
    candidate labels into one row): the distributed labeling must
    equal the pure-Python synchronous recurrence — including the
    known star OSCILLATION (hub and leaves swap labels each round),
    which is exactly what a silent partial aggregate would corrupt."""
    from miningfrequentpattern_spark.operators.graph import (
        label_propagation,
    )

    n = 2000
    edges = spark.range(1, n + 1).select(
        F.lit(0).alias("src"), F.col("id").alias("dst")
    )
    for iters in (2, 3):
        got = {
            r["id"]: r["community"]
            for r in label_propagation(edges, iterations=iters).collect()
        }
        # pure-Python synchronous min-tiebreak reference
        labels = {i: i for i in range(n + 1)}
        for _ in range(iters):
            nxt = {}
            # hub 0: neighbors are all leaves; majority tie -> min label
            nxt[0] = min(labels[i] for i in range(1, n + 1))
            for i in range(1, n + 1):
                nxt[i] = labels[0]
            labels = nxt
        assert got == labels, iters


def test_salted_helpers_reject_working_column_collisions(spark):
    """Hardening (h), r10: a user column named `_salt` would be
    silently REPLACED by salted_join's withColumn (corrupt join keys,
    no error); the aggregate helpers shadow `_salt`/`_pn`/`_ps` the
    same way. All three fail fast naming the clash."""
    import pytest

    from miningfrequentpattern_spark.functions.skew import (
        salted_collect_set,
        salted_count,
        salted_join,
    )

    fact = spark.createDataFrame([(1, 2)], "k long, _salt long")
    dim = spark.createDataFrame([(1, "x")], "k long, v string")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(fact, dim, "k")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(dim, fact, "k")
    with pytest.raises(ValueError, match="collide"):
        salted_count(fact, ["_salt"])
    with pytest.raises(ValueError, match="collide"):
        salted_collect_set(fact, "k", "_salt")


def test_ranked_operators_reject_working_column_collisions(spark):
    """Hardening (h), r10 — the ranked/joined family: top_k_per_group
    drops `_rn` at the end (a user `_rn` column would vanish),
    global_row_number shifts `_mid`/`_pid` arithmetic, asof_join
    monotonic-ids `_lid`. Each rejects the collision by name."""
    import pytest
    from pyspark.sql import functions as F

    from miningfrequentpattern_spark.operators.relational import (
        asof_join,
        global_row_number,
        top_k_per_group,
    )

    df = spark.createDataFrame([(1, 2)], "k long, _rn long")
    with pytest.raises(ValueError, match="_rn"):
        top_k_per_group(df, ["k"], [F.col("_rn")], 1)
    df2 = spark.createDataFrame([(1, 2)], "k long, _mid long")
    with pytest.raises(ValueError, match="_mid"):
        global_row_number(df2, [F.col("k")])
    left = spark.createDataFrame(
        [(1, 2)], "k long, _lid long"
    ).withColumn("ts", F.current_timestamp())
    right = left.select("k", "ts")
    with pytest.raises(ValueError, match="_lid"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts")


def test_salted_out_name_and_case_variant_collisions_rejected(spark):
    """r10 review follow-ups on the collision guards: (1) the `out`
    output name must not duplicate a key/internal column (two
    identically-named columns -> AMBIGUOUS_REFERENCE one operator
    later); (2) names compare case-insensitively, matching Spark's
    default resolver — a `_SALT` column is exactly as replaced by
    withColumn('_salt', ...) as a lowercase one."""
    import pytest

    from miningfrequentpattern_spark.functions.skew import (
        salted_collect_set,
        salted_count,
        salted_join,
    )

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="out"):
        salted_count(df, ["k"], out="k")
    with pytest.raises(ValueError, match="out"):
        salted_collect_set(df, "k", "v", out="k")
    fact_uc = spark.createDataFrame([(1, 2)], "k long, _SALT long")
    dim = spark.createDataFrame([(1, "x")], "k long, s string")
    with pytest.raises(ValueError, match="collide"):
        salted_join(fact_uc, dim, "k")


def test_user_frame_operators_reject_internal_name_collisions(spark):
    """r10 class audit: every operator that withColumn's an internal
    name onto the CALLER's frame (where it silently REPLACES a
    same-named user column) rejects the collision actionably —
    scd2_versions, cdc_apply, seasonal_profile, pit_trailing_features,
    truncated_dim_recall, the int8 iterator
    UDF, and interval_overlap_join's key set."""
    import pytest
    from pyspark.sql import functions as F

    from miningfrequentpattern_spark.functions.vectors import (
        int8_roundtrip_error_iter,
    )
    from miningfrequentpattern_spark.operators.relational import (
        cdc_apply,
        scd2_versions,
    )
    from miningfrequentpattern_spark.operators.similarity import (
        truncated_dim_recall,
    )
    from miningfrequentpattern_spark.operators.timeseries import (
        interval_overlap_join,
        pit_trailing_features,
        seasonal_profile,
    )

    ts = spark.createDataFrame(
        [(1, 2.0, 3, 4)], "k long, v double, _new_version long, sq long"
    ).withColumn("ts", F.current_timestamp())
    with pytest.raises(ValueError, match="_new_version"):
        scd2_versions(ts, ["k"], ["v"], "ts", "sq")
    rn = ts.withColumnRenamed("_new_version", "_rn")
    with pytest.raises(ValueError, match="_rn"):
        cdc_apply(rn.withColumn("op", F.lit("U")), ["k"], ["sq"], "op")
    dow = ts.withColumnRenamed("_new_version", "_dow")
    with pytest.raises(ValueError, match="_dow"):
        seasonal_profile(dow, ["k"], "ts", "v")
    us = ts.withColumnRenamed("_new_version", "_us")
    with pytest.raises(ValueError, match="_us"):
        pit_trailing_features(us, ["k"], "ts", "v", "7 days")
    emb = spark.createDataFrame(
        [(1, [1.0, 2.0], 9.0)], "vec_id long, embedding array<double>, _tv double"
    )
    with pytest.raises(ValueError, match="_tv"):
        truncated_dim_recall(emb, emb, trunc_dims=[1], k=1)
    sc = emb.withColumnRenamed("_tv", "scale")
    with pytest.raises(ValueError, match="scale"):
        int8_roundtrip_error_iter(sc)
    iv = spark.createDataFrame(
        [(1, 0.0, 1.0)], "_bk long, span_start double, span_end double"
    )
    with pytest.raises(ValueError, match="_bk"):
        interval_overlap_join(iv, iv, ["_bk"])
