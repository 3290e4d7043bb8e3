"""Mining-core invariants (SURVEY.md §5.4) — algorithm-level checks
that need no SQL oracle."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.baskets import (
    order_baskets,
    token_baskets,
)
from miningfrequentpattern_spark.operators.mining import (
    apriori_frequent_itemsets,
    closed_itemsets,
    fit_fpgrowth,
    maximal_itemsets,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_SMOKE

MIN_SUPPORT = 0.5


def _fp_itemsets(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    model = fit_fpgrowth(token_baskets(docs), min_support=MIN_SUPPORT)
    return model.freqItemsets


def test_apriori_equals_fpgrowth(spark):
    """Han 2000 §5: Apriori and FP-Growth produce the identical result
    set at equal minSupport. Our DataFrame Apriori (k≤3) must match
    MLlib FP-Growth's k≤3 slice exactly — items AND counts."""
    docs = load_table(spark, SF_SMOKE, "documents")
    b = token_baskets(docs)
    fp = (
        fit_fpgrowth(b, min_support=MIN_SUPPORT)
        .freqItemsets.filter(F.size("items") <= 3)
        .select(F.sort_array("items").alias("items"), "freq")
    )
    ap = apriori_frequent_itemsets(b, min_support=MIN_SUPPORT, max_k=3).select(
        F.sort_array("items").alias("items"), "freq"
    )
    assert fp.count() == ap.count()
    assert fp.exceptAll(ap).isEmpty() and ap.exceptAll(fp).isEmpty()


def test_anti_monotonicity(spark):
    """Every (k-1)-subset of a frequent k-itemset is frequent with
    support >= the superset's support."""
    fi = _fp_itemsets(spark).cache()
    multi = fi.filter(F.size("items") >= 2)
    # Generate all (k-1)-subsets by dropping one element.
    subsets = multi.select(
        F.col("freq").alias("super_freq"),
        F.explode(
            F.transform(
                "items",
                lambda x: F.array_remove("items", x),
            )
        ).alias("sub_items"),
    )
    joined = subsets.join(
        fi.select(F.col("items").alias("sub_items"), F.col("freq").alias("sub_freq")),
        "sub_items",
        "left",
    )
    violations = joined.filter(
        F.col("sub_freq").isNull() | (F.col("sub_freq") < F.col("super_freq"))
    )
    assert violations.isEmpty()


def test_k1_equals_sql_groupby(spark):
    """FPGrowth's k=1 itemsets == plain GROUP BY counts over exploded
    baskets at the same threshold."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    b = order_baskets(li).cache()
    n = b.count()
    s = 0.002
    model = fit_fpgrowth(b, min_support=s)
    k1 = model.freqItemsets.filter(F.size("items") == 1).select(
        F.element_at("items", 1).alias("item"), "freq"
    )
    import math

    sql = (
        b.select(F.explode("items").alias("item"))
        .groupBy("item")
        .count()
        .filter(F.col("count") >= math.ceil(s * n))
        .select("item", F.col("count").alias("freq"))
    )
    assert k1.exceptAll(sql).isEmpty() and sql.exceptAll(k1).isEmpty()


def test_closed_maximal_containment(spark):
    """maximal ⊆ closed ⊆ frequent, and maximal sets are mutually
    incomparable."""
    fi = _fp_itemsets(spark).cache()
    cl = closed_itemsets(fi).cache()
    mx = maximal_itemsets(fi).cache()
    assert cl.count() <= fi.count()
    assert mx.count() <= cl.count()
    # maximal must be a subset of closed
    assert mx.exceptAll(cl).isEmpty()


def test_rule_confidence_identity(spark):
    """confidence(X=>Y) == supp(X∪Y)/supp(X) recomputed from the
    itemset table itself."""
    docs = load_table(spark, SF_SMOKE, "documents")
    model = fit_fpgrowth(
        token_baskets(docs), min_support=MIN_SUPPORT, min_confidence=0.6
    )
    fi = model.freqItemsets.select(
        F.sort_array("items").alias("items"), F.col("freq")
    )
    rules = model.associationRules.select(
        F.sort_array(
            F.array_union("antecedent", "consequent")
        ).alias("union_items"),
        F.sort_array("antecedent").alias("ante"),
        "confidence",
    )
    j = (
        rules.join(fi.withColumnRenamed("items", "union_items"), "union_items")
        .withColumnRenamed("freq", "union_freq")
        .join(
            fi.withColumnRenamed("items", "ante").withColumnRenamed(
                "freq", "ante_freq"
            ),
            "ante",
        )
    )
    bad = j.filter(
        F.abs(F.col("confidence") - F.col("union_freq") / F.col("ante_freq"))
        > 1e-9
    )
    assert bad.isEmpty()


def test_pair_form_equals_basket_form(spark):
    """The scalable pair-shuffle support count must equal the
    basket-materializing path exactly."""
    from miningfrequentpattern_spark.operators.mining import (
        item_supports,
        item_supports_from_rows,
    )

    li = load_table(spark, SF_SMOKE, "lineitem")
    via_pairs = {
        r.item: r.freq
        for r in item_supports_from_rows(li, "l_orderkey", "l_partkey").collect()
    }
    via_baskets = {
        r.item: r.freq for r in item_supports(order_baskets(li)).collect()
    }
    assert via_pairs == via_baskets


def test_salted_basketize_equals_plain(spark):
    """The skew-guarded (two-phase salted) basketize must be
    result-identical to the plain single-aggregate form — it is the
    same set union, just sharded — and max_items must cap on TRUE
    post-aggregation basket sizes."""
    from miningfrequentpattern_spark.operators.baskets import basketize

    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = basketize(li, "l_orderkey", "l_partkey")
    salted = basketize(li, "l_orderkey", "l_partkey", n_salts=4)
    assert plain.exceptAll(salted).isEmpty()
    assert salted.exceptAll(plain).isEmpty()

    cap = 3
    capped = basketize(li, "l_orderkey", "l_partkey", max_items=cap)
    assert capped.filter(F.size("items") > cap).isEmpty()
    want = plain.filter(F.size("items") <= cap).count()
    assert capped.count() == want


def test_pagerank_matches_dense_reference(spark):
    """operators/graph.py pagerank vs a dense numpy power iteration on
    a small asymmetric graph (star + tail), same fixed iterations."""
    import numpy as np

    from miningfrequentpattern_spark.operators.graph import pagerank

    edges = [
        (1, 2), (2, 1),
        (1, 3), (3, 1),
        (1, 4), (4, 1),
        (4, 5), (5, 4),
        (5, 6),  # directed tail: 6 has no out-edges (dangling)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["pagerank"]
        for r in pagerank(df, iterations=4, damping=0.85).collect()
    }

    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(4):
        nxt = np.full(n, 0.15 / n)
        for s, d in edges:
            nxt[idx[d]] += 0.85 * r[idx[s]] / out[idx[s]]
        r = nxt
    want = {m: round(r[idx[m]] * n, 4) for m in nodes}
    assert got == want


def test_pagerank_keeps_no_inbound_nodes_at_teleport_floor(spark):
    """A source-only node must survive every iteration at the teleport
    value, not silently drop out of the result."""
    from miningfrequentpattern_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {
        r["id"]: r["pagerank"]
        for r in pagerank(df, iterations=3, damping=0.85).collect()
    }
    assert set(got) == {1, 2, 3}
    # node 1: no in-edges -> rank stays (1-d)/N each round; scaled = 1-d
    assert got[1] == round(0.15, 4)


def test_kcore_oracle_chain_has_peel_depth_slack(duck):
    """m18's oracle is a FIXED 16-round chained-CTE peel, equal to the
    fixpoint only while the fixture converges within the chain. Pin
    the slack with a pure-Python peel on the same thresholded edge
    list: a regenerated fixture that peels deeper than
    _KCORE_ORACLE_ROUNDS - 4 fails HERE with a readable message,
    instead of as an opaque driver hash mismatch."""
    from collections import defaultdict

    from miningfrequentpattern_spark.queries.mining_pack import (
        _KCORE_K,
        _KCORE_ORACLE_ROUNDS,
    )

    edges = duck.execute(
        """
        WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                    FROM read_parquet(
                      '/root/testdata/sf0.01/lineitem.parquet'))
        SELECT a.pk, b.pk FROM li a
        JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2 HAVING count(*) >= 2
        """
    ).fetchall()
    adj: dict[int, set[int]] = defaultdict(set)
    for s_, d_ in edges:
        adj[s_].add(d_)
        adj[d_].add(s_)
    rounds = 0
    while True:
        drop = [v for v, ns in adj.items() if len(ns) < _KCORE_K]
        if not drop:
            break
        rounds += 1
        for v in drop:
            for u in adj[v]:
                adj[u].discard(v)
            del adj[v]
    assert rounds <= _KCORE_ORACLE_ROUNDS - 4, (
        f"fixture 3-core peel depth {rounds} is within 4 rounds of the "
        f"{_KCORE_ORACLE_ROUNDS}-round oracle chain — lengthen "
        "_KCORE_ORACLE_ROUNDS before the driver hash silently diverges"
    )


def test_frequent_items_from_rows_denominator_ignores_all_null_keys(spark):
    """The F-list threshold denominator counts keys with >= 1
    non-NULL item, mirroring basketize's empty-basket drop
    (code-review r9: an all-NULL-item key inflated N on the row path
    only, so the two forms' ceil(s*N) thresholds diverged on exactly
    the null-bearing inputs the support filter already handles)."""
    from miningfrequentpattern_spark.operators.baskets import basketize
    from miningfrequentpattern_spark.operators.mining import (
        frequent_items,
        frequent_items_from_rows,
    )

    # 11 keys; key 11 has only NULL items -> basket path sees N=10.
    # item 'a' sits in 5 baskets: frequent at s=0.5 iff N=10.
    rows = [(k, "a") for k in range(1, 6)]
    rows += [(k, f"only_{k}") for k in range(6, 11)]
    rows += [(11, None), (11, None)]
    df = spark.createDataFrame(rows, "k long, item string")
    via_rows = {
        r["item"]: r["freq"]
        for r in frequent_items_from_rows(df, "k", "item", 0.5).collect()
    }
    via_baskets = {
        r["item"]: r["freq"]
        for r in frequent_items(
            basketize(df, "k", "item"), 0.5
        ).collect()
    }
    assert via_rows == via_baskets == {"a": 5}


def test_prefix_span_hand_pin_and_cache_release(spark):
    """prefix_span (optimization r11) caches its input for MLlib's
    multiple passes and pins the result before releasing the cache:
    values must match the hand-computed lattice, the returned handle
    must survive the unpersist (re-collectable), and the input must
    NOT stay cached after the call."""
    from miningfrequentpattern_spark.operators.mining import prefix_span

    rows = [
        (1, [["a"], ["b"], ["c"]]),
        (2, [["a"], ["c"]]),
        (3, [["b"], ["a"]]),
    ]
    seqs = spark.createDataFrame(
        rows, "uid long, sequence array<array<string>>"
    ).select("sequence")
    out = prefix_span(seqs, min_support=0.5, max_pattern_length=3)
    got = {
        ">".join(x[0] for x in r["sequence"]): r["freq"]
        for r in out.collect()
    }
    # minCount = ceil(0.5 * 3) = 2: a in all three, b/c in two,
    # a>c in u1+u2; every other chain appears at most once.
    assert got == {"a": 3, "b": 2, "c": 2, "a>c": 2}
    assert seqs.storageLevel.useMemory is False  # cache released
    assert len(out.collect()) == 4  # pin survives the unpersist
