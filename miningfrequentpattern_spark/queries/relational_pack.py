"""Relational pack (SURVEY.md §2.3, R1-R22): TPC-H-shaped queries over
the fixture star schema, every one oracle-checked against DuckDB.

Scale notes baked into each query:
- dimension joins use explicit `broadcast()` hints (region/nation/
  supplier/part/customer are true dims at any SF);
- filters and projections are expressed declaratively so Catalyst
  pushes them into the parquet scan (asserted in tests/test_plans.py);
- every ordered/limited output carries a deterministic tiebreak;
- float aggregates are rounded to 4dp on BOTH engines before hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round4
from ..operators.relational import asof_join
from ..sources.io import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# R1/R2: projection + predicates (pushdown showcase)
# ---------------------------------------------------------------------------

@query(
    "r01_filter_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    WHERE l_returnflag = 'R'
      AND l_quantity BETWEEN 10 AND 20
      AND l_linestatus IN ('F', 'O')
    """,
)
def r01_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1+R2: projection with computed column under pushed-down
    conjunctive predicates (=, BETWEEN, IN)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & F.col("l_quantity").between(10, 20)
        & F.col("l_linestatus").isin("F", "O")
    ).select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "net_price"
        ),
    )


# ---------------------------------------------------------------------------
# R9: TPC-H Q1 shape — the canonical hash-aggregate
# ---------------------------------------------------------------------------

@query(
    "r02_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def r02_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 (TPC-H Q1 shape): multi-aggregate scan with partial
    aggregation; one shuffle on the 6-value group key."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# R3: broadcast star join (TPC-H Q5 shape)
# ---------------------------------------------------------------------------

@query(
    "r03_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
)
def r03_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 (TPC-H Q5 shape): fact table joined to a 3-level dim chain,
    every dim broadcast — zero shuffles for the joins, one for the
    final group-by."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# R4: outer join
# ---------------------------------------------------------------------------

@query(
    "r04_customer_order_counts",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 4) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def r04_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4: left outer join preserving order-less customers (count=0)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias(
                "total_spend"
            ),
        )
    )


# ---------------------------------------------------------------------------
# R5: semi / anti join
# ---------------------------------------------------------------------------

@query(
    "r05_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def r05_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5: left anti join == NOT EXISTS."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "r05b_parts_with_bulk_orders",
    oracle="""
    SELECT p_partkey, p_brand FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
    """,
)
def r05b_parts_with_bulk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5: left semi join == EXISTS with a pushed predicate."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_brand"
    )


# ---------------------------------------------------------------------------
# R6: range (theta) join
# ---------------------------------------------------------------------------

@query(
    "r06_click_to_purchase_10min",
    oracle="""
    SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
           round((epoch_us(b.ts) - epoch_us(a.ts)) / 1000000.0, 4) AS gap_sec
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
    """,
)
def r06_click_to_purchase_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6: self range-join — purchases within 10 minutes after a click
    by the same user. Equi-key (user_id) carries the shuffle; the range
    predicate is applied post-join, so fan-out is bounded per user."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").alias("a")
    b = ev.filter(F.col("event_type") == "purchase").alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (
            F.col("b.ts")
            <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES")
        ),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("click_id"),
        F.col("b.event_id").alias("purchase_id"),
        # Exact integer micros, then ONE divide — the r62 pin: a
        # double-cast ts at epoch ~1.7e9 carries ~2.4e-7 error, and
        # 4dp hits .xxxx5 halves the engines disagree on; the oracle
        # computes (epoch_us(b) - epoch_us(a)) / 1e6 identically
        # (code-review r8).
        F.round(
            (F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts")))
            / F.lit(1_000_000.0),
            4,
        ).alias("gap_sec"),
    )


# ---------------------------------------------------------------------------
# R7: cross join
# ---------------------------------------------------------------------------

@query(
    "r07_region_segment_grid",
    oracle="""
    SELECT r.r_name AS region, s.c_mktsegment AS segment,
           coalesce(x.n_customers, 0) AS n_customers
    FROM region r
    CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
    LEFT JOIN (
      SELECT n.n_regionkey, c.c_mktsegment, count(*) AS n_customers
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_regionkey, c.c_mktsegment
    ) x ON x.n_regionkey = r.r_regionkey AND x.c_mktsegment = s.c_mktsegment
    """,
)
def r07_region_segment_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7: dense (region × segment) grid via cross join, zero-filled
    from an aggregated fact — the canonical "complete the matrix"
    pattern. Both cross-join sides are tiny at any SF."""
    reg = _t(spark, sf_dir, "region")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    segs = cust.select("c_mktsegment").distinct()
    counts = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_regionkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return (
        reg.crossJoin(segs)
        .join(
            counts,
            (counts.n_regionkey == reg.r_regionkey)
            & (counts.c_mktsegment == segs.c_mktsegment),
            "left",
        )
        .select(
            F.col("r_name").alias("region"),
            segs.c_mktsegment.alias("segment"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# R8: as-of join
# ---------------------------------------------------------------------------

@query(
    "r08_asof_last_click_before_purchase",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
    clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    ranked AS (
      SELECT p.user_id, p.event_id AS purchase_id,
             c.event_id AS asof_event_id,
             row_number() OVER (
               PARTITION BY p.user_id, p.event_id
               ORDER BY (epoch_us(p.ts) - epoch_us(c.ts)) ASC NULLS LAST,
                        c.event_id) AS rn
      FROM purchases p
      LEFT JOIN clicks c ON c.user_id = p.user_id AND c.ts <= p.ts)
    SELECT user_id, purchase_id, asof_event_id
    FROM ranked WHERE rn = 1
    """,
)
def r08_asof_last_click_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """R8: as-of (backward) join — for every purchase, the most recent
    click at-or-before it by the same user. Implemented by the reusable
    asof_join operator (range join + rank-1 window, one shuffle)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        direction="backward",
        right_cols=["event_id"],
    )
    return out.select("user_id", "purchase_id", "asof_event_id")


# ---------------------------------------------------------------------------
# R9: distinct aggregates
# ---------------------------------------------------------------------------

@query(
    "r09_distinct_aggregates",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_suppliers,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def r09_distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9: multiple COUNT(DISTINCT) in one aggregate (expand-based
    plan; AQE handles the blow-up)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


@query("r10_approx_aggregates")
def r10_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10: approx_count_distinct + percentile_approx in ONE pass —
    both are mergeable sketches, so the plan is a plain partial+final
    hash aggregate with no Expand. Rows-only by design (sketches are
    engine-specific); accuracy vs exact is asserted in tests.

    Deliberately NOT combined with an exact COUNT(DISTINCT) (r09
    covers that): mixing a true distinct aggregate in forces an
    Expand that replicates every row per aggregate group, and the
    percentile/HLL sketches then update over the multiplied rows —
    measured 25-70x slower at sf0.1 (47-252 s vs 3.7 s) for identical
    sketch outputs. At 100 TB that Expand is the difference between
    one scan-shaped aggregate and a shuffle several times the input."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_p50"),
    )


# ---------------------------------------------------------------------------
# R11: rollup / cube
# ---------------------------------------------------------------------------

@query(
    "r11_rollup_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def r11_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11: hierarchical rollup with NULL-marked subtotal rows."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
    )


@query(
    "r11b_cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_lines
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def r11b_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11: full cube (all 2^2 grouping sets)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines")
    )


# ---------------------------------------------------------------------------
# R12/R15: ranking windows + top-k per group
# ---------------------------------------------------------------------------

@query(
    "r12_top3_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rnk
      FROM part)
    WHERE rnk <= 3
    """,
)
def r12_top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12+R15: row_number ranking, top-3 per brand, deterministic
    tiebreak on p_partkey."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.col("p_partkey")
    )
    return (
        p.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rnk")
    )


# ---------------------------------------------------------------------------
# R13: analytic windows (lag/lead)
# ---------------------------------------------------------------------------

@query(
    "r13_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS days_since_prev
    FROM orders
    """,
)
def r13_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13: lag() — days since the customer's previous order (NULL for
    the first)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias(
            "days_since_prev"
        ),
    )


# ---------------------------------------------------------------------------
# R14: running aggregates (frames)
# ---------------------------------------------------------------------------

@query(
    "r14_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS cum_spend
    FROM orders
    """,
)
def r14_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14: running sum with an explicit ROWS frame and deterministic
    ordering (orderdate + orderkey tiebreak)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("cum_spend"),
    )


# ---------------------------------------------------------------------------
# R15: global top-k
# ---------------------------------------------------------------------------

@query(
    "r15_top25_orders",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def r15_top25_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R15: global ORDER BY + LIMIT (TakeOrderedAndProject — no full
    sort, per-partition heaps)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice"))
    )


# ---------------------------------------------------------------------------
# R16: set operations
# ---------------------------------------------------------------------------

@query(
    "r16_repeat_customers_y2k",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01' AND o_orderdate < TIMESTAMP '2000-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_orderdate < TIMESTAMP '2001-01-01'
    """,
)
def r16_repeat_customers_y2k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R16: INTERSECT — customers ordering in both 1999 and 2000."""
    o = _t(spark, sf_dir, "orders")
    y99 = o.filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    ).select("o_custkey")
    y00 = o.filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y99.intersect(y00)


@query(
    "r16b_one_year_only_customers",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01' AND o_orderdate < TIMESTAMP '2000-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_orderdate < TIMESTAMP '2001-01-01'
    """,
)
def r16b_one_year_only_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R16: EXCEPT (set difference, distinct semantics)."""
    o = _t(spark, sf_dir, "orders")
    y99 = o.filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    ).select("o_custkey")
    y00 = o.filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y99.subtract(y00)


# ---------------------------------------------------------------------------
# R17: string functions
# ---------------------------------------------------------------------------

@query(
    "r17_string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substring(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           concat(c_mktsegment, ':', cast(c_nationkey AS VARCHAR)) AS seg_nation
    FROM customer
    WHERE c_name LIKE 'Customer%'
    """,
)
def r17_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R17: upper/substring/length/concat under a LIKE predicate."""
    c = _t(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").like("Customer%")).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws(":", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
    )


# ---------------------------------------------------------------------------
# R18: date/time functions
# ---------------------------------------------------------------------------

@query(
    "r18_monthly_order_stats",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           year(o_orderdate) AS order_year,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS monthly_total
    FROM orders GROUP BY 1, 2
    """,
)
def r18_monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R18: date_trunc/year with UTC session tz on both engines."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("monthly_total"),
    )


# ---------------------------------------------------------------------------
# R19: math functions
# ---------------------------------------------------------------------------

@query(
    "r19_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 1000), 4) AS abs_dev,
           round(pow(1 + l_discount, 2), 4) AS disc_sq,
           round(ln(l_extendedprice + 1), 4) AS log_price,
           round(least(l_quantity, 25.0), 4) AS q_capped,
           round(greatest(l_tax, l_discount), 4) AS max_rate
    FROM lineitem WHERE l_orderkey <= 100
    """,
)
def r19_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R19: abs/pow/ln/least/greatest on a pruned scan."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 1000), 4).alias("abs_dev"),
        F.round(F.pow(1 + F.col("l_discount"), 2), 4).alias("disc_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("log_price"),
        F.round(F.least("l_quantity", F.lit(25.0)), 4).alias("q_capped"),
        F.round(F.greatest("l_tax", "l_discount"), 4).alias("max_rate"),
    )


# ---------------------------------------------------------------------------
# R20: array functions (over derived baskets)
# ---------------------------------------------------------------------------

@query(
    "r20_array_functions",
    oracle="""
    WITH b AS (
      SELECT l_orderkey,
             list_sort(list_distinct(list(l_partkey))) AS items
      FROM lineitem GROUP BY l_orderkey)
    SELECT l_orderkey,
           len(items) AS n_items,
           items[1] AS min_item,
           items[-1] AS max_item,
           list_contains(items, 42) AS has_42,
           len(list_filter(items, x -> x % 2 = 0)) AS n_even
    FROM b
    """,
)
def r20_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R20: size/element_at/array_contains/filter over basket arrays —
    the array toolkit the mining pack rests on."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("items")
    )
    return b.select(
        "l_orderkey",
        F.size("items").cast("long").alias("n_items"),
        F.element_at("items", 1).alias("min_item"),
        F.element_at("items", -1).alias("max_item"),
        F.array_contains("items", 42).alias("has_42"),
        F.size(F.filter("items", lambda x: x % 2 == 0)).cast("long").alias(
            "n_even"
        ),
    )


# ---------------------------------------------------------------------------
# R21: JSON extraction
# ---------------------------------------------------------------------------

@query(
    "r21_json_props",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(avg(cast(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
           max(cast(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def r21_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R21: from_json over the events.props JSON column + aggregate."""
    ev = _t(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# R22: hashing
# ---------------------------------------------------------------------------

@query(
    "r22_content_hashes",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256
    FROM documents WHERE doc_id < 100
    """,
)
def r22_content_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R22: md5/sha256 content digests (shared algorithms across
    engines; xxhash64 deliberately unoracled — Spark-specific seed)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


# ---------------------------------------------------------------------------
# R10: exact percentiles (the oracle-able counterpart of the approx query)
# ---------------------------------------------------------------------------

@query(
    "r10b_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def r10b_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10: EXACT interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation) — the
    deterministic sibling of r10's sketch-based approx."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


# ---------------------------------------------------------------------------
# R12b: rank / dense_rank / ntile
# ---------------------------------------------------------------------------

@query(
    "r12b_rank_variants",
    oracle="""
    SELECT p_brand, p_partkey,
           rank() OVER w AS price_rank,
           dense_rank() OVER w AS price_dense_rank,
           ntile(4) OVER w AS price_quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    """,
)
def r12b_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12: rank/dense_rank/ntile over the same deterministic window."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.col("p_partkey")
    )
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
    )


# ---------------------------------------------------------------------------
# R13b: lead + first/last analytic functions
# ---------------------------------------------------------------------------

@query(
    "r13b_next_order_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(lead(o_totalprice) OVER w, 4) AS next_price,
           round(first_value(o_totalprice) OVER w, 4) AS first_price,
           round(last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4)
             AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def r13b_next_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13: lead/first/last — last_value needs the full-partition frame
    on BOTH engines (default frame stops at CURRENT ROW)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lead("o_totalprice").over(w), 4).alias("next_price"),
        F.round(F.first("o_totalprice").over(w), 4).alias("first_price"),
        F.round(F.last("o_totalprice").over(wfull), 4).alias("last_price"),
    )


# ---------------------------------------------------------------------------
# R17b: edit distance
# ---------------------------------------------------------------------------

@query(
    "r17b_name_edit_distance",
    oracle="""
    SELECT c_custkey, c_name,
           levenshtein(c_name, 'Customer#000000001') AS dist
    FROM customer WHERE c_custkey <= 200
    """,
)
def r17b_name_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R17: levenshtein edit distance (same algorithm both engines)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        "c_name",
        F.levenshtein("c_name", F.lit("Customer#000000001"))
        .cast("long")
        .alias("dist"),
    )


# ---------------------------------------------------------------------------
# R11c: GROUPING SETS through the SQL surface
# ---------------------------------------------------------------------------

@query(
    "r11c_grouping_sets_sql",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           grouping(o_orderstatus) AS g_status,
           grouping(o_orderpriority) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def r11c_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11 via the SQL entry point: explicit GROUPING SETS with
    grouping() markers (distinguishes real NULLs from subtotal NULLs),
    run through spark.sql over registered temp views — exercises the
    engine's second query surface."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               cast(grouping(o_orderstatus) AS BIGINT) AS g_status,
               cast(grouping(o_orderpriority) AS BIGINT) AS g_priority
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# R23: calendar resample + forward fill (time-series gap filling)
# ---------------------------------------------------------------------------

@query(
    "r23_daily_activity_ffill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('day', min(ts)) AS d0, date_trunc('day', max(ts)) AS d1
      FROM events),
    cal AS (
      SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                    (SELECT d1 FROM bounds),
                                    INTERVAL 1 DAY)) AS day),
    users AS (SELECT DISTINCT user_id FROM events),
    daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             count(*) AS n, round(sum(value), 4) AS v
      FROM events GROUP BY 1, 2),
    grid AS (
      SELECT u.user_id, c.day, coalesce(d.n, 0) AS n_events, d.v
      FROM users u CROSS JOIN cal c
      LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = c.day)
    SELECT user_id, day, n_events,
           round(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS ffill_value
    FROM grid
    """,
)
def r23_daily_activity_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R23 (resample): dense per-user daily calendar with zero-filled
    counts and forward-filled metric — the gap-filling shape every
    time-series feature pipeline needs. Calendar bounds derive from the
    data on BOTH engines (no literals to drift). The users × days grid
    is a broadcast-friendly cross join: |users| × |days| rows, never
    |events|-proportional."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    cal = bounds.select(
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    users = ev.select("user_id").distinct()
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("v")
    )
    grid = (
        users.crossJoin(F.broadcast(cal))
        .join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            "v",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        "user_id",
        "day",
        "n_events",
        F.round(F.last("v", ignorenulls=True).over(w), 4).alias("ffill_value"),
    )


# ---------------------------------------------------------------------------
# R24/R25: pivot / unpivot
# ---------------------------------------------------------------------------

@query(
    "r24_pivot_event_counts",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
)
def r24_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R24: pivot — long→wide per-user event-type counts. Pivot values
    are EXPLICIT (the 5 known types): with an inferred value list Spark
    runs an extra distinct job and column order becomes data-dependent,
    both wrong at scale."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy("user_id").pivot("event_type", types).count()
    # pivot leaves NULL for absent combos; counts must be 0.
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


@query(
    "r25_unpivot_part_attrs",
    oracle="""
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, round(p_retailprice, 4) AS val
    FROM part
    """,
)
def r25_unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R25: unpivot/melt — wide→long over part attributes (the inverse
    of r24; stack values into (attr, val) rows)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.round("p_retailprice", 4).alias("p_retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="attr",
        valueColumnName="val",
    )


@query(
    "r26_global_order_rank",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice,
           row_number() OVER (ORDER BY round(o_totalprice, 4) DESC,
                              o_orderkey)
             AS global_rank
    FROM orders
    """,
)
def r26_global_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R26: exact global ranking of every order by total price —
    distributed two-phase form (range shuffle + per-partition offsets),
    NOT the single-partition `row_number() OVER (ORDER BY ...)` the
    oracle uses. Same answer, parallel plan; see
    operators/relational.py::global_row_number."""
    from ..operators.relational import global_row_number

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice")
    )
    return global_row_number(
        o, [F.desc("o_totalprice"), F.asc("o_orderkey")]
    )


@query(
    "r27_variant_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod
    FROM events WHERE event_id < 2000
    """,
)
def r27_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R21-extension: semi-structured access through the VARIANT type
    (Spark 4) — parse_json once into a binary variant, then typed
    path extraction with try_variant_get. Unlike from_json (r21) no
    schema is declared up front, which is the 100 TB posture for
    heterogeneous JSON: parse once, push typed path probes down to
    each consumer."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        (k % 10).alias("k_mod"),
    )


# The SAME SQL text runs on both engines (Spark 4 recursive CTE and
# DuckDB) — the strongest possible parity statement for the surface.
# Spark restricts recursion to UNION ALL (no UNION-distinct), so the
# walk must be acyclic: each step follows lead() to the strictly-next
# order, terminating at the chain tail. Depth = max orders per
# customer (25 on the fixtures, limit 100 via
# spark.sql.cteRecursionLevelLimit).
_R28_SQL = """
    WITH RECURSIVE nxt AS (
      SELECT o_custkey, o_orderkey,
             lead(o_orderkey) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
               AS next_key,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    chain(o_custkey, o_orderkey, hop) AS (
      SELECT o_custkey, o_orderkey, 1 AS hop FROM nxt WHERE rn = 1
      UNION ALL
      SELECT n.o_custkey, n.next_key, c.hop + 1
      FROM chain c
      JOIN nxt n ON n.o_orderkey = c.o_orderkey
      WHERE n.next_key IS NOT NULL
    )
    SELECT o_custkey, o_orderkey, hop FROM chain
"""


@query("r28_recursive_order_chain", oracle=_R28_SQL)
def r28_recursive_order_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R28 (recursive CTE, Spark 4): walk each customer's orders
    date-forward hop by hop. Query and oracle are the IDENTICAL SQL
    string — Spark's iterative UnionLoop vs DuckDB's recursive CTE
    must converge to the same fixpoint."""
    for t in ("orders",):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_R28_SQL)


@query("r29_hll_sketches")
def r29_hll_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10-extension (mergeable sketches, Spark 4 datasketches): per
    return-flag HLL distinct-part estimates via
    hll_sketch_agg/hll_sketch_estimate. The point at 100 TB is
    MERGEABILITY: sketch partials combine across partitions/days in
    the map-side aggregate, unlike exact COUNT(DISTINCT) whose shuffle
    grows with cardinality. Rows-only (sketch binary is
    engine-specific); accuracy vs exact is asserted in
    tests/test_smoke.py (±3%)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").alias(
                "approx_parts"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# R30/R31: subquery surfaces — correlated scalar + lateral join
# ---------------------------------------------------------------------------

# Identical SQL text on both engines (same posture as r28): the
# correlated scalar subquery is the decorrelation test — Catalyst
# rewrites it to an aggregate + join (never a per-row re-execution),
# which is the only shape that survives 100 TB. The inner aggregate
# groups on c_nationkey (25 keys) and broadcasts back.
_R30_SQL = """
    SELECT c_custkey, c_name, round(c_acctbal, 4) AS acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
"""


@query("r30_above_nation_avg", oracle=_R30_SQL)
def r30_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R30 (correlated scalar subquery): customers above their own
    nation's average balance. Query and oracle are the identical SQL
    string; `.explain` shows the decorrelated Aggregate←BroadcastJoin,
    not a nested-loop re-evaluation."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_R30_SQL)


_R31_SQL = """
    SELECT n_name, s_name, round(s_acctbal, 4) AS acctbal
    FROM nation n, LATERAL (
      SELECT s_name, s_acctbal FROM supplier s
      WHERE s.s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_name LIMIT 2) top2
"""


@query("r31_lateral_top_suppliers", oracle=_R31_SQL)
def r31_lateral_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R31 (lateral join): per-nation top-2 suppliers via a correlated
    LATERAL subquery with ORDER BY + LIMIT (Spark 4 decorrelates it
    into a partitioned window rank — the same physical plan as r12's
    explicit formulation, proving the two surfaces converge). Identical
    SQL text runs on DuckDB."""
    for t in ("nation", "supplier"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_R31_SQL)


# ---------------------------------------------------------------------------
# R32: incremental upsert / MERGE emulation (CDC shape)
# ---------------------------------------------------------------------------

@query(
    "r32_incremental_upsert",
    oracle="""
    WITH base AS (
      SELECT o_custkey, round(sum(o_totalprice), 4) AS spend,
             count(*) AS n_orders
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY o_custkey),
    delta AS (
      SELECT o_custkey, round(sum(o_totalprice), 4) AS spend,
             count(*) AS n_orders
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      GROUP BY o_custkey)
    SELECT coalesce(b.o_custkey, d.o_custkey) AS o_custkey,
           round(coalesce(b.spend, 0) + coalesce(d.spend, 0), 4)
             AS total_spend,
           coalesce(b.n_orders, 0) + coalesce(d.n_orders, 0)
             AS total_orders,
           CASE WHEN b.o_custkey IS NULL THEN 'insert'
                WHEN d.o_custkey IS NULL THEN 'unchanged'
                ELSE 'update' END AS merge_op
    FROM base b FULL OUTER JOIN delta d ON b.o_custkey = d.o_custkey
    """,
)
def r32_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R32 (MERGE/upsert emulation): fold a change-set (orders on or
    after the cutover) into a base snapshot (orders before it) with
    insert/update/unchanged disposition per key — the CDC merge shape
    Delta's MERGE INTO performs, expressed as aggregate + full outer
    join so it runs on plain parquet. Both legs pre-aggregate before
    the join (partial map-side combine), so the shuffle carries one
    row per customer per leg, not raw orders; at 100 TB both legs
    would additionally bucket by key, making the merge shuffle-free."""
    orders = _t(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("timestamp")

    def leg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.round(F.sum("o_totalprice"), 4).alias("spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )

    base = leg(orders.filter(F.col("o_orderdate") < cut))
    delta = leg(orders.filter(F.col("o_orderdate") >= cut))
    b, d = base.alias("b"), delta.alias("d")
    return b.join(d, F.col("b.o_custkey") == F.col("d.o_custkey"), "full").select(
        F.coalesce("b.o_custkey", "d.o_custkey").alias("o_custkey"),
        F.round(
            F.coalesce("b.spend", F.lit(0)) + F.coalesce("d.spend", F.lit(0)), 4
        ).alias("total_spend"),
        (
            F.coalesce("b.n_orders", F.lit(0)) + F.coalesce("d.n_orders", F.lit(0))
        ).alias("total_orders"),
        F.when(F.col("b.o_custkey").isNull(), "insert")
        .when(F.col("d.o_custkey").isNull(), "unchanged")
        .otherwise("update")
        .alias("merge_op"),
    )


@query("r33_approx_topk")
def r33_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10-extension (frequent-items sketch, Spark 4 datasketches):
    per-return-flag top-5 parts via approx_top_k. Like r29's HLL, the
    win at 100 TB is MERGEABILITY — sketch partials combine map-side,
    so the shuffle carries one bounded sketch per group instead of a
    (group × item) explosion; exact top-k would shuffle every distinct
    pair. maxItemsTracked=8192 bounds executor memory regardless of
    item cardinality. Rows-only (tie order and eviction are
    engine-specific); count accuracy vs the exact aggregate is
    asserted in tests/test_smoke.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.expr("approx_top_k(l_partkey, 5, 8192)").alias("top_parts"))
        .select(
            "l_returnflag",
            F.posexplode("top_parts").alias("pos", "entry"),
        )
        .select(
            "l_returnflag",
            (F.col("pos") + 1).alias("rank"),
            F.col("entry.item").alias("l_partkey"),
            F.col("entry.count").alias("approx_count"),
        )
    )


@query(
    "r34_rolling_7day_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2)
             AS spend_7d
    FROM orders
    """,
)
def r34_rolling_7day_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14-extension (time-RANGE window frame): per-customer rolling
    7-day spend — the frame is a VALUE range over event time ([t-6d,
    t]), not a row count, so bursty days aggregate correctly however
    many orders share a date (the frame family r14's rowsBetween
    cannot express).

    Spark's rangeBetween needs a numeric ordering key, so the frame
    runs over epoch seconds (cast to long) with a ±6-day offset in
    seconds — semantically identical to the oracle's INTERVAL frame
    because o_orderdate is day-aligned (asserted by construction:
    both engines see the same instants). Scale shape: windows
    partition by customer — millions of small uniform groups, no
    global sort; frame evaluation is the standard sliding-sum scan
    within each sorted partition."""
    o = load_table(spark, sf_dir, "orders")
    epoch = F.col("o_orderdate").cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-6 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_7d"),
    )


@query(
    "r35_unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
    FROM part
    """,
)
def r35_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R24's inverse (UNPIVOT / melt): wide part metrics to long
    (key, metric, value) rows via the native `unpivot` operator —
    planned as a single Expand over the scan (each input row emits one
    row per value column in the same task), so the melt is shuffle-free
    and the 2x row fan-out is the entire cost at any scale. Oracle is
    the portable UNION ALL formulation of the same relation."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return p.unpivot(
        ["p_partkey"], ["p_size", "p_retailprice"], "metric", "value"
    )


@query(
    "r08b_asof_bucketed",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
    clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    ranked AS (
      SELECT p.user_id, p.event_id AS purchase_id,
             c.event_id AS asof_event_id,
             row_number() OVER (
               PARTITION BY p.user_id, p.event_id
               ORDER BY (epoch_us(p.ts) - epoch_us(c.ts)) ASC NULLS LAST,
                        c.event_id) AS rn
      FROM purchases p
      LEFT JOIN clicks c
        ON c.user_id = p.user_id AND c.ts <= p.ts
       AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000)
    SELECT user_id, purchase_id, asof_event_id
    FROM ranked WHERE rn = 1
    """,
)
def r08b_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 (bucketed twin): r08 with a 1-hour tolerance AND the coarse
    time-bucket equi-key (`bucket="1 hour"`) in the join condition —
    the 100 TB form. Each click registers under its own hour-bucket
    plus the next, purchases join on exact bucket equality, and the
    per-user fan-out drops from the whole click history to ~2 hours
    of clicks. tolerance (3600 s) == bucket width, so results are
    provably identical to the unbucketed range join; the oracle states
    the same tolerance-bounded as-of in plain SQL, hash-certifying the
    bucketed plan end-to-end."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        direction="backward",
        tolerance_expr=F.lit(3600.0),
        right_cols=["event_id"],
        bucket="1 hour",
    )
    return out.select("user_id", "purchase_id", "asof_event_id")


@query(
    "r36_salted_join_segments",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def r36_salted_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew lever (functions/skew.py): order revenue by customer
    segment through `salted_join` — the fact side carries a random
    salt, the dim side is replicated once per salt value, and the join
    runs on (key, salt), spreading any hot customer across n_salts
    tasks. The tool for joins AQE's runtime skew splitting cannot
    reach (bucketed / pre-partitioned / stream-static joins avoid the
    shuffle AQE would split). Semantics are identical to the plain
    equi-join — the oracle IS the plain join, so the driver
    hash-certifies the equivalence, not just a test fixture."""
    from ..functions.skew import salted_join

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    joined = salted_join(o, c, key="custkey", n_salts=8)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@query(
    "r37_snapshot_diff",
    oracle="""
    WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders
                WHERE o_orderkey % 13 != 0),
    v2 AS (SELECT o_orderkey,
                  CASE WHEN o_orderkey % 7 = 0
                       THEN o_totalprice + 1000.0
                       ELSE o_totalprice END AS o_totalprice
           FROM orders WHERE o_orderkey % 11 != 0)
    SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                WHEN v2.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           v1.o_totalprice AS old_price,
           v2.o_totalprice AS new_price
    FROM v1 FULL OUTER JOIN v2 USING (o_orderkey)
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
       OR v1.o_totalprice != v2.o_totalprice
    """,
)
def r37_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (the DERIVE side of CDC, complementing
    r32's MERGE apply side): given two table versions, emit the
    added / removed / changed row set — the audit diff every
    ingestion pipeline runs when a source re-delivers a full dump
    instead of a changelog. The two versions are carved
    deterministically out of `orders` (key-mod drops on each side, a
    price bump on every 7th key) so the diff has all three change
    types and the oracle rebuilds the identical versions. The bump is
    ADDITIVE (+1000.0, exact in IEEE doubles both engines) — a
    multiplicative round(x*1.1, 2) was tried first and diverged on
    decimal-tie rounding between engines.

    Shape: one full-outer shuffle join on the snapshot key, filtered
    to differences. At 100 TB the join key is the natural primary
    key, so both sides partition evenly; bucketed snapshots make it
    exchange-free (tests/test_plans.py bucketed-join evidence), and
    comparing a row-hash instead of each column keeps the diff
    predicate cheap at wide schemas."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("old_price")
    )
    v2 = o.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.col("o_totalprice") + 1000.0,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("new_price"),
    )
    j = v1.join(v2, "o_orderkey", "full_outer")
    return (
        j.filter(
            F.col("old_price").isNull()
            | F.col("new_price").isNull()
            | (F.col("old_price") != F.col("new_price"))
        )
        .select(
            "o_orderkey",
            F.when(F.col("old_price").isNull(), F.lit("added"))
            .when(F.col("new_price").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed"))
            .alias("change_type"),
            "old_price",
            "new_price",
        )
    )


@query(
    "r38_incremental_agg_refresh",
    oracle="""
    SELECT o_custkey,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders GROUP BY o_custkey
    """,
)
def r38_incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9-extension (incremental view maintenance): refresh a
    per-customer order aggregate by MERGING a previously-computed
    base aggregate with the aggregate of only the delta rows —
    count/sum/max combine algebraically (count+count, sum+sum,
    greatest(max,max)), so the refresh never rescans the base data.
    This is the derive-side complement of r32's MERGE apply and r37's
    snapshot diff: at 100 TB a daily refresh aggregates ONLY the new
    partition (the delta leg's date filter prunes at the scan) and
    full-outer-joins it against the stored aggregate table (|keys|
    rows, not |rows|). The oracle aggregates the WHOLE table
    directly, so the hash match proves the merge algebra is exact —
    including customers present in only one leg.

    Cutoff 1995-01-01 splits the fixtures roughly in half; both legs
    push their date predicate into the parquet scan (one scan per
    leg here; in production the base leg is a stored table, not a
    rescan — the point certified is the MERGE, not the base's
    provenance)."""
    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1995-01-01").cast("date")
    def agg_of(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("s"),
            F.max("o_totalprice").alias("m"),
        )
    base = agg_of(o.filter(F.col("o_orderdate") < cutoff))
    delta = agg_of(o.filter(F.col("o_orderdate") >= cutoff))
    b, d = base.alias("b"), delta.alias("d")
    merged = b.join(d, F.col("b.o_custkey") == F.col("d.o_custkey"),
                    "full_outer")
    return merged.select(
        F.coalesce(F.col("b.o_custkey"), F.col("d.o_custkey")).alias(
            "o_custkey"
        ),
        (
            F.coalesce(F.col("b.n"), F.lit(0))
            + F.coalesce(F.col("d.n"), F.lit(0))
        ).alias("n_orders"),
        F.round(
            F.coalesce(F.col("b.s"), F.lit(0.0))
            + F.coalesce(F.col("d.s"), F.lit(0.0)),
            2,
        ).alias("sum_price"),
        F.round(
            F.greatest(
                F.coalesce(F.col("b.m"), F.col("d.m")),
                F.coalesce(F.col("d.m"), F.col("b.m")),
            ),
            2,
        ).alias("max_price"),
    )


def _funnel_stages(
    spark: SparkSession, sf_dir: str, pin: bool
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three r39 funnel stage relations (first click; first view
    within 2 h of it; first purchase within 2 h of that). With
    ``pin`` the stage-1/2 outputs sit behind lazy localCheckpoints
    (see r39's optimization note); without, the raw lineage is
    exposed so tests can assert each stage's filter pushdown."""
    ev = _t(spark, sf_dir, "events")

    def first_after(
        prev: DataFrame, ts_col: str, etype: str, out_col: str
    ) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype).alias("e")
        pv = prev.alias("pv")
        return (
            pv.join(
                e,
                (F.col("e.user_id") == F.col("pv.user_id"))
                & (F.col("e.ts") > F.col(f"pv.{ts_col}"))
                & (
                    F.col("e.ts")
                    <= F.col(f"pv.{ts_col}") + F.expr("INTERVAL 2 HOURS")
                ),
            )
            .groupBy(F.col("pv.user_id").alias("user_id"))
            .agg(F.min(F.col("e.ts")).alias(out_col))
        )

    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    if pin:
        c = c.localCheckpoint(eager=False)
    v = first_after(c, "click_ts", "view", "view_ts")
    if pin:
        v = v.localCheckpoint(eager=False)
    p = first_after(v, "view_ts", "purchase", "purchase_ts")
    return c, v, p


@query(
    "r39_funnel_conversion",
    oracle="""
    WITH c AS (SELECT user_id, min(ts) AS click_ts
               FROM events WHERE event_type = 'click' GROUP BY 1),
    v AS (SELECT c.user_id, min(e.ts) AS view_ts
          FROM c JOIN events e
            ON e.user_id = c.user_id AND e.event_type = 'view'
           AND e.ts > c.click_ts
           AND e.ts <= c.click_ts + INTERVAL 2 HOUR
          GROUP BY 1),
    p AS (SELECT v.user_id, min(e.ts) AS purchase_ts
          FROM v JOIN events e
            ON e.user_id = v.user_id AND e.event_type = 'purchase'
           AND e.ts > v.view_ts
           AND e.ts <= v.view_ts + INTERVAL 2 HOUR
          GROUP BY 1)
    SELECT 'l1_click' AS stage, count(*) AS n_users FROM c
    UNION ALL SELECT 'l2_view', count(*) FROM v
    UNION ALL SELECT 'l3_purchase', count(*) FROM p
    """,
)
def r39_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events-analytics extension (complex event sequencing): a
    3-stage conversion funnel — first click, then first view within
    2 h of it, then first purchase within 2 h of THAT — counting
    users surviving each stage. The sequential dependency (each
    stage's window anchors on the previous stage's event) is what
    separates a funnel from three independent counts, and it is the
    relational mirror of what PrefixSpan mines as sequences.

    Shape: three passes, each an event_type-filtered scan (predicate
    pushed — at scale each stage reads only its event partition), a
    user-keyed min-aggregate with map-side partials, and a user-keyed
    equi-join against the previous stage (|users|-sized left leg —
    broadcastable until user counts outgrow the threshold, then a
    plain shuffled equi-join; either is skew-safe since user_id is
    the natural partition key). Stage outputs are 1-row counts
    union'd together."""
    # Optimization r11 (guide §2.4): each stage relation feeds TWO
    # consumers (its own 1-row count + the next stage's join anchor)
    # — unpinned, the funnel's sequential dependency made the plan
    # expand stage 1 THREE times and stage 2 twice (6 parquet scans
    # of events). Lazy localCheckpoint pins on the |users|-sized
    # stage-1/2 outputs (stage 3 has one consumer): each stage's
    # event scan runs ONCE. Lazy ⇒ nothing runs at construction;
    # fresh per invocation ⇒ no cross-run caching. Each stage's
    # event_type filter still pushes into its (now interior) scan —
    # asserted on the pre-pin stages in tests/test_plans.py.
    c, v, p = _funnel_stages(spark, sf_dir, pin=True)
    one = F.count(F.lit(1)).alias("n_users")
    return (
        c.agg(one).select(F.lit("l1_click").alias("stage"), "n_users")
        .unionAll(
            v.agg(one).select(F.lit("l2_view").alias("stage"), "n_users")
        )
        .unionAll(
            p.agg(one).select(
                F.lit("l3_purchase").alias("stage"), "n_users"
            )
        )
    )


@query(
    "r40_cohort_retention",
    oracle="""
    WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
               FROM events GROUP BY 1),
    a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
          FROM events)
    SELECT f.cohort_week,
           CAST(datediff('day', CAST(f.cohort_week AS DATE),
                         CAST(a.week AS DATE)) / 7 AS BIGINT)
             AS week_offset,
           count(*) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def r40_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events-analytics extension (cohort retention): users grouped
    by first-seen ISO week, counted in each subsequent activity week
    — the retention triangle every product-analytics stack computes.
    Week truncation is ISO-Monday in BOTH engines and offsets are
    exact day-diffs of truncated weeks divided by 7, so the oracle is
    integer-exact.

    Shape: the cohort leg is one user-keyed min-aggregate; the
    activity leg is a distinct over (user, week) — both map-side
    partial; the user-keyed equi-join then a (cohort, offset) hash
    aggregate. All keys are natural and uniform; nothing global."""
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    a = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        a.join(f, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.col("week").cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Beyond-§2: single-pass statistics, constraint checking, gap-fill
# ---------------------------------------------------------------------------

@query(
    "r41_correlation_matrix",
    oracle="""
    WITH c AS (SELECT corr(l_quantity, l_extendedprice) AS c1,
                      corr(l_quantity, l_discount)      AS c2,
                      corr(l_quantity, l_tax)           AS c3,
                      corr(l_extendedprice, l_discount) AS c4,
                      corr(l_extendedprice, l_tax)      AS c5,
                      corr(l_discount, l_tax)           AS c6
               FROM lineitem)
    SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
           round(c1, 4) + 0.0 AS pearson_corr FROM c
    UNION ALL SELECT 'l_quantity', 'l_discount', round(c2, 4) + 0.0 FROM c
    UNION ALL SELECT 'l_quantity', 'l_tax', round(c3, 4) + 0.0 FROM c
    UNION ALL SELECT 'l_extendedprice', 'l_discount', round(c4, 4) + 0.0 FROM c
    UNION ALL SELECT 'l_extendedprice', 'l_tax', round(c5, 4) + 0.0 FROM c
    UNION ALL SELECT 'l_discount', 'l_tax', round(c6, 4) + 0.0 FROM c
    """,
)
def r41_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-§2 (profiling statistics): pairwise Pearson correlation
    over lineitem's four numeric measures, computed in ONE aggregate
    pass and unpivoted to a (col_x, col_y, corr) matrix — the standard
    feature-screening step before any modeling/mixing decision.

    Shape: a single full-width hash aggregate (map-side partials carry
    the six streaming covariance states — constant size per partition,
    independent of row count), then a 6-row `stack` over the 1-row
    result. The corpus is scanned ONCE for all six pairs; adding
    columns grows the aggregate state quadratically but the scan count
    not at all. Both engines use streaming sample-covariance
    accumulators; 4dp rounding absorbs summation-order ulps."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_quantity", "l_tax"),
        ("l_extendedprice", "l_discount"),
        ("l_extendedprice", "l_tax"),
        ("l_discount", "l_tax"),
    ]
    agg = li.agg(
        *[
            F.corr(x, y).alias(f"c{i}")
            for i, (x, y) in enumerate(pairs)
        ]
    )
    # + 0.0 pins -0.0 on near-orthogonal pairs (the l43 class);
    # paired with `+ 0.0` in the oracle.
    stack_args = ", ".join(
        f"'{x}', '{y}', round(c{i}, 4) + 0.0"
        for i, (x, y) in enumerate(pairs)
    )
    return agg.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_x, col_y, pearson_corr)"
    )


@query(
    "r42_data_quality_report",
    oracle="""
    WITH li AS (SELECT count(*) AS n,
                       count(*) - count(DISTINCT (l_orderkey, l_linenumber))
                         AS pk_dupes,
                       count(*) FILTER (l_discount < 0 OR l_discount > 0.1)
                         AS disc_viol
                FROM lineitem),
    o AS (SELECT count(*) AS n,
                 count(*) - count(DISTINCT o_orderkey) AS pk_dupes
          FROM orders),
    ev AS (SELECT count(*) AS n,
                  count(*) FILTER (value IS NULL) AS null_value
           FROM events),
    li_orph AS (SELECT count(*) AS v FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)),
    ev_orph AS (SELECT count(*) AS v FROM events e
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = e.user_id))
    SELECT 'lineitem_pk_unique' AS check_name,
           pk_dupes AS n_violations, n AS n_total,
           round(pk_dupes * 1.0 / n, 6) AS violation_rate FROM li
    UNION ALL SELECT 'lineitem_discount_range', disc_viol, n,
           round(disc_viol * 1.0 / n, 6) FROM li
    UNION ALL SELECT 'orders_pk_unique', pk_dupes, n,
           round(pk_dupes * 1.0 / n, 6) FROM o
    UNION ALL SELECT 'events_value_complete', null_value, n,
           round(null_value * 1.0 / n, 6) FROM ev
    UNION ALL SELECT 'lineitem_fk_orders', li_orph.v, li.n,
           round(li_orph.v * 1.0 / li.n, 6) FROM li_orph, li
    UNION ALL SELECT 'events_fk_customer', ev_orph.v, ev.n,
           round(ev_orph.v * 1.0 / ev.n, 6) FROM ev_orph, ev
    """,
)
def r42_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-§2 (constraint checking, Deequ-style): a declarative
    data-quality report — primary-key uniqueness, value-range,
    completeness, and referential-integrity checks — emitted as one
    (check_name, n_violations, n_total, violation_rate) relation.
    The fixtures genuinely fire `lineitem_pk_unique` (14,168 dupes at
    sf0.01), so the report is certified on both firing and passing
    checks.

    Shape: each table's value/uniqueness checks share ONE conditional
    aggregate over a single scan (count + countDistinct + FILTER
    counts — all map-side partial); the two FK checks are left_anti
    joins counting survivors. At 100 TB the anti joins shuffle on
    their natural uniform keys (orderkey / custkey) — or broadcast
    when the parent's key column fits — and the conditional-agg legs
    stay one scan per table regardless of how many checks are added:
    adding a rule costs an expression, not a pass."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")

    li_agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.count(F.lit(1))
            - F.count_distinct(F.col("l_orderkey"), F.col("l_linenumber"))
        ).alias("pk_dupes"),
        F.count_if(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("disc_viol"),
    )
    # Optimization r11: li_agg feeds THREE report legs (two checks +
    # the FK row's total) and ev_agg two — unpinned, each unionAll
    # branch re-planned the full table aggregate (the r42 plan held
    # 10 parquet scans: lineitem 4×, events 3×). A lazy
    # localCheckpoint materializes each 1-ROW aggregate once; every
    # leg reads the pinned RDD. Lazy ⇒ nothing runs at construction;
    # fresh per invocation ⇒ no cross-run caching.
    li_agg = li_agg.localCheckpoint(eager=False)
    o_agg = orders.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
            "pk_dupes"
        ),
    )
    ev_agg = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("value").isNull()).alias("null_value"),
    ).localCheckpoint(eager=False)
    li_orph = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    ev_orph = (
        ev.join(cust, ev.user_id == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
    )

    def row(name: str, src: DataFrame, viol: str, tot: str = "n") -> DataFrame:
        return src.select(
            F.lit(name).alias("check_name"),
            F.col(viol).alias("n_violations"),
            F.col(tot).alias("n_total"),
            F.round(F.col(viol) / F.col(tot), 6).alias("violation_rate"),
        )

    li_total = li_agg.select("n")
    ev_total = ev_agg.select("n")
    return (
        row("lineitem_pk_unique", li_agg, "pk_dupes")
        .unionAll(row("lineitem_discount_range", li_agg, "disc_viol"))
        .unionAll(row("orders_pk_unique", o_agg, "pk_dupes"))
        .unionAll(row("events_value_complete", ev_agg, "null_value"))
        .unionAll(
            row("lineitem_fk_orders", li_orph.crossJoin(li_total), "v")
        )
        .unionAll(
            row("events_fk_customer", ev_orph.crossJoin(ev_total), "v")
        )
    )


@query(
    "r43_gapfill_daily",
    oracle="""
    WITH b AS (SELECT min(CAST(ts AS DATE)) AS mn,
                      max(CAST(ts AS DATE)) AS mx
               FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    days AS (SELECT unnest(generate_series(b.mn, b.mx, INTERVAL 1 DAY))
               AS d FROM b),
    grid AS (SELECT t.event_type, CAST(days.d AS DATE) AS day
             FROM types t CROSS JOIN days),
    c AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
          FROM events GROUP BY 1, 2)
    -- day is re-emitted as a midnight TIMESTAMP: the hash-compare layer
    -- coerces DuckDB DATE through pandas (datetime64) while Spark dates
    -- stay datetime.date, so DATE columns can never hash-match across
    -- engines; midnight timestamps are identical on both.
    SELECT g.event_type, CAST(g.day AS TIMESTAMP) AS day,
           coalesce(c.n, 0) AS n_events,
           (c.n IS NULL) AS is_gap
    FROM grid g LEFT JOIN c USING (event_type, day)
    """,
)
def r43_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-§2 (time-series gap-fill): the dense event_type × calendar
    day grid with zero-filled missing days — the densification step
    every downstream rolling window / forecast needs (a RANGE window
    over sparse days silently skips absent dates; the grid makes gaps
    explicit rows instead).

    Shape: bounds are a 1-row global aggregate (broadcast), the type
    dimension a distinct over a 5-value column; the grid is
    |types| × |days| rows built by `sequence` + explode — generated,
    never shuffled at corpus size. The counts leg is one map-side
    partial hash aggregate on (type, day); the stitch joins
    grid-to-counts on the same key. Grid size is bounded by
    cardinality × date span, independent of event volume — at 100 TB
    the only corpus-sized stage is still the single counts
    aggregate."""
    ev = _t(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    # Optimization r11 (guide §2.3/§2.4): bounds and the type
    # dimension both derive from the counts relation instead of two
    # extra corpus passes — c is (type, day)-grain by construction,
    # so min/max over its day column ≡ min/max over the raw cast
    # (aggregates skip the NULL-day group identically) and its
    # distinct event_type set ≡ the corpus's (every row lands in some
    # group, NULL keys included). c is day-grain-sized, so it pins
    # behind a lazy localCheckpoint for its three consumers: the
    # corpus is scanned ONCE (was 3 scans). Fresh per invocation ⇒
    # no cross-run caching.
    c = ev.groupBy(
        "event_type", day.alias("day")
    ).agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=False)
    b = c.agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    types = c.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 DAY")
                )
            ).alias("day"),
        )
    )
    return grid.join(c, ["event_type", "day"], "left").select(
        "event_type",
        # midnight timestamp, not DATE — see the oracle's dialect note
        F.col("day").cast("timestamp").alias("day"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.col("n").isNull().alias("is_gap"),
    )


@query(
    "r44_daily_anomaly",
    oracle="""
    WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      count(*) AS n
               FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, avg(n) AS mu, stddev(n) AS sigma
          FROM c GROUP BY 1)
    -- sigma = 0 (flat series) is pinned on BOTH engines: z_score is
    -- NULL (DuckDB's IEEE divide would give NaN where Spark's
    -- non-ANSI Divide gives NULL — a latent hash split) and nothing
    -- is an anomaly (>= would flag EVERY zero-deviation day).
    SELECT c.event_type,
           CAST(c.day AS TIMESTAMP) AS day,
           c.n AS n_events,
           CASE WHEN s.sigma > 0
                THEN round((c.n - s.mu) / s.sigma, 4) + 0.0
           END AS z_score,
           (s.sigma > 0 AND abs(c.n - s.mu) > 2 * s.sigma)
             AS is_anomaly
    FROM c JOIN s USING (event_type)
    """,
)
def r44_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-§2 (monitoring): z-score anomaly flags on daily event
    volumes per type — the volume-regression tripwire every ingestion
    pipeline runs (a dropped feed or a crawler loop shows up as a
    |z| ≥ 2 day long before downstream metrics move).

    Shape: one (type, day) hash aggregate over the corpus (map-side
    partial), a |types|-row moment aggregate on top of it, and a
    broadcast join back — the corpus is scanned once and everything
    after the first aggregate is dimension-sized. stddev is the
    SAMPLE stddev in both engines (n-1); day is a midnight timestamp
    per the r43 dialect note. A flat series (sigma = 0) yields NULL
    z and no anomalies on BOTH engines — guarded explicitly, since
    the engines' divide-by-zero semantics differ (NULL vs NaN) and
    `>=` would have flagged every constant day."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    s = c.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev("n").alias("sigma")
    )
    return c.join(F.broadcast(s), "event_type").select(
        "event_type",
        F.col("day").cast("timestamp").alias("day"),
        F.col("n").alias("n_events"),
        # round4-style + 0.0 pins -0.0 on at-the-mean days (l43 class)
        (
            F.when(
                F.col("sigma") > 0,
                F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 4),
            )
            + F.lit(0.0)
        ).alias("z_score"),
        (
            (F.col("sigma") > 0)
            & (F.abs(F.col("n") - F.col("mu")) > 2 * F.col("sigma"))
        ).alias("is_anomaly"),
    )


@query(
    "r45_delta_join_refresh",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment,
           CASE WHEN o.o_orderdate <  DATE '1995-01-01'
                 AND c.c_custkey % 10 != 0 THEN 'base'
                WHEN o.o_orderdate >= DATE '1995-01-01'
                 AND c.c_custkey % 10 != 0 THEN 'delta_orders'
                WHEN o.o_orderdate <  DATE '1995-01-01'
                 AND c.c_custkey % 10 =  0 THEN 'delta_customers'
                ELSE 'delta_both' END AS leg
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def r45_delta_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-extension (incremental JOIN-view maintenance — the join-side
    complement of r38's aggregate merge): maintain the materialized
    join view orders⋈customer under INSERT-ONLY deltas on BOTH sides
    via the standard delta-join expansion

        (O ∪ ΔO) ⋈ (C ∪ ΔC)
          = O⋈C ∪ ΔO⋈C ∪ O⋈ΔC ∪ ΔO⋈ΔC

    — four terms, each tagged with its provenance leg. The oracle
    recomputes the FULL join and re-derives each row's leg from the
    split predicates, so the hash match certifies both the expansion
    (no row lost, none duplicated across terms) and the tags.

    ΔO = post-cutoff orders (a date predicate that prunes at the
    scan), ΔC = custkey % 10 = 0 (stand-in for a batch of new
    customers). Shape: the customer legs broadcast (dimension-sized
    at every SF); at 100 TB the base term is the STORED view (never
    recomputed — here it is derived only so one query can certify
    the algebra end-to-end) and the three delta terms scan only a
    delta plus one stored side; the expansion is what makes a daily
    view refresh cost |Δ|-sized work instead of |O|×|C|-sized."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cutoff = F.lit("1995-01-01").cast("date")
    o_old = o.filter(F.col("o_orderdate") < cutoff)
    o_new = o.filter(F.col("o_orderdate") >= cutoff)
    c_old = c.filter(F.col("c_custkey") % 10 != 0)
    c_new = c.filter(F.col("c_custkey") % 10 == 0)

    def term(ol: DataFrame, cl: DataFrame, tag: str) -> DataFrame:
        return (
            ol.join(
                F.broadcast(cl), ol.o_custkey == cl.c_custkey
            ).select(
                "o_orderkey",
                "o_custkey",
                "c_mktsegment",
                F.lit(tag).alias("leg"),
            )
        )

    return (
        term(o_old, c_old, "base")
        .unionAll(term(o_new, c_old, "delta_orders"))
        .unionAll(term(o_old, c_new, "delta_customers"))
        .unionAll(term(o_new, c_new, "delta_both"))
    )


@query(
    "r46_rolling_distinct_users",
    oracle="""
    WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, user_id
               FROM events),
    f AS (SELECT event_type, user_id,
                 CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                             INTERVAL 1 DAY)) AS DATE)
                   AS window_end
          FROM e)
    SELECT event_type,
           CAST(window_end AS TIMESTAMP) AS window_end,
           count(DISTINCT user_id) AS n_distinct_users
    FROM f GROUP BY 1, 2
    """,
)
def r46_rolling_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """R-extension (sliding distinct): EXACT 7-day rolling distinct
    user counts per event type — the metric a RANGE window cannot
    compute at scale (distinct aggregates are unsupported over
    window frames, and per-frame collect_set explodes memory on wide
    frames). The scalable exact form: each event fans out to the ≤7
    window-ends it can influence (bounded ×7, generated map-side),
    then ONE (type, window_end)-keyed distinct-count aggregate —
    shuffle volume is 7×|events| narrow rows, partials map-side, no
    per-frame state. r29's HLL sketches are the approximate tier of
    the same question; this is the exact tier. Windows at the right
    edge are partial by design (they end after the last observed
    day), identically on both engines."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "user_id",
    )
    f = e.select(
        "event_type",
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), 6),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("window_end"),
    )
    return f.groupBy(
        "event_type",
        F.col("window_end").cast("timestamp").alias("window_end"),
    ).agg(F.count_distinct(F.col("user_id")).alias("n_distinct_users"))


@query(
    "r47_event_transitions",
    oracle="""
    WITH s AS (SELECT user_id, event_type, ts,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                        AS next_type
               FROM events),
    t AS (SELECT event_type AS from_type, next_type AS to_type,
                 count(*) AS n
          FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT from_type, sum(n) AS row_n FROM t GROUP BY 1)
    SELECT t.from_type, t.to_type, t.n AS n_transitions,
           round(t.n * 1.0 / r.row_n, 4) AS p_transition
    FROM t JOIN r USING (from_type)
    """,
)
def r47_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-extension (behavioral Markov matrix): the first-order
    event-type transition matrix over per-user clickstreams —
    counts and row-normalized probabilities of "after X, next comes
    Y" — the navigation-model / next-event-prediction baseline and
    the relational mirror of m09's ordered sequences.

    Shape: ONE window shuffle keyed by user_id (uniform key; lead()
    is frame-free so no per-row state beyond one lookahead), then a
    |types|²-bounded hash aggregate and a dimension-sized
    row-normalizer broadcast back. Ties in ts are broken by event_id
    in BOTH engines — without the tiebreak, same-timestamp events
    would make lead() nondeterministic and the hash unstable."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    t = (
        s.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    r = t.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return t.join(F.broadcast(r), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").alias("n_transitions"),
        F.round(F.col("n") / F.col("row_n"), 4).alias("p_transition"),
    )


@query("r48_hll_rollup_merge")
def r48_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10-extension #2 (sketch RE-aggregation): the two-level HLL
    rollup r29 stops short of — build per-(returnflag, ship-year)
    part sketches (level 1, the granularity a pipeline PERSISTS),
    then merge them per returnflag with `hll_union_agg` (level 2)
    and estimate. This is the mechanism that makes stored sketches
    useful: any coarser rollup (week→month→all-time) derives from
    persisted fine-grained sketches WITHOUT rescanning the fact
    table — re-aggregation cost is |stored sketches|, not |rows|.

    Emits both the merged estimate and the direct single-level
    estimate plus their relative difference. They are NOT bit-equal:
    datasketches' union path promotes sketch target types, so the
    merged estimate drifts slightly from direct aggregation
    (measured ~1% here — union 1991 vs direct 2011 vs 2000 true) —
    the honest mergeability statement is agreement WITHIN the
    estimator's error envelope, which tests assert (≤2% relative,
    and both within ±3% of the exact distinct count). Rows-only like
    r29 (sketch binaries are engine-specific; DuckDB's
    approx_count_distinct is a different estimator)."""
    li = load_table(spark, sf_dir, "lineitem")
    lvl1 = li.groupBy(
        "l_returnflag", F.year("l_shipdate").alias("ship_year")
    ).agg(F.expr("hll_sketch_agg(l_partkey)").alias("sk"))
    merged = lvl1.groupBy("l_returnflag").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias(
            "approx_parts_merged"
        ),
        F.count(F.lit(1)).alias("n_sketches"),
    )
    direct = li.groupBy("l_returnflag").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").alias(
            "approx_parts_direct"
        )
    )
    return merged.join(F.broadcast(direct), "l_returnflag").select(
        "l_returnflag",
        "n_sketches",
        F.round("approx_parts_merged", 4).alias("approx_parts_merged"),
        F.round("approx_parts_direct", 4).alias("approx_parts_direct"),
        F.round(
            F.abs(
                F.col("approx_parts_merged")
                - F.col("approx_parts_direct")
            )
            / F.col("approx_parts_direct"),
            4,
        ).alias("rel_diff"),
    )


@query(
    "r49_pareto_frontier",
    oracle="""
    WITH p AS (SELECT p_brand, p_partkey,
                      round(p_retailprice, 4) AS p_retailprice, p_size
               FROM part WHERE p_brand IS NOT NULL)
    SELECT b.p_brand, b.p_partkey, b.p_retailprice, b.p_size
    FROM p b WHERE NOT EXISTS (
      SELECT 1 FROM p a
      WHERE a.p_brand = b.p_brand
        AND a.p_retailprice <= b.p_retailprice
        AND a.p_size >= b.p_size
        AND (a.p_retailprice < b.p_retailprice OR a.p_size > b.p_size))
    """,
)
def r49_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-§2: exact per-brand 2-D skyline (Pareto frontier) —
    the parts no same-brand part beats on BOTH price (lower-better)
    and size (higher-better). The textbook formulations are a NOT
    EXISTS self-join (O(n²) per brand — the oracle deliberately IS
    that form) or a global-ORDER-BY running max (single-partition
    WindowExec, the r26 cliff); this plans neither. See
    operators/relational.py::pareto_frontier_2d for the two-level
    bucketed prefix-max: every window is PARTITIONED (by brand+bucket
    or by brand over ≤n_buckets rows), the dominance test runs on the
    aggregated (brand, price)->max(size) relation, and the
    frontier-sized survivors broadcast back to recover rows."""
    from ..operators.relational import pareto_frontier_2d

    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand").isNotNull())
        .select(
            "p_brand",
            "p_partkey",
            F.round("p_retailprice", 4).alias("p_retailprice"),
            "p_size",
        )
    )
    return pareto_frontier_2d(
        p, ["p_brand"], "p_retailprice", "p_size"
    ).select("p_brand", "p_partkey", "p_retailprice", "p_size")


@query(
    "r50_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_suppkey, l_extendedprice,
             sum(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING) AS cum,
             sum(l_quantity) OVER (PARTITION BY l_suppkey) AS tot
      FROM lineitem)
    SELECT l_suppkey,
           round(min(l_extendedprice), 4) AS wmedian_price
    FROM w WHERE cum >= tot / 2 GROUP BY l_suppkey
    """,
)
def r50_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-§2 (R10-extension, EXACT weighted order statistic):
    per-supplier quantity-weighted median price — the smallest price
    whose cumulative quantity reaches half the supplier's total. No
    sort-collapse: the cumulative and the total are two windows over
    the SAME per-supplier partitioning, so the whole operator costs
    ONE exchange (asserted in tests/test_plans.py — the follow-up
    groupBy reuses that clustering too: one shuffle end to end).
    Determinism: the running sum's frame is ROWS with a total
    (price, orderkey, linenumber) order, and l_quantity is integral
    on this schema (sums are exact in doubles), so the boundary row
    is engine-independent — which is what lets an oracle certify a
    cumulative-sum threshold at all."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_extendedprice",
        "l_quantity",
        "l_orderkey",
        "l_linenumber",
    )
    w_cum = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_suppkey")
    return (
        li.withColumn("cum", F.sum("l_quantity").over(w_cum))
        .withColumn("tot", F.sum("l_quantity").over(w_tot))
        .filter(F.col("cum") >= F.col("tot") / 2)
        .groupBy("l_suppkey")
        .agg(F.round(F.min("l_extendedprice"), 4).alias("wmedian_price"))
    )


# ---------------------------------------------------------------------------
# Round-6 promotions (staged round 5, locally certified in their test
# files; oracles moved VERBATIM from the staged SQL). Operator
# docstrings carry the scale posture; property/edge tests stay in the
# original test files.
# ---------------------------------------------------------------------------

from ..functions.skew import key_skew_profile  # noqa: E402
from ..operators.relational import (  # noqa: E402
    abc_classification,
    benford_audit,
    binned_quantile_rollup,
    cdc_apply,
    chi2_independence,
    contract_audit,
    cuped_adjust,
    join_cardinality_audit,
    mad_outliers,
    mannwhitney_z,
    psi_drift,
    referential_orphan_audit,
    rfm_scores,
    scd2_versions,
    target_encode,
    topn_with_others,
    winsorized_stats,
)
from ..operators.timeseries import (  # noqa: E402
    autocorrelation,
    cadence_audit,
    cusum_drift,
    ewma,
    gapfill_interpolate,
    holt_linear,
    interval_merge,
    interval_overlap_join,
    last_touch_attribution,
    seasonal_profile,
    series_trend,
    theil_sen_trend,
    time_weighted_avg,
)


@query(
    "r51_scd2_versions",
    oracle="""
    WITH o AS (SELECT user_id, event_type, ts, event_id FROM events
               WHERE event_type IS NOT NULL),
    c AS (SELECT user_id, event_type, ts, event_id,
                 CASE WHEN lag(event_type) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id)
                           IS DISTINCT FROM event_type
                        OR lag(event_id) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id)
                           IS NULL
                      THEN 1 ELSE 0 END AS nv
          FROM o),
    v AS (SELECT user_id, event_type, ts AS valid_from, event_id
          FROM c WHERE nv = 1)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER
             (PARTITION BY user_id ORDER BY valid_from, event_id)
             AS valid_to,
           lead(valid_from) OVER
             (PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL
             AS is_current,
           event_id AS version_id
    FROM v
    """,
)
def r51_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC/warehouse dimension versioning: collapse each user's event
    stream into SCD-2 validity intervals — a version starts whenever
    the tracked attribute changes (null-safe comparison), [valid_from,
    valid_to) half-open, NULL valid_to ⇔ is_current. Two keyed window
    passes, joinless, ONE exchange (the second window shares the key,
    EnsureRequirements elides its shuffle — plan-asserted in
    tests/test_cdc.py). operators/relational.py::scd2_versions;
    run-collapse property test ibid."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    return scd2_versions(ev, ["user_id"], ["event_type"], "ts", "event_id")


@query(
    "r52_ewma_daily_revenue",
    oracle="""
    WITH RECURSIVE daily AS MATERIALIZED (
      SELECT o_orderpriority AS priority,
             CAST(o_orderdate AS DATE) AS day,
             sum(o_totalprice) AS rev
      FROM orders GROUP BY 1, 2),
    idx AS MATERIALIZED (
      SELECT priority, day, rev,
             row_number() OVER (PARTITION BY priority ORDER BY day) AS rn
      FROM daily),
    ew AS (
      SELECT priority, day, rn, rev, rev AS y FROM idx WHERE rn = 1
      UNION ALL
      SELECT i.priority, i.day, i.rn, i.rev,
             0.8::DOUBLE * e.y + 0.2::DOUBLE * i.rev
      FROM idx i JOIN ew e ON i.priority = e.priority AND i.rn = e.rn + 1
    )
    SELECT priority, CAST(day AS TIMESTAMP) AS day,
           round(rev, 4) AS revenue,
           round(y, 4) AS ewma_revenue
    FROM ew
    """,
)
def r52_ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series EWMA smoothing of daily revenue (α = 0.2) — the
    classic monitoring smoother, a RECURRENCE no closed-form window
    expresses; the per-series grouped-map runs the pandas
    ewm(adjust=False) update so each step is bitwise the oracle's
    recursive-CTE arithmetic (the m13/l02e chained-iteration oracle
    trick). Order driven by the order column, never arrival order
    (property-tested). operators/timeseries.py::ewma."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    return ewma(daily, ["priority"], "day", "rev", alpha=0.2).select(
        "priority",
        F.col("day").cast("timestamp").alias("day"),
        F.round("rev", 4).alias("revenue"),
        F.round("ewma", 4).alias("ewma_revenue"),
    )


@query(
    "r53_skew_advisor",
    oracle="""
    WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
    s AS (SELECT count(*) AS n_keys,
                 CAST(sum(n) AS BIGINT) AS n_rows,
                 avg(n) AS mean_n,
                 quantile_cont(n, 0.5) AS p50_n,
                 quantile_cont(n, 0.99) AS p99_n,
                 max(n) AS max_n
          FROM c)
    SELECT c.user_id, c.n AS n_rows_key,
           round(c.n * 1.0 / s.n_rows, 4) AS share,
           s.n_keys,
           round(s.mean_n, 4) AS mean_per_key,
           round(s.p50_n, 4) AS p50_per_key,
           round(s.p99_n, 4) AS p99_per_key,
           round(s.max_n / s.mean_n, 4) AS skew_factor
    FROM c, s
    ORDER BY c.n DESC, c.user_id
    LIMIT 5
    """,
)
def r53_skew_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight shuffle-skew measurement: per-key row counts of the
    would-be shuffle key, top-5 hot keys with their share plus the
    key-cardinality distribution (mean/p50/p99/max, skew factor =
    max/mean) — the number that tells you BEFORE a 100 TB join
    whether to salt. One count aggregate (map-side partial) + a
    1-row moment relation broadcast back; top-5 is a bounded
    TakeOrdered. functions/skew.py::key_skew_profile; hot-key hand
    pin in tests/test_skew_profile.py."""
    return key_skew_profile(
        load_table(spark, sf_dir, "events"), ["user_id"], top_k=5
    )


@query(
    "r54_histogram_quantiles",
    oracle="""
    WITH b AS (SELECT event_type,
                      least(greatest(CAST(floor((value - 0.0::DOUBLE)
                                                / 5.0::DOUBLE) AS BIGINT),
                                     0), 199) AS bin,
                      count(*) AS cnt
               FROM events WHERE value IS NOT NULL
               GROUP BY 1, 2),
    c AS (SELECT event_type, bin, cnt,
                 sum(cnt) OVER (PARTITION BY event_type
                                ORDER BY bin) AS cum,
                 coalesce(sum(cnt) OVER (PARTITION BY event_type
                                         ORDER BY bin
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND 1 PRECEDING),
                          0) AS cum_below,
                 sum(cnt) OVER (PARTITION BY event_type) AS n_rows
          FROM b),
    qs AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q)
    SELECT c.event_type, qs.q AS q,
           CAST(c.n_rows AS BIGINT) AS n_rows,
           round(0.0::DOUBLE + 5.0::DOUBLE *
                 (c.bin + (qs.q * c.n_rows - c.cum_below) / c.cnt),
                 4) + 0.0 AS est
    FROM c CROSS JOIN qs
    WHERE c.cum >= qs.q * c.n_rows AND c.cum_below < qs.q * c.n_rows
    """,
)
def r54_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile sketch: fixed-grid histogram (200 bins over
    [0, 1000]) + within-bin linear interpolation for p50/p90/p99 per
    event type — bin counts are associative, so daily partials merge
    losslessly into monthly/global estimates (the property
    approx_percentile's GK sketch lacks; merge-is-lossless is tested).
    One (group, bin) hash aggregate, ≤200-row-per-group windows.
    operators/relational.py::binned_quantile_rollup."""
    return binned_quantile_rollup(
        load_table(spark, sf_dir, "events"),
        ["event_type"], "value", [0.5, 0.9, 0.99], 0.0, 1000.0, 200,
    )


@query(
    "r55_activity_spans",
    oracle="""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
      FROM events WHERE ts IS NOT NULL),
    flag AS (
      SELECT user_id, s, e,
             CASE WHEN s <= max(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS ni
      FROM iv),
    isl AS (
      SELECT user_id, s, e,
             sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM flag)
    SELECT user_id, min(s) AS span_start, max(e) AS span_end,
           count(*) AS n_intervals
    FROM isl GROUP BY user_id, island
    """,
)
def r55_activity_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merge: coalesce each user's
    overlapping/touching 30-minute activity intervals into maximal
    spans — the running-max new-island flag + island-id prefix sum,
    both windows keyed by user (no global window at any scale), one
    exchange. Touching/nested/duplicate-start pins in
    tests/test_interval_merge.py.
    operators/timeseries.py::interval_merge."""
    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    return interval_merge(iv, ["user_id"], "s", "e")


@query(
    "r56_time_weighted_value",
    oracle="""
    WITH v AS (
      SELECT user_id, epoch_us(ts)/1000000.0 AS t, value AS x
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    d AS (
      SELECT user_id, x,
             lead(t) OVER (PARTITION BY user_id ORDER BY t, x) - t AS dt
      FROM v)
    SELECT user_id,
           round(CASE WHEN sum(dt) > 0 THEN sum(x * dt) / sum(dt) END, 4)
             AS twa,
           count(*) AS n_obs
    FROM d GROUP BY user_id
    """,
)
def r56_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user — each observation weighted by
    how long it HELD (lead(ts) − ts), the correct mean for
    irregularly-sampled gauges where the naive row-mean overweights
    chatty periods. One keyed lead() window + one aggregate;
    single-observation series yield NULL (zero covered duration),
    never NaN. operators/timeseries.py::time_weighted_avg."""
    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg(ev, ["user_id"], "ts", "value").select(
        "user_id", F.round("twa", 4).alias("twa"), "n_obs"
    )


@query(
    "r57_daily_revenue_trend",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority,
             CAST(o_orderdate AS DATE) AS day,
             sum(o_totalprice) AS rev
      FROM orders GROUP BY 1, 2),
    t AS (
      SELECT priority,
             date_diff('day', DATE '1970-01-01', day)::DOUBLE AS tt,
             rev
      FROM daily)
    SELECT priority, count(*) AS n_obs,
           round(CASE WHEN var_pop(tt) > 0
                      THEN covar_pop(tt, rev) / var_pop(tt) END, 4) + 0.0
             AS slope,
           round(avg(rev) - CASE WHEN var_pop(tt) > 0
                                 THEN covar_pop(tt, rev) / var_pop(tt) END
                            * avg(tt), 4) + 0.0 AS intercept,
           round(corr(tt, rev) ^ 2, 4) AS r2
    FROM t GROUP BY priority
    """,
)
def r57_daily_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS trend of daily revenue: slope/intercept/R² from
    population co-moments (covar_pop/var_pop) in ONE aggregate pass —
    no iterative fitting, no window. Zero-variance series yield NULL
    slope (the r44 pin); the co-moment 4dp round absorbs libm ulp.
    operators/timeseries.py::series_trend; exact-line and flat-series
    pins in tests/test_series_trend.py."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
        .withColumn("t", F.datediff("day", F.lit("1970-01-01")))
    )
    return series_trend(daily, ["priority"], "t", "rev")


@query(
    "r58_value_drift",
    oracle="""
    WITH base AS (
      SELECT event_type, ts, value AS x
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    pre AS (
      SELECT event_type, ts, x,
             sum(x - 50.0) OVER (PARTITION BY event_type ORDER BY ts, x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
      FROM base),
    p AS (
      SELECT event_type, ts, x, pp,
             min(pp) OVER (PARTITION BY event_type ORDER BY ts, x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS runmin
      FROM pre)
    SELECT event_type, ts, round(x, 4) + 0.0 AS value,
           round(pp - least(0.0, runmin), 4) AS cusum,
           (pp - least(0.0, runmin)) > 2000.0 AS drifted
    FROM p
    """,
)
def r58_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector per event type (target 50,
    threshold 2000): the classic C⁺ recurrence max(0, C+x−target)
    rewritten as the CLOSED-FORM prefix-sum-minus-running-min — two
    keyed cumulative windows, no recursion, no UDF (the window twin
    of the true-stream cusum_stream in streaming/stateful.py).
    operators/timeseries.py::cusum_drift."""
    ev = load_table(spark, sf_dir, "events")
    return cusum_drift(
        ev, ["event_type"], "ts", "value", target=50.0, threshold=2000.0
    ).select(
        "event_type",
        "ts",
        round4("value").alias("value"),
        F.round("cusum", 4).alias("cusum"),
        "drifted",
    )


@query(
    "r59_fk_audit",
    oracle="""
    SELECT 'lineitem->orders' AS relationship, count(*) AS n_child,
           CAST(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphans,
           round(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS orphan_rate
    FROM lineitem c LEFT JOIN (SELECT DISTINCT o_orderkey AS _pk FROM orders
                               WHERE o_orderkey IS NOT NULL) p
      ON c.l_orderkey = p._pk
    UNION ALL
    SELECT 'lineitem->part', count(*),
           CAST(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4)
    FROM lineitem c LEFT JOIN (SELECT DISTINCT p_partkey AS _pk FROM part
                               WHERE p_partkey IS NOT NULL) p
      ON c.l_partkey = p._pk
    UNION ALL
    SELECT 'orders->customer', count(*),
           CAST(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4)
    FROM orders c LEFT JOIN (SELECT DISTINCT c_custkey AS _pk FROM customer
                             WHERE c_custkey IS NOT NULL) p
      ON c.o_custkey = p._pk
    UNION ALL
    SELECT 'events->customer', count(*),
           CAST(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4)
    FROM events c LEFT JOIN (SELECT DISTINCT c_custkey AS _pk FROM customer
                             WHERE c_custkey IS NOT NULL) p
      ON c.user_id = p._pk
    """,
)
def r59_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across four FK relationships —
    per relationship: child count, orphan count, orphan rate. Each
    relationship is a left join against the DISTINCT (dimension-
    sized, broadcastable) parent key set, aggregated to ONE row —
    the data-quality gate a pipeline runs before trusting joins.
    operators/relational.py::referential_orphan_audit."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    pa = load_table(spark, sf_dir, "part")
    ev = load_table(spark, sf_dir, "events")
    return referential_orphan_audit(
        [
            ("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
            ("lineitem->part", li, "l_partkey", pa, "p_partkey"),
            ("orders->customer", o, "o_custkey", cu, "c_custkey"),
            ("events->customer", ev, "user_id", cu, "c_custkey"),
        ]
    )


@query(
    "r60_winsorized_price",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS returnflag, l_extendedprice AS v
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)),
    b AS (
      SELECT returnflag,
             quantile_cont(v, 0.05) AS lo,
             quantile_cont(v, 0.95) AS hi
      FROM base GROUP BY returnflag)
    SELECT base.returnflag, count(*) AS n_obs,
           round(any_value(lo), 4) + 0.0 AS lo_val,
           round(any_value(hi), 4) + 0.0 AS hi_val,
           round(avg(least(greatest(v, lo), hi)), 4) + 0.0 AS win_mean
    FROM base JOIN b USING (returnflag)
    GROUP BY base.returnflag
    """,
)
def r60_winsorized_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per return flag (clamp to the exact 5th/95th
    percentiles, then average) — the outlier-robust mean for heavy-
    tailed money columns. One exact-percentile aggregate (group-
    cardinality sized) broadcast back onto the corpus, which is never
    reshuffled on the group key. Exact `percentile` ≡ quantile_cont
    interpolation (the r10b pin).
    operators/relational.py::winsorized_stats."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    return winsorized_stats(
        li.withColumnRenamed("l_returnflag", "returnflag"),
        ["returnflag"],
        "l_extendedprice",
        0.05,
        0.95,
    )


@query(
    "r61_cdc_snapshot",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
    w AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM c)
    SELECT user_id, ts AS last_ts, event_type AS last_type,
           round(value, 4) AS last_value
    FROM w WHERE rn = 1 AND op <> 'D'
    """,
)
def r61_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog → current-state snapshot: keep each key's latest
    record by (ts, event_id) sequence, dropping keys whose latest op
    is a delete ('error' rows stand in for D ops on the fixture) —
    the batch twin of the true-stream cdc_snapshot_stream
    (streaming/stateful.py, proven equal in tests/test_streaming.py).
    Rank-1 per key plans as a map-side WindowGroupLimit, never a full
    sort. operators/relational.py::cdc_apply."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "op",
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(
            F.lit("U")
        ),
    )
    snap = cdc_apply(ev, ["user_id"], ["ts", "event_id"], "op")
    return snap.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.round("value", 4).alias("last_value"),
    )


@query(
    "r63_brand_topn_others",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand AS label,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS total
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1),
    rk AS (SELECT label, total,
                  row_number() OVER (ORDER BY total DESC, label) AS rn
           FROM rev)
    SELECT CASE WHEN rn <= 10 THEN label ELSE 'OTHER' END AS label,
           (rn > 10) AS is_other,
           round(sum(total), 4) + 0.0 AS total
    FROM rk GROUP BY 1, 2
    """,
)
def r63_brand_topn_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 brands by net revenue with everything else folded into
    one 'OTHER' row — mass-conserving (parts sum to the grand total;
    tested), deterministic boundary ((total DESC, label) is a total
    order). The rank runs on the brand-cardinality aggregate, never
    the corpus. operators/relational.py::topn_with_others."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(pa.select("p_partkey", "p_brand")),
        li["l_partkey"] == pa["p_partkey"],
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return topn_with_others(joined, "p_brand", rev, 10)


@query(
    "r64_brand_abc",
    oracle="""
    WITH agg AS (
      SELECT l.l_returnflag AS returnflag, p.p_brand AS item,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS total
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2),
    w AS (
      SELECT returnflag, item, total,
             coalesce(sum(total) OVER (PARTITION BY returnflag
                   ORDER BY total DESC, item
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0.0) AS cumb,
             sum(total) OVER (PARTITION BY returnflag) AS grand
      FROM agg)
    SELECT returnflag, item, round(total, 4) + 0.0 AS total,
           round(total / grand, 4) + 0.0 AS share,
           round((cumb + total) / grand, 4) + 0.0 AS cum_share,
           CASE WHEN cumb / grand < 0.8 THEN 'A'
                WHEN cumb / grand < 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM w
    """,
)
def r64_brand_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto contribution classes of brand revenue per return
    flag: cumulative-share windows over the (flag, brand) aggregate —
    class decided by the share BEFORE the item (the crossing item
    takes the HIGHER class; pinned in tests/test_topn_abc.py). The
    windows run on the dimension-sized aggregate, keyed by flag.
    operators/relational.py::abc_classification."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(pa.select("p_partkey", "p_brand")),
        li["l_partkey"] == pa["p_partkey"],
    ).withColumnRenamed("l_returnflag", "returnflag")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return abc_classification(joined, ["returnflag"], "p_brand", rev)


@query(
    "r65_ops_monitor",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    mu AS (SELECT event_type, avg(n * 1.0) AS mean_n FROM daily GROUP BY 1),
    tr AS (
      SELECT event_type,
             round(CASE WHEN var_pop(tt) > 0
                        THEN covar_pop(tt, n * 1.0) / var_pop(tt) END, 4)
               + 0.0 AS slope
      FROM (SELECT event_type,
                   date_diff('day', DATE '1970-01-01', day)::DOUBLE AS tt, n
            FROM daily)
      GROUP BY event_type),
    cen AS (
      SELECT d.event_type, d.day, d.n, d.n - m.mean_n AS x
      FROM daily d JOIN mu m USING (event_type)),
    pre AS (
      SELECT event_type, day, n, x,
             sum(x) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
      FROM cen),
    cu AS (
      SELECT event_type, day, n, pp,
             min(pp) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS runmin
      FROM pre)
    SELECT c.event_type, CAST(c.day AS TIMESTAMP) AS day, c.n,
           t.slope,
           round(c.pp - least(0.0, c.runmin), 4) AS cusum,
           (c.pp - least(0.0, c.runmin)) > 50.0 AS drifted
    FROM cu c JOIN tr t USING (event_type)
    """,
)
def r65_ops_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed monitoring flagship: daily per-type volumes →
    per-series OLS trend (series_trend) + mean-centered CUSUM drift
    (cusum_drift) fused in ONE plan — the monitoring counterpart of
    l25/l40's composed LLM pipelines, certified as a COMPOSITION by
    stage-fragment oracles (r57/r58 shapes). The daily relation
    feeds BOTH branches without a second corpus pass; the mean and
    trend legs broadcast back (plan-asserted in
    tests/test_ops_monitor.py)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Optimization r11 (guide §2.4): daily feeds THREE legs (mu,
    # trend, centered) — unpinned, each re-planned the events scan +
    # aggregate (the r65 plan held 3 parquet scans, belying the
    # docstring's one-pass claim). The (event_type × day)-grain
    # relation is tiny at any corpus size — pin it lazily so the
    # corpus pass runs once. Fresh per invocation ⇒ no cross-run
    # caching.
    daily = daily.localCheckpoint(eager=False)
    mu = daily.groupBy("event_type").agg(
        F.avg(F.col("n") * 1.0).alias("mean_n")
    )
    trend = series_trend(
        daily.withColumn("t", F.datediff("day", F.lit("1970-01-01"))),
        ["event_type"],
        "t",
        "n",
    ).select("event_type", "slope")
    centered = daily.join(F.broadcast(mu), "event_type").select(
        "event_type",
        "day",
        "n",
        (F.col("n") - F.col("mean_n")).alias("x"),
    )
    cu = cusum_drift(
        centered, ["event_type"], "day", "x",
        target=0.0, threshold=50.0, carry=("n",),
    )
    return (
        cu.join(F.broadcast(trend), "event_type")
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            "n",
            "slope",
            F.round("cusum", 4).alias("cusum"),
            "drifted",
        )
    )


@query(
    "r66_volume_acf",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_type, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY day, n) AS rn
      FROM c)
    SELECT a.event_type, CAST(l.lag AS INT) AS lag, count(b.n) AS n_pairs,
           round(corr(a.n, b.n), 4) + 0.0 AS acf
    FROM r a
    CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
    LEFT JOIN r b
      ON b.event_type = a.event_type AND b.rn = a.rn - l.lag
    GROUP BY 1, 2
    """,
)
def r66_volume_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1–7) of daily volumes per event
    type — weekly seasonality shows as a lag-7 spike, drift as a
    slowly-decaying comb. Pairwise Pearson corr of the series against
    its row_number-shifted self: a keyed rank window + a ≤7×
    lag-join on the DAY-cardinality relation (never corpus-sized).
    Flat series land NULL (the r44 pin, normalized operator-side).
    operators/timeseries.py::autocorrelation; numpy reference in
    tests/test_acf.py."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    return autocorrelation(daily, ["event_type"], "day", "n", max_lag=7)


@query(
    "r67_value_outliers",
    oracle="""
    WITH m AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    d AS (
      SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN m USING (event_type)
      WHERE e.value IS NOT NULL GROUP BY 1)
    SELECT e.event_type, e.event_id, e.value,
           CASE WHEN d.mad > 0
                THEN round(0.6745 * (e.value - m.med) / d.mad, 4) + 0.0
           END AS robust_z,
           coalesce(
             CASE WHEN d.mad > 0
                  THEN abs(0.6745 * (e.value - m.med) / d.mad) > 3.5
             END, false) AS is_outlier
    FROM events e
    LEFT JOIN m USING (event_type)
    LEFT JOIN d USING (event_type)
    """,
)
def r67_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flags per event type via the median/MAD rule
    (robust_z = 0.6745·(x−med)/MAD, |z| > 3.5 flags — Iglewicz–
    Hoaglin) — the robust twin of r44's mean/σ monitor: one bad row
    inflates σ until nothing flags, median/MAD barely budge. Two
    exact-percentile aggregates broadcast back; MAD = 0 yields NULL
    robust_z / false (never an everything-flags storm); NULL and NaN
    values ride a pass-through leg.
    operators/relational.py::mad_outliers."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    return mad_outliers(ev, ["event_type"], "value", carry=["event_id"])


@query(
    "r68_join_fanout_audit",
    oracle="""
    WITH l AS (SELECT o_custkey AS custkey, count(*) AS n_left
               FROM orders GROUP BY 1),
         r AS (SELECT c_custkey AS custkey, count(*) AS n_right
               FROM customer GROUP BY 1)
    SELECT coalesce(l.custkey, r.custkey) AS custkey,
           coalesce(l.n_left, 0) AS n_left,
           coalesce(r.n_right, 0) AS n_right,
           coalesce(l.n_left, 0) * coalesce(r.n_right, 0) AS out_rows,
           (coalesce(l.n_left, 0) > 1 AND coalesce(r.n_right, 0) > 1)
             AS is_mtm
    FROM l FULL JOIN r ON l.custkey = r.custkey
    """,
)
def r68_join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-cardinality audit of orders ⋈ customer: per
    key, both sides' row counts and their product (the key's exact
    contribution to the inner-join output; SUM(out_rows) equals the
    true join cardinality — tested). One partial-count aggregate per
    side, then a full-outer join of two KEY-cardinality relations —
    the corpus-sized inputs are never joined to each other.
    operators/relational.py::join_cardinality_audit."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    return join_cardinality_audit(orders, cust, ["custkey"])


@query(
    "r70_price_benford",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority AS grp,
             CAST(floor(abs(o_totalprice)
                  / pow(10, floor(log10(abs(o_totalprice))))) AS INT)
               AS digit
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_totalprice <> 0),
    c AS (SELECT grp, digit, count(*) AS n_obs FROM b GROUP BY 1, 2)
    SELECT grp, digit, n_obs,
           round(n_obs / sum(n_obs) OVER w, 4) AS obs_share,
           round(log10(1.0 + 1.0 / digit), 4) AS benford_p,
           round(n_obs / sum(n_obs) OVER w - log10(1.0 + 1.0 / digit), 4)
             + 0.0 AS deviation,
           round(sum(n_obs) OVER w
                 * pow(n_obs / sum(n_obs) OVER w
                       - log10(1.0 + 1.0 / digit), 2)
                 / log10(1.0 + 1.0 / digit), 4) AS chi2_part
    FROM c
    WINDOW w AS (PARTITION BY grp)
    """,
)
def r70_price_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals per priority —
    per-digit observed share vs log10(1 + 1/d) with χ² parts (the
    fabricated-numbers tripwire). Digit extraction is row-local
    double arithmetic (no string cast, stays in whole-stage codegen);
    one (group, digit) aggregate + a ≤9-row-per-group window.
    Zero/NULL/NaN carry no first digit and are excluded.
    operators/relational.py::benford_audit."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"), "o_totalprice"
    )
    return benford_audit(orders, ["grp"], "o_totalprice")


@query(
    "r72_custkey_encoding",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS ck,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS y
      FROM orders WHERE o_totalprice IS NOT NULL),
    g AS (SELECT round(avg(y), 4) AS gmean FROM base)
    SELECT ck, count(*) AS n_obs,
           round(avg(y), 4) AS raw_mean,
           round((count(*) * round(avg(y), 4) + 20.0 * g.gmean)
                 / (count(*) + 20.0), 4) AS encoded
    FROM base CROSS JOIN g
    GROUP BY ck, g.gmean
    """,
)
def r72_custkey_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of customer key against order value
    (shrinkage m = 20 toward the global mean) — the standard
    high-cardinality categorical feature. One per-key aggregate + a
    1-row global-mean broadcast; the target enters in integer CENTS
    so every sum is exact in float64 and the 4dp boundary has one
    deterministic side (the cross-engine money-mean pin).
    operators/relational.py::target_encode."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    return target_encode(orders, ["ck"], "cents", smoothing=20.0)


@query(
    "r73_deseasonal_outliers",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2),
    prof AS MATERIALIZED (
      SELECT event_type, day, n, CAST(isodow(day) AS INT) AS dow,
             round(avg(n) OVER w, 4) AS dow_mean,
             round(n - round(avg(n) OVER w, 4), 4) + 0.0 AS residual
      FROM daily WINDOW w AS (PARTITION BY event_type, isodow(day))),
    med AS (SELECT event_type, quantile_cont(residual, 0.5) AS med
            FROM prof GROUP BY 1),
    mad AS (SELECT p.event_type,
                   quantile_cont(abs(p.residual - m.med), 0.5) AS mad
            FROM prof p JOIN med m USING (event_type) GROUP BY 1)
    SELECT p.event_type, p.day, p.n, p.dow, p.dow_mean, p.residual,
           CASE WHEN d.mad > 0
                THEN round(0.6745 * (p.residual - m.med) / d.mad, 4) + 0.0
           END AS robust_z,
           coalesce(
             CASE WHEN d.mad > 0
                  THEN abs(0.6745 * (p.residual - m.med) / d.mad) > 3.5
             END, false) AS is_outlier
    FROM prof p
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    """,
)
def r73_deseasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed monitoring flagship #2: daily volumes → day-of-week
    seasonal_profile → median/MAD outliers on the RESIDUAL, fused in
    ONE plan — stops weekday cycles from masquerading as anomalies
    (r44's raw z fires on every weekend of a weekday-heavy feed; the
    residual doesn't — hand-pinned in
    tests/test_deseasonal_outliers.py). Certified as a COMPOSITION by
    r69/r67 stage-fragment oracles; residuals are 4dp-rounded before
    the percentiles so both engines feed bitwise-identical inputs."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    prof = seasonal_profile(daily, ["event_type"], "day", "n").drop("ratio")
    # Optimization r11 (guide §2.4): mad_outliers consumes its input
    # through FOUR legs (median agg, MAD agg, scoring join, NULL
    # pass-through) — unpinned, each re-planned the events scan +
    # daily aggregate + seasonal window (the r73 plan held 5 parquet
    # scans / 13 Exchanges). The profile is (event_type × day)-grain
    # — tiny at any corpus size — so pin it: the expensive corpus
    # lineage materializes once. Lazy ⇒ nothing runs at
    # construction; fresh per invocation ⇒ no cross-run caching.
    prof = prof.localCheckpoint(eager=False)
    return mad_outliers(
        prof,
        ["event_type"],
        "residual",
        carry=["day", "n", "dow", "dow_mean"],
    )


@query(
    "r74_value_psi",
    oracle="""
    -- NOT isnan: in lockstep with psi_drift's Spark-side exclusion
    -- (r9 sweep — NaN sorts above all reals in Spark, inflating the
    -- top bin; excluded like NULL on BOTH engines)
    WITH ref AS (SELECT value FROM events
                 WHERE value IS NOT NULL AND NOT isnan(value)
                   AND ts < TIMESTAMP '2024-07-01'),
    cur AS (SELECT value FROM events
            WHERE value IS NOT NULL AND NOT isnan(value)
                  AND ts >= TIMESTAMP '2024-07-01'),
    e AS (SELECT list_transform(
            quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                  0.6, 0.7, 0.8, 0.9]),
            x -> round(x, 4)) AS edges FROM ref),
    rb AS (SELECT len(list_filter(e.edges, x -> r.value >= x)) AS bin,
                  count(*) AS n_ref
           FROM ref r CROSS JOIN e GROUP BY 1),
    cb AS (SELECT len(list_filter(e.edges, x -> c.value >= x)) AS bin,
                  count(*) AS n_cur
           FROM cur c CROSS JOIN e GROUP BY 1),
    j AS (SELECT coalesce(rb.bin, cb.bin) AS bin,
                 coalesce(rb.n_ref, 0) AS n_ref,
                 coalesce(cb.n_cur, 0) AS n_cur
          FROM rb FULL JOIN cb ON rb.bin = cb.bin),
    t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
    SELECT CAST(j.bin AS INT) AS bin, j.n_ref, j.n_cur,
           round(j.n_ref / t.tr, 4) AS ref_share,
           round(j.n_cur / t.tc, 4) AS cur_share,
           round((greatest(j.n_cur / t.tc, 0.0001)
                  - greatest(j.n_ref / t.tr, 0.0001))
                 * ln(greatest(j.n_cur / t.tc, 0.0001)
                      / greatest(j.n_ref / t.tr, 0.0001)), 4) + 0.0
             AS psi_part
    FROM j CROSS JOIN t
    """,
)
def r74_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the value distribution across a
    time split: reference-decile bins (edges 4dp-rounded so both
    engines re-bin ties identically), per-bin share drift with the
    0.0001 floor (empty bins are maximal drift evidence, not a
    divide-by-zero) — the standard feature/score drift monitor.
    Edges are one exact-percentile aggregate broadcast to both
    corpus passes. operators/relational.py::psi_drift."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-07-01").cast("timestamp")
    ref = ev.filter(F.col("ts") < split).select("value")
    cur = ev.filter(F.col("ts") >= split).select("value")
    return psi_drift(ref, cur, "value", n_bins=10)


@query(
    "r75_customer_rfm",
    oracle="""
    WITH pc AS (
      SELECT o_custkey AS cust, max(o_orderdate) AS last_ts,
             count(*) AS frequency,
             round(coalesce(sum(o_totalprice), 0), 4) AS monetary
      FROM orders GROUP BY 1),
    e AS (SELECT
      list_transform(quantile_cont(epoch_us(last_ts) / 1000000.0,
                     [0.2, 0.4, 0.6, 0.8]), x -> round(x, 4)) AS er,
      list_transform(quantile_cont(frequency * 1.0,
                     [0.2, 0.4, 0.6, 0.8]), x -> round(x, 4)) AS ef,
      list_transform(quantile_cont(monetary,
                     [0.2, 0.4, 0.6, 0.8]), x -> round(x, 4)) AS em
      FROM pc),
    s AS (SELECT pc.cust, pc.last_ts, pc.frequency, pc.monetary,
      CAST(len(list_filter(e.er,
           x -> epoch_us(pc.last_ts) / 1000000.0 >= x)) + 1 AS INT) AS r_score,
      CAST(len(list_filter(e.ef,
           x -> pc.frequency * 1.0 >= x)) + 1 AS INT) AS f_score,
      CAST(len(list_filter(e.em,
           x -> pc.monetary >= x)) + 1 AS INT) AS m_score
      FROM pc CROSS JOIN e)
    SELECT cust, last_ts, frequency, monetary, r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm
    FROM s
    """,
)
def r75_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary
    quintile scores (values AT an edge take the higher score; a
    constant measure collapses to ONE score, never an arbitrary
    split — pinned in tests/test_rfm.py) composed into the classic
    3-digit RFM code. One per-customer aggregate + a 1-row
    broadcast edge relation; recency compares in the exact
    epoch-seconds double domain (the r71 pin).
    operators/relational.py::rfm_scores."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"), "o_orderdate", "o_totalprice"
    )
    return rfm_scores(orders, "cust", "o_orderdate", "o_totalprice")


@query(
    "r76_robust_trend",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority AS priority,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS DOUBLE) AS t,
             CAST(count(*) AS DOUBLE) AS n
      FROM orders GROUP BY 1, CAST(o_orderdate AS DATE)),
    p AS (SELECT a.priority, (b.n - a.n) / (b.t - a.t) AS s
          FROM d a JOIN d b ON a.priority = b.priority AND a.t < b.t),
    m AS (SELECT priority, count(*) AS n_pairs,
                 quantile_cont(s, 0.5) AS slope
          FROM p GROUP BY 1)
    SELECT d.priority, count(*) AS n_obs, max(m.n_pairs) AS n_pairs,
           round(max(m.slope), 4) + 0.0 AS sen_slope,
           round(quantile_cont(d.n - m.slope * d.t, 0.5), 4) + 0.0
             AS sen_intercept
    FROM d JOIN m USING (priority)
    GROUP BY d.priority
    """,
)
def r76_robust_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily order volumes per priority:
    median of all pairwise slopes + median residual intercept — up to
    ~29% contamination tolerance where r57's OLS slope chases every
    outlier. The pairwise join runs per SERIES on the day-cardinality
    aggregate (≤ n²/2 pairs of a bounded daily relation, never
    corpus-sized); exact-line and breakdown pins in
    tests/test_theil_sen.py. operators/timeseries.py::theil_sen_trend."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .select(
            "priority",
            F.datediff("day", F.lit("1970-01-01")).cast("double").alias("t"),
            "n",
        )
    )
    return theil_sen_trend(daily, ["priority"], "t", "n")


@query(
    "r77_type_dow_chi2",
    oracle="""
    WITH c AS (
      SELECT event_type AS a,
             CAST(isodow(CAST(ts AS DATE)) AS INT) AS b,
             count(*) AS n_obs
      FROM events GROUP BY 1, 2)
    SELECT a, b, n_obs,
           round(sum(n_obs) OVER (PARTITION BY a)
                 * sum(n_obs) OVER (PARTITION BY b)
                 / sum(n_obs) OVER (), 4) AS expected,
           round(pow(n_obs - sum(n_obs) OVER (PARTITION BY a)
                             * sum(n_obs) OVER (PARTITION BY b)
                             / sum(n_obs) OVER (), 2)
                 / (sum(n_obs) OVER (PARTITION BY a)
                    * sum(n_obs) OVER (PARTITION BY b)
                    / sum(n_obs) OVER ()), 4) AS chi2_part
    FROM c
    """,
)
def r77_type_dow_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence cells for event type × ISO day-of-week:
    observed counts vs margin-product expectations with per-cell χ²
    parts (SUM is the test statistic; the per-cell grain keeps the
    offending cell visible). Margins are windows over the ≤|a|·|b|
    CELL-grain relation — nothing after the first aggregate touches
    corpus scale. operators/relational.py::chi2_independence;
    textbook 2×2 pin in tests/test_chi2.py."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        ((F.dayofweek(F.col("ts").cast("date")) + 5) % 7 + 1)
        .cast("int")
        .alias("dow"),
    )
    return chi2_independence(ev, "event_type", "dow")


@query(
    "r78_click_vs_view_ranksum",
    oracle="""
    WITH base AS (
      SELECT event_type AS g, value AS v FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
    r AS (SELECT g, v, row_number() OVER (ORDER BY v) AS rn FROM base),
    pv AS (SELECT v, avg(rn) AS midrank, count(*) AS t,
                  sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS na_v
           FROM r GROUP BY 1),
    s AS (SELECT sum(na_v * midrank) AS ra,
                 CAST(sum(na_v) AS BIGINT) AS na,
                 CAST(sum(t - na_v) AS BIGINT) AS nb,
                 CAST(sum(t * t * t - t) AS BIGINT) AS ties
          FROM pv)
    SELECT 'click' AS group_a, 'view' AS group_b, na AS n_a, nb AS n_b,
           round(ra - na * (na + 1) / 2, 4) AS u_stat,
           CASE WHEN na * nb / 12.0
                     * ((na + nb + 1)
                        - ties / (CAST(na + nb AS DOUBLE)
                                  * (na + nb - 1))) > 0
                THEN round((ra - na * (na + 1) / 2 - na * nb / 2)
                           / sqrt(na * nb / 12.0
                                  * ((na + nb + 1)
                                     - ties / (CAST(na + nb AS DOUBLE)
                                               * (na + nb - 1)))), 4)
                     + 0.0
           END AS z
    FROM s
    """,
)
def r78_click_vs_view_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test between the click and view arms'
    values — the distribution-free did-the-metric-move test, with the
    tie-corrected normal z. The classic global avg-rank window is
    replaced by the two-phase distributed rank + per-VALUE midrank
    aggregate (permutation-invariant consumers make the relaxed
    tiebreak sound); everything after is value-cardinality sized.
    NULL and NaN values are excluded; an empty arm yields NULL u/z.
    operators/relational.py::mannwhitney_z."""
    ev = load_table(spark, sf_dir, "events")
    return mannwhitney_z(ev, "event_type", "value", "click", "view")


@query(
    "r79_cuped_user_value",
    oracle="""
    WITH pc AS (
      SELECT user_id,
             round(sum(CASE WHEN ts < TIMESTAMP '2024-07-01'
                            THEN value END), 4) + 0.0 AS pre,
             round(sum(CASE WHEN ts >= TIMESTAMP '2024-07-01'
                            THEN value END), 4) + 0.0 AS post
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    f AS (SELECT covar_pop(pre, post) AS cov, var_pop(pre) AS var,
                 avg(pre) AS mx
          FROM pc WHERE pre IS NOT NULL AND post IS NOT NULL)
    SELECT pc.user_id, pc.post, pc.pre,
           round(CASE WHEN f.var > 0 THEN f.cov / f.var END, 4) + 0.0
             AS theta,
           round(CASE WHEN pc.post IS NULL THEN NULL
                      WHEN pc.pre IS NOT NULL AND f.var > 0
                      THEN pc.post - (f.cov / f.var) * (pc.pre - f.mx)
                      ELSE pc.post END, 4) + 0.0 AS adjusted
    FROM pc CROSS JOIN f
    """,
)
def r79_cuped_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction: θ = cov(pre, post)/var(pre) fit over
    users with both periods, adjusted = post − θ·(pre − mean(pre)) —
    the standard experiment-analysis preprocessor (keeps the mean,
    cuts variance by ~ρ²; property-tested). One per-user aggregate +
    a 1-row co-moment broadcast; users missing a period pass through
    per the documented NULL ladder.
    operators/relational.py::cuped_adjust."""
    split = F.lit("2024-07-01").cast("timestamp")
    pc = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            round4(
                F.sum(F.when(F.col("ts") < split, F.col("value")))
            ).alias("pre"),
            round4(
                F.sum(F.when(F.col("ts") >= split, F.col("value")))
            ).alias("post"),
        )
    )
    return cuped_adjust(pc, "post", "pre", carry=["user_id"])


@query(
    "r80_concurrent_activity",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_type, ts AS s, ts + INTERVAL 30 MINUTE AS e
      FROM events WHERE ts IS NOT NULL
        AND event_type IN ('click', 'view')),
    flag AS (
      SELECT user_id, event_type, s, e,
             CASE WHEN s <= max(e) OVER (PARTITION BY user_id, event_type
                    ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS ni
      FROM iv),
    isl AS (
      SELECT user_id, event_type, s, e,
             sum(ni) OVER (PARTITION BY user_id, event_type ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM flag),
    sp AS (
      SELECT user_id, event_type,
             epoch_us(min(s)) / 1000000.0 AS ss,
             epoch_us(max(e)) / 1000000.0 AS ee
      FROM isl GROUP BY user_id, event_type, island)
    SELECT a.user_id,
           a.ss AS a_start, a.ee AS a_end,
           b.ss AS b_start, b.ee AS b_end,
           greatest(a.ss, b.ss) AS overlap_start,
           least(a.ee, b.ee) AS overlap_end
    FROM sp a JOIN sp b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'view'
     AND a.ss < b.ee AND b.ss < a.ee
    """,
)
def r80_concurrent_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join: per-user click-activity spans
    (r55's merge) overlapped against view-activity spans — "when was
    the user doing both", half-open [s, e) so touching spans never
    match. The operator buckets both sides into time cells and
    equi-joins on (keys, cell) with claim-cell dedup (each pair
    counted in ONE cell) — proven ≡ the naive non-equi join on the
    fixture (tests/test_interval_overlap.py); the oracle is the
    naive form. operators/timeseries.py::interval_overlap_join."""

    def spans(tp: str) -> DataFrame:
        iv = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("ts").isNotNull() & (F.col("event_type") == tp))
            .select(
                "user_id",
                F.col("ts").alias("s"),
                (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
            )
        )
        return interval_merge(iv, ["user_id"], "s", "e")

    return interval_overlap_join(
        spans("click"),
        spans("view"),
        ["user_id"],
        "span_start",
        "span_end",
        bucket="6 hours",
    )


@query(
    "r81_orders_contract",
    oracle="""
    WITH w AS (
      SELECT count(*) AS n,
             sum(CASE WHEN NOT coalesce(o_totalprice > 0, false)
                      THEN 1 ELSE 0 END) AS v_price_positive,
             sum(CASE WHEN NOT coalesce(o_custkey IS NOT NULL, false)
                      THEN 1 ELSE 0 END) AS v_custkey_present,
             sum(CASE WHEN NOT coalesce(
                        o_orderdate >= TIMESTAMP '1990-01-01', false)
                      THEN 1 ELSE 0 END) AS v_date_sane,
             sum(CASE WHEN NOT coalesce(
                        o_orderstatus IN ('O', 'F'), false)
                      THEN 1 ELSE 0 END) AS v_status_known,
             sum(CASE WHEN NOT coalesce(
                        o_orderpriority IS NOT NULL, false)
                      THEN 1 ELSE 0 END) AS v_priority_present
      FROM orders),
    t AS (
      SELECT 'price_positive' AS rule, n, v_price_positive AS nv FROM w
      UNION ALL SELECT 'custkey_present', n, v_custkey_present FROM w
      UNION ALL SELECT 'date_sane', n, v_date_sane FROM w
      UNION ALL SELECT 'status_known', n, v_status_known FROM w
      UNION ALL SELECT 'priority_present', n, v_priority_present FROM w)
    SELECT rule, CAST(n AS BIGINT) AS n_rows,
           CAST(nv AS BIGINT) AS n_violations,
           round(CASE WHEN n > 0 THEN nv / (n * 1.0) END, 4)
             AS violation_rate,
           nv = 0 AS passed
    FROM t
    """,
)
def r81_orders_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract audit over orders: five rules
    evaluated in ONE corpus pass (conditional sums, then a 5-row
    unpivot) — a violation is FALSE **or NULL** (three-valued-logic
    pin: `col > 0` on NULL counts against the contract). One rule
    (status_known) deliberately fails on the fixture so the FAILURE
    path is hash-certified, not just the all-green path.
    operators/relational.py::contract_audit."""
    orders = load_table(spark, sf_dir, "orders")
    return contract_audit(
        orders,
        [
            ("price_positive", F.col("o_totalprice") > 0),
            ("custkey_present", F.col("o_custkey").isNotNull()),
            (
                "date_sane",
                F.col("o_orderdate") >= F.lit("1990-01-01").cast("timestamp"),
            ),
            ("status_known", F.col("o_orderstatus").isin("O", "F")),
            ("priority_present", F.col("o_orderpriority").isNotNull()),
        ],
    )


@query(
    "r69_weekly_seasonality",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type, day, n,
           CAST(isodow(day) AS INT) AS dow,
           round(avg(n) OVER w, 4) AS dow_mean,
           round(n - round(avg(n) OVER w, 4), 4) + 0.0 AS residual,
           CASE WHEN round(avg(n) OVER w, 4) != 0
                THEN round(n / round(avg(n) OVER w, 4), 4) END AS ratio
    FROM c
    WINDOW w AS (PARTITION BY event_type, isodow(day))
    """,
)
def r69_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile of daily volumes per event type:
    per-(series, ISO dow) mean, residual, and ratio — the
    deseasonalization fragment r73 composes with MAD outliers. ISO
    dow (1 = Monday) via the shifted Spark dayofweek; the windows
    run on the day-cardinality aggregate, keyed by (series, dow).
    operators/timeseries.py::seasonal_profile; hand pins in
    tests/test_seasonal_profile.py."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    return seasonal_profile(daily, ["event_type"], "day", "n")


# ---------------------------------------------------------------------------
# ROUND-7 PROMOTIONS (staged r6, oracles moved VERBATIM from their
# test files; property/edge tests stay there).
# ---------------------------------------------------------------------------


@query(
    "r62_attribution",
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_id, event_type
  FROM events WHERE ts IS NOT NULL),
w AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_ts,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type
  FROM e)
SELECT user_id, ts, event_id,
       CASE WHEN touch_ts >= ts - INTERVAL 7 DAY THEN touch_ts END
         AS touch_ts,
       CASE WHEN touch_ts >= ts - INTERVAL 7 DAY THEN touch_type END
         AS touch_type,
       CASE WHEN touch_ts >= ts - INTERVAL 7 DAY
            THEN round(epoch_us(ts - touch_ts) / 1000000.0, 6) END
         AS age_seconds
FROM w WHERE event_type = 'purchase'
""",
)
def r62_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase joined to the latest
    prior click/view of the same user inside a 7-day horizon — the
    marketing-credit primitive. ONE user-keyed window pass (IGNORE
    NULLS last_value over (ts, event_id) total order), horizon
    applied as row-local filters after it — no self-join, no range
    join. Same-timestamp touches credit only when the tiebreak sorts
    them first (pinned in tests/test_attribution.py); organic
    conversions keep their row with NULL touch columns. age_seconds
    rounds at 6dp — the exact micros grid where round() has no
    midpoints (4dp hits .xxxx5 halves the engines disagree on).
    operators/timeseries.py::last_touch_attribution."""
    ev = load_table(spark, sf_dir, "events")
    out = last_touch_attribution(
        ev,
        ["user_id"],
        "ts",
        "event_type",
        conversion_type="purchase",
        touch_types=("click", "view"),
        max_age="7 days",
        tiebreak_col="event_id",
    )
    return out.withColumn("age_seconds", F.round("age_seconds", 6))


@query(
    "r71_feed_cadence",
    oracle="""
WITH g AS (
  SELECT event_type, ts,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY event_type ORDER BY epoch_us(ts)))
           / 1000000.0 AS gap
  FROM events WHERE ts IS NOT NULL)
SELECT event_type,
       count(*) AS n_obs,
       min(ts) AS first_seen,
       max(ts) AS last_seen,
       count(gap) AS n_gaps,
       round(quantile_cont(gap, 0.5), 4) AS median_gap_s,
       round(quantile_cont(gap, 0.95), 4) AS p95_gap_s,
       round(max(gap), 4) AS max_gap_s
FROM g GROUP BY 1
""",
)
def r71_feed_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-cadence / freshness audit per event type: median, p95
    and max inter-arrival gap plus first/last seen — the
    feed-staleness monitor (a feed whose p95 gap suddenly triples is
    degrading long before it flatlines). One keyed lag window + one
    hash aggregate; gaps computed on the exact epoch-micros grid
    divided to seconds. Tied timestamps are genuine 0-second gaps
    (duplicate delivery is a cadence FACT, not a dedup);
    single-observation series report NULL gap stats.
    operators/timeseries.py::cadence_audit; closed-form and tie pins
    in tests/test_cadence_audit.py."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    return cadence_audit(ev, ["event_type"], "ts")


@query(
    "r82_holt_revenue",
    oracle="""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2),
idx AS MATERIALIZED (
  SELECT priority, day, rev,
         row_number() OVER (PARTITION BY priority ORDER BY day) AS rn
  FROM daily),
h AS (
  SELECT i1.priority, i1.day, i1.rn, i1.rev,
         i1.rev AS l, i2.rev - i1.rev AS b
  FROM idx i1 LEFT JOIN idx i2
    ON i2.priority = i1.priority AND i2.rn = 2
  WHERE i1.rn = 1
  UNION ALL
  SELECT i.priority, i.day, i.rn, i.rev,
         0.2::DOUBLE * i.rev + 0.8::DOUBLE * (h.l + h.b),
         0.3::DOUBLE * ((0.2::DOUBLE * i.rev + 0.8::DOUBLE * (h.l + h.b))
                        - h.l)
           + 0.7::DOUBLE * h.b
  FROM idx i JOIN h ON i.priority = h.priority AND i.rn = h.rn + 1
)
SELECT priority, CAST(day AS TIMESTAMP) AS day,
       round(rev, 4) AS revenue,
       round(l, 4) AS level,
       round(b, 4) + 0.0 AS trend
FROM h
""",
)
def r82_holt_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing of daily revenue
    per priority — (level, trend) per day, the one-step forecast
    being level + trend. r52's EWMA tracks LEVEL only and lags every
    ramp by 1/α days; the second (trend) state closes that gap — the
    standard short-horizon capacity/revenue forecaster. The recurrence
    is a grouped-map over the per-SERIES day vector (bounded by the
    calendar grain, never corpus-sized — the r52 stance), matched by
    a recursive-CTE oracle streaming bitwise-equal float64 (α/β
    complements round-trip exactly). The smoothed TREND is fp-noise
    around zero on flat stretches — round4-pinned on both sides (the
    l43 sign-of-zero class). A 1-row series keeps NULL trend.
    operators/timeseries.py::holt_linear; hand recurrence / exact-line
    / order-independence pins in tests/test_holt.py, true-stream twin
    in streaming/stateful.py (split-independence proven)."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    return holt_linear(
        daily, ["priority"], "day", "rev", alpha=0.2, beta=0.3
    ).select(
        "priority",
        F.col("day").cast("timestamp").alias("day"),
        F.round("rev", 4).alias("revenue"),
        F.round("level", 4).alias("level"),
        round4("trend").alias("trend"),
    )


@query(
    "r83_gapfill_interp",
    oracle="""
WITH b AS (SELECT min(CAST(ts AS DATE)) AS mn,
                  max(CAST(ts AS DATE)) AS mx
           FROM events),
types AS (SELECT DISTINCT event_type FROM events),
days AS (SELECT unnest(generate_series(b.mn, b.mx, INTERVAL 1 DAY))
           AS d FROM b),
grid AS (SELECT t.event_type, CAST(days.d AS DATE) AS day
         FROM types t CROSS JOIN days),
c AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2),
g AS (SELECT grid.event_type, grid.day,
             date_diff('day', DATE '1970-01-01', grid.day)::DOUBLE AS t,
             c.n::DOUBLE AS v
      FROM grid LEFT JOIN c USING (event_type, day)),
w AS (SELECT event_type, day, t, v,
             last_value(v IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pt,
             first_value(v IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY t
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nt
      FROM g)
SELECT event_type, CAST(day AS TIMESTAMP) AS day,
       (v IS NULL) AS is_gap,
       round(CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NOT NULL AND nv IS NOT NULL
                  THEN pv + (nv - pv) * (t - pt) / (nt - pt) END,
             4) AS filled
FROM w
""",
)
def r83_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill over the dense day grid per event
    type — GAUGE semantics (a missing sensor day is best estimated
    between its neighbors) where r43's zero-fill is COUNTER semantics
    (a missing count day IS zero). Two keyed window passes (previous
    and next observed value/time via IGNORE NULLS frames), row-local
    interpolation after — one exchange total, plan-audited. Leading/
    trailing gaps refuse to extrapolate (NULL filled, is_gap = true).
    operators/timeseries.py::gapfill_interpolate; midpoint/thirds
    closed forms in tests/test_gapfill_interp.py."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    b = ev.agg(F.min(day).alias("mn"), F.max(day).alias("mx"))
    grid = (
        ev.select("event_type").distinct()
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"),
                           F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    c = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    g = grid.join(c, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.datediff("day", F.lit("1970-01-01")).cast("double").alias("t"),
        F.col("n").cast("double").alias("v"),
    )
    out = gapfill_interpolate(g, ["event_type"], "t", "v")
    return out.select(
        "event_type",
        F.col("day").cast("timestamp").alias("day"),
        F.col("v").isNull().alias("is_gap"),
        F.round("filled", 4).alias("filled"),
    )


@query(
    "r84_scd2_lookup",
    oracle="""
WITH o AS (SELECT user_id, event_type, ts, event_id FROM events
           WHERE event_type IN ('click', 'view')),
c AS (SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                       IS DISTINCT FROM event_type
                    OR lag(event_id) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS nv
      FROM o),
v0 AS (SELECT user_id, event_type, ts AS valid_from, event_id
       FROM c WHERE nv = 1),
v AS (SELECT user_id, event_type, valid_from,
             lead(valid_from) OVER
               (PARTITION BY user_id ORDER BY valid_from, event_id)
               AS valid_to,
             event_id AS version_id
      FROM v0)
SELECT f.event_id AS purchase_id, f.user_id, f.ts,
       v.event_type AS status_at_purchase,
       v.valid_from, v.version_id
FROM events f JOIN v ON v.user_id = f.user_id
 AND v.valid_from <= f.ts
 AND (f.ts < v.valid_to OR v.valid_to IS NULL)
WHERE f.event_type = 'purchase' AND f.ts IS NOT NULL
""",
)
def r84_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 lookup — purchases AS OF their timestamp
    against the SCD2-versioned browsing-status dimension (the r51
    fragment built from click/view events): THE warehouse correctness
    query (which version was true when the fact happened), kept in
    ONE time domain so the containment actually selects (orders'
    1995-2001 dates vs events' 2024 clock would make an empty join).
    CONTAINMENT (valid_from <= t < valid_to, NULL = open) rather than
    an as-of rank: tied valid_from values mint an empty [t, t)
    interval for the superseded version and containment provably
    never picks it. User-keyed equi-join with range post-filters
    (shuffle-hash hinted — the dimension is history-sized); fan-out
    bounded by versions-per-user. A purchase before the user's first
    touch has no version and drops (inner-join semantics, both
    engines). operators/relational.py::scd2_versions; boundary and
    tie pins in tests/test_scd2_lookup.py."""
    ev = load_table(spark, sf_dir, "events")
    touches = ev.filter(
        F.col("event_type").isin("click", "view")
    ).select("user_id", "event_type", "ts", "event_id")
    v = scd2_versions(
        touches, ["user_id"], ["event_type"], "ts", "event_id"
    ).withColumnRenamed("user_id", "v_user")
    facts = ev.filter(
        (F.col("event_type") == "purchase") & F.col("ts").isNotNull()
    ).select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    return facts.join(
        v.hint("shuffle_hash"),
        (F.col("v_user") == F.col("user_id"))
        & (F.col("valid_from") <= F.col("ts"))
        & (
            F.col("valid_to").isNull()
            | (F.col("ts") < F.col("valid_to"))
        ),
    ).select(
        "purchase_id",
        "user_id",
        "ts",
        F.col("event_type").alias("status_at_purchase"),
        "valid_from",
        "version_id",
    )


# ---------------------------------------------------------------------------
# Round-8 promotions: r85-r91 (staged + locally certified in round 7;
# oracles moved VERBATIM from their test files per the rotation flow)
# ---------------------------------------------------------------------------

from ..operators.relational import (  # noqa: E402
    growth_accounting,
    retention_cohorts,
)
from ..operators.timeseries import (  # noqa: E402
    holt_winters_additive,
    ols_two_factor,
    pit_trailing_features,
    ttl_dedup,
)


@query(
    "r85_retention_cohorts",
    oracle="""
WITH e AS (SELECT user_id AS u, ts FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
fu AS (SELECT u, date_trunc('week', min(ts)) AS cohort
       FROM e GROUP BY 1),
up AS (SELECT DISTINCT e.u, fu.cohort,
              date_trunc('week', e.ts) AS p
       FROM e JOIN fu USING (u)),
m AS (SELECT cohort,
             CAST(date_diff('day', CAST(cohort AS DATE),
                            CAST(p AS DATE)) / 7 AS INT) AS "offset",
             count(*) AS n_active
      FROM up GROUP BY 1, 2)
SELECT CAST(cohort AS TIMESTAMP) AS cohort,
       "offset",
       CAST(n_active AS BIGINT) AS n_active,
       CAST(max(CASE WHEN "offset" = 0 THEN n_active END)
              OVER (PARTITION BY cohort) AS BIGINT) AS n_cohort,
       round(n_active * 1.0
             / max(CASE WHEN "offset" = 0 THEN n_active END)
                 OVER (PARTITION BY cohort), 4) AS retention
FROM m
""",
)
def r85_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over events — every user joins
    the cohort of their first active week; each later active week
    lands at integer offset (exact day/7 on Monday-truncated weeks).
    ONE corpus scan feeds both the cohort and active-period legs
    (plan-audited in tests/test_retention.py), then a cohort-keyed
    window anchors retention on the offset-0 row. Calendar pins:
    date_trunc('week') is ISO-Monday in both engines; cohort
    re-emitted as TIMESTAMP. Scale: user-keyed aggregate + a
    cohort-week-count-sized (tiny) window relation.
    operators/relational.py::retention_cohorts."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return retention_cohorts(ev, "user_id", "ts", grain="week")


@query(
    "r86_pit_features",
    oracle="""
WITH b AS (
  SELECT user_id, ts, event_id, value,
         (event_type = 'purchase') AS is_fact,
         epoch_us(ts) AS us
  FROM events WHERE ts IS NOT NULL),
w AS (
  SELECT user_id, ts, event_id, is_fact,
         count(CASE WHEN NOT is_fact THEN 1 END) OVER f AS n_prior,
         round(sum(CASE WHEN NOT is_fact THEN value END) OVER f, 4)
           + 0.0 AS sum_prior,
         round((us - max(CASE WHEN NOT is_fact THEN us END) OVER f)
               / 1000000.0, 6) AS last_gap_s
  FROM b
  WINDOW f AS (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING))
SELECT user_id, ts, event_id AS purchase_id,
       CAST(n_prior AS BIGINT) AS n_prior, sum_prior, last_gap_s
FROM w WHERE is_fact
""",
)
def r86_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time trailing-window features — per-purchase trailing
    10-minute click/view aggregates over events, the feature-store
    primitive with the strict leakage contract: the RANGE frame is
    [t-window, t) in exact epoch-micros (600000000 PRECEDING AND 1
    PRECEDING), so a same-instant touch can NEVER leak into its own
    fact's features and a touch exactly window-old still counts.
    ONE user-keyed window pass — no facts-by-touches self-join (the
    range-join formulation fans out), state bounded by the frame.
    Domain note (the r84 lesson): facts AND touches are both events
    rows, so the time domains overlap by construction. sum_prior
    carries the paired sign-of-zero pin; last_gap_s rounds at 6dp on
    the exact micros grid. operators/timeseries.py::
    pit_trailing_features; frame pins in tests/test_pit_features.py."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "is_fact", F.col("event_type") == "purchase"
    )
    out = pit_trailing_features(
        ev,
        ["user_id"],
        "ts",
        "is_fact",
        value_col="value",
        window="10 minutes",
        carry=["event_id"],
    )
    return out.select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        "n_prior",
        "sum_prior",
        "last_gap_s",
    )


@query(
    "r87_ttl_dedup",
    oracle="""
WITH RECURSIVE b AS (
  SELECT user_id, ts, event_id, epoch_us(ts) AS us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events WHERE ts IS NOT NULL),
k AS (
  SELECT user_id, ts, event_id, us, rn,
         true AS is_kept, us AS anchor
  FROM b WHERE rn = 1
  UNION ALL
  SELECT b.user_id, b.ts, b.event_id, b.us, b.rn,
         b.us >= k.anchor + 600000000,
         CASE WHEN b.us >= k.anchor + 600000000
              THEN b.us ELSE k.anchor END
  FROM b JOIN k ON b.user_id = k.user_id AND b.rn = k.rn + 1)
SELECT user_id, ts, event_id, is_kept FROM k
""",
)
def r87_ttl_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time TTL dedup — the per-user 10-minute throttle chain:
    keep a row iff it is at least ttl after the last KEPT row (the
    greedy chain a notification throttle / sessionized rate limiter
    computes), which no fixed window expresses because the anchor is
    the chain's own output. The DuckDB oracle is the r82/r28
    linear-recursion stance (anchor <- us when us >= anchor + ttl,
    rows totally ordered by epoch-micros + event_id tiebreak; ties
    WITHOUT a tiebreak raise rather than flap). A TRUE streaming twin
    (dropDuplicatesWithinWatermark) agrees on fixtures outside the
    delay..2*delay eviction-ambiguity band —
    tests/test_ttl_dedup.py. Both fixture sides are events rows (one
    time domain, the r84 lesson). operators/timeseries.py::ttl_dedup."""
    ev = load_table(spark, sf_dir, "events")
    return ttl_dedup(
        ev, ["user_id"], "ts", ttl="10 minutes", tiebreak_col="event_id"
    ).select("user_id", "ts", "event_id", "is_kept")


@query(
    "r88_growth_accounting",
    oracle="""
WITH e AS (SELECT user_id AS u, date_trunc('week', ts) AS p
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
up AS (SELECT DISTINCT u, p FROM e),
fu AS (SELECT u, min(p) AS first_p FROM up GROUP BY 1),
cl AS (SELECT up.u, up.p,
              CASE WHEN up.p = fu.first_p THEN 'new'
                   WHEN date_diff('day',
                        CAST(lag(up.p) OVER (PARTITION BY up.u
                                             ORDER BY up.p) AS DATE),
                        CAST(up.p AS DATE)) / 7 = 1 THEN 'retained'
                   ELSE 'resurrected' END AS s
       FROM up JOIN fu USING (u)),
c AS (SELECT p AS period,
             CAST(count(*) AS BIGINT) AS n_active,
             CAST(sum(CASE WHEN s = 'new' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN s = 'retained' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_retained,
             CAST(sum(CASE WHEN s = 'resurrected' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_resurrected
      FROM cl GROUP BY 1),
spine AS (SELECT unnest(generate_series(
            (SELECT min(period) FROM c),
            (SELECT max(period) FROM c),
            INTERVAL 7 DAY)) AS period)
SELECT s.period,
       CAST(coalesce(c.n_active, 0) AS BIGINT) AS n_active,
       CAST(coalesce(c.n_new, 0) AS BIGINT) AS n_new,
       CAST(coalesce(c.n_retained, 0) AS BIGINT) AS n_retained,
       CAST(coalesce(c.n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(coalesce(pr.n_active, 0) - coalesce(c.n_retained, 0)
            AS BIGINT) AS n_churned
FROM spine s
LEFT JOIN c ON c.period = s.period
LEFT JOIN c pr
  ON date_trunc('week', CAST(pr.period AS DATE) + INTERVAL 7 DAY)
     = s.period
""",
)
def r88_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — the new/retained/resurrected/churned
    MAU decomposition every growth team reads first: classify each
    (user, active week) by the gap to the user's previous active week
    (first week = new, gap of exactly 1 week = retained, longer =
    resurrected), then churned(p) = active(prev) - retained(p) via a
    predecessor self-join of the week-count-sized aggregate.
    Identities (tested): new + retained + resurrected = active.
    Scale: one user-keyed distinct + lag window; the self-join is on
    the tiny per-week relation. operators/relational.py::
    growth_accounting; lifecycle pins in
    tests/test_growth_accounting.py."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return growth_accounting(ev, "user_id", "ts", grain="week")


@query(
    "r89_forecast_backtest",
    oracle="""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2),
idx AS MATERIALIZED (
  SELECT priority, day, rev,
         row_number() OVER (PARTITION BY priority ORDER BY day) AS rn
  FROM daily),
h AS (
  SELECT i1.priority, i1.day, i1.rn, i1.rev,
         i1.rev AS l, i2.rev - i1.rev AS b
  FROM idx i1 LEFT JOIN idx i2
    ON i2.priority = i1.priority AND i2.rn = 2
  WHERE i1.rn = 1
  UNION ALL
  SELECT i.priority, i.day, i.rn, i.rev,
         0.2::DOUBLE * i.rev + 0.8::DOUBLE * (h.l + h.b),
         0.3::DOUBLE * ((0.2::DOUBLE * i.rev + 0.8::DOUBLE * (h.l + h.b))
                        - h.l)
           + 0.7::DOUBLE * h.b
  FROM idx i JOIN h ON i.priority = h.priority AND i.rn = h.rn + 1
),
f AS (
  -- f_snaive joins the CALENDAR day-7 revenue, not 7 observed rows
  -- back: with a gapped daily series lag(rev, 7) reads a different
  -- weekday and measures a different forecaster than documented
  -- (code-review r8)
  SELECT h.priority, h.day, h.rev,
         lag(h.rev, 1) OVER w AS f_naive,
         d7.rev AS f_snaive,
         lag(h.l + h.b, 1) OVER w AS f_holt
  FROM h LEFT JOIN daily d7
    ON d7.priority = h.priority AND d7.day = h.day - 7
  WINDOW w AS (PARTITION BY h.priority ORDER BY h.rn)),
m AS (
  SELECT priority,
         CAST(count(*) AS BIGINT) AS n_eval,
         round(avg(abs(rev - f_naive)), 4) AS mae_naive,
         round(avg(abs(rev - f_snaive)), 4) AS mae_snaive,
         round(avg(abs(rev - f_holt)), 4) AS mae_holt
  FROM f
  WHERE f_naive IS NOT NULL AND f_snaive IS NOT NULL
    AND f_holt IS NOT NULL
  GROUP BY 1)
SELECT priority, n_eval, mae_naive, mae_snaive, mae_holt,
       CASE WHEN mae_holt <= mae_naive AND mae_holt <= mae_snaive
            THEN 'holt'
            WHEN mae_naive <= mae_snaive THEN 'naive'
            ELSE 'snaive' END AS best_method
FROM m
""",
)
def r89_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest — daily revenue per priority,
    one-step-ahead forecasts from three models (naive = yesterday,
    seasonal-naive = same weekday last week, Holt = previous row's
    level + trend, the r82 recurrence), per-series MAE over the FAIR
    evaluation set (days where ALL THREE forecasts exist so every MAE
    averages the same days), winner named by a total order (ties
    break toward the simpler model). The question every forecasting
    deployment answers first: does the model beat persistence AT ALL?
    Composition of the r82-certified holt_linear + lag windows (the
    certified-composition stance); MAEs non-negative, no sign pin.
    operators/timeseries.py::holt_linear;
    tests/test_forecast_backtest.py."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    hl = holt_linear(daily, ["priority"], "day", "rev", alpha=0.2, beta=0.3)
    w = Window.partitionBy("priority").orderBy("day")
    # Seasonal-naive reads the CALENDAR day-7 revenue, not lag(rev, 7)
    # over observed rows — with a gapped series the row-lag lands on a
    # different weekday and silently measures a different forecaster
    # (code-review r8). An exact RANGE frame [-7, -7] over the
    # day-number ordering picks the day-7 row iff it exists (daily
    # grain ⇒ at most one row in frame) — same answer as the oracle's
    # calendar self-join, with NO second scan and no extra shuffle
    # (the frame rides the same (priority, day) window partitioning).
    w7 = (
        Window.partitionBy("priority")
        .orderBy(F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-7, -7)
    )
    f = hl.select(
        "priority",
        "day",
        "rev",
        F.lag("rev", 1).over(w).alias("f_naive"),
        F.max("rev").over(w7).alias("f_snaive"),
        F.lag(F.col("level") + F.col("trend"), 1).over(w).alias("f_holt"),
    ).filter(
        F.col("f_naive").isNotNull()
        & F.col("f_snaive").isNotNull()
        & F.col("f_holt").isNotNull()
    )
    m = f.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.round(F.avg(F.abs(F.col("rev") - F.col("f_naive"))), 4).alias(
            "mae_naive"
        ),
        F.round(F.avg(F.abs(F.col("rev") - F.col("f_snaive"))), 4).alias(
            "mae_snaive"
        ),
        F.round(F.avg(F.abs(F.col("rev") - F.col("f_holt"))), 4).alias(
            "mae_holt"
        ),
    )
    best = (
        F.when(
            (F.col("mae_holt") <= F.col("mae_naive"))
            & (F.col("mae_holt") <= F.col("mae_snaive")),
            F.lit("holt"),
        )
        .when(F.col("mae_naive") <= F.col("mae_snaive"), F.lit("naive"))
        .otherwise(F.lit("snaive"))
    )
    return m.withColumn("best_method", best)


@query(
    "r90_holt_winters",
    oracle="""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2),
idx AS MATERIALIZED (
  SELECT priority, day, rev,
         row_number() OVER (PARTITION BY priority ORDER BY day) AS rn
  FROM daily),
seed AS (
  SELECT priority,
         list_sum((list(rev ORDER BY rn))[1:7]) / 7.0::DOUBLE AS l0,
         (list_sum((list(rev ORDER BY rn))[8:14]) / 7.0::DOUBLE
          - list_sum((list(rev ORDER BY rn))[1:7]) / 7.0::DOUBLE)
           / 7.0::DOUBLE AS b0,
         (list(rev ORDER BY rn))[1:7] AS first7
  FROM idx GROUP BY priority),
h AS (
  SELECT i.priority, i.day, i.rn, i.rev,
         s.l0 AS l, s.b0 AS b,
         list_transform(s.first7, v -> v - s.l0) AS buf,
         CAST(NULL AS DOUBLE) AS fitted,
         s.first7[7] - s.l0 AS seasonal
  FROM idx i JOIN seed s USING (priority) WHERE i.rn = 7
  UNION ALL
  SELECT i.priority, i.day, i.rn, i.rev,
         0.2::DOUBLE * (i.rev - h.buf[1])
           + 0.8::DOUBLE * (h.l + h.b),
         0.1::DOUBLE * ((0.2::DOUBLE * (i.rev - h.buf[1])
                         + 0.8::DOUBLE * (h.l + h.b)) - h.l)
           + 0.9::DOUBLE * h.b,
         h.buf[2:] || [0.3::DOUBLE * (i.rev - h.l - h.b)
                       + 0.7::DOUBLE * h.buf[1]],
         h.l + h.b + h.buf[1],
         0.3::DOUBLE * (i.rev - h.l - h.b) + 0.7::DOUBLE * h.buf[1]
  FROM idx i JOIN h ON i.priority = h.priority AND i.rn = h.rn + 1)
SELECT i.priority, CAST(i.day AS TIMESTAMP) AS day,
       round(i.rev, 4) AS revenue,
       round(h.l, 4) + 0.0 AS level,
       round(h.b, 4) + 0.0 AS trend,
       round(h.seasonal, 4) + 0.0 AS seasonal,
       round(h.fitted, 4) + 0.0 AS fitted
FROM idx i LEFT JOIN h ON h.priority = i.priority AND h.rn = i.rn
""",
)
def r90_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (triple exponential) smoothing of daily
    revenue per priority, weekly seasonality — level/trend/seasonal
    state plus the one-step-ahead fitted value per day. The DuckDB
    oracle is the r82 recursive-CTE stance with the seasonal buffer
    carried as a LIST whose head is s_{t-m} (tail append = s_t);
    every smoothing literal is ::DOUBLE so both engines multiply the
    identical doubles, init means reduce the ORDERED season lists
    left-to-right, and all signed outputs carry the paired
    sign-of-zero pin (functions/rounding.py::round4 + the oracle's
    `+ 0.0`). Scale: per-key sequential recurrence via the r82
    grouped-map seam — keys parallelize, the within-key scan is
    inherently ordered. operators/timeseries.py::
    holt_winters_additive; hand recurrence + exact-weekly-signal pins
    in tests/test_holt_winters.py."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    hw = holt_winters_additive(
        daily, ["priority"], "day", "rev",
        alpha=0.2, beta=0.1, gamma=0.3, period=7,
    )
    return hw.select(
        "priority",
        F.col("day").cast("timestamp").alias("day"),
        F.round("rev", 4).alias("revenue"),
        round4("level").alias("level"),
        round4("trend").alias("trend"),
        round4("seasonal").alias("seasonal"),
        round4("fitted").alias("fitted"),
    )


@query(
    "r91_trend_weekend_ols",
    oracle="""
WITH daily AS MATERIALIZED (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2),
b AS (
  SELECT priority,
         date_diff('day', DATE '1970-01-01', day)::DOUBLE AS x1,
         CASE WHEN isodow(day) >= 6 THEN 1.0 ELSE 0.0 END AS x2,
         rev AS y
  FROM daily),
m AS (SELECT priority, round(avg(y), 4) AS my, round(avg(x1), 4) AS m1,
             round(avg(x2), 4) AS m2
      FROM b GROUP BY 1),
c AS (SELECT b.priority, b.y - m.my AS yc, b.x1 - m.m1 AS c1,
             b.x2 - m.m2 AS c2, m.my, m.m1, m.m2
      FROM b JOIN m USING (priority)),
a AS (SELECT priority, count(*) AS n_obs,
             first(my) AS my, first(m1) AS m1, first(m2) AS m2,
             sum(c1 * c1) AS s11, sum(c2 * c2) AS s22,
             sum(c1 * c2) AS s12, sum(c1 * yc) AS s1y,
             sum(c2 * yc) AS s2y, sum(yc * yc) AS syy,
             sum(yc) AS sy, sum(c1) AS sc1, sum(c2) AS sc2
      FROM c GROUP BY 1),
a2 AS (SELECT *,
         (s11 * s22 - s12 * s12 > 1e-12 * s11 * s22
          AND s11 - sc1 * sc1 / n_obs > 1e-12 * s11
          AND s22 - sc2 * sc2 / n_obs > 1e-12 * s22) AS ok
       FROM a)
SELECT priority, CAST(n_obs AS BIGINT) AS n_obs,
       round(CASE WHEN ok
             THEN (my + sy / n_obs)
                  - ((s1y * s22 - s12 * s2y)
                     / (s11 * s22 - s12 * s12)) * (m1 + sc1 / n_obs)
                  - ((s11 * s2y - s1y * s12)
                     / (s11 * s22 - s12 * s12)) * (m2 + sc2 / n_obs)
             END, 4) + 0.0 AS intercept,
       round(CASE WHEN ok
             THEN (s1y * s22 - s12 * s2y) / (s11 * s22 - s12 * s12)
             END, 4) + 0.0 AS beta1,
       round(CASE WHEN ok
             THEN (s11 * s2y - s1y * s12) / (s11 * s22 - s12 * s12)
             END, 4) + 0.0 AS beta2,
       round(CASE WHEN syy > 0 AND ok
             THEN 1.0 - (syy
                  - ((s1y * s22 - s12 * s2y)
                     / (s11 * s22 - s12 * s12)) * s1y
                  - ((s11 * s2y - s1y * s12)
                     / (s11 * s22 - s12 * s12)) * s2y) / syy
             END, 4) + 0.0 AS r2
FROM a2
""",
)
def r91_trend_weekend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-factor OLS: daily revenue ~ trend + weekend dummy per
    priority — the controlled-trend question series_trend alone
    cannot answer (is revenue really declining, or is the mix of
    weekend days moving?). Both engines center every variable on its
    4dp-ROUNDED group mean (bitwise-stable pivots; centering shifts
    only the intercept), solve the reduced 2x2 normal equations, and
    recover the intercept from the rounded pivots plus residual
    means; a singular system (collinear regressors) yields NULLs,
    never a garbage solve. Signed outputs carry the paired
    sign-of-zero pin. Scale: one keyed aggregate over row-local
    expressions — no matrix library, no collect.
    operators/timeseries.py::ols_two_factor; exact-plane/collinear
    pins in tests/test_ols_two_factor.py."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
        .select(
            "priority",
            F.datediff("day", F.lit("1970-01-01"))
            .cast("double")
            .alias("x1"),
            F.when(
                ((F.dayofweek("day") + 5) % 7 + 1) >= 6, F.lit(1.0)
            ).otherwise(F.lit(0.0)).alias("x2"),
            F.col("rev").alias("y"),
        )
    )
    return ols_two_factor(daily, ["priority"], "y", "x1", "x2")
