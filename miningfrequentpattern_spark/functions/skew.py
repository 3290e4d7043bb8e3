"""Skew-handling primitives (SCALING.md levers).

AQE's skew-join splitting handles JOIN skew automatically, but a
skewed AGGREGATION key (one user with 10⁹ events, one order with 10⁶
lines) still lands every row of the hot key in one reducer. The fix is
the classic two-phase salted aggregate: shard each key across
`n_salts` partial groups, aggregate, then merge the partials.

Only algebraic aggregates (sum/count/min/max, collect_set-as-union)
can be salted this way; the helpers below cover the shapes this
engine's operators actually use (counts and set-collection — the
basketize hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .guards import reject_working_cols


def salted_count(
    df: DataFrame, keys: list[str], n_salts: int = 16, out: str = "n"
) -> DataFrame:
    """COUNT(*) per key, skew-proof: phase 1 aggregates
    (key, salt) shards, phase 2 sums the shard counts. Two small
    shuffles instead of one skewed one."""
    # hardening (h), r9 relational sweep: a key named like an
    # internal column would be shadowed in the salted projection
    reject_working_cols(df.select(*keys), ("_salt", "_pn"), "salted_count")
    # the output name must not duplicate a key (r10 review: two
    # identically-named columns -> AMBIGUOUS_REFERENCE one op later)
    if out.casefold() in {k.casefold() for k in keys} | {"_salt", "_pn"}:
        raise ValueError(
            f"salted_count: out={out!r} collides with a key or an "
            f"internal column"
        )
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    partial = (
        df.select(*keys, salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_pn"))
    )
    return partial.groupBy(*keys).agg(F.sum("_pn").alias(out))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join for a hot fact key against a
    non-broadcastable dim: the fact side gets a random salt, the dim
    side is replicated once per salt value, and the join runs on
    (key, salt) — the hot key's rows spread across `n_salts` tasks
    instead of one straggler.

    When to use: AQE's skew-join splitting already handles plain
    shuffle joins at runtime, but it cannot split a join that avoids
    the shuffle (bucketed / pre-partitioned inputs) or a stream-static
    join. Cost: dim side is shuffled n_salts×; keep it for
    medium-sized dims where broadcast is too big but n_salts copies
    still fit comfortably.

    Semantics: identical to `fact.join(dim, key, how)` for inner and
    left joins with unique dim keys (asserted in tests) — each fact
    row meets exactly the one dim row carrying its salt.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # hardening (h): withColumn REPLACES an existing _salt column
    # silently — corrupt join keys with no error
    reject_working_cols(fact, ("_salt",), "salted_join")
    reject_working_cols(dim, ("_salt",), "salted_join")
    f = fact.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")


def salted_collect_set(
    df: DataFrame,
    key: str,
    item: str,
    n_salts: int = 16,
    out: str = "items",
) -> DataFrame:
    """collect_set per key, skew-proof: shard-level collect_set, then
    flatten+distinct at merge. Bounds any single task's set size to
    ~|key's items|/n_salts during phase 1 — the salted twin of
    operators.baskets.basketize for pathological keys."""
    # hardening (h): only key/item survive into the salted projection
    reject_working_cols(
        df.select(key, item), ("_salt", "_ps"), "salted_collect_set"
    )
    if out.casefold() in {key.casefold(), "_salt", "_ps"}:
        raise ValueError(
            f"salted_collect_set: out={out!r} collides with the key "
            f"or an internal column"
        )
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    partial = (
        df.select(key, F.col(item), salt)
        .groupBy(key, "_salt")
        .agg(F.collect_set(item).alias("_ps"))
    )
    return partial.groupBy(key).agg(
        F.sort_array(
            F.array_distinct(F.flatten(F.collect_list("_ps")))
        ).alias(out)
    )


def key_skew_profile(
    df: DataFrame, keys: list[str], top_k: int = 5
) -> DataFrame:
    """Skew DIAGNOSTIC: the measurement that tells you when the
    salted operators above (or a broadcast/bucketing change) are
    worth their cost, instead of guessing from a straggler task in
    the UI. Returns the `top_k` heaviest keys (count DESC, then key
    ASC — deterministic under ties) annotated with their share of
    all rows plus corpus-level distribution stats repeated per row:

        (keys…, n_rows_key, share, n_keys, mean_per_key,
         p50_per_key, p99_per_key, skew_factor = max/mean)

    A skew_factor near 1 says the key is uniform (salting is pure
    overhead); p99 ≫ p50 with a big top-1 share says ONE hot key —
    salt or isolate it; a heavy p99 across many keys says the
    distribution itself is Zipfian — raise shuffle partitions or
    pre-aggregate.

    Shape note (the diagnostic must not itself fall to the skew it
    measures): the per-key count is a hash aggregate with MAP-SIDE
    partials, so a 10⁹-row hot key arrives at its reducer as one
    partial per map task, never as raw rows — counting is the one
    aggregate shape that is skew-immune by construction. Everything
    downstream is |keys|-sized: exact interpolated percentiles over
    the counts relation (Spark `percentile` == DuckDB
    `quantile_cont`, the r10b pin), a 1-row stats aggregate
    broadcast back, and a bounded TakeOrderedAndProject for the
    top-k — never a global sort."""
    # Same collision stance as the salted siblings (r11 functions
    # sweep): a key named like one of the seven computed columns
    # would silently duplicate the name in the result (two 'share'
    # columns) or make the internal orderBy ambiguous.
    reject_working_cols(
        df.select(*keys),
        (
            "n_rows_key",
            "share",
            "n_keys",
            "mean_per_key",
            "p50_per_key",
            "p99_per_key",
            "skew_factor",
            "_n_rows",
            "_mean",
            "_max_n",
        ),
        "key_skew_profile",
    )
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows_key"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows_key").alias("_n_rows"),
        F.avg("n_rows_key").alias("_mean"),
        F.round(F.expr("percentile(n_rows_key, 0.5)"), 4).alias(
            "p50_per_key"
        ),
        F.round(F.expr("percentile(n_rows_key, 0.99)"), 4).alias(
            "p99_per_key"
        ),
        F.max("n_rows_key").alias("_max_n"),
    )
    top = counts.orderBy(F.desc("n_rows_key"), *keys).limit(top_k)
    return top.crossJoin(F.broadcast(stats)).select(
        *keys,
        "n_rows_key",
        F.round(F.col("n_rows_key") / F.col("_n_rows"), 4).alias("share"),
        "n_keys",
        F.round(F.col("_mean"), 4).alias("mean_per_key"),
        "p50_per_key",
        "p99_per_key",
        F.round(F.col("_max_n") / F.col("_mean"), 4).alias("skew_factor"),
    )
