"""Basket / sequence derivation (SURVEY.md §1.3, M1) — the bridge from
relational fixtures to the mining core's transaction model.

The reference's data model is "one basket per text line"; ours derives
baskets from relational tables with a single shuffle:

    lineitem GROUP BY l_orderkey -> collect_set(l_partkey)

Scale notes:
- `collect_set` (not `collect_list`) is mandatory: MLlib FPGrowth
  raises on duplicate items within a transaction, and the fixtures DO
  repeat partkeys within an order (FIXTURES.md lineitem note).
- One hash-aggregate shuffle on the basket key; partial aggregation
  (map-side combine) applies to collect_set, so the shuffle carries
  de-duplicated partial sets, not raw rows.
- Basket skew: a pathological order with millions of lines would blow
  a single task; at 100 TB add `.filter(F.size("items") < cap)` after
  derivation or pre-aggregate with a salted two-phase collect_set.
  The fixtures' max basket is tiny so the plain form is used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basketize(
    df: DataFrame,
    key: str,
    item: str,
    *,
    items_col: str = "items",
    min_items: int = 1,
    max_items: int | None = None,
    n_salts: int | None = None,
) -> DataFrame:
    """M1: rows -> one row per key with a sorted, deduplicated item set.

    Sorting makes downstream output deterministic (oracle-friendly);
    FPGrowth itself is order-insensitive on input items.

    Skew guards (both off by default — the fixtures' baskets are
    tiny, and the plain single-aggregate plan is the fastest when no
    key is pathological):
    - `n_salts`: build each set with the two-phase salted aggregate
      (functions.skew.salted_collect_set) so a hot key's rows spread
      over `n_salts` partial tasks during phase 1 instead of landing
      on one reducer. Result-identical to the plain form (asserted in
      tests/test_mining.py).
    - `max_items`: drop baskets larger than the cap AFTER derivation —
      a one-in-a-billion giant basket (a crawler session with 10⁶
      events) is noise for support counting but would dominate
      FP-tree conditional builds; capping is what production FIM
      pipelines do. Applied post-aggregation so the filter sees true
      basket sizes.
    """
    if n_salts is not None:
        from ..functions.skew import salted_collect_set

        out = salted_collect_set(df, key, item, n_salts=n_salts, out=items_col)
    else:
        out = df.groupBy(key).agg(
            F.sort_array(F.collect_set(item)).alias(items_col)
        )
    if min_items > 0:
        # Applied at min_items=1 too: a key whose item values are all
        # NULL collects an EMPTY set, and an items=[] basket would both
        # violate the contract and inflate the basket count N that
        # frequent_items' ceil(s*N) threshold divides by.
        out = out.filter(F.size(items_col) >= min_items)
    if max_items is not None:
        out = out.filter(F.size(items_col) <= max_items)
    return out


def order_baskets(lineitem: DataFrame) -> DataFrame:
    """Market baskets: (l_orderkey, items ARRAY<BIGINT> of partkeys)."""
    return basketize(lineitem, "l_orderkey", "l_partkey")


def token_baskets(documents: DataFrame) -> DataFrame:
    """Token baskets from documents.text (whitespace-separated vocab).

    (doc_id, items ARRAY<STRING> of distinct tokens).
    """
    from .text import tokens

    return documents.select(
        "doc_id",
        # trim+split via the single repo-wide tokenizer contract
        # (split('  a b ') would yield a '' item that FPGrowth
        # happily mines; text.tokens trims first).
        F.sort_array(F.array_distinct(tokens("text"))).alias("items"),
    ).filter(F.size("items") > 0)


def event_sequences(events: DataFrame) -> DataFrame:
    """Time-ordered per-user sequences for PrefixSpan (M9).

    PrefixSpan wants ARRAY<ARRAY<T>>: a sequence of itemsets. Events
    are instantaneous, so each itemset is a singleton [event_type].
    Ordering: sort struct(ts, event_id) then project — `sort_array` on
    an array of structs orders lexicographically by field position,
    giving a deterministic time order with event_id as tiebreak
    (the fixtures can repeat ts per user at ms granularity).
    """
    return (
        events.groupBy("user_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: F.array(s["event_type"]),
            ).alias("sequence")
        )
    )
