"""Fixture invariants the SQL oracles silently rely on (ADVICE r2).

Several oracle/Spark parities hold only because the fixtures' text is
single-byte ASCII with no whitespace runs:
- l07c equates DuckDB character substr/length with Spark byte slicing
  of the UTF-8 media blob (1 char == 1 byte only for ASCII);
- l19/l20 (and every string_split-based oracle) split on a single
  space while Spark's text.tokens splits on \\s+ (identical only when
  no tabs/newlines/double spaces exist and text is trimmed or
  trim-stable).

Assert the invariant ONCE here so a future fixture regeneration fails
loudly in this file instead of as a mysterious oracle hash mismatch.
DuckDB reads the parquet directly — no Spark session needed.
"""

import duckdb

from .conftest import SF_ORACLE, SF_SMOKE


def test_documents_text_is_ascii_single_spaced():
    con = duckdb.connect()
    for sf in (SF_SMOKE, SF_ORACLE):
        bad = con.execute(
            f"""
            SELECT count(*)
            FROM read_parquet('{sf}/documents.parquet')
            WHERE length(text) != octet_length(text::BLOB)
               OR text LIKE '%  %'
               OR text != trim(text)
               OR contains(text, chr(9))
               OR contains(text, chr(10))
               OR contains(text, chr(13))
               -- empty/NULL text (code-review r8): token_baskets
               -- filters zero-token docs so FPGrowth's minSupport
               -- denominator is (non-empty docs), while every mining
               -- oracle divides by count(*) FROM documents — one
               -- empty doc shifts ceil(s*N) and every support/
               -- confidence/lift across m04-m10 as an opaque hash
               -- mismatch; pin it HERE, loudly
               OR text IS NULL
               OR length(text) = 0
            """
        ).fetchone()[0]
        assert bad == 0, (
            f"{sf}/documents.parquet violates the ASCII/single-space/"
            "trimmed invariant that oracle parity depends on: every "
            "trim-normalizing Spark tokenizer (operators/text.tokens) "
            "is paired with an untrimmed string_split oracle, so a "
            "leading/trailing space would surface as an opaque driver "
            "hash mismatch — this test exists to fail loudly instead"
        )


def test_duckdb_list_dialect_semantics_are_pinned():
    """DuckDB dialect seams the oracles lean on (VERDICT r4 task 6):
    several oracle/Spark parities hold only because DuckDB 1.x list
    semantics are what they are today —

    - 1-BASED indexing: `l[1]` is the first element (l29 reads
      `embedding[t.dim]` with dims generated from 1; every
      `list_zip ... s -> s[1]` shingle lambda) while Spark's
      `element_at` is also 1-based but `getItem`/`[]` is 0-based —
      the oracles were written against the 1-based form;
    - 1-based SLICING: `l[2:]` drops exactly the first element (the
      n-gram shingle construction in l02/l16/l22/l28);
    - `list_zip` pads to the LONGEST input with NULLs (it does NOT
      truncate like Python zip), and `NULL || 'x'` is NULL — the
      shingle transforms rely on the tail entries collapsing to NULL
      so a downstream filter/unnest can drop them;
    - `generate_series(a, b)` is INCLUSIVE of b; `range(a, b)` is
      exclusive (l29 vs l07c use one each);
    - `unnest([])` emits ZERO rows (empty-document safety in every
      exploding oracle).

    A DuckDB upgrade that changes any of these would surface as an
    opaque driver hash mismatch; this canary fails loudly instead,
    naming the changed behavior."""
    con = duckdb.connect()
    one = con.execute(
        """
        SELECT [10,20,30][1]          AS first_elem,
               [10,20,30][2:]          AS tail_slice,
               list_zip([1,2,3],[9,8]) AS zip_padded,
               list_transform(list_zip(['a','b','c'],['b','c']),
                              s -> s[1] || ' ' || s[2]) AS shingles,
               generate_series(1,3)    AS gs,
               range(0,3)              AS rg,
               (SELECT count(*) FROM (SELECT unnest(CAST([] AS INT[]))))
                                       AS unnest_empty
        """
    ).fetchone()
    assert one[0] == 10, f"list indexing no longer 1-based: {one[0]}"
    assert one[1] == [20, 30], f"1-based slicing changed: {one[1]}"
    assert one[2] == [(1, 9), (2, 8), (3, None)], (
        f"list_zip no longer NULL-pads to longest: {one[2]}"
    )
    assert one[3] == ["a b", "b c", None], (
        f"shingle-lambda NULL collapse changed: {one[3]}"
    )
    assert one[4] == [1, 2, 3], f"generate_series bounds changed: {one[4]}"
    assert one[5] == [0, 1, 2], f"range bounds changed: {one[5]}"
    assert one[6] == 0, f"unnest of empty list emits rows: {one[6]}"


def test_events_stream_columns_non_null():
    """The streaming-pack oracles (t01-t06) rely on events.ts /
    event_type / user_id being non-NULL: Spark's window()/
    session_window() DROP a NULL-ts row while DuckDB buckets it under
    a NULL group; t04's row_number orders NULLS FIRST in Spark vs
    DuckDB's NULLS LAST; collect_set drops a NULL event_type the
    oracle's DISTINCT keeps. Pin the invariant loudly here
    (code-review r8 — the documents.text stance applied to events)."""
    con = duckdb.connect()
    for sf in (SF_SMOKE, SF_ORACLE):
        bad = con.execute(
            f"""
            SELECT count(*)
            FROM read_parquet('{sf}/events.parquet')
            WHERE ts IS NULL OR event_type IS NULL OR user_id IS NULL
            """
        ).fetchone()[0]
        assert bad == 0, (
            f"{sf}/events.parquet has NULL ts/event_type/user_id — "
            "the t01-t06 oracles would hash-mismatch opaquely"
        )
