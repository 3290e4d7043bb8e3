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
