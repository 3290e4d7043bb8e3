"""Binary media dedup (operators/multimodal.py::media_dedup) —
round-8 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL the future l59_media_dedup registration will
carry. md5 over the SAME bytes is engine-independent (the media blob
is the deterministic UTF-8 payload attach_media builds), so unlike
the perceptual tiers this binary-column op is hash-oracle-able."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.multimodal import (
    attach_media,
    media_dedup,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future l59 oracle, verbatim. DuckDB md5() over the encoded text
# bytes equals Spark md5 over the BinaryType column (same bytes,
# same digest); keeper = lowest doc_id per digest.
L59_ORACLE = """
WITH m AS (SELECT doc_id, md5(text) AS media_md5 FROM documents
           WHERE text IS NOT NULL)
SELECT doc_id, media_md5,
       CAST(count(*) OVER (PARTITION BY media_md5) AS BIGINT)
         AS n_copies,
       row_number() OVER (PARTITION BY media_md5 ORDER BY doc_id) = 1
         AS is_kept
FROM m
"""


def _l59(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return media_dedup(attach_media(docs)).select(
        "doc_id", "media_md5", "n_copies", "is_kept"
    )


def test_media_dedup_matches_duckdb_oracle(spark, duck):
    compare(_l59(spark, SF_ORACLE), duck, L59_ORACLE)


def test_media_dedup_closed_form(spark):
    """Two byte-identical payloads dedup to the lower doc_id; a
    distinct payload keeps itself."""
    docs = spark.createDataFrame(
        [(7, "same bytes"), (3, "same bytes"), (9, "other")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_copies"], r["is_kept"])
        for r in media_dedup(attach_media(docs)).collect()
    }
    assert got == {3: (2, True), 7: (2, False), 9: (1, True)}


def test_media_dedup_keeps_exactly_one_per_digest(spark):
    out = _l59(spark, SF_ORACLE)
    per = out.groupBy("media_md5").agg(
        F.sum(F.col("is_kept").cast("int")).alias("k")
    )
    assert per.filter(F.col("k") != 1).isEmpty()


def test_media_dedup_rejects_unknown_keep(spark):
    import pytest

    docs = attach_media(
        spark.createDataFrame([(1, "x")], "doc_id long, text string")
    )
    with pytest.raises(ValueError, match="min_id"):
        media_dedup(docs, keep="max_id")
