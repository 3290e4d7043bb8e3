"""Binary media dedup (operators/multimodal.py::media_dedup) — PROMOTED round 8 as l59_media_dedup: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the closed-form pins, the
one-keeper-per-digest invariant, and the keep-mode raise stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.multimodal import (
    attach_media,
    media_dedup,
)
from .conftest import SF_ORACLE
from miningfrequentpattern_spark.queries.registry import (
    QUERIES,
    load_all_packs,
)

load_all_packs()

def _l59(spark, sf_dir):
    return QUERIES["l59_media_dedup"](spark, sf_dir)



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
