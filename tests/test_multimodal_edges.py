"""NULL-payload and parameter-validation pins for the multimodal
operators — round-8 batch-4 code-review regressions."""

import pytest
from pyspark.sql import functions as F


def test_media_dedup_null_payloads_are_singletons(spark):
    """md5(NULL) is NULL: without the doc_id salt every payload-less
    row landed in ONE dup group and all but one were marked copies of
    each other (and the NULL partition is a skew funnel at scale)."""
    from miningfrequentpattern_spark.operators.multimodal import media_dedup

    df = spark.createDataFrame(
        [
            (1, bytearray(b"xx")),
            (2, bytearray(b"xx")),
            (3, None),
            (4, None),
        ],
        "doc_id long, media binary",
    )
    got = {
        r["doc_id"]: (r["n_copies"], r["is_kept"])
        for r in media_dedup(df).collect()
    }
    assert got[1] == (2, True) and got[2] == (2, False)
    # each NULL payload is its own singleton keeper
    assert got[3] == (1, True) and got[4] == (1, True)


def test_extract_media_features_null_row_raises_actionably(spark):
    from miningfrequentpattern_spark.operators.multimodal import (
        extract_media_features,
    )

    df = spark.createDataFrame(
        [(1, None, None)],
        "doc_id long, media binary, "
        "media_meta struct<kind string, n_bytes bigint>",
    )
    with pytest.raises(Exception, match="payload-less"):
        extract_media_features(df).collect()


def test_sample_frames_rejects_bad_frame_bytes(spark):
    from miningfrequentpattern_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, bytearray(b"abcdef"))], "doc_id long, media binary"
    )
    with pytest.raises(ValueError, match="frame_bytes"):
        sample_frames(df, frame_bytes=0)
    with pytest.raises(ValueError, match="frame_bytes"):
        sample_frames(df, frame_bytes=-32)
    # and a valid cut still works
    rows = sample_frames(df, frame_bytes=4).collect()
    assert [(r["frame_idx"], r["frame_len"]) for r in rows] == [
        (0, 4), (1, 2)
    ]


def test_sample_frames_null_media_raises_actionably(spark):
    """Same r8 contract raise as extract_media_features, extended to
    the frame sampler in the r9 sweep: a NULL payload fails naming
    the attach_media contract, not bytes(None)'s opaque TypeError."""
    from miningfrequentpattern_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, bytearray(b"abcd")), (2, None)], "doc_id long, media binary"
    )
    with pytest.raises(Exception, match="payload-less"):
        sample_frames(df, frame_bytes=4).collect()
