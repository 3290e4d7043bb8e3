"""Multimodal column plumbing (SURVEY.md §2.4 L7).

The fixtures carry no binary media, so this module does two things:

1. the REAL part — a typed multimodal row model joining text, vector,
   and label modalities (documents ⋈ embeddings), plus a `media`
   binary column with a typed metadata struct, built deterministically
   from text bytes so tests exercise true BinaryType plumbing;
2. the STUBBED part — decode/feature-extraction over the binary column
   via `mapInPandas` with a real schema, real Arrow batch flow, and a
   clearly marked seam where an image/audio library would plug in.
   The stub "decoder" computes deterministic pseudo-features
   (byte length, crc-like rolling sum, first/last bytes); swapping in
   PIL/librosa changes ONE function, none of the Spark plumbing.

Why mapInPandas: media decode is per-row Python work with large blob
inputs — Arrow-batched iteration avoids both per-row UDF overhead and
materializing all blobs of a partition at once (the iterator yields
batch-by-batch). This is the sanctioned shape for binary-heavy
pipelines; partition sizing is governed by
spark.sql.files.maxPartitionBytes on the scan side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, checksum BIGINT, "
    "head_byte INT, tail_byte INT"
)


def multimodal_rows(documents: DataFrame, embeddings: DataFrame) -> DataFrame:
    """L7: one row per document with every modality: text + metadata,
    embedding vector, class label. Plain equi-join on the 1:1 key;
    at scale both sides bucket by id so this is shuffle-free."""
    return documents.join(
        embeddings,
        documents.doc_id == embeddings.vec_id,
        "inner",
    ).select(
        "doc_id", "text", "lang", "source", "n_chars", "embedding", "label"
    )


def attach_media(documents: DataFrame) -> DataFrame:
    """Build a BinaryType `media` column (UTF-8 bytes of text — a
    deterministic stand-in for an image/audio payload) with typed
    metadata, mirroring how a real pipeline lands media next to text."""
    media = F.encode("text", "UTF-8")
    # A document with NULL text has no payload — no media row (the
    # decode seam and frame sampler operate on bytes; None is not a
    # blob, and real pipelines drop or dead-letter payload-less rows
    # before decode).
    documents = documents.filter(F.col("text").isNotNull())
    return documents.select(
        "doc_id",
        media.alias("media"),
        F.struct(
            F.lit("text/fake-media").alias("kind"),
            F.length(media).cast("long").alias("n_bytes"),
            F.lit("utf-8").alias("encoding"),
        ).alias("media_meta"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """The decode seam. Replace the body with PIL/librosa/ffmpeg calls
    for real media; everything around it stays identical.

    Raises NotImplementedError for media kinds a real decoder would
    own; the deterministic fake path covers the fixture kind so the
    plumbing is testable end-to-end.
    """
    blobs = pdf["media"]
    # Fail with the module contract spelled out, not an opaque
    # executor TypeError from len(None)/None["kind"] (code-review
    # r8): payload-less rows must be filtered before decode —
    # attach_media does; an external media_df must too.
    if blobs.isna().any() or pdf["media_meta"].isna().any():
        raise ValueError(
            "extract_media_features: NULL media/media_meta row "
            "reached the decoder — filter payload-less rows first "
            "(attach_media's media.isNotNull() contract)"
        )
    kinds = pdf["media_meta"].map(lambda m: m["kind"])
    if (kinds != "text/fake-media").any():
        raise NotImplementedError(
            "real media decode (image/audio/video) requires codec libs "
            "not present in this environment; plug them in here"
        )
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": blobs.map(len).astype("int64"),
            "checksum": blobs.map(
                lambda b: sum((i + 1) * v for i, v in enumerate(b)) % (1 << 31)
            ).astype("int64"),
            "head_byte": blobs.map(lambda b: b[0] if len(b) else -1).astype("int32"),
            "tail_byte": blobs.map(lambda b: b[-1] if len(b) else -1).astype("int32"),
        }
    )


def extract_media_features(media_df: DataFrame) -> DataFrame:
    """L7: Arrow-batched feature extraction over the binary column.
    Batch sizing is governed by spark.sql.execution.arrow.
    maxRecordsPerBatch (the former batch_size parameter was a dead
    knob that silently did nothing — code-review r8)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _decode_batch(pdf)

    return media_df.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id BIGINT, frame_idx BIGINT, frame_len BIGINT, frame_md5 STRING"


def sample_frames(media_df: DataFrame, frame_bytes: int = 32) -> DataFrame:
    """L7: frame sampling over a binary "video" column — the fan-out
    twin of `extract_media_features` (one input row → many frames).

    The stub treats the blob as a fixed-rate stream and cuts it into
    consecutive `frame_bytes` windows (a real decoder would seek
    keyframes with ffmpeg at this exact seam); each frame is emitted as
    (index, byte length, md5). Deterministic by construction, so the
    whole mapInPandas fan-out is oracle-checkable against SQL substring
    math. Output size is len/frame_bytes rows per input — the Arrow
    iterator shape keeps peak memory at one input batch regardless of
    fan-out, and frames inherit the scan's partitioning (no shuffle).
    """
    import hashlib

    if frame_bytes < 1:
        # media_dedup's eager `keep` validation stance: fail on the
        # driver with the parameter named, not a ZeroDivisionError
        # (0) or silent empty frames (negative) inside a task.
        raise ValueError(f"frame_bytes must be >= 1, got {frame_bytes}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # Same contract raise as extract_media_features (r8
            # hardening, extended to this second mapInPandas path in
            # the r9 sweep): a NULL payload must fail with the
            # contract spelled out, not `bytes(None)`'s opaque
            # executor TypeError.
            if pdf["media"].isna().any():
                raise ValueError(
                    "sample_frames: NULL media row reached the frame "
                    "sampler — filter payload-less rows first "
                    "(attach_media's media.isNotNull() contract)"
                )
            ids: list[int] = []
            idxs: list[int] = []
            lens: list[int] = []
            digests: list[str] = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                blob = bytes(blob)
                for k in range(max(1, -(-len(blob) // frame_bytes))):
                    frame = blob[k * frame_bytes : (k + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(k)
                    lens.append(len(frame))
                    digests.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    return media_df.select("doc_id", "media").mapInPandas(run, schema=FRAME_SCHEMA)


def media_dedup(media_df: DataFrame, keep: str = "min_id") -> DataFrame:
    """Exact dedup over the BINARY media column — every media row plus
    (media_md5, n_copies, is_kept): byte-identical payloads dedup to
    one keeper (lowest doc_id — deterministic), the l01 contract on
    blobs instead of text. The first media pass of any multimodal
    pipeline: byte-exact re-uploads/mirrors are the bulk of media
    duplication and need no decode to find (the l02-style perceptual
    tier would run AFTER this on the survivors).

    Shape: md5 runs JVM-side over the binary column (whole-stage
    codegen, no Python); ONE digest-keyed window ranks copies —
    digest keys are uniform by construction (cryptographic hash), so
    the shuffle cannot skew. At 100 TB the digest is 16 bytes per
    blob in the exchange, never the payload: the projection drops the
    media column before the shuffle and joins it back only if the
    caller selects it (Catalyst column pruning does this for free
    when downstream reads metadata only).
    """
    if keep != "min_id":
        raise ValueError(f"only keep='min_id' is supported, got {keep!r}")
    digest = F.md5(F.col("media"))
    # NULL payloads are NOT copies of each other: md5(NULL) is NULL
    # and a bare digest partition would glue every payload-less row
    # into one dup group (marking distinct docs as byte-identical —
    # code-review r8) AND funnel them through one skewed partition.
    # A doc_id salt on the NULL side makes each NULL row its own
    # singleton (n_copies 1, kept) inside the same single window
    # pass; for non-NULL digests the salt is a constant and changes
    # nothing.
    # Both columns ride ONE window spec (same partitioning AND
    # ordering) so the plan carries a single Exchange+Sort — the salt
    # must be a NAMED column for that: an inline expression is
    # re-aliased per window spec (_w0#14 vs _w0#18), which Catalyst
    # treats as two different partitionings and plans two shuffles
    # (r10 sweep, booked item (l)). The count needs the explicit
    # whole-partition frame: an ordered window's default frame stops
    # at the current row.
    w = Window.partitionBy("media_md5", "_null_salt").orderBy("doc_id")
    cw = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        media_df.withColumn("media_md5", digest)
        .withColumn(
            "_null_salt",
            F.when(F.col("media_md5").isNull(), F.col("doc_id")),
        )
        .withColumn("n_copies", F.count(F.lit(1)).over(cw).cast("long"))
        .withColumn("is_kept", F.row_number().over(w) == 1)
        .drop("_null_salt")
    )
