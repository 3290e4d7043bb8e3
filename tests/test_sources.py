"""Source/sink & file-layout maintenance tests (SURVEY.md §2.1)."""

from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE, SF_SMOKE

def test_compact_parquet_shrinks_files_preserves_rows(spark, tmp_path):
    """Small-file compaction: a 64-file write compacts to the computed
    target count, content survives exactly, and range clustering gives
    disjoint per-file key ranges (the min/max skipping precondition)."""
    from miningfrequentpattern_spark.functions.layout import (
        compact_parquet,
        dir_parquet_bytes,
    )

    li = load_table(spark, SF_SMOKE, "lineitem")
    src = str(tmp_path / "fragmented")
    li.repartition(64).write.parquet(src)
    dst = str(tmp_path / "compacted")
    target = max(1, dir_parquet_bytes(src) // 4)
    n = compact_parquet(spark, src, dst, target_file_bytes=target,
                        sort_cols=["l_orderkey"])
    import glob

    files = glob.glob(f"{dst}/*.parquet")
    # repartitionByRange samples boundaries, so it may produce FEWER
    # non-empty partitions than requested — assert the contract it
    # actually gives (bounded above by the computed count).
    assert 1 <= len(files) <= n <= 8
    back = spark.read.parquet(dst)
    assert back.count() == li.count()
    assert back.exceptAll(li).isEmpty() and li.exceptAll(back).isEmpty()
    # Range clustering: per-file [min,max] of the sort key must not
    # overlap across files.
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["l_orderkey"])
        col = t.column(0)
        if len(col):
            import pyarrow.compute as pc

            ranges.append(
                (pc.min(col).as_py(), pc.max(col).as_py())
            )
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file key ranges overlap"


def test_dir_parquet_bytes_raises_on_no_files(tmp_path):
    """A path with no locally-visible data files (empty dir, sidecar
    -only dir, or any non-local URI os.walk can't see) must raise
    instead of returning 0 — a 0-byte estimate would make
    compact_parquet plan a single-task rewrite of an arbitrarily large
    dataset. Extensionless part files (Hive-style) DO count."""
    import pytest

    from miningfrequentpattern_spark.functions.layout import (
        dir_parquet_bytes,
    )

    empty = tmp_path / "nothing"
    empty.mkdir()
    (empty / "_SUCCESS").write_text("")
    (empty / ".hidden.crc").write_text("x")
    with pytest.raises(FileNotFoundError, match="no data files"):
        dir_parquet_bytes(str(empty))
    with pytest.raises(FileNotFoundError):
        dir_parquet_bytes("s3://bucket/prefix")
    hive = tmp_path / "hive"
    hive.mkdir()
    (hive / "part-00000").write_bytes(b"x" * 128)
    assert dir_parquet_bytes(str(hive)) == 128


def test_polymorphic_udtf_matches_native_shingles(spark):
    """ngram_wide's analyze-time schema and eval fan-out must agree
    with the native explode(shingles(n=3)) path on occurrence counts
    (the UDTF is the extension-point proof; shingles is production —
    shingles() deduplicates per doc, so compare on the distinct
    per-doc trigram sets)."""
    from pyspark.sql import functions as F

    from miningfrequentpattern_spark.functions.udtf import register_udtfs
    from miningfrequentpattern_spark.operators.dedup import shingles
    from miningfrequentpattern_spark.operators.text import tokens

    register_udtfs(spark)
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.createOrReplaceTempView("docs_udtf_test")
    via_udtf = spark.sql(
        """
        SELECT DISTINCT d.doc_id, concat_ws(' ', t.w1, t.w2, t.w3) AS sh
        FROM docs_udtf_test d, LATERAL ngram_wide(d.text, 3) t
        """
    )
    via_native = (
        docs.withColumn("toks", tokens("text"))
        .select("doc_id", F.explode(shingles("toks", 3)).alias("sh"))
    )
    assert via_udtf.exceptAll(via_native).count() == 0
    assert via_native.exceptAll(via_udtf).count() == 0


def test_polymorphic_udtf_rejects_bad_n(spark):
    """analyze() must reject a non-constant or out-of-range n at PLAN
    time (AnalysisException on the driver), before any task runs."""
    import pytest
    from pyspark.errors import AnalysisException

    from miningfrequentpattern_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    spark.range(1).selectExpr("'a b c' AS text").createOrReplaceTempView(
        "one_doc_udtf_test"
    )
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT * FROM one_doc_udtf_test, "
            "LATERAL ngram_wide(text, 0) t"
        ).collect()


def test_read_transactions_text_edge_lines(spark, tmp_path):
    """FIMI-file robustness (code-review r8): blank lines vanish
    (not a one-empty-item basket), repeated separators don't inject
    '' items, and a regex-metacharacter separator ('|') is treated
    literally instead of alternation-splitting every character."""
    from miningfrequentpattern_spark.sources.io import (
        read_transactions_text,
    )

    p = tmp_path / "t.txt"
    p.write_text("a b c\n\nb  c\n   \nc a\n")
    baskets = [
        r["items"]
        for r in read_transactions_text(spark, str(p))
        .orderBy("txn_id")
        .collect()
    ]
    assert baskets == [["a", "b", "c"], ["b", "c"], ["a", "c"]]
    assert all("" not in b for b in baskets)

    p2 = tmp_path / "pipe.txt"
    p2.write_text("milk|bread\nbread|eggs||milk\n")
    baskets2 = [
        r["items"]
        for r in read_transactions_text(spark, str(p2), sep="|")
        .orderBy("txn_id")
        .collect()
    ]
    assert baskets2 == [["bread", "milk"], ["bread", "eggs", "milk"]]


def test_load_table_normalizes_bigint_nanos_for_orders_too(
    spark, tmp_path
):
    """The BIGINT-epoch-nanos guard covers every column the fixture
    history has shipped as TIMESTAMP(NANOS) — keying it on
    events-only would silently type-break orders.o_orderdate on a
    regeneration (code-review r8)."""
    import datetime

    sf = tmp_path / "sf"
    sf.mkdir()
    ns = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z in nanos
    spark.createDataFrame(
        [(1, ns)], "o_orderkey long, o_orderdate long"
    ).write.parquet(str(sf / "orders.parquet"))
    got = load_table(spark, str(sf), "orders")
    assert dict(got.dtypes)["o_orderdate"] == "timestamp"
    row = got.collect()[0]
    assert row["o_orderdate"] == datetime.datetime(2024, 1, 1)


def test_u05_empty_vector_filtered_and_ragged_raises(spark, tmp_path):
    """u05's Arrow centroid kernel: empty vectors are filtered at the
    boundary (the u04 r8 fix, extended to this twin in the r9 sweep)
    and ragged dims within a label raise naming the defect instead of
    reshape's opaque ValueError / silent shear."""
    import pytest
    from pyspark.sql import functions as F

    from miningfrequentpattern_spark.queries.registry import (
        QUERIES,
        load_all_packs,
    )
    from miningfrequentpattern_spark.sources.io import load_table

    load_all_packs()
    q = QUERIES["u05_arrow_grouped_centroids"]

    base = load_table(spark, SF_ORACLE, "embeddings")

    # empty vectors are dropped like NULLs: same centroids as without
    d_empty = str(tmp_path / "empty")
    base.unionByName(
        base.limit(2).withColumn(
            "embedding", F.array().cast(base.schema["embedding"].dataType)
        )
    ).write.mode("overwrite").parquet(f"{d_empty}/embeddings.parquet")
    clean = {tuple(r) for r in q(spark, SF_ORACLE).collect()}
    withempty = {tuple(r) for r in q(spark, d_empty).collect()}
    assert clean == withempty and len(clean) == 10

    # ragged dims within a label raise actionably
    d_rag = str(tmp_path / "ragged")
    base.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 7 == 0, F.slice("embedding", 1, 8))
        .otherwise(F.col("embedding")),
    ).write.mode("overwrite").parquet(f"{d_rag}/embeddings.parquet")
    with pytest.raises(Exception, match="ragged"):
        q(spark, d_rag).collect()

    # ragged dims whose element TOTAL divides evenly by the row count
    # (ADVICE r9): a 2-row group with dims 6 and 10 passed the old
    # `len(flat) % len(table)` divisibility check (16 % 2 == 0) and
    # reshape(2, 8) silently sheared every row — the per-row length
    # check must raise here too.
    import pandas as pd

    d_shear = str(tmp_path / "shear")
    (tmp_path / "shear").mkdir()
    pd.DataFrame(
        {
            "vec_id": pd.array([1, 2], dtype="int64"),
            "embedding": [
                [float(i) for i in range(6)],
                [float(i) for i in range(10)],
            ],
            "label": pd.array([3, 3], dtype="int32"),
        }
    ).to_parquet(f"{d_shear}/embeddings.parquet")
    with pytest.raises(Exception, match="ragged"):
        q(spark, d_shear).collect()


def test_orc_roundtrip_empty_input_returns_empty(spark, tmp_path):
    """code-review r10: an EMPTY slice written to ORC/parquet leaves a
    fileless directory; a schema-inferred read-back then throws
    UNABLE_TO_INFER_SCHEMA instead of returning the empty relation
    the round-trip contract owes (the s04/s05 pin, extended to
    read_orc and s10's read-back)."""
    from pyspark.sql import functions as F

    from miningfrequentpattern_spark.sources.io import (
        load_table,
        read_orc,
        write_orc,
    )

    p = load_table(spark, SF_ORACLE, "part").filter(F.lit(False))
    path = str(tmp_path / "orc_empty")
    write_orc(p, path)
    back = read_orc(spark, path, schema=p.schema)
    assert back.count() == 0
    assert back.columns == p.columns
