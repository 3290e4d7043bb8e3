"""Partitioned MERGE upsert (sources/io.py::merge_upsert_partitioned) —
PROMOTED round 7 as s16_merge_upsert: the DuckDB oracle moved VERBATIM
into the @query registration (tests/test_oracle_parity.py now
carries the compare); the property/edge/hand pins stay here."""

import os

from pyspark.sql import functions as F

from miningfrequentpattern_spark.sources.io import (
    load_table,
    merge_upsert_partitioned,
)

from .conftest import SF_ORACLE
from .oracle import compare

def test_merge_upsert_leaves_untouched_partition_files_alone(
    spark, tmp_path
):
    """The 100 TB contract at the FILE level: partitions absent from
    the update batch keep their exact parquet files (same names, same
    mtimes) — dynamic overwrite surgically replaced only the touched
    partition directory."""
    path = str(tmp_path / "t")
    orders = load_table(spark, SF_ORACLE, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(
        path
    )

    def files_of(priority):
        d = os.path.join(path, f"o_orderpriority={priority}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_low = files_of("5-LOW")
    before_urgent = files_of("1-URGENT")
    updates = (
        spark.read.schema(orders.schema).parquet(path)
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderkey") % 10 == 0)
        )
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    merge_upsert_partitioned(
        spark, path, updates, ["o_orderkey"], "o_orderpriority"
    )
    assert files_of("5-LOW") == before_low  # untouched: same files
    assert files_of("1-URGENT") != before_urgent  # touched: rewritten


def test_merge_upsert_inserts_new_keys_and_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "k long, p string, v double",
    )
    base.write.mode("overwrite").partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(2, "a", 99.0, "U"),   # update existing
         (4, "a", 40.0, "U"),   # insert new key
         (1, "a", 0.0, "D")],   # delete
        "k long, p string, v double, _op string",
    )
    merge_upsert_partitioned(
        spark, path, updates, ["k"], "p", op_col="_op"
    )
    got = {
        (r["k"], r["p"]): r["v"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {(2, "a"): 99.0, (4, "a"): 40.0, (3, "b"): 30.0}


def test_merge_upsert_rejects_null_keys_and_schema_drift(spark, tmp_path):
    import pytest

    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a", 1.0)], "k long, p string, v double")
    base.write.mode("overwrite").partitionBy("p").parquet(path)
    null_key = spark.createDataFrame(
        [(None, "a", 2.0)], "k long, p string, v double"
    )
    with pytest.raises(ValueError, match="NULL merge key"):
        merge_upsert_partitioned(spark, path, null_key, ["k"], "p")
    drifted = spark.createDataFrame([(1, "a")], "k long, p string")
    with pytest.raises(ValueError, match="schema must match"):
        merge_upsert_partitioned(spark, path, drifted, ["k"], "p")


def test_merge_upsert_delete_entire_partition_removes_files(
    spark, tmp_path
):
    """ADVICE r6 (medium): a delete batch that tombstones EVERY row of
    a touched partition produces zero output rows for it — dynamic
    overwrite alone would leave the old files, resurrecting the
    "deleted" keys on the next read. The emptied partition's directory
    must be gone (and other partitions untouched)."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "k long, p string, v double",
    )
    base.write.mode("overwrite").partitionBy("p").parquet(path)
    # tombstone ALL of partition a; nothing re-inserted there
    updates = spark.createDataFrame(
        [(1, "a", 0.0, "D"), (2, "a", 0.0, "D")],
        "k long, p string, v double, _op string",
    )
    merge_upsert_partitioned(spark, path, updates, ["k"], "p", op_col="_op")
    got = {(r["k"], r["p"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {(3, "b"): 30.0}
    assert not os.path.isdir(os.path.join(path, "p=a"))
    assert os.path.isdir(os.path.join(path, "p=b"))


def test_merge_upsert_delete_one_of_two_emptied_partitions(spark, tmp_path):
    """Mixed batch: one touched partition is emptied (dir removed),
    the other keeps surviving rows (rewritten in place)."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "b", 30.0)],
        "k long, p string, v double",
    )
    base.write.mode("overwrite").partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(1, "a", 0.0, "D"), (2, "b", 0.0, "D")],
        "k long, p string, v double, _op string",
    )
    merge_upsert_partitioned(spark, path, updates, ["k"], "p", op_col="_op")
    got = {(r["k"], r["p"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {(3, "b"): 30.0}
    assert not os.path.isdir(os.path.join(path, "p=a"))


def test_merge_upsert_escaped_partition_value_cleanup(spark, tmp_path):
    """Partition values Spark escapes in directory names (here a
    space + colon) still match the emptied-partition cleanup — names
    are unescaped and compared, never re-formatted."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "with space:colon", 1.0), (2, "plain", 2.0)],
        "k long, p string, v double",
    )
    base.write.mode("overwrite").partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(1, "with space:colon", 0.0, "D")],
        "k long, p string, v double, _op string",
    )
    merge_upsert_partitioned(spark, path, updates, ["k"], "p", op_col="_op")
    got = {(r["k"], r["p"]) for r in spark.read.parquet(path).collect()}
    assert got == {(2, "plain")}
    dirs = [d for d in os.listdir(path) if d.startswith("p=")]
    assert len(dirs) == 1 and "plain" in dirs[0]


def test_merge_upsert_rejects_cross_partition_key_move(spark, tmp_path):
    """ADVICE r6 (low): an update that carries a DIFFERENT partition
    value than the key's base row is a cross-partition move — the
    detectable case (both partitions touched) must raise, not leave a
    stale duplicate."""
    import pytest

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)],
        "k long, p string, v double",
    )
    base.write.mode("overwrite").partitionBy("p").parquet(path)
    # key 1 lives in partition a, but the update claims partition b —
    # and partition a is ALSO touched (key 9 insert), so the base row
    # of key 1 is inside the touched slice and the move is visible.
    updates = spark.createDataFrame(
        [(1, "b", 99.0), (9, "a", 9.0)],
        "k long, p string, v double",
    )
    with pytest.raises(ValueError, match="moves a key across"):
        merge_upsert_partitioned(spark, path, updates, ["k"], "p")


def test_merge_upsert_null_partition_survivors_kept(spark, tmp_path):
    """NULL partition values are legal (__HIVE_DEFAULT_PARTITION__)
    and must behave like any other partition under MERGE: plain
    equality joins never match NULL to NULL, which silently dropped
    every non-updated base row of the NULL partition and then
    tombstoned the whole directory (code-review r8 regression)."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "p1", 30.0)],
        "k long, p string, v double",
    )
    base.write.mode("overwrite").partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(2, None, 99.0)], "k long, p string, v double"
    )
    merge_upsert_partitioned(spark, path, updates, ["k"], "p")
    got = {
        (r["k"], r["p"], r["v"])
        for r in spark.read.parquet(path).collect()
    }
    # k=1 (non-updated NULL-partition row) must SURVIVE
    assert got == {(1, None, 10.0), (2, None, 99.0), (3, "p1", 30.0)}
    assert os.path.isdir(
        os.path.join(path, "p=__HIVE_DEFAULT_PARTITION__")
    )


def test_merge_upsert_null_partition_tombstone_cleans_dir(
    spark, tmp_path
):
    """An all-tombstoned NULL partition is cleaned up like a named
    one: the emptied-partition anti-join must match NULL null-safely
    or the deleted keys resurface on the next read."""
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, None, 10.0), (3, "p1", 30.0)], "k long, p string, v double"
    ).write.mode("overwrite").partitionBy("p").parquet(path)
    dels = spark.createDataFrame(
        [(1, None, 10.0, "d")], "k long, p string, v double, op string"
    )
    merge_upsert_partitioned(
        spark, path, dels, ["k"], "p", op_col="op", delete_marker="d"
    )
    got = {(r["k"], r["p"]) for r in spark.read.parquet(path).collect()}
    assert got == {(3, "p1")}
    assert not os.path.isdir(
        os.path.join(path, "p=__HIVE_DEFAULT_PARTITION__")
    )


def test_merge_upsert_partition_col_in_keys(spark, tmp_path):
    """The contract note's recommended configuration — make the
    partition column part of the merge key — must work: re-selecting
    it beside the keys duplicated the column and broke the USING join
    with AMBIGUOUS_REFERENCE (code-review r8 regression). With the
    partition in the key a cross-partition move is impossible by
    construction, so the move check is skipped, not crashed."""
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "k long, p string, v double",
    ).write.mode("overwrite").partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(2, "a", 99.0), (4, "b", 40.0)], "k long, p string, v double"
    )
    merge_upsert_partitioned(spark, path, updates, ["k", "p"], "p")
    got = {
        (r["k"], r["p"], r["v"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, "a", 10.0), (2, "a", 99.0), (3, "b", 30.0), (4, "b", 40.0)
    }


def test_merge_upsert_null_base_key_survives_once(spark, tmp_path):
    """Base rows with a NULL merge key (legacy data — updates can
    never carry one, the guard raises) must survive a merge touching
    their partition EXACTLY once: the survivors anti-join is
    null-safe by construction (ADVICE r8), so a NULL base key neither
    matches an update nor duplicates."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(None, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "k long, p string, v double",
    )
    base.write.mode("overwrite").partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(2, "a", 99.0)], "k long, p string, v double"
    )
    merge_upsert_partitioned(spark, path, updates, ["k"], "p")
    rows = [
        (r["k"], r["p"], r["v"]) for r in spark.read.parquet(path).collect()
    ]
    assert sorted(rows, key=str) == sorted(
        [(None, "a", 10.0), (2, "a", 99.0), (3, "b", 30.0)], key=str
    )


def test_merge_upsert_boolean_partition_tombstone_cleanup(
    spark, tmp_path
):
    """Spark renders boolean partition dirs lowercase ('p=true');
    the emptied-dir matcher must render Python True the same way or
    the tombstoned directory survives and resurrects its keys
    (code-review r8 regression)."""
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, True, 1.0), (2, False, 2.0)], "k long, p boolean, v double"
    ).write.mode("overwrite").partitionBy("p").parquet(path)
    assert os.path.isdir(os.path.join(path, "p=true"))
    dels = spark.createDataFrame(
        [(1, True, 1.0, "d")], "k long, p boolean, v double, op string"
    )
    # partition-dir type inference yields STRING for 'true'/'false';
    # a boolean-partitioned table must state its schema explicitly
    # (the cast from the dir name is exact)
    schema = spark.createDataFrame(
        [], "k long, v double, p boolean"
    ).schema
    merge_upsert_partitioned(
        spark, path, dels, ["k"], "p",
        op_col="op", delete_marker="d", base_schema=schema,
    )
    got = {
        (r["k"], r["p"])
        for r in spark.read.schema(schema).parquet(path).collect()
    }
    assert got == {(2, False)}
    assert not os.path.isdir(os.path.join(path, "p=true"))


def test_merge_upsert_null_op_is_upsert_not_delete(spark, tmp_path):
    """A NULL op value must act as an UPSERT per the contract ('every
    other op value is an upsert') — plain != delete_marker evaluated
    NULL and silently DELETED the key (code-review r9, the
    silent-data-loss finding: a CDC feed with a missing op field)."""
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0)], "k long, p string, v double"
    ).write.mode("overwrite").partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(1, "a", 99.0, None), (2, "a", 0.0, "d")],
        "k long, p string, v double, op string",
    )
    merge_upsert_partitioned(
        spark, path, updates, ["k"], "p", op_col="op", delete_marker="d"
    )
    got = {
        (r["k"], r["v"]) for r in spark.read.parquet(path).collect()
    }
    assert got == {(1, 99.0)}  # k=1 upserted, k=2 deleted


def test_merge_upsert_duplicate_batch_keys_raise(spark, tmp_path):
    """Duplicate merge keys within one batch raise on the shared
    primitive (code-review r9: the guard lived only in the
    cdc_merge_stream wrapper; direct callers silently got two rows
    for one key)."""
    import pytest

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10.0)], "k long, p string, v double"
    ).write.mode("overwrite").partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(1, "a", 1.0), (1, "a", 2.0)], "k long, p string, v double"
    )
    with pytest.raises(ValueError, match="duplicate merge key"):
        merge_upsert_partitioned(spark, path, updates, ["k"], "p")
    assert spark.read.parquet(path).count() == 1  # untouched


def test_merge_upsert_type_drift_raises(spark, tmp_path):
    """Same column NAMES but drifted TYPES must be rejected — a silent
    union coercion writes mixed physical types across partitions
    (code-review r9)."""
    import pytest

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10.0)], "k long, p string, v double"
    ).write.mode("overwrite").partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(1, "a", "not-a-double")], "k long, p string, v string"
    )
    with pytest.raises(ValueError, match="type"):
        merge_upsert_partitioned(spark, path, updates, ["k"], "p")
    assert spark.read.parquet(path).count() == 1


def test_merge_upsert_nested_nullability_is_not_drift(spark, tmp_path):
    """ADVICE r9: the drift guard compares nullability-NORMALIZED
    types. An updates batch whose array<double> differs from the base
    only in containsNull (array(lit(...)) builds containsNull=false;
    parquet round-trips read back true) is a lossless union and must
    NOT be rejected."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", [10.0, 20.0])], "k long, p string, v array<double>"
    ).write.mode("overwrite").partitionBy("p").parquet(path)
    updates = spark.createDataFrame([(1, "a")], "k long, p string").select(
        "k", "p", F.array(F.lit(1.5), F.lit(2.5)).alias("v")
    )
    base_n = [f for f in spark.read.parquet(path).schema if f.name == "v"]
    up_n = [f for f in updates.schema if f.name == "v"]
    # precondition: the two sides really do differ only in containsNull
    assert base_n[0].dataType != up_n[0].dataType
    assert (
        base_n[0].dataType.simpleString() == up_n[0].dataType.simpleString()
    )
    merge_upsert_partitioned(spark, path, updates, ["k"], "p")
    got = spark.read.parquet(path).collect()
    assert len(got) == 1 and list(got[0]["v"]) == [1.5, 2.5]


def test_merge_upsert_unrenderable_emptied_partition_fails_fast(
    spark, tmp_path
):
    """A tombstone batch emptying a TIMESTAMP partition must fail
    BEFORE the write (Python str() of a timestamp never matches
    Spark's directory rendering, so cleanup would miss) — and fail
    fast means the table is untouched, not half-mutated
    (code-review r9)."""
    import pytest

    path = str(tmp_path / "t")
    spark.sql(
        "SELECT 1L AS k, TIMESTAMP'2024-01-01 00:00:00.5' AS p, "
        "10.0 AS v"
    ).write.mode("overwrite").partitionBy("p").parquet(path)
    dels = spark.sql(
        "SELECT 1L AS k, TIMESTAMP'2024-01-01 00:00:00.5' AS p, "
        "10.0 AS v, 'd' AS op"
    )
    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    with pytest.raises(ValueError, match="cannot safely clean up"):
        merge_upsert_partitioned(
            spark, path, dels, ["k"], "p", op_col="op", delete_marker="d"
        )
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert before == after  # fail-fast: nothing mutated
