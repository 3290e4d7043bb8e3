"""Edge-input pins for the dedup operators — round-8 code-review
regressions: normalization order, empty-token SimHash fingerprints,
and the exact-GEMM id-type contract."""

import pytest
from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    normalized_text,
    simhash64,
    simhash_neardup_pairs,
)


def test_normalized_text_collapses_before_trim(spark):
    """'\\thello world' and 'hello world' are the same document:
    collapse-then-trim removes the leading tab entirely, while the
    old trim-then-collapse left a leading space and split the two
    into different digests."""
    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "\thello world"),
            (3, "hello world\n"),
            (4, "  hello   world  "),
            (5, "Hello\tWORLD"),
        ],
        "doc_id long, text string",
    )
    forms = {
        r["n"]
        for r in df.select(
            normalized_text("text").alias("n")
        ).collect()
    }
    assert forms == {"hello world"}
    out = exact_dedup(df)
    assert [r["doc_id"] for r in out.filter("is_kept").collect()] == [1]


def test_simhash64_empty_and_null_tokens_fingerprint_null(spark):
    """Zero tokens must NOT fingerprint to all-ones (every bit-count
    tie 0*2 >= 0 resolves to 1) — that value sits within max_hamming
    of any dense-popcount real document, making content-free docs
    near-dup hubs. NULL fingerprints fall out of the banded join."""
    df = spark.createDataFrame(
        [
            (1, ["a", "b", "c"]),
            (2, []),
            (3, None),
        ],
        "doc_id long, tokens array<string>",
    )
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", simhash64("tokens").alias("fp")).collect()
    }
    assert got[1] is not None and got[1] >= 0
    assert got[2] is None and got[3] is None


def test_simhash_pairs_exclude_empty_docs(spark):
    """An empty doc pairs with NOTHING — under the old all-ones
    fingerprint it paired with any ~dense-popcount document."""
    docs = spark.createDataFrame(
        [
            (1, ["x", "y", "z", "w"], "en"),
            (2, [], "en"),
            (3, [], "en"),
        ],
        "doc_id long, tokens array<string>, lang string",
    ).withColumn("simhash", simhash64("tokens"))
    pairs = simhash_neardup_pairs(docs, max_hamming=62).collect()
    ids = {i for r in pairs for i in (r["doc_a"], r["doc_b"])}
    assert 2 not in ids and 3 not in ids


def test_embedding_neardup_rejects_non_integral_ids(spark):
    """The exact GEMM tier's pair schema is BIGINT: a string/UUID id
    must fail AT THE BOUNDARY with the any-id-type sibling named,
    not mid-job with an opaque executor ValueError."""
    emb = spark.createDataFrame(
        [("u-1", [1.0, 0.0]), ("u-2", [1.0, 0.0])],
        "vec_id string, embedding array<double>",
    )
    with pytest.raises(TypeError, match="semantic_neardup_pairs"):
        embedding_neardup_pairs(emb)


def test_embedding_neardup_int_ids_still_work(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.9).collect()
    }
    assert got == {(1, 2)}


# --- round-8 batch-2 review pins (text/timeseries edge inputs) ----------


def test_repetition_signals_keeps_zero_token_docs(spark):
    """A whitespace-only doc must SURFACE (n_tokens 0, NULL ratios),
    not vanish through an inner join — it is exactly the degenerate
    doc a downstream quality gate needs to see."""
    from miningfrequentpattern_spark.operators.text import (
        repetition_signals,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_tokens"] == 3
    assert got[2]["n_tokens"] == 0 and got[2]["top_token_ratio"] is None
    assert got[3]["n_tokens"] == 0 and got[3]["dup_bigram_ratio"] is None


def test_chunk_with_overlap_skips_empty_docs(spark):
    """Zero-token documents produce NO chunks — not a phantom
    zero-length ''-text chunk per empty doc in the RAG index."""
    from miningfrequentpattern_spark.operators.text import (
        chunk_with_overlap,
    )

    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    rows = chunk_with_overlap(docs, chunk_size=4, overlap=1).collect()
    assert {r["doc_id"] for r in rows} == {1}
    assert all(r["chunk_len"] > 0 for r in rows)


def test_sequence_pack_zero_token_doc_spans_zero_chunks(spark):
    """An empty doc spans 0 chunks wherever its seq_start lands —
    the floor identity otherwise reported 0 on a chunk boundary but
    1 anywhere else, purely by position."""
    from miningfrequentpattern_spark.operators.text import sequence_pack

    docs = spark.createDataFrame(
        # one source, empty docs interleaved at different offsets
        [(1, "s", "a b c"), (2, "s", ""), (3, "s", "d e"),
         (4, "s", ""), (5, "s", "f")],
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_chunks"])
        for r in sequence_pack(docs, budget=4).collect()
    }
    for d, (n_tok, n_ch) in got.items():
        if n_tok == 0:
            assert n_ch == 0, (d, got[d])
        else:
            assert n_ch >= 1


def test_ewma_tiebreak_may_be_value_col(spark):
    """The streaming twins pass tiebreak_col=value_col (order by
    (ts, value)); selecting it beside the cast alias raised
    AMBIGUOUS_REFERENCE (code-review r8 regression)."""
    from pyspark.sql import functions as SF

    from miningfrequentpattern_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("k", 1, 10.0), ("k", 2, 20.0), ("k", 3, 15.0)],
        "k string, t long, v double",
    )
    got = {
        r["t"]: r["ewma"]
        for r in ewma(
            df, ["k"], "t", "v", alpha=0.5, tiebreak_col="v"
        ).collect()
    }
    assert got[1] == 10.0 and got[2] == 15.0 and got[3] == 15.0


def test_seasonal_profile_additive_identity_at_4dp(spark):
    """dow_mean + residual must reconstruct the value at 4dp IN THE
    OUTPUT ITSELF: both derived columns pivot on the rounded mean the
    dow_mean column emits (the rounded-pivot stance)."""
    import datetime

    from miningfrequentpattern_spark.operators.timeseries import (
        seasonal_profile,
    )

    # 7 Mondays whose mean has a non-zero 5th decimal:
    # values 1..7 scaled -> mean = 4.000057142857...
    base = datetime.datetime(2024, 1, 1)  # a Monday
    rows = [
        ("k", base + datetime.timedelta(weeks=i), 1.0 * (i + 1) + 0.0001 * (i % 3))
        for i in range(7)
    ]
    df = spark.createDataFrame(rows, "k string, day timestamp, n double")
    for r in seasonal_profile(df, ["k"], "day", "n").collect():
        assert abs((r["dow_mean"] + r["residual"]) - r["n"]) < 5e-5, r


def test_calibrated_gate_is_kept_matches_emitted_pct_rank(spark):
    """is_kept recomputed from the EMITTED pct_rank must agree with
    the column — the gate rounds before comparing, so output rows can
    never contradict the documented equivalence."""
    from miningfrequentpattern_spark.operators.text import (
        rank_calibrated_gate,
    )

    docs = spark.createDataFrame(
        [(i, "s", float(i % 37)) for i in range(200)],
        "doc_id long, src string, score double",
    )
    out = rank_calibrated_gate(
        docs, ["src"], "score", keep_frac=0.3, tiebreak_col="doc_id"
    ).collect()
    for r in out:
        assert r["is_kept"] == (r["pct_rank"] <= 0.3), r


def test_interval_overlap_join_boundary_end_correct(spark):
    """An interval ending exactly on a bucket boundary still joins
    correctly under the exact ceil-based fan (the old epsilon was
    below one double ulp at epoch magnitudes)."""
    from miningfrequentpattern_spark.operators.timeseries import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [("k", 0.0, 3600.0)], "k string, s double, e double"
    )
    right = spark.createDataFrame(
        [("k", 3500.0, 3700.0), ("k", 3600.0, 3800.0)],
        "k string, s double, e double",
    )
    got = {
        (r["b_start"], r["b_end"])
        for r in interval_overlap_join(
            left, right, ["k"], "s", "e", bucket="1 hour"
        ).collect()
    }
    # [0,3600) overlaps [3500,3700) but NOT [3600,3800) (half-open)
    assert got == {(3500.0, 3700.0)}


# --- round-8 batch-5 review pins (similarity/layout edges) --------------


def test_cosine_topk_exact_drops_null_vectors(spark):
    """A NULL query vector must emit NO rows (not k NULL-sim rows
    ranked by neighbor_id), and NULL corpus vectors never surface —
    the ANN tiers' boundary stance, now shared by the exact tier."""
    from miningfrequentpattern_spark.operators.similarity import (
        cosine_topk_exact,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    rows = cosine_topk_exact(emb, emb, k=2).collect()
    assert all(r["query_id"] != 3 for r in rows)
    assert all(r["neighbor_id"] != 3 for r in rows)
    assert all(r["cos_sim"] is not None for r in rows)


def test_ann_lsh_rejects_nonpositive_bucket_length(spark):
    from miningfrequentpattern_spark.operators.similarity import ann_lsh_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket_length"):
        ann_lsh_topk(emb, emb, bucket_length=0.0)
    with _pytest.raises(ValueError, match="bucket_length"):
        ann_lsh_topk(emb, emb, bucket_length=-1.0)


def test_pq_topk_missized_dim_raises(spark):
    """An explicit dim smaller than the real width silently trained on
    a vector PREFIX (recall collapse, no error) before the guard."""
    from miningfrequentpattern_spark.operators.similarity import pq_topk

    emb = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="vector length != dim"):
        pq_topk(
            emb, emb, k=2, n_subspaces=2, n_codes=4, dim=4
        ).collect()


def test_dir_parquet_bytes_skips_staging_dirs(tmp_path):
    """part files inside _temporary/ (a killed write) must not count —
    they are uncommitted data and would double compact_parquet's size
    estimate."""
    from miningfrequentpattern_spark.functions.layout import (
        dir_parquet_bytes,
    )

    d = tmp_path / "t"
    (d / "_temporary" / "0").mkdir(parents=True)
    (d / "part-00000.parquet").write_bytes(b"x" * 100)
    (d / "_temporary" / "0" / "part-00000.parquet").write_bytes(b"y" * 900)
    (d / "_SUCCESS").write_bytes(b"")
    assert dir_parquet_bytes(str(d)) == 100


def test_exact_dedup_rejects_annotation_collisions(spark):
    """r10 sweep (the 73e18de class): a docs frame already carrying
    content_hash/dup_rank/is_kept (a prior pass's output) was
    silently overwritten or ambiguously duplicated."""
    import pytest

    from miningfrequentpattern_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "a", 2)], "doc_id long, text string, dup_rank long"
    )
    with pytest.raises(ValueError, match="dup_rank"):
        exact_dedup(df)


def test_minhash_empty_and_degenerate_corpora_return_empty(spark):
    """r10 sweep: an empty corpus, all-NULL text, or every-doc-under-
    3-tokens corpus crashed CountVectorizer.fit ('vocabulary size
    should be > 0') instead of returning the empty pair set like the
    sibling embedding/semantic tiers."""
    from miningfrequentpattern_spark.operators.dedup import (
        minhash_neardup_pairs,
    )

    schema = "doc_id long, text string"
    for rows in ([], [(1, None)], [(1, "a b"), (2, "x")]):
        df = spark.createDataFrame(rows, schema)
        out = minhash_neardup_pairs(df)
        assert out.count() == 0
        assert out.columns == ["doc_a", "doc_b", "jaccard_dist"]


def test_minhash_vocab_truncation_raises_actionably(spark):
    """r10 sweep: CountVectorizer silently keeps only the top-df
    vocab_size shingles — survivors estimate a DIFFERENT Jaccard and
    unique-content docs zero out and crash MinHashLSH mid-job. The
    cap being hit must raise with the knob named."""
    import pytest

    from miningfrequentpattern_spark.operators.dedup import (
        minhash_neardup_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3} tok{i+4}") for i in range(8)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="vocab_size"):
        minhash_neardup_pairs(docs, vocab_size=4)


def test_simhash_rejects_degenerate_max_hamming(spark):
    """r10 sweep: max_hamming > 62 silently degenerated the banded
    equi-join to a per-block cross product (a width-0 band masks
    every fingerprint to 0); negatives divided by zero."""
    import pytest

    from miningfrequentpattern_spark.operators.dedup import (
        simhash_neardup_pairs,
    )

    fp = spark.createDataFrame([(1, 5)], "doc_id long, simhash long")
    for bad in (63, 70, -1):
        with pytest.raises(ValueError, match="max_hamming"):
            simhash_neardup_pairs(fp, max_hamming=bad)
    # the generalized n_bits bound (round-11 portable tier): the
    # pigeonhole budget shrinks with the fingerprint width, and n_bits
    # itself must leave the BIGINT sign bit alone
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_neardup_pairs(fp, max_hamming=28, n_bits=28)
    for bad_bits in (0, 64):
        with pytest.raises(ValueError, match="n_bits"):
            simhash_neardup_pairs(fp, max_hamming=1, n_bits=bad_bits)


@pytest.mark.slow  # driver test budget (VERDICT r11 item 2):
# heavyweight property/stream-twin cert, full-suite-only
def test_simhash_portable_banding_lossless_property(spark):
    """Hypothesis sweep of the pigeonhole-exactness claim the l02c
    oracle rests on: for ARBITRARY small corpora over a tie-heavy
    alphabet and ARBITRARY max_hamming in [0, 27], the 28-bit banded
    equi-join's pair set equals the naive all-pairs hamming filter.
    Random band widths exercise the uneven n_bits*b//bands bounds the
    fixed-corpus test cannot (a width-rounding bug would drop pairs
    only at specific hamming/width combinations)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F

    from miningfrequentpattern_spark.operators.dedup import (
        simhash_portable,
        simhash_portable_pairs,
    )

    word = st.text(alphabet="abcd", min_size=1, max_size=3)

    @given(
        texts=st.lists(
            st.lists(word, min_size=1, max_size=5).map(" ".join),
            min_size=2,
            max_size=6,
        ),
        max_h=st.integers(0, 27),
    )
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def _property(texts, max_h):
        docs = spark.createDataFrame(
            [(i, t, "xx") for i, t in enumerate(texts)],
            "doc_id long, text string, lang string",
        ).withColumn(
            "tokens",
            F.filter(F.split(F.trim("text"), r"\s+"),
                     lambda t: t != F.lit("")),
        )
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_portable_pairs(
                docs, block_col="lang", max_hamming=max_h
            ).collect()
        }
        fp = docs.withColumn("fp", simhash_portable("tokens")).filter(
            F.col("fp").isNotNull()
        )
        a, b = fp.alias("a"), fp.alias("b")
        naive = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in a.join(
                b, F.col("a.doc_id") < F.col("b.doc_id")
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
                .cast("long")
                .alias("hamming"),
            )
            .filter(F.col("hamming") <= max_h)
            .collect()
        }
        assert got == naive

    _property()


def test_simhash_portable_banded_equals_allpairs(spark):
    """Round-11 portable tier: the 28-bit banded equi-join's pair set
    must equal the naive all-pairs hamming filter (the pigeonhole
    exactness claim the l02c oracle relies on), and empty-token docs
    must pair with nothing (NULL fingerprint, the simhash64 stance)."""
    from pyspark.sql import functions as F

    from miningfrequentpattern_spark.operators.dedup import (
        SIMHASH_PORTABLE_BITS,
        simhash_portable,
        simhash_portable_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon", "en"),
            (2, "alpha beta gamma delta zeta", "en"),
            (3, "alpha beta gamma delta epsilon", "en"),
            (4, "totally different words entirely here", "en"),
            (5, "alpha beta gamma delta epsilon", "fr"),
            (6, "", "en"),
        ],
        "doc_id long, text string, lang string",
    ).withColumn("tokens", F.filter(F.split(F.trim("text"), r"\s+"),
                                    lambda t: t != F.lit("")))
    max_h = 6
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_portable_pairs(
            docs, block_col="lang", max_hamming=max_h
        ).collect()
    }
    fp = docs.withColumn("fp", simhash_portable("tokens")).filter(
        F.col("fp").isNotNull()
    )
    a, b = fp.alias("a"), fp.alias("b")
    naive = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.fp").bitwiseXOR(F.col("b.fp"))
            ).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_h)
        .collect()
    }
    assert got == naive
    # identical docs (1, 3) must pair at hamming 0; the empty doc 6
    # and the cross-lang twin 5 must appear in no pair
    assert (1, 3, 0) in got
    ids = {i for (x, y, _) in got for i in (x, y)}
    assert 6 not in ids  # empty doc: NULL fingerprint
    assert 5 not in ids  # alone in its lang block
    # fingerprints stay within the declared bit budget
    top = fp.agg(F.max("fp")).first()[0]
    assert 0 <= top < (1 << SIMHASH_PORTABLE_BITS)


def test_embedding_neardup_null_element_and_ragged(spark):
    """r10 sweep: a vector with a NULL element passed the
    vector-level isNotNull filter, numpy turned it into NaN, and
    every pair for that doc silently vanished (NaN > threshold is
    False); ragged widths crashed with numpy's opaque
    inhomogeneous-shape error. NULL-element vectors now ride the
    documented drop; ragged widths raise by name."""
    import pytest

    from miningfrequentpattern_spark.operators.dedup import (
        embedding_neardup_pairs,
    )

    ok = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])]
    base = spark.createDataFrame(
        ok, "doc_id long, embedding array<double>"
    )
    withnull = base.unionByName(
        spark.createDataFrame(
            [(4, [1.0, None])], "doc_id long, embedding array<double>"
        )
    )
    want = sorted(
        map(tuple, embedding_neardup_pairs(base, threshold=0.9, id_col="doc_id").collect())
    )
    got = sorted(
        map(tuple, embedding_neardup_pairs(withnull, threshold=0.9, id_col="doc_id").collect())
    )
    assert got == want and len(got) == 1  # (1,2) pair only
    ragged = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0, 5.0])],
        "doc_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="mixed vector widths"):
        embedding_neardup_pairs(ragged, threshold=0.1, id_col="doc_id", num_blocks=1).collect()
