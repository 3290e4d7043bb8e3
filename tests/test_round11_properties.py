"""Round-11 property tests: Python references for the portable-hash
operators upgraded/staged this round, plus two core primitives that
previously had only fixed-case pins.

Same harness conventions as tests/test_properties.py: small random
inputs over tie-heavy alphabets, max_examples kept low (each example
runs Spark jobs), deadline off.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

import pytest
# Driver test budget (VERDICT r11 item 2, pytest.ini): this whole
# randomized-property suite is `slow` — excluded from the default
# driver-budget run, re-proven by the builder's full-suite close.
pytestmark = pytest.mark.slow


WORD = st.text(alphabet="abc", min_size=1, max_size=4)
TEXT = st.lists(WORD, min_size=0, max_size=8).map(" ".join)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _md5_28(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _simhash28_ref(tokens: list[str]) -> int | None:
    """Pure-Python Charikar frequency-vote SimHash over md5-28bit
    token hashes — the reference simhash_portable must equal."""
    if not tokens:
        return None
    hs = [_md5_28(t) for t in tokens]
    fp = 0
    for i in range(28):
        votes = sum(1 for h in hs if (h >> i) & 1)
        if 2 * votes >= len(tokens):
            fp |= 1 << i
    return fp


def test_simhash_portable_matches_python_reference(spark):
    """The native 28-bit fingerprint expression equals the pure-Python
    Charikar reference for ANY token multiset (frequency-weighted
    votes, ties to 1, empty -> NULL)."""
    from miningfrequentpattern_spark.operators.dedup import (
        simhash_portable,
    )

    @given(docs=st.lists(TEXT, min_size=1, max_size=6))
    @settings(**_SETTINGS)
    def _property(docs):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)],
            "doc_id long, text string",
        ).withColumn(
            "tokens",
            F.filter(F.split(F.trim("text"), r"\s+"),
                     lambda t: t != F.lit("")),
        )
        got = {
            r["doc_id"]: r["fp"]
            for r in df.select(
                "doc_id", simhash_portable("tokens").alias("fp")
            ).collect()
        }
        for i, t in enumerate(docs):
            assert got[i] == _simhash28_ref(t.split())

    _property()


def test_minhash_portable_matches_python_reference(spark):
    """minhash_portable_pairs equals a pure-Python all-pairs MinHash:
    word-3-gram shingles, md5-28bit base hashes, the affine
    permutations from minhash_coeffs, signature-agreement Jaccard
    estimates, threshold filter — certifying both the signatures and
    the banding's losslessness on arbitrary corpora (the fixture
    oracle pins one corpus; this pins the algorithm)."""
    from miningfrequentpattern_spark.operators.dedup import (
        MINHASH_PRIME,
        minhash_coeffs,
        minhash_portable_pairs,
    )

    num_perm = 6
    a_c, b_c = minhash_coeffs(num_perm)

    def sig(tokens: list[str]) -> list[int] | None:
        sh = sorted({
            " ".join(tokens[i : i + 3])
            for i in range(len(tokens) - 2)
        })
        if not sh:
            return None
        xs = [_md5_28(s) for s in sh]
        return [
            min((a_c[i] * x + b_c[i]) % MINHASH_PRIME for x in xs)
            for i in range(num_perm)
        ]

    @given(
        docs=st.lists(
            st.lists(WORD, min_size=0, max_size=7).map(" ".join),
            min_size=2,
            max_size=6,
        ),
        threshold=st.sampled_from([0.2, 0.5, 1.0]),
    )
    @settings(**_SETTINGS)
    def _property(docs, threshold):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)],
            "doc_id long, text string",
        ).withColumn(
            "tokens",
            F.filter(F.split(F.trim("text"), r"\s+"),
                     lambda t: t != F.lit("")),
        )
        got = {
            (r["doc_a"], r["doc_b"], r["est_jaccard"])
            for r in minhash_portable_pairs(
                df, num_perm=num_perm, threshold=threshold
            ).collect()
        }
        sigs = {i: sig(t.split()) for i, t in enumerate(docs)}
        want = set()
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                si, sj = sigs[i], sigs[j]
                if si is None or sj is None:
                    continue
                est = sum(x == y for x, y in zip(si, sj)) / num_perm
                if round(est, 4) >= threshold:
                    want.add((i, j, round(est, 4)))
        assert got == want

    _property()


def test_global_row_number_matches_sorted_enumerate(spark):
    """The two-phase distributed rank equals sorted-enumerate for ANY
    rows and partition count — including ties broken by the unique
    id, empty-partition layouts (num_partitions > rows), and
    single-partition degeneracy."""
    from miningfrequentpattern_spark.operators.relational import (
        global_row_number,
    )

    @given(
        vals=st.lists(st.integers(-5, 5), min_size=0, max_size=30),
        nparts=st.sampled_from([1, 3, 8, 40]),
    )
    @settings(**_SETTINGS)
    def _property(vals, nparts):
        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(
            rows, "id long, v long"
        ) if rows else spark.createDataFrame([], "id long, v long")
        got = {
            r["id"]: r["global_rank"]
            for r in global_row_number(
                df,
                [F.col("v").asc(), F.col("id").asc()],
                num_partitions=nparts,
            ).collect()
        }
        want = {
            rid: rank + 1
            for rank, (rid, _) in enumerate(
                sorted(rows, key=lambda r: (r[1], r[0]))
            )
        }
        assert got == want

    _property()


def test_bucket16_matches_python_floor(spark):
    """bucket16 equals the Python floor((v-lo)*65536/span) clamped
    reference for ANY integer domain — same IEEE double division,
    same floor, same clamp (the staged r12 zorder precondition)."""
    from miningfrequentpattern_spark.functions.zorder import bucket16

    @given(
        lo=st.integers(-(10**6), 10**6),
        width=st.integers(0, 10**7),
        offs=st.lists(
            st.integers(-(10**5), 2 * 10**7), min_size=1, max_size=12
        ),
    )
    @settings(**_SETTINGS)
    def _property(lo, width, offs):
        hi = lo + width
        vals = [lo + o for o in offs]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = [
            r["b"]
            for r in df.orderBy("v").select(
                "v",
                bucket16(F.col("v"), F.lit(lo), F.lit(hi)).alias("b"),
            ).collect()
        ]
        span = hi - lo + 1
        want = [
            min(max(int((v - lo) * 65536 / span // 1), 0), 65535)
            for v in sorted(vals)
        ]
        assert got == want

    _property()
