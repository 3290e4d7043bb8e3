"""Python UDTF surface (SURVEY.md §2.6 U3).

A user-defined TABLE function — one input row, many output rows — is
the remaining UDF shape after scalar pandas UDFs (vectors.py),
grouped-map (t05), and mapInPandas (multimodal.py). The tokenizer
below is deliberately simple; the point registered queries exercise is
the UDTF plumbing itself: lateral-join expansion through spark.sql.

UDTFs run row-at-a-time in Python — the SLOWEST surface in the engine
(SURVEY.md §2.6 policy). Real pipelines should prefer explode(split())
(native) for this exact job; the UDTF exists to prove the extension
point works, and its test asserts it agrees with the native form.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token STRING, token_len INT")
class TokenizeUDTF:
    """Emit one row per whitespace token of the input text."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for tok in text.split():
            yield tok, len(tok)


@udtf
class NgramWideUDTF:
    """POLYMORPHIC UDTF (Spark 4 `analyze` surface): emit one row per
    word n-gram of the input text, as n separate columns w1..wn —
    the OUTPUT SCHEMA is computed at plan time from the constant
    second argument, the capability a fixed `returnType` cannot
    express. `analyze` runs on the DRIVER during resolution (type
    checks raise as AnalysisException before any task launches);
    `eval` then runs row-at-a-time on executors like any UDTF."""

    @staticmethod
    def analyze(text, n):  # noqa: D102
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if not isinstance(n.value, int) or isinstance(n.value, bool) or not (
            1 <= n.value <= 16
        ):
            raise ValueError(
                "ngram_wide(text, n): n must be a constant integer in "
                f"[1, 16], got {n.value!r}"
            )
        schema = StructType()
        for i in range(n.value):
            schema = schema.add(f"w{i + 1}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None:
            return
        # str.split() splits on \s+ runs; the u07 oracle splits on
        # single spaces. They agree ONLY under the fixture invariant
        # (ASCII, single-spaced, trimmed) asserted loudly in
        # tests/test_fixture_invariants.py — same contract every
        # string_split-based oracle in llm_pack leans on. A fixture
        # regeneration with tabs/double spaces fails THERE, not as an
        # opaque u07 hash mismatch.
        toks = text.split()
        for i in range(len(toks) - n + 1):
            yield tuple(toks[i : i + n])


@udtf(
    returnType=(
        "user_id BIGINT, session_start TIMESTAMP, n_events BIGINT, "
        "last_ts TIMESTAMP"
    )
)
class SessionizeUDTF:
    """TABLE-argument UDTF (Spark 4): per-user 30-minute-gap
    sessionization driven by `PARTITION BY user_id ORDER BY ts` in
    the call site — Spark hands each partition's rows, in order, to
    a FRESH instance and calls terminate() at partition end, so the
    running state below can never bleed across users. This is the
    imperative-stateful surface a SQL window can only emulate with
    gaps-and-islands; the u08 oracle IS that emulation (the t03
    SHAPE with u08's own boundary), certifying the two formulations
    against each other. Boundary pin (code-review r9 — the old
    docstring claimed the opposite): a gap of EXACTLY the threshold
    STARTS a new session here (>=, mirrored by `>=` in the u08
    oracle), whereas t03's NATIVE session_window MERGES at
    exactly-gap (its oracle uses strict >) — the two oracles differ
    by that ONE character on purpose; never sync them blindly.
    NULL-ts rows carry no event time and are DROPPED (they would
    otherwise arrive FIRST under Spark's NULLS FIRST ordering,
    initialize state to a None start, and either lose the first real
    row's count or crash on timestamp arithmetic mid-partition);
    the u08 oracle filters them identically.
    Row-at-a-time Python — the extension surface, not the hot path
    (session_counts in streaming/windows.py is the native form)."""

    GAP_S = 30 * 60

    def __init__(self):  # noqa: D107
        self._user = None
        self._start = None
        self._last = None
        self._n = 0

    def eval(self, row):  # noqa: D102
        ts = row.ts
        if ts is None:
            return
        if self._start is None:
            self._user, self._start, self._last, self._n = (
                row.user_id, ts, ts, 1,
            )
            return
        if (ts - self._last).total_seconds() >= self.GAP_S:
            yield self._user, self._start, self._n, self._last
            self._start, self._n = ts, 1
        else:
            self._n += 1
        self._last = ts

    def terminate(self):  # noqa: D102
        if self._start is not None:
            yield self._user, self._start, self._n, self._last


def register_udtfs(spark) -> None:
    """Register all engine UDTFs for SQL use (idempotent)."""
    spark.udtf.register("tokenize", TokenizeUDTF)
    spark.udtf.register("ngram_wide", NgramWideUDTF)
    spark.udtf.register("sessionize", SessionizeUDTF)
