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


def register_udtfs(spark) -> None:
    """Register all engine UDTFs for SQL use (idempotent)."""
    spark.udtf.register("tokenize", TokenizeUDTF)
