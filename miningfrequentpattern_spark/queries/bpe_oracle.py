"""Unrolled-CTE DuckDB oracles for the BPE trainer/encoder
(operators/text.py::bpe_merge_rounds / bpe_encode).

Certified in tests/test_bpe.py (fixture equality at n_merges 3/6,
tie-heavy corpora forcing the (left, right) ASC tiebreak, early-stop
parity, word-boundary sentinel) BEFORE promotion — the registrations
in queries/llm_pack.py call these generators at a FIXED n_merges so
the driver sees a static expanded SQL string, the l60 generated-oracle
pattern. BPE is iterative-argmax, which plain SQL cannot loop — the
oracle UNROLLS the rounds: each round k is a (pair-count, gated
argmax, merge-fold) CTE triple reading round k-1's vocabulary.
"""

from __future__ import annotations


def bpe_oracle_sql(n_merges: int, min_pair_count: int = 2) -> str:
    """Generate the unrolled-CTE DuckDB oracle for bpe_merge_rounds
    over a `documents(text)` view.

    Per round k: (1) freq-weighted adjacent-pair counts over the
    vocabulary's symbol lists (OVERLAPPING adjacent positions, the
    Sennrich get_stats convention the operator shares); (2) a
    deterministic argmax (count DESC, pair ASC) gated on
    min_pair_count; (3) the LEFT-TO-RIGHT NON-OVERLAPPING merge fold
    expressed as a string replace over a wrapped-symbol encoding —
    every symbol rendered ' s ' and concatenated, so the pattern
    ' l  r ' consumes both wrappers and replace()'s
    continue-after-replacement scan IS the non-overlap fold (symbols
    are whitespace-free by construction: words come from a
    whitespace split and merges only concatenate). An empty winner
    (max pair below min_pair_count) passes the vocabulary through
    unchanged, so later rounds are empty too — the operator's early
    stop."""
    parts = ["""WITH v0 AS (
  SELECT string_split(w, '') AS syms, count(*) AS freq FROM (
    SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents)
  WHERE w != '' GROUP BY w)"""]
    for k in range(1, n_merges + 1):
        p, w, vprev, vnext = f"p{k}", f"w{k}", f"v{k-1}", f"v{k}"
        parts.append(f""",
{p} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r, sum(freq) AS n
  FROM {vprev}, unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2),
{w} AS (
  SELECT l, r, l || r AS m, n FROM {p}
  WHERE n >= {min_pair_count}
  ORDER BY n DESC, l, r LIMIT 1),
{vnext} AS (
  SELECT CASE WHEN w.l IS NULL THEN v.syms
         ELSE string_split(
           trim(replace(
             list_aggregate(list_transform(v.syms,
                            s -> ' ' || s || ' '), 'string_agg', ''),
             ' ' || w.l || '  ' || w.r || ' ',
             ' ' || w.m || ' ')),
           '  ')
         END AS syms, v.freq
  FROM {vprev} v LEFT JOIN {w} w ON TRUE)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS round, l AS left, r AS right, m AS merged, "
        f"CAST(n AS BIGINT) AS pair_count FROM w{k}"
        for k in range(1, n_merges + 1)
    )
    return "".join(parts) + f"\n{sel}\nORDER BY round"


def bpe_encode_oracle_sql(n_merges: int, min_pair_count: int = 2) -> str:
    """Generate the unrolled-CTE DuckDB oracle for bpe_encode over the
    merges the TRAINER oracle derives from the same corpus: per
    document, every word's symbols are wrapped (' s ') and words are
    joined with a TAB sentinel (no ' l  r ' pattern can span it, so
    merges never cross word boundaries; tab rather than the original
    '#' — code-review r9: '#' is legal text under the fixture
    invariant pin and a literal '#' in a document would have been
    erased by the final replace, while tab is pinned ABSENT by the
    single-space/ASCII-printable invariant); each training round's
    merge is then applied in RANK ORDER as the same replace-fold —
    the training-order replay the encoder's rank-priority loop is
    provably equivalent to on self-trained tables. The final token
    list falls out by erasing the sentinel (leaving the same double
    space that separates intra-word tokens), trimming, and splitting
    on '  '; the output column is that list re-joined with TAB
    (code-review r10: the driver's pandas hash canonicalizer cannot
    factorize ARRAY columns, so registered queries must emit scalar
    columns — the l62 red-row lesson; TAB is safe as the join char
    for the same pinned-absent reason it is safe as the sentinel).
    Relies on the pinned fixture invariant (non-empty,
    single-spaced ASCII text)."""
    trainer = bpe_oracle_sql(n_merges, min_pair_count)
    with_part = trainer[: trainer.index("\nSELECT 1 AS round")]
    parts = [with_part]
    parts.append(""",
e0 AS (
  SELECT doc_id,
         list_aggregate(
           list_transform(string_split(trim(text), ' '),
             w -> list_aggregate(
                    list_transform(string_split(w, ''),
                                   s -> ' ' || s || ' '),
                    'string_agg', '')),
           'string_agg', chr(9)) AS repr
  FROM documents)""")
    for k in range(1, n_merges + 1):
        parts.append(f""",
e{k} AS (
  SELECT e.doc_id,
         CASE WHEN w.l IS NULL THEN e.repr
         ELSE replace(e.repr,
                      ' ' || w.l || '  ' || w.r || ' ',
                      ' ' || w.m || ' ') END AS repr
  FROM e{k-1} e LEFT JOIN w{k} w ON TRUE)""")
    parts.append(f"""
SELECT doc_id,
       array_to_string(
         string_split(trim(replace(repr, chr(9), '')), '  '),
         chr(9)) AS bpe_tokens
FROM e{n_merges}
ORDER BY doc_id""")
    return "".join(parts)
