"""LLM-data-pipeline pack (SURVEY.md §2.4, L1-L7): dedup, similarity
search, text analysis, corpus profiling, multimodal plumbing.

Oracle-parity conventions specific to this pack:
- cosine math is forced to DOUBLE on both engines (Spark: cast to
  array<double> before the fold; DuckDB: embedding::DOUBLE[] with an
  explicit list_sum/list_transform formula rather than
  list_cosine_similarity, which accumulates in float32) so 4dp
  rounding agrees bit-for-bit;
- randomized operators (MinHash LSH, RP-LSH) are seeded and
  registered rows-only; their exact counterparts (n-gram Jaccard,
  brute-force cosine) carry the oracles;
- thresholds are calibrated against the fixtures (planted near-dups:
  6 doc pairs with 3-gram Jaccard ≥ 0.2; 271 embedding pairs with
  cosine > 0.35 at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text as T
from ..operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_portable_pairs,
    ngram_jaccard_pairs,
    shingles,
    connected_components,
)
from ..operators.multimodal import (
    attach_media,
    extract_media_features,
    multimodal_rows,
)
from ..operators.similarity import ann_lsh_topk, cosine_topk_exact
from ..sources.io import load_table
from .bpe_oracle import bpe_encode_oracle_sql, bpe_oracle_sql
from .registry import query

_STOPLIST_SQL = "', '".join(T.STOPWORDS)

# First-N-token prefix fingerprint shared by l22 (diagnostic dup rate),
# l23 (cross-source overlap), and l30 (materialized keep-best dedup) —
# ONE constant + one expression pair so the companion queries can never
# drift onto different fingerprints (self-review r5). The SQL fragment
# interpolates into each oracle; the column builder is its exact Spark
# twin (both depend on the single-space fixture invariant pinned in
# tests/test_fixture_invariants.py).
PREFIX_FP_TOKENS = 8
PREFIX_FP_SQL = (
    "array_to_string((string_split(trim(text), ' '))"
    f"[1:{PREFIX_FP_TOKENS}], ' ')"
)


def _prefix_fp() -> F.Column:
    return F.array_join(F.slice(T.tokens("text"), 1, PREFIX_FP_TOKENS), " ")



# ---------------------------------------------------------------------------
# L1: exact dedup
# ---------------------------------------------------------------------------

@query(
    "l01_exact_dedup",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               AS content_hash
      FROM documents)
    SELECT doc_id, content_hash,
           row_number() OVER (PARTITION BY content_hash ORDER BY doc_id)
             AS dup_rank,
           row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) = 1
             AS is_kept
    FROM h
    """,
)
def l01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: normalized-content SHA-256 dedup; lowest doc_id survives."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs).select(
        "doc_id", "content_hash", "dup_rank", "is_kept"
    )


# ---------------------------------------------------------------------------
# L2: near-duplicate detection (4 methods + clustering)
# ---------------------------------------------------------------------------

_L02_ORACLE = """
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS l
               FROM documents),
    sh AS (SELECT doc_id, lang,
             list_distinct(list_filter(
               list_transform(list_zip(l, l[2:], l[3:]),
                              s -> s[1] || ' ' || s[2] || ' ' || s[3]),
               x -> x IS NOT NULL)) AS g
           FROM t)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.g, b.g)) * 1.0 /
                 (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 4)
             AS jaccard
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE round(len(list_intersect(a.g, b.g)) * 1.0 /
                (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 4)
          >= 0.2
    """


@query("l02_ngram_jaccard_pairs", oracle=_L02_ORACLE)
def l02_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (exact): word-3-gram Jaccard near-dup pairs, lang-blocked.
    The deterministic anchor for the randomized MinHash variant.

    Registered with the hot-shingle guard OFF: the guard's broadcast
    side re-derives the shingle relation (one extra corpus pass,
    ~+1 s warm / +3 s cold at sf0.1) and the fixtures' max shingle df
    is 5 — pure overhead at this scale. l02f is the guarded twin
    (same oracle — the guard provably changes nothing below the cap);
    at 100 TB the operator DEFAULT keeps the guard on."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    return ngram_jaccard_pairs(
        docs, block_col="lang", n=3, threshold=0.2, max_shingle_df=None
    )


@query("l02f_ngram_jaccard_guarded", oracle=_L02_ORACLE)
def l02f_ngram_jaccard_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (exact, guarded): l02 with the hot-shingle prefix filter ON
    (the operator default, max_shingle_df=1000) — the 100 TB form. A
    shingle in d docs contributes d² join rows, so sampled-df-over-cap
    shingles are removed from the per-doc shingle arrays (broadcast
    per-block hot sets + array_except, BEFORE the explode) so they
    never enter the self-join's shuffle. Carries the SAME oracle as
    l02: the fixtures' max shingle df is 5, so the guard provably
    drops nothing here — the driver row certifies the guarded plan
    end-to-end, and the synthetic-boilerplate test (tests/test_llm.py)
    certifies the dropping behavior itself."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    return ngram_jaccard_pairs(docs, block_col="lang", n=3, threshold=0.2)


@query(
    "l02g_ngram_jaccard_capped",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS l
               FROM documents),
    sh0 AS (SELECT doc_id, lang,
             list_distinct(list_filter(
               list_transform(list_zip(l, l[2:], l[3:]),
                              s -> s[1] || ' ' || s[2] || ' ' || s[3]),
               x -> x IS NOT NULL)) AS g
           FROM t),
    posts AS (SELECT doc_id, lang, unnest(g) AS shingle FROM sh0),
    hot AS (SELECT lang, shingle FROM posts
            GROUP BY lang, shingle HAVING count(*) > 2),
    keep AS (SELECT p.* FROM posts p ANTI JOIN hot h USING (lang, shingle)),
    sets AS (SELECT doc_id, lang, list(shingle) AS g
             FROM keep GROUP BY doc_id, lang)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.g, b.g)) * 1.0 /
                 (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 4)
             AS jaccard
    FROM sets a JOIN sets b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE round(len(list_intersect(a.g, b.g)) * 1.0 /
                (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 4)
          >= 0.1
    """,
)
def l02g_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (exact, guard FIRING): unlike l02f — where the cap sits above
    the fixtures' max shingle df and the guard provably drops nothing —
    this twin pins the cap at 2, UNDER the fixture df ceiling of 5, so
    the hot-shingle filter genuinely removes ~340 shingles at sf0.01
    and the surviving pairs are scored on the filtered universe. The
    oracle recomputes the identical semantics in SQL (df > cap →
    drop postings → rebuild per-doc sets → Jaccard over the survivors),
    which hash-certifies the guard END-TO-END in the driver env:
    both the dropping behavior and the post-guard denominators
    (numerator and denominator from the same shingle universe).
    cap·guard_sample < 20 ⇒ the exact-df fallback runs, so the flagged
    set is deterministic."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    return ngram_jaccard_pairs(
        docs, block_col="lang", n=3, threshold=0.1, max_shingle_df=2
    )


def _l02b_oracle(num_perm: int = 16, threshold: float = 0.2) -> str:
    """All-pairs MinHash oracle with the operator's OWN affine-hash
    coefficients interpolated as integer literals (the L48_QUERY_TERMS
    oracle-constant pattern): both engines compute identical 28-bit
    md5 shingle hashes (the l04d fold) and identical (a_i*x + b_i)
    mod 2^31-1 signatures, so the banding is the only thing the
    oracle omits — and banding is provably output-lossless (any pair
    agreeing on >= 1 of num_perm components shares an r=1 band)."""
    from ..operators.dedup import MINHASH_PRIME, minhash_coeffs

    a_c, b_c = minhash_coeffs(num_perm)
    sig_entries = ",\n      ".join(
        f"list_min(list_transform(xs, x -> "
        f"(CAST({a_c[i]} AS BIGINT) * x + {b_c[i]}) % {MINHASH_PRIME}))"
        for i in range(num_perm)
    )
    return f"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split(trim(text), ' '),
                                  x -> x != '') AS l
               FROM documents WHERE text IS NOT NULL),
    sh AS (SELECT doc_id,
             list_distinct(list_filter(
               list_transform(list_zip(l, l[2:], l[3:]),
                              s -> s[1] || ' ' || s[2] || ' ' || s[3]),
               x -> x IS NOT NULL)) AS g
           FROM t),
    hx AS (SELECT doc_id,
             list_transform(g, w -> list_reduce(
               list_transform(string_split(substr(md5(w), 1, 7), ''),
                 c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
               (a, b) -> a * 16 + b)) AS xs
           FROM sh WHERE len(g) > 0),
    sig AS (SELECT doc_id, [
      {sig_entries}
      ] AS sig FROM hx)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_filter(list_zip(a.sig, b.sig),
                                 s -> s[1] = s[2])) / {num_perm}.0, 4)
             AS est_jaccard
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE round(len(list_filter(list_zip(a.sig, b.sig),
                                s -> s[1] = s[2])) / {num_perm}.0, 4)
          >= {threshold}
    """


@query("l02b_minhash_lsh_pairs", oracle=_l02b_oracle())
def l02b_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (MinHash LSH): banded min-hash candidate pairs at estimated
    Jaccard >= 0.2 — UPGRADED round 11 from rows-only to a full
    value-hash oracle by swapping MLlib's seeded MinHashLSH for the
    engine-portable affine-permutation form (operators/dedup.py::
    minhash_portable_pairs): 28-bit md5 shingle hashes + fixed
    (a_i*x+b_i) mod 2^31-1 permutations are computable identically in
    DuckDB, so the oracle checks exact signature values, not just row
    counts. The MLlib variant (minhash_neardup_pairs) remains the
    library operator for vectorized corpora, recall-tested in
    tests/test_llm.py; this form is what a 100 TB dedup would run
    anyway — no CountVectorizer fit, no driver-sized vocabulary, one
    row-local signature pass."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    return minhash_portable_pairs(docs, num_perm=16, threshold=0.2)


_L02C_MAX_HAMMING = 3


def _l02c_oracle(max_hamming: int = _L02C_MAX_HAMMING) -> str:
    """All-pairs portable-SimHash oracle with the 28 per-bit majority
    votes unrolled as literal power-of-two constants (the l02b
    generated-oracle pattern): per doc, each token's 28-bit md5 hash
    (the l04d fold) votes on every bit; bit = 1 iff votes*2 >= n_tokens
    (ties to 1, matching simhash_portable's IF(c*2 >= size)). The
    banded Spark plan is output-lossless (pigeonhole over
    max_hamming+1 bands), so the all-pairs SQL computes the identical
    pair set."""
    from ..operators.dedup import SIMHASH_PORTABLE_BITS

    bits = ",\n             ".join(
        f"CASE WHEN 2 * len(list_filter(hs, h -> (h // {1 << i}) % 2 = 1))"
        f" >= len(hs) THEN 1 ELSE 0 END"
        for i in range(SIMHASH_PORTABLE_BITS)
    )
    ham = "len(list_filter(list_zip(a.b, c.b), p -> p[1] != p[2]))"
    return f"""
    WITH t AS (SELECT doc_id, lang,
                      list_filter(string_split(trim(text), ' '),
                                  x -> x != '') AS toks
               FROM documents WHERE text IS NOT NULL),
    hx AS (SELECT doc_id, lang,
             list_transform(toks, w -> list_reduce(
               list_transform(string_split(substr(md5(w), 1, 7), ''),
                 c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
               (a, b) -> a * 16 + b)) AS hs
           FROM t WHERE len(toks) > 0),
    fp AS (SELECT doc_id, lang,
             [{bits}] AS b
           FROM hx)
    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
           CAST({ham} AS BIGINT) AS hamming
    FROM fp a JOIN fp c ON a.lang = c.lang AND a.doc_id < c.doc_id
    WHERE {ham} <= {max_hamming}
    """


@query("l02c_simhash_pairs", oracle=_l02c_oracle())
def l02c_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (SimHash): hamming≤3 near-dup pairs over 28-bit PORTABLE
    fingerprints, lang-blocked — UPGRADED round 11 from rows-only to a
    full value-hash oracle (the l02b/l03c burn-down pattern): the
    per-token hash moves from Spark-private xxhash64 to the md5-28bit
    engine-shared integer, so DuckDB recomputes the identical
    frequency-vote fingerprints and the all-pairs oracle certifies the
    banded plan's exact pair set (banding is lossless by pigeonhole).
    The 64-bit xxhash tier (simhash64 + hamming≤8) stays the library
    operator — higher resolution, banded-equals-all-pairs-tested in
    tests/test_llm.py; this tier trades 28-bit resolution for a driver
    value-hash proof. max_hamming=3 keeps the relative cut (3/28) in
    line with the 64-bit tier's 8/63; at sf0.01 the fixture's planted
    near-dups land at hamming 0-1 with 442 pairs total under the cut
    (probed round 11)."""
    from ..operators.dedup import simhash_portable_pairs

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    return simhash_portable_pairs(
        docs, block_col="lang", max_hamming=_L02C_MAX_HAMMING
    )


@query(
    "l02d_embedding_neardup",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(list_zip(a.v, b.v), s -> s[1]*s[2]))
                 / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
                    * sqrt(list_sum(list_transform(b.v, x -> x*x)))), 4)
             AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_sum(list_transform(list_zip(a.v, b.v), s -> s[1]*s[2]))
                / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
                   * sqrt(list_sum(list_transform(b.v, x -> x*x)))), 4)
          > 0.35
    """,
)
def l02d_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (embedding cosine): brute-force near-dup pairs above 0.35."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return embedding_neardup_pairs(emb, threshold=0.35)


@query(
    "l02e_neardup_clusters",
    oracle="""
    WITH RECURSIVE t AS (SELECT doc_id, lang, string_split(text, ' ') AS l
               FROM documents),
    sh AS (SELECT doc_id, lang,
             list_distinct(list_filter(
               list_transform(list_zip(l, l[2:], l[3:]),
                              s -> s[1] || ' ' || s[2] || ' ' || s[3]),
               x -> x IS NOT NULL)) AS g
           FROM t),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE round(len(list_intersect(a.g, b.g)) * 1.0 /
                  (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 4)
            >= 0.2),
    und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT a AS d FROM und),
    reach AS (
      SELECT d, d AS r FROM nodes
      UNION
      SELECT reach.d, und.b AS r FROM reach JOIN und ON und.a = reach.r)
    SELECT d AS doc_id, min(r) AS component FROM reach GROUP BY d
    """,
)
def l02e_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (clustering): connected components over the exact-Jaccard
    edge set — smallest-id label propagation, no graph library.

    Oracle: the same edge set (the l02 pair SQL) closed transitively
    with a recursive CTE; min reachable id == the converged min-label
    propagation, so the iterative Spark loop is checked against a
    declarative fixpoint."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    edges = ngram_jaccard_pairs(
        # Guard OFF for the same reason as l02: at fixture df <= 5 the
        # guard's sampled hot-list pass is pure overhead and can never
        # drop anything (connected_components caches the edge list, so
        # the cost is paid once, but once is still overhead here).
        docs, block_col="lang", n=3, threshold=0.2, max_shingle_df=None
    )
    return connected_components(edges).orderBy("doc_id")


# ---------------------------------------------------------------------------
# L3: similarity search
# ---------------------------------------------------------------------------

@query(
    "l03_cosine_topk",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < 20),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_sum(list_transform(list_zip(q.v, c.v), s -> s[1]*s[2]))
                   / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
                      * sqrt(list_sum(list_transform(c.v, x -> x*x)))), 4)
               + 0.0 AS cos_sim
      FROM q JOIN e c ON c.vec_id != q.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM pairs)
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """,
)
def l03_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 (exact): brute-force top-5 cosine neighbors for 20 query
    vectors; ranking happens on the 4dp-rounded similarity with an id
    tiebreak so both engines rank identically."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    # The limit(20) drops nothing (vec_id is unique, so the filter
    # already yields ≤ 20 rows) but gives the plan a static maxRows,
    # letting cosine_topk_exact's query-bound guard pass for FREE
    # instead of running its eager count probe.
    queries_df = emb.filter(F.col("vec_id") < 20).limit(20)
    return cosine_topk_exact(queries_df, emb, k=5)


def _l03b_ann_lsh_oracle_sql(
    k: int = 5,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
    dim: int = 64,
    max_query_id: int = 20,
    admission_floor: float = 0.28,
) -> str:
    """Generate the all-in-SQL RP-LSH oracle over the `embeddings`
    view with the operator's OWN seeded projections interpolated at
    full repr precision (the _l60_oracle pattern; registry booking
    (o), promoted r12 from tests/test_ann_lsh_oracle_staged.py).
    Every float step has an exact DuckDB twin: the norm/dot
    sequential folds mirror F.aggregate via list_reduce;
    bucket_length 0.5 is a power of two so the bucket floor agrees
    wherever the dots are bit-identical; the rerank cosine is
    round4-pinned with the id tiebreak."""
    import numpy as np

    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((num_hash_tables, dim))
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)

    fold = "list_reduce(list_prepend(0.0, {terms}), (a, b) -> a + b)"
    sq = fold.format(terms="list_transform(v, x -> x * x)")
    bucket_arms = []
    for t, d in enumerate(proj):
        lits = ", ".join(repr(float(x)) for x in d)
        dott = fold.format(
            terms=f"list_transform(list_zip(u, [{lits}]),"
            " s -> s[1] * s[2])"
        )
        bucket_arms.append(
            f"SELECT vec_id, {t} AS t,\n"
            f"       CAST(floor(({dott}) / {bucket_length!r}) AS BIGINT)"
            f" AS h\nFROM nv"
        )
    buckets = "\nUNION ALL\n".join(bucket_arms)
    dot_vv = fold.format(
        terms="list_transform(list_zip(q.v, c.v), s -> s[1] * s[2])"
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE embedding IS NOT NULL),
    n AS (SELECT vec_id, v, sqrt({sq}) AS nrm FROM e),
    nv AS (SELECT vec_id, v,
             list_transform(
               v, x -> x / CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END) AS u
           FROM n),
    b AS ({buckets}),
    cand AS (
      SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
      FROM b qb JOIN b cb ON qb.t = cb.t AND qb.h = cb.h
      WHERE qb.vec_id < {max_query_id}
        AND qb.vec_id != cb.vec_id),
    scored AS (
      -- q.nrm/c.nrm are the SAME sequential folds cosine() recomputes
      -- from the raw vectors, so reusing them is value-identical
      SELECT cand.query_id, cand.neighbor_id,
             round(CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
                        ELSE ({dot_vv}) / (q.nrm * c.nrm) END,
                   4) + 0.0 AS cos_sim
      FROM cand
      JOIN n q ON q.vec_id = cand.query_id
      JOIN n c ON c.vec_id = cand.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id)
               AS rank
      FROM scored WHERE cos_sim >= {admission_floor!r})
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


@query("l03b_ann_lsh_topk", oracle=_l03b_ann_lsh_oracle_sql())
def l03b_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 (approximate): NATIVE random-projection LSH top-5 for the
    same 20 queries (round 6 rewrite: codegen dot-product hashes, a
    plain (table, bucket) equi-join for candidates, no MLlib UDF and
    therefore no localCheckpoint barrier — full lineage
    recoverability). Seeded; recall vs the exact operator is
    asserted in tests/test_llm.py. dim passed explicitly — fully
    lazy plan.

    r12 re-cert (registry booking (o)): moved OFF the rows-only list
    — the generated all-in-SQL oracle above certifies projections,
    normalization, bucket floors, candidate set, admission floor and
    ranking value-for-value. The one body change the promotion
    needed: `.cast("array<double>")` at the query boundary (the
    l03/l02d convention) — Spark's fold over array<float> multiplies
    in float32 before the double accumulate, which no portable SQL
    reproduces."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries_df = emb.filter(F.col("vec_id") < 20)
    return ann_lsh_topk(queries_df, emb, k=5, seed=42, dim=64)


# ---------------------------------------------------------------------------
# L4: text analysis
# ---------------------------------------------------------------------------

@query(
    "l04_token_stats",
    oracle=r"""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS l
               FROM documents)
    SELECT doc_id,
           len(l) AS n_tokens,
           len(list_distinct(l)) AS n_distinct_tokens,
           round(list_sum(list_transform(l, x -> len(x) * 1.0)) / len(l), 4)
             AS avg_token_len,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
             AS n_bpe_ish_tokens
    FROM t
    """,
)
def l04_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: per-document token counting (whitespace + BPE-ish regex)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.token_stats(docs)


@query(
    "l04b_top_bigrams",
    oracle="""
    WITH t AS (SELECT string_split(text, ' ') AS l FROM documents),
    z AS (SELECT unnest(list_zip(l, l[2:])) AS s FROM t)
    SELECT s[1] || ' ' || s[2] AS bigram, count(*) AS n_occurrences
    FROM z WHERE s[2] IS NOT NULL
    GROUP BY 1 ORDER BY n_occurrences DESC, bigram LIMIT 30
    """,
)
def l04b_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: corpus-wide top-30 token bigrams (order-sensitive n-grams,
    unlike the shingle sets used for dedup)."""
    docs = load_table(spark, sf_dir, "documents")
    l = T.tokens("text")
    bigrams = T.shifted_pairs(l, lambda a, b: F.concat_ws(" ", a, b))
    return (
        docs.filter(F.size(l) >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.col("bigram"))
        .limit(30)
    )


@query("l04c_doc_fingerprints")
def l04c_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: order-sensitive rolling-hash fingerprints (xxhash64-based —
    Spark-specific, hence rows-only) next to a portable SHA-256. The
    hash-oracle-able twin is l04d_portable_fingerprints."""
    docs = load_table(spark, sf_dir, "documents")
    return T.rolling_fingerprint(docs)


@query(
    "l04d_portable_fingerprints",
    oracle="""
    -- Engine-shared rolling fingerprint: per-token hash is the first
    -- 7 hex chars of md5 (28 bits) folded left-to-right as
    -- (acc*31 + h) mod 2^30 — list_reduce is a sequential fold, the
    -- exact twin of Spark aggregate(); mod-2^30 keeps every
    -- intermediate in exactly-representable BIGINT range (DuckDB
    -- errors on 64-bit overflow, so JVM-style wraparound is not an
    -- option on purpose). list_filter mirrors Spark T.tokens' ''
    -- drop: DuckDB string_split('', ' ') is [''] (LEN 1, never 0 —
    -- code-review r9: the empty-list guard was unreachable and an
    -- empty-text doc would have folded md5('') instead of Spark's
    -- 0), so the filtered form makes the guard real on both engines.
    WITH t AS (SELECT doc_id,
                      list_filter(string_split(trim(text), ' '),
                                  x -> x != '') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(CASE WHEN len(toks) = 0 THEN 0
                ELSE list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(toks, w -> list_reduce(
                      list_transform(string_split(substr(md5(w), 1, 7), ''),
                        c -> CAST(strpos('0123456789abcdef', c) - 1
                                  AS BIGINT)),
                      (a, b) -> a * 16 + b))),
                  (acc, h) -> (acc * 31 + h) % 1073741824)
                END AS BIGINT) AS fingerprint,
           sha256(array_to_string(toks, ' ')) AS exact_digest
    FROM t
    """,
)
def l04d_portable_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: l04c's hash-oracle-able twin (round-9 rows-only burn-down,
    the l59 engine-shared-digest pattern): md5-28bit token hashes in
    the same order-sensitive polynomial fold, reduced mod 2^30 so
    both engines compute identical exact integers. operators/
    text.py::portable_fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    return T.portable_fingerprint(docs)


@query(
    "l08_langid_heuristic",
    oracle="""
    -- NULL-text rows keep parity with Spark's non-ANSI semantics:
    -- size(array_intersect(NULL, ...)) is -1 there, so every score
    -- coalesces NULL -> -1 here and best <= 0 -> 'unknown' (matching
    -- the Spark argmax's best > 0 gate). Without this a fixture
    -- regeneration with NULL text would fall through the CASE to
    -- 'zh' and surface as an opaque hash mismatch (self-review r5).
    WITH t AS (SELECT doc_id, lang AS label_lang,
                      list_distinct(string_split(trim(text), ' ')) AS toks
               FROM documents),
    s AS (SELECT doc_id, label_lang,
            coalesce(len(list_intersect(toks,
              ['the','and','fast','query','table'])), -1) AS score_en,
            coalesce(len(list_intersect(toks,
              ['el','la','de','que','rapido'])), -1) AS score_es,
            coalesce(len(list_intersect(toks,
              ['der','die','und','schnell','tabelle'])), -1) AS score_de,
            coalesce(len(list_intersect(toks,
              ['le','la','et','rapide','requete'])), -1) AS score_fr,
            coalesce(len(list_intersect(toks,
              ['de5','shi4','kuai4','biao3','cha2'])), -1) AS score_zh
          FROM t),
    g AS (SELECT *, greatest(score_en, score_es, score_de, score_fr,
                             score_zh) AS best
          FROM s)
    SELECT doc_id, label_lang,
           CAST(score_en AS INT) AS score_en,
           CAST(score_es AS INT) AS score_es,
           CAST(score_de AS INT) AS score_de,
           CAST(score_fr AS INT) AS score_fr,
           CAST(score_zh AS INT) AS score_zh,
           CASE WHEN best <= 0 THEN 'unknown'
                WHEN score_en = best THEN 'en'
                WHEN score_es = best THEN 'es'
                WHEN score_de = best THEN 'de'
                WHEN score_fr = best THEN 'fr'
                ELSE 'zh' END AS predicted_lang
    FROM g
    """,
)
def l08_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: marker-token language-ID scores + argmax prediction.
    Deterministic native expressions — UPGRADED round 5 from
    rows-only to a full value-hash oracle: the per-language score
    columns are list-intersection sizes and the argmax is a CASE
    cascade whose tie-break order (en, es, de, fr, zh — profile
    declaration order) is pinned IDENTICALLY in the Spark coalesce
    chain and the SQL; accuracy vs the label column is additionally
    measured in tests/test_llm.py."""
    docs = load_table(spark, sf_dir, "documents")
    return T.langid_scores(docs)


# ---------------------------------------------------------------------------
# L5/L6: corpus profiling + quality filtering
# ---------------------------------------------------------------------------

@query(
    "l05_corpus_profile",
    oracle="""
    SELECT lang, source,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents GROUP BY lang, source
    """,
)
def l05_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: language × source corpus profile."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "l06_quality_filter",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, n_chars,
                      string_split(text, ' ') AS l FROM documents),
    f AS (SELECT doc_id, lang, n_chars,
                 len(l) AS n_tokens,
                 round(list_sum(list_transform(l, x -> len(x) * 1.0))
                       / len(l), 4) AS mean_word_len,
                 round(len(list_distinct(l)) * 1.0 / len(l), 4)
                   AS distinct_ratio,
                 round(len(list_intersect(list_distinct(l),
                                          ['{_STOPLIST_SQL}'])) * 1.0
                       / len(list_distinct(l)), 4) AS stopword_ratio
          FROM t)
    SELECT *,
           (n_tokens >= 5 AND n_chars BETWEEN 20 AND 10000
            AND mean_word_len BETWEEN 2 AND 12
            AND distinct_ratio > 0.1) AS quality_pass
    FROM f
    """,
)
def l06_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: Gopher/C4-style quality features + pass verdict."""
    docs = load_table(spark, sf_dir, "documents")
    return T.quality_features(docs)


# ---------------------------------------------------------------------------
# L7: multimodal
# ---------------------------------------------------------------------------

@query(
    "l07_multimodal_join",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars, e.label,
           len(e.embedding) AS emb_dim,
           round(sqrt(list_sum(list_transform(
             CAST(e.embedding AS DOUBLE[]), x -> x*x))), 4) AS emb_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def l07_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7: text+vector+label multimodal rows with embedding geometry."""
    from ..functions.vectors import norm

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    rows = multimodal_rows(docs, emb)
    return rows.select(
        "doc_id",
        "lang",
        "n_chars",
        "label",
        F.size("embedding").cast("long").alias("emb_dim"),
        F.round(norm(F.col("embedding").cast("array<double>")), 4).alias(
            "emb_norm"
        ),
    )


@query(
    "l07b_media_features",
    oracle="""
    -- Recomputes the stub decoder's byte arithmetic in SQL: valid
    -- because fixture text is ASCII (1 char == 1 UTF-8 byte, pinned
    -- in tests/test_fixture_invariants.py) and DuckDB string/list
    -- indexing is 1-based (pinned by the dialect canary there).
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(coalesce(list_sum(list_transform(
                  generate_series(1, length(text)),
                  i -> i * ascii(text[i]))), 0) % 2147483648 AS BIGINT)
             AS checksum,
           CAST(CASE WHEN length(text) > 0 THEN ascii(text[1])
                     ELSE -1 END AS INT) AS head_byte,
           CAST(CASE WHEN length(text) > 0
                     THEN ascii(text[length(text)])
                     ELSE -1 END AS INT) AS tail_byte
    FROM documents WHERE text IS NOT NULL
    """,
)
def l07b_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7: BinaryType media column → Arrow-batched mapInPandas feature
    extraction (deterministic stand-in decoder; real codecs plug into
    operators/multimodal._decode_batch). UPGRADED round 5 from
    rows-only to a full value-hash oracle: the stub features are pure
    byte arithmetic (positional checksum mod 2³¹, head/tail byte), so
    DuckDB can recompute them from the originating text under the
    ASCII fixture invariant — certifying the WHOLE pandas seam
    (encode → Arrow batches → mapInPandas → schema) value-for-value,
    the strongest check a Python-UDF-backed operator can carry. A
    real-codec replacement of _decode_batch naturally reverts this
    query to rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(attach_media(docs))


@query(
    "l03c_ivf_topk",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                    v AS cv
             FROM e ORDER BY vec_id LIMIT 16),
    cells AS (SELECT e.vec_id, e.v, c.cid,
                list_sum(list_transform(list_zip(e.v, c.cv),
                         s -> (s[1]-s[2])*(s[1]-s[2]))) AS d2
              FROM e CROSS JOIN cent c),
    ranked_cells AS (SELECT vec_id, v, cid,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY d2, cid) AS rn
              FROM cells),
    posts AS (SELECT vec_id AS neighbor_id, v AS cv2, cid
              FROM ranked_cells WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, v AS qv, cid
               FROM ranked_cells WHERE rn <= 4 AND vec_id < 20),
    scored AS (SELECT query_id, neighbor_id,
                 round(list_sum(list_transform(list_zip(qv, cv2),
                                               s -> s[1]*s[2]))
                       / (sqrt(list_sum(list_transform(qv, x -> x*x)))
                          * sqrt(list_sum(list_transform(cv2,
                                                         x -> x*x)))),
                       4) + 0.0 AS cos_sim
               FROM probes JOIN posts USING (cid)
               WHERE neighbor_id != query_id),
    ranked AS (SELECT query_id, neighbor_id, cos_sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC,
                                             neighbor_id) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM ranked WHERE rank <= 5
    """,
)
def l03c_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 (approximate, IVF): deterministic coarse quantizer (the 16
    lowest-id corpus vectors as fixed seed points) + n_probes=4
    posting-list search + exact rerank for the same 20 queries —
    UPGRADED round 11 from rows-only to a full value-hash oracle:
    seed-point assignment and probing are plain L2 argmins DuckDB
    recomputes exactly, so the driver certifies the ENTIRE IVF
    pipeline (cell assignment, multi-probe, posting join, rerank,
    ranking) value for value, not just row counts. The KMeans-trained
    form (operators/similarity.py::ivf_topk) remains the quality
    tier, recall-tested in tests/test_llm.py; both share the search
    machinery this oracle proves."""
    from ..operators.similarity import ivf_topk_portable

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    return ivf_topk_portable(queries_df, emb, k=5, n_clusters=16, n_probes=4)


@query(
    "l09_hash_split",
    oracle="""
    SELECT doc_id,
           substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7'
                  THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def l09_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-pack: deterministic hash-based train/val/test split (50/25/25
    by first md5 nibble of the id) — the standard stable-sampling move
    for training corpora: no seed state, reproducible across engines
    and runs, and new documents never reshuffle old assignments."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket <= "7", "train")
        .when(bucket <= "b", "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "l06b_repetition_signals",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS l
               FROM documents),
    tok AS (SELECT doc_id, unnest(l) AS tok FROM t),
    per_tok AS (SELECT doc_id, tok, count(*) AS c
                FROM tok GROUP BY doc_id, tok),
    per_doc AS (SELECT doc_id, sum(c) AS n_tokens, max(c) AS top_count
                FROM per_tok GROUP BY doc_id),
    big AS (SELECT doc_id,
              list_filter(list_transform(list_zip(l, l[2:]),
                          s -> s[1] || ' ' || s[2]), x -> x IS NOT NULL) AS bg
            FROM t)
    SELECT b.doc_id,
           CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           round(p.top_count * 1.0 / p.n_tokens, 4) AS top_token_ratio,
           CASE WHEN len(b.bg) > 0
                THEN round(1 - len(list_distinct(b.bg)) * 1.0 / len(b.bg), 4)
           END AS dup_bigram_ratio
    FROM big b LEFT JOIN per_doc p USING (doc_id)
    """,
)
def l06b_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 (repetition): Gopher-style boilerplate/spam signals —
    top-token share and duplicate-bigram share per document."""
    docs = load_table(spark, sf_dir, "documents")
    return T.repetition_signals(docs)


@query(
    "l10_pii_scrub",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
               '@example.com id ' || CAST(doc_id * 7919 + 1000000 AS VARCHAR)
               AS text
      FROM documents)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>',
               'g'),
             '[0-9]{6,}', '<NUM>', 'g') AS scrubbed_text,
           true AS was_scrubbed
    FROM aug
    """,
)
def l10_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 (PII scrubbing): redact emails and long digit runs with typed
    placeholders. The synthetic corpus contains no PII, so the query
    first INJECTS a deterministic fake email + numeric id derived from
    doc_id — proving the scrubber actually fires on every row (the
    oracle performs the identical injection, and `was_scrubbed` must
    come back true everywhere)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com id "),
            (F.col("doc_id") * 7919 + 1000000).cast("string"),
        ),
    )
    return T.pii_scrub(docs)


@query(
    "l11_stratified_sample",
    oracle="""
    WITH b AS (
      SELECT doc_id, source,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      FROM documents)
    SELECT doc_id, source, bucket FROM b
    WHERE CASE WHEN source IN ('src0','src1','src2','src3','src4',
                               'src5','src6','src7','src8','src9')
               THEN bucket < '80' ELSE bucket < '40' END
    """,
)
def l11_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-pack (domain mixing): deterministic per-source downsampling —
    50% of src0-src9, 25% of the rest — by comparing the first md5
    byte of the id against a per-source hex threshold. Same stability
    contract as l09: reproducible across engines/runs, and adding new
    documents never reshuffles old keep/drop decisions. At 100 TB this
    is a stateless filter fused into the scan (no shuffle, no sort, no
    sampling state)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    half = [f"src{i}" for i in range(10)]
    keep = F.when(
        F.col("source").isin(*half), bucket < "80"
    ).otherwise(bucket < "40")
    return docs.select(
        "doc_id", "source", bucket.alias("bucket")
    ).filter(keep)


# Every BENCH_MOD-th doc_id plays the benchmark role in the
# decontamination family (l12/l25/l31/l54) -- the fixtures carry no
# eval suite. ONE constant interpolated into all four oracles and
# used by all four Spark bodies (hardening (j), r9 sweep): the
# hand-synced '40' literals per engine could drift silently.
BENCH_MOD = 40


@query(
    "l12_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    sh AS (SELECT doc_id,
             list_distinct(list_filter(
               list_transform(list_zip(l, l[2:], l[3:]),
                              s -> s[1] || ' ' || s[2] || ' ' || s[3]),
               x -> x IS NOT NULL)) AS g
           FROM t),
    ex AS (SELECT doc_id, unnest(g) AS s FROM sh),
    b AS (SELECT doc_id AS bench_id, s FROM ex WHERE doc_id % {BENCH_MOD} = 0),
    tr AS (SELECT doc_id, s FROM ex WHERE doc_id % {BENCH_MOD} != 0)
    SELECT tr.doc_id, count(DISTINCT b.bench_id) AS n_benchmark_hits
    FROM tr JOIN b ON tr.s = b.s
    GROUP BY tr.doc_id
    """,
)
def l12_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-pack (decontamination): flag training docs sharing any
    word-3-gram with a benchmark doc. The fixtures carry no eval
    suite, so every 40th doc_id plays the benchmark role — the planted
    near-dup pairs guarantee hits. Broadcast inverted-index join: the
    corpus side never shuffles."""
    from ..operators.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    bench = docs.filter(F.col("doc_id") % BENCH_MOD == 0)
    train = docs.filter(F.col("doc_id") % BENCH_MOD != 0)
    return decontaminate(train, bench, n=3)


@query(
    "l13_sequence_pack",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             len(string_split(trim(text), ' ')) AS n_tokens
      FROM documents),
    w AS (
      SELECT *,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS BIGINT) AS seq_start
      FROM t)
    SELECT doc_id, source, shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           seq_start,
           CAST(floor(seq_start / 2048.0) AS BIGINT) AS chunk_id,
           CAST(CASE WHEN n_tokens = 0 THEN 0
                ELSE floor((seq_start + n_tokens - 1) / 2048.0)
                     - floor(seq_start / 2048.0) + 1 END AS BIGINT)
             AS n_chunks
    FROM w
    """,
)
def l13_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-pack (sequence packing): concat-and-chunk token offsets into
    2048-token training sequences, packed within (source, md5-shard)
    cells so no window ever sees more than one cell."""
    docs = load_table(spark, sf_dir, "documents")
    return T.sequence_pack(docs, budget=2048)


@query(
    "l14_neardup_keep_best",
    oracle="""
    WITH RECURSIVE t AS (SELECT doc_id, lang, string_split(text, ' ') AS l
               FROM documents),
    sh AS (SELECT doc_id, lang,
             list_distinct(list_filter(
               list_transform(list_zip(l, l[2:], l[3:]),
                              s -> s[1] || ' ' || s[2] || ' ' || s[3]),
               x -> x IS NOT NULL)) AS g
           FROM t),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE round(len(list_intersect(a.g, b.g)) * 1.0 /
                  (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 4)
            >= 0.2),
    und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT a AS d FROM und),
    reach AS (
      SELECT d, d AS r FROM nodes
      UNION
      SELECT reach.d, und.b AS r FROM reach JOIN und ON und.a = reach.r),
    comp AS (SELECT d AS doc_id, min(r) AS component FROM reach GROUP BY d)
    SELECT d.doc_id,
           coalesce(c.component, d.doc_id) AS component,
           d.n_chars,
           row_number() OVER (
             PARTITION BY coalesce(c.component, d.doc_id)
             ORDER BY d.n_chars DESC, d.doc_id) = 1 AS is_representative
    FROM documents d LEFT JOIN comp c USING (doc_id)
    """,
)
def l14_neardup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (keep-best resolution): pick the highest-n_chars doc per
    near-dup cluster (singletons represent themselves). Completes the
    dedup pipeline: pairs (l02) → clusters (l02e) → survivors (l14).

    Oracle: the l02e recursive-CTE fixpoint, LEFT-joined back to all
    documents with the same quality ranking."""
    from ..operators.dedup import cluster_representatives

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    edges = ngram_jaccard_pairs(
        # Guard OFF for the same reason as l02: at fixture df <= 5 the
        # guard's sampled hot-list pass is pure overhead and can never
        # drop anything (connected_components caches the edge list, so
        # the cost is paid once, but once is still overhead here).
        docs, block_col="lang", n=3, threshold=0.2, max_shingle_df=None
    )
    comp = connected_components(edges)
    return cluster_representatives(
        docs.drop("tokens"), comp, quality_col="n_chars"
    )


@query(
    "l15_unigram_logprob",
    oracle="""
    WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
               FROM documents),
    v AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
    n AS (SELECT count(*) AS total FROM t)
    SELECT t.doc_id,
           count(*) AS n_tokens,
           round(avg(-log2(v.c * 1.0 / n.total)), 4) AS avg_neg_log2p
    FROM t JOIN v USING (tok) CROSS JOIN n
    GROUP BY t.doc_id
    """,
)
def l15_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 (LM quality score, CCNet-style): per-doc mean unigram
    surprise under the corpus's own token distribution — the
    perplexity-bucket signal without an external model."""
    docs = load_table(spark, sf_dir, "documents")
    return T.unigram_logprob_score(docs)


@query(
    "l16_chunk_overlap",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS l
               FROM documents
               WHERE len(string_split(trim(text), ' ')) > 0),
    s AS (SELECT doc_id, l,
                 unnest(generate_series(1, greatest(len(l) - 32, 1), 224))
                   AS start_token
          FROM t)
    SELECT doc_id,
           CAST((start_token - 1) / 224 AS BIGINT) AS chunk_idx,
           CAST(start_token AS BIGINT) AS start_token,
           CAST(len(l[start_token:start_token + 255]) AS BIGINT)
             AS chunk_len,
           array_to_string(l[start_token:start_token + 255], ' ')
             AS chunk_text
    FROM s
    """,
)
def l16_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 (chunking): 256-token windows stepping by 224 (32-token
    overlap) — RAG / long-context training prep. All native sequence/
    slice expressions; zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return T.chunk_with_overlap(docs, chunk_size=256, overlap=32)


@query(
    "l17_tfidf_topterms",
    oracle="""
    WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
               FROM documents),
    tf AS (SELECT doc_id, tok, count(*) AS tf
           FROM t GROUP BY doc_id, tok),
    df AS (SELECT tok, count(*) AS df
           FROM (SELECT DISTINCT doc_id, tok FROM t) GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1), 4)
               AS tfidf
      FROM tf JOIN df USING (tok) CROSS JOIN n),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, tok) AS term_rank
      FROM scored)
    SELECT doc_id, tok, tf, df, tfidf, term_rank
    FROM ranked WHERE term_rank <= 5
    """,
)
def l17_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 (keywords): per-doc top-5 terms by smoothed TF-IDF; the df
    leg is vocab-sized and broadcast so the corpus never shuffles on
    Zipf-skewed tokens."""
    docs = load_table(spark, sf_dir, "documents")
    return T.tfidf_top_terms(docs, k=5)


@query("l18_semantic_neardup")
def l18_semantic_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (semantic, clustered): embedding near-dup pairs blocked by a
    seeded KMeans coarse quantizer — Σ cluster² pair space with exact
    cosine scoring inside clusters. Rows-only (MLlib KMeans centroids
    are engine-specific); subset-of-exact and recall vs l02d are
    asserted in tests/test_llm.py."""
    from ..operators.dedup import semantic_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_neardup_pairs(
        emb, threshold=0.35, n_clusters=16, seed=42
    )


@query(
    "l07c_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             unnest(range(0, greatest((length(text) + 31) // 32, 1)))
               AS frame_idx
      FROM documents)
    SELECT f.doc_id,
           frame_idx,
           length(substr(d.text, frame_idx * 32 + 1, 32))::BIGINT
             AS frame_len,
           md5(substr(d.text, frame_idx * 32 + 1, 32)) AS frame_md5
    FROM f JOIN documents d USING (doc_id)
    """,
)
def l07c_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7 (frame sampling): cut each media blob into fixed-rate 32-byte
    "frames" via a fan-out mapInPandas (one input row → many frame
    rows) — the video-frame-sampling shape with the codec stubbed
    deterministically (operators/multimodal.py::sample_frames). The
    fixture media is the UTF-8 text bytes, so the Arrow-batched Python
    fan-out is exactly reproducible by SQL substring math — the oracle
    checks the whole plumbing (batch iteration, fan-out, hashing), not
    a fake. Frames inherit the scan's partitioning; no shuffle."""
    from ..operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_media(docs), frame_bytes=32)


@query(
    "l19_duplicate_ngram_spans",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS l
               FROM documents),
    g AS (SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, len(l) - 6),
                   i -> array_to_string(l[i:i+7], ' '))) AS spans
          FROM t WHERE len(l) >= 8),
    e AS (SELECT doc_id, unnest(spans) AS span FROM g)
    SELECT span, count(*) AS n_docs
    FROM e GROUP BY span HAVING count(*) >= 2
    """,
)
def l19_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (substring-level dedup): 8-token spans occurring in more than
    one document — the cross-document repeated-substring signal behind
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2022), approximated at fixed n instead of suffix arrays.

    Shape: sliding windows via native sequence/slice/transform (inside
    codegen, no Python), array_distinct per doc so a span counts once
    per document, then one hash aggregate keyed on the span. At 100 TB
    the only change is shuffling on xxhash64(span) instead of the
    span text (narrower shuffle rows) and pre-filtering singleton
    spans with a count-min pass; the plan shape is identical."""
    docs = load_table(spark, sf_dir, "documents")
    # One tokenizer contract repo-wide (operators.text.tokens): the
    # oracle's string_split(trim(text), ' ') matches it only under the
    # fixture invariant asserted in tests/test_fixture_invariants.py.
    toks = T.tokens("text")
    spans = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(7)),
            lambda i: F.array_join(F.slice(toks, i, 8), " "),
        )
    )
    return (
        docs.filter(F.size(toks) >= 8)
        .select("doc_id", spans.alias("spans"))
        .select("doc_id", F.explode("spans").alias("span"))
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "l20_quality_buckets",
    oracle="""
    WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
               FROM documents),
    v AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
    n AS (SELECT count(*) AS total FROM t),
    s AS (
      SELECT t.doc_id,
             round(avg(-log2(v.c * 1.0 / n.total)), 4) AS avg_neg_log2p
      FROM t JOIN v USING (tok) CROSS JOIN n
      GROUP BY t.doc_id),
    r AS (
      SELECT doc_id, avg_neg_log2p,
             row_number() OVER (ORDER BY avg_neg_log2p, doc_id) AS ppl_rank,
             count(*) OVER () AS n_docs
      FROM s)
    SELECT doc_id, avg_neg_log2p, ppl_rank,
           CAST(least(9, (ppl_rank - 1) * 10 // n_docs) + 1 AS BIGINT)
             AS ppl_decile,
           (least(9, (ppl_rank - 1) * 10 // n_docs) + 1) <= 8 AS is_kept
    FROM r
    """,
)
def l20_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 (perplexity-bucket curation, CCNet-style): rank every doc by
    its unigram LM surprise (l15's score), cut the corpus into 10
    equal-width deciles, and keep the best 80% — the "bucket by
    perplexity, drop the tail" curation step of CCNet/CC-pipeline
    recipes.

    The global rank uses the two-phase distributed form
    (operators/relational.py::global_row_number) — never a
    single-partition ORDER BY window — and the doc count rides in on a
    broadcast 1-row cross join, so every stage stays parallel at any
    corpus size. Decile = explicit width formula over (rank, N),
    bit-identical on both engines."""
    from ..operators.relational import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    scored = T.unigram_logprob_score(docs).select("doc_id", "avg_neg_log2p")
    ranked = global_row_number(
        scored,
        [F.asc("avg_neg_log2p"), F.asc("doc_id")],
        rank_col="ppl_rank",
    )
    # N must count SCORED documents — unigram_logprob_score emits no
    # row for a zero-token doc (T.tokens: empty/whitespace-only text
    # yields [], so the explode drops it), and the oracle's
    # count(*) OVER () counts scored rows. The old comment claimed
    # the split always yields a token (false — code-review r9) and
    # counted raw docs, which diverges the moment a regeneration
    # ships a token-less doc. The count stays a pruned scan (text
    # column only), never a re-evaluation of the scoring pipeline.
    n_docs = docs.filter(F.size(T.tokens("text")) > 0).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    decile = (
        F.least(
            F.lit(9),
            F.floor((F.col("ppl_rank") - 1) * 10 / F.col("n_docs")),
        )
        + 1
    ).cast("bigint")
    return (
        ranked.crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "avg_neg_log2p",
            "ppl_rank",
            decile.alias("ppl_decile"),
            (decile <= 8).alias("is_kept"),
        )
    )


@query(
    "l21_source_mixing",
    oracle="""
    WITH t AS (SELECT source, count(*) AS n_docs,
                      sum(len(string_split(trim(text), ' '))) AS n_tokens
               FROM documents GROUP BY source),
    p AS (SELECT *, sqrt(n_tokens) AS w_raw FROM t),
    s AS (SELECT sum(w_raw) AS tot FROM p)
    SELECT source,
           n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(w_raw / s.tot, 6) AS mix_weight,
           CAST(floor(w_raw / s.tot * 1000000) AS BIGINT) AS alloc_tokens,
           round(w_raw / s.tot * 1000000 / n_tokens, 4) AS oversample_epochs
    FROM p CROSS JOIN s
    """,
)
def l21_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 (data mixing): temperature-scaled per-source sampling weights
    for a fixed training-token budget — the multilingual/multi-source
    rebalancing step (weights ∝ n_tokens^α with α=0.5, i.e. T=2;
    the mBERT/XLM exponentiated-sampling recipe). Emits each source's
    token count, normalized mix weight, allocated tokens of a 1M
    budget, and the oversampling factor (epochs) that allocation
    implies.

    Shape: one hash aggregate keyed by source (map-side partials over
    the corpus scan — the only corpus-sized stage), then a 1-row
    broadcast cross join for the normalizer; output is |sources| rows.
    α is fixed at 0.5 so the power is `sqrt` — exactly rounded under
    IEEE 754 in both engines, keeping the oracle bit-stable (a libm
    `pow` could differ in the last ulp)."""
    docs = load_table(spark, sf_dir, "documents")
    budget = 1_000_000
    t = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(T.tokens("text"))).cast("long").alias("n_tokens"),
    )
    p = t.withColumn("w_raw", F.sqrt(F.col("n_tokens")))
    s = p.agg(F.sum("w_raw").alias("tot"))
    w = F.col("w_raw") / F.col("tot")
    return p.crossJoin(F.broadcast(s)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(w, 6).alias("mix_weight"),
        F.floor(w * budget).cast("long").alias("alloc_tokens"),
        F.round(w * budget / F.col("n_tokens"), 4).alias(
            "oversample_epochs"
        ),
    )


@query(
    "l22_prefix_dup_rate",
    oracle=f"""
    WITH h AS (SELECT doc_id, source,
                 {PREFIX_FP_SQL}
                   AS prefix_fp
               FROM documents),
    r AS (SELECT *, row_number() OVER (PARTITION BY prefix_fp
                                       ORDER BY doc_id) AS rk
          FROM h)
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT prefix_fp) AS n_unique_prefixes,
           count(*) FILTER (rk > 1) AS n_prefix_dupes,
           round(count(*) FILTER (rk > 1) * 1.0 / count(*), 4)
             AS prefix_dup_rate
    FROM r GROUP BY source
    """,
)
def l22_prefix_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2/L5 (curation diagnostic): per-source duplication rate under a
    first-8-token prefix fingerprint — the cheap boilerplate-header
    detector (shared headers/templates collide on their opening
    tokens long before full-content hashes do; the fixtures carry 24
    such collisions at sf0.01 where exact content dupes are zero).

    Shape: one shuffle keyed by the prefix fingerprint for the
    first-seen ranking (uniform unless one template dominates — the
    hot-prefix case IS the signal being measured), then a per-source
    hash aggregate; emits |sources| rows. At 100 TB swap the raw
    prefix string for xxhash64(prefix) as the shuffle key (narrower
    rows, same partitioning)."""
    docs = load_table(spark, sf_dir, "documents")
    pfx = _prefix_fp()
    w = Window.partitionBy("prefix_fp").orderBy("doc_id")
    ranked = docs.select(
        "doc_id", "source", pfx.alias("prefix_fp")
    ).withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("prefix_fp").alias("n_unique_prefixes"),
        F.count_if(F.col("rk") > 1).alias("n_prefix_dupes"),
        F.round(
            F.count_if(F.col("rk") > 1) / F.count(F.lit(1)), 4
        ).alias("prefix_dup_rate"),
    )


@query(
    "l23_source_overlap",
    oracle=f"""
    WITH g AS (SELECT DISTINCT source,
                 {PREFIX_FP_SQL}
                   AS fp
               FROM documents)
    SELECT a.source AS source_a, b.source AS source_b,
           count(*) AS n_shared
    FROM g a JOIN g b ON a.fp = b.fp AND a.source < b.source
    GROUP BY source_a, source_b
    """,
)
def l23_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2/L5 (cross-source contamination matrix): for every source
    pair, how many distinct first-8-token prefix fingerprints they
    share — the "is dataset A leaking into dataset B" diagnostic run
    before mixing corpora (same fingerprint family as l22).

    Shape: the inverted-index self-join pattern of l02 keyed by the
    fingerprint — only sources sharing a fingerprint ever meet, so
    the pair space is Σ df² over fingerprints, not |sources|²·docs.
    shuffle_hash-hinted like l02: the fingerprint index is
    corpus-sized and must never broadcast; both legs share one
    reused exchange. Output is ≤ |sources|² rows."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("source", _prefix_fp().alias("fp")).distinct()
    a, b = fp.alias("a"), fp.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@query(
    "l24_embedding_quantize",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    s AS (SELECT vec_id, v,
            list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
          FROM e),
    q AS (SELECT vec_id, scale,
            list_transform(v, x -> round(x / scale)) AS qv, v
          FROM s)
    SELECT vec_id,
           round(scale, 6) AS q_scale,
           CASE WHEN scale != 0 THEN
             round(sqrt(list_sum(list_transform(list_zip(v, qv),
                   p -> (p[1] - p[2]*scale) * (p[1] - p[2]*scale))) / len(v))
                   / scale, 4) END AS rel_rmse
    FROM q
    """,
)
def l24_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 (scalar int8 quantization): per-vector symmetric int8
    quantization (scale = max|x|/127, q = round(x/scale)) with the
    reconstruction error reported as RMSE relative to the scale — the
    memory-shrinking step in front of any large ANN index (IVF-PQ's
    simpler cousin; 4x smaller vectors, measurable recall cost).

    Shape: pure per-row native expressions (array_max / transform /
    zip_with / aggregate) — no shuffle, no Python; the scan's
    partitioning is the plan. Rounding parity: x/scale is an exactly
    rounded IEEE division on both engines and both round() halves
    away from zero, so the oracle is bit-stable."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scale = F.array_max(F.transform("v", lambda x: F.abs(x))) / F.lit(127.0)
    s = e.select("vec_id", "v", scale.alias("scale"))
    qv = F.transform("v", lambda x: F.round(x / F.col("scale")))
    q = s.select("vec_id", "v", "scale", qv.alias("qv"))
    sq_err = F.aggregate(
        F.zip_with(
            "v",
            "qv",
            lambda x, qx: (x - qx * F.col("scale"))
            * (x - qx * F.col("scale")),
        ),
        F.lit(0.0),
        lambda acc, y: acc + y,
    )
    # scale = 0 (an all-zero vector) makes rel_rmse 0/0 — Spark's
    # non-ANSI divide says NULL, DuckDB's IEEE divide says NaN; guard
    # EXPLICITLY on both engines so they agree on NULL (the l29/r44
    # divide-by-zero pin; code-review r8).
    return q.select(
        "vec_id",
        F.round(F.col("scale"), 6).alias("q_scale"),
        F.when(
            F.col("scale") != 0,
            F.round(F.sqrt(sq_err / F.size("v")) / F.col("scale"), 4),
        ).alias("rel_rmse"),
    )


@query(
    "l25_curation_pipeline",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, n_chars, text,
             row_number() OVER (
               PARTITION BY sha256(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               ORDER BY doc_id) AS rn
      FROM documents),
    kept AS (SELECT doc_id, lang, n_chars, text FROM h WHERE rn = 1),
    t AS (SELECT doc_id, lang, n_chars,
                 string_split(text, ' ') AS l FROM kept),
    f AS (SELECT doc_id, lang, n_chars, len(l) AS n_tokens,
                 round(list_sum(list_transform(l, x -> len(x) * 1.0))
                       / len(l), 4) AS mean_word_len,
                 round(len(list_distinct(l)) * 1.0 / len(l), 4)
                   AS distinct_ratio
          FROM t),
    good AS (SELECT doc_id, lang, n_tokens FROM f
             WHERE n_tokens >= 5 AND n_chars BETWEEN 20 AND 10000
               AND mean_word_len BETWEEN 2 AND 12
               AND distinct_ratio > 0.1),
    sh AS (SELECT doc_id,
             list_distinct(list_filter(
               list_transform(list_zip(l, l[2:], l[3:]),
                              s -> s[1] || ' ' || s[2] || ' ' || s[3]),
               x -> x IS NOT NULL)) AS g
           FROM (SELECT doc_id, string_split(text, ' ') AS l
                 FROM documents)),
    ex AS (SELECT doc_id, unnest(g) AS s FROM sh),
    bench AS (SELECT doc_id AS bench_id, s FROM ex WHERE doc_id % {BENCH_MOD} = 0),
    train AS (SELECT e.doc_id, e.s FROM ex e
              JOIN good g ON g.doc_id = e.doc_id
              WHERE e.doc_id % {BENCH_MOD} != 0),
    contaminated AS (SELECT DISTINCT tr.doc_id
                     FROM train tr JOIN bench b ON tr.s = b.s),
    clean AS (SELECT g.* FROM good g
              WHERE g.doc_id % {BENCH_MOD} != 0
                AND g.doc_id NOT IN (SELECT doc_id FROM contaminated))
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM clean GROUP BY lang
    """,
)
def l25_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-pack capstone: the operators COMPOSED as one curation
    pipeline — exact dedup (keep lowest doc_id per normalized digest)
    → Gopher/C4 quality gate → benchmark decontamination (every 40th
    doc_id plays the eval suite, as in l12) → per-language corpus
    summary. Each stage is the same operator its standalone query
    certifies; this query certifies that they compose (the id-set
    plumbing between stages is where real pipelines silently lose or
    double-count documents — the oracle rebuilds all four stages in
    one SQL and the hash match pins the whole lattice of survivors).

    Scale shape: dedup is one digest-keyed shuffle; the quality gate
    is a per-row map; stage plumbing is doc_id equi-joins (semi/anti),
    all AQE-planable; decontamination broadcasts only the benchmark
    shingles, so the corpus never shuffles for it; the output is
    |langs| rows."""
    from ..operators.dedup import decontaminate, exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    deduped = exact_dedup(docs).filter(F.col("is_kept")).drop(
        "content_hash", "dup_rank", "is_kept"
    )
    feats = T.quality_features(deduped)
    good = feats.filter(F.col("quality_pass"))
    train_docs = (
        deduped.join(good.select("doc_id"), "doc_id", "left_semi")
        .filter(F.col("doc_id") % BENCH_MOD != 0)
        .withColumn("tokens", T.tokens("text"))
    )
    bench = docs.filter(F.col("doc_id") % BENCH_MOD == 0).withColumn(
        "tokens", T.tokens("text")
    )
    contaminated = decontaminate(train_docs, bench).select("doc_id")
    clean = (
        good.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(contaminated, "doc_id", "left_anti")
    )
    return clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


@query(
    "l26_source_kl_drift",
    oracle="""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    cs AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
    ts AS (SELECT source, sum(c) AS t FROM cs GROUP BY 1),
    cw AS (SELECT w, sum(c) AS cg FROM cs GROUP BY 1),
    tg AS (SELECT sum(c) AS g FROM cs)
    SELECT cs.source,
           round(sum((cs.c * 1.0 / ts.t)
                     * ln((cs.c * 1.0 / ts.t)
                          / (cw.cg * 1.0 / (SELECT g FROM tg)))), 4)
             AS kl_divergence,
           max(ts.t)::BIGINT AS n_tokens
    FROM cs JOIN ts USING (source) JOIN cw USING (w)
    GROUP BY cs.source
    """,
)
def l26_source_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6-extension (mixture monitoring): KL divergence of each
    source's unigram distribution from the whole-corpus distribution
    — the standard drift/skew metric a data-mixing pipeline tracks
    per source (and per snapshot) to catch a feed whose content
    shifted. KL(P_source ‖ P_corpus) = Σ_w P(w)·ln(P(w)/Q(w)); every
    source token is by construction in the corpus vocabulary, so no
    zero-denominator smoothing is needed.

    Shape: one explode + (source, w) hash agg, a vocabulary-keyed
    equi-join of per-source counts to corpus counts (both
    vocabulary-sized — shuffled, NOT broadcast: at web scale the
    vocabulary is unbounded, unlike l15's capped-vocab LM leg), and a
    per-source scalar agg. Token totals ride the same aggregations;
    nothing rescans the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(T.tokens("text")).alias("w"))
    cs = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    # Optimization r11: cs feeds FOUR legs (main + ts + cw + tg) —
    # unpinned, each re-planned the corpus explode + aggregate (the
    # l26 plan held 4 parquet scans / 4 Generates). A lazy
    # localCheckpoint materializes the vocabulary×sources-sized
    # counts once; every leg reads the pinned RDD. Lazy ⇒ nothing
    # runs at construction; fresh per invocation ⇒ no cross-run
    # caching.
    cs = cs.localCheckpoint(eager=False)
    ts = cs.groupBy("source").agg(F.sum("c").alias("t"))
    cw = cs.groupBy("w").agg(F.sum("c").alias("cg"))
    tg = cs.agg(F.sum("c").alias("g"))
    p = F.col("c") / F.col("t")
    q = F.col("cg") / F.col("g")
    return (
        cs.join(F.broadcast(ts), "source")
        .join(cw, "w")
        .crossJoin(F.broadcast(tg))
        .groupBy("source")
        .agg(
            F.round(F.sum(p * F.log(p / q)), 4).alias("kl_divergence"),
            F.max("t").alias("n_tokens"),
        )
    )


@query(
    "l27_importance_resample",
    oracle="""
    WITH tok AS (SELECT doc_id, source, lang = 'en' AS is_tgt,
                        unnest(string_split(trim(text), ' ')) AS tok
                 FROM documents),
    raw AS (SELECT tok, count(*) AS c_raw,
                   count(*) FILTER (is_tgt) AS c_tgt
            FROM tok GROUP BY tok),
    scal AS (SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt,
                    count(*) AS v
             FROM raw),
    perdoc AS (SELECT t.doc_id,
                      count(*) AS n_tokens,
                      round(avg(log2((r.c_tgt + 1.0) / (r.c_raw + 1.0)))
                            + log2((s.n_raw + s.v) * 1.0
                                   / (s.n_tgt + s.v)), 4) + 0.0
                        AS llr_score
               FROM tok t JOIN raw r USING (tok) CROSS JOIN scal s
               GROUP BY t.doc_id, s.n_raw, s.n_tgt, s.v),
    ranked AS (SELECT d.doc_id, d.source, p.n_tokens, p.llr_score,
                      row_number() OVER (PARTITION BY d.source
                                         ORDER BY p.llr_score DESC,
                                                  d.doc_id) AS src_rank
               FROM perdoc p JOIN documents d USING (doc_id))
    SELECT doc_id, source, n_tokens, llr_score,
           CAST(src_rank AS BIGINT) AS src_rank,
           src_rank <= 10 AS is_kept
    FROM ranked
    """,
)
def l27_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6-extension (targeted data selection): DSIR-style importance
    resampling — score every document by the log-likelihood ratio
    between a target-domain unigram LM (here: the English slice,
    `lang = 'en'`) and the raw-corpus LM, then keep the top 10 per
    source (per-source quotas preserve the mixture l21 budgets; a
    global cut would let one domain-adjacent source crowd out the
    rest). The real pipeline (Xie et al. 2023) samples ∝ weight;
    the deterministic top-slice variant here keeps the oracle exact.

    Shape: `importance_llr_score` is two corpus passes — build the
    LM counts in one aggregate, then re-scan to score against the
    BROADCAST score table (Zipf-skewed key — never shuffled; vocab
    bounded at `vocab_size` with an OOV floor at web scale, exact on
    the fixtures; see the operator docstring for why two passes beat
    caching the exploded corpus); the per-source ranking is ONE
    shuffle keyed by source (uniform by construction — sources are
    feeds, not Zipf tokens). Ranking reads the ROUNDED score (both
    engines) so a last-ulp difference in the float mean can never
    flip the kept set."""
    docs = load_table(spark, sf_dir, "documents")
    scored = T.importance_llr_score(docs, target=F.col("lang") == "en")
    ranked = (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .withColumn(
            "src_rank",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.desc("llr_score"), F.asc("doc_id")
                )
            ),
        )
    )
    return ranked.select(
        "doc_id",
        "source",
        "n_tokens",
        "llr_score",
        F.col("src_rank").cast("long").alias("src_rank"),
        (F.col("src_rank") <= 10).alias("is_kept"),
    )


@query(
    "l28_ngram_novelty",
    oracle="""
    -- Depends on DuckDB list_zip NULL-PADDING to the longest input
    -- (tail shingles collapse to NULL via `NULL || x` and are
    -- list_filter'ed) and 1-based slicing l[2:]; pinned by the
    -- dialect canary in tests/test_fixture_invariants.py.
    WITH t AS (SELECT doc_id, source, string_split(trim(text), ' ') AS l
               FROM documents),
    sh AS (SELECT doc_id, source,
             list_distinct(list_filter(
               list_transform(list_zip(l, l[2:], l[3:], l[4:], l[5:]),
                 s -> s[1] || ' ' || s[2] || ' ' || s[3] || ' '
                      || s[4] || ' ' || s[5]),
               x -> x IS NOT NULL)) AS g
           FROM t),
    post AS (SELECT doc_id, source, unnest(g) AS sh FROM sh),
    firsts AS (SELECT sh, min(doc_id) AS first_doc FROM post GROUP BY sh),
    perdoc AS (SELECT p.doc_id, p.source,
                      count(*) AS n_shingles,
                      count(*) FILTER (f.first_doc = p.doc_id) AS n_novel
               FROM post p JOIN firsts f USING (sh)
               GROUP BY p.doc_id, p.source)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_shingles) AS BIGINT) AS n_shingles,
           CAST(sum(n_novel) AS BIGINT) AS n_novel,
           round(sum(n_novel) * 1.0 / sum(n_shingles), 4) AS novelty_rate
    FROM perdoc GROUP BY source
    """,
)
def l28_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5-extension (redundancy curve): per-source 5-gram novelty rate
    — the fraction of each document's distinct 5-gram shingles whose
    corpus-wide FIRST occurrence (lowest doc_id, i.e. ingestion
    order) is that document. The aggregate curve of this number over
    time is the standard "is this feed still contributing new
    content?" monitor in corpus curation (the RefinedWeb/C4 line of
    work tracks exactly this redundancy signal when deciding how
    deep to crawl a source).

    Shape (optimization r11): ONE corpus explode into (shingle, doc)
    postings behind ONE explicit hash(shingle) exchange that both
    aggregate legs reuse (ReusedExchange — the shingle Generate runs
    once), a shingle-keyed first-seen aggregate, and a per-doc
    novelty count derived from the FIRSTS relation alone (count of
    shingles crediting each first_doc) — the corpus-sized
    postings×firsts join-back of the previous plan is gone; the only
    join left stitches two ≤|docs|-sized relations at the doc grain.
    Hot boilerplate shingles skew only the shared postings exchange;
    AQE's skew handling covers that at scale, and a df-cap prefilter
    (l02f's guard) is the stronger lever if one shingle dominates.
    Per-doc then per-source aggregates collapse to |sources| rows."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    # Optimization r11 (guide §2.3/§2.4): ONE explicit hash(sh)
    # exchange that BOTH aggregate legs ride (ReusedExchange), so the
    # expensive zip_with shingle Generate runs once — the previous
    # join-back plan expanded the scan+Generate subtree twice AND
    # joined the corpus-sized postings against firsts. n_novel per
    # doc is derivable from the firsts relation ALONE (count shingles
    # by their first_doc), so the postings join-back is gone
    # entirely: the doc-grain stitch joins two ≤|docs|-sized
    # relations. Identical sums (each posting row still counts once
    # in n_shingles; each shingle credits exactly its first doc).
    post = docs.select(
        "doc_id", "source", F.explode(shingles("tokens", 5)).alias("sh")
    ).repartition("sh")
    firsts = post.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    novel = firsts.groupBy("first_doc").agg(
        F.count(F.lit(1)).alias("_novel")
    )
    docstats = post.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    perdoc = (
        docstats.join(
            novel, F.col("doc_id") == F.col("first_doc"), "left"
        )
        .select(
            "doc_id",
            "source",
            "n_shingles",
            F.coalesce(F.col("_novel"), F.lit(0)).alias("n_novel"),
        )
    )
    return perdoc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_shingles").cast("long").alias("n_shingles"),
        F.sum("n_novel").cast("long").alias("n_novel"),
        F.round(F.sum("n_novel") / F.sum("n_shingles"), 4).alias(
            "novelty_rate"
        ),
    )


@query(
    "l29_embedding_dim_stats",
    oracle="""
    -- Depends on DuckDB 1-BASED list indexing (embedding[1] = first
    -- element) + INCLUSIVE generate_series; pinned by the dialect
    -- canary in tests/test_fixture_invariants.py.
    WITH d AS (SELECT e.label, t.dim,
                      e.embedding[t.dim]::DOUBLE AS x
               FROM embeddings e,
                    unnest(generate_series(1, len(e.embedding)))
                      AS t(dim)),
    cls AS (SELECT dim, label, count(*) AS n_l,
                   sum(x) AS sx, sum(x * x) AS sx2
            FROM d GROUP BY dim, label),
    enr AS (SELECT *,
                   sum(n_l) OVER (PARTITION BY dim) AS n,
                   sum(sx) OVER (PARTITION BY dim) AS sxt,
                   sum(sx2) OVER (PARTITION BY dim) AS sx2t
            FROM cls),
    per AS (SELECT dim, max(n) AS n,
                   max(sxt) / max(n) AS mean,
                   max(sx2t) / max(n)
                     - (max(sxt) / max(n)) * (max(sxt) / max(n)) AS var,
                   sum(n_l * (sx / n_l - sxt / n)
                           * (sx / n_l - sxt / n)) / max(n)
                     AS between_var
            FROM enr GROUP BY dim)
    SELECT CAST(dim AS INT) AS dim,
           CAST(n AS BIGINT) AS n_vecs,
           round(mean, 4) AS mean,
           round(sqrt(greatest(var, 0)), 4) AS std,
           CASE WHEN var > 0 THEN round(between_var / var, 4) END
             AS fisher_ratio
    FROM per
    """,
)
def l29_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3-extension (embedding-space monitoring): per-DIMENSION
    statistics over the embedding corpus — mean, std, and the Fisher
    discriminant ratio (between-class variance of the label-wise
    means over total variance). The standard embedding-health panel:
    collapsed dimensions show std ≈ 0, scale drift shows in the
    means, and the Fisher ratio ranks which dimensions actually
    separate the labels (anisotropy/feature-collapse monitoring for
    a retrieval or clustering pipeline).

    All moments derive from ONE (dim, label) aggregate of sufficient
    statistics (n, Σx, Σx²) over the exploded corpus — per-dim
    totals and the between-class variance are algebra over those
    d×|labels| rows, so the corpus is genuinely scanned and exploded
    ONCE (asserted on the plan: one parquet scan, one Generate).
    Both engines compute the same formulas over the same sums,
    keeping the 4-dp rounding bit-stable (no var_pop, whose
    streaming merge order could differ in the last ulp). Degenerate
    dimensions are first-class: var is clamped at 0 before sqrt (FP
    cancellation can leave a collapsed dimension's var a hair
    negative) and fisher_ratio is NULL when var == 0 (Spark's
    non-ANSI divide and DuckDB's IEEE divide disagree on x/0, so the
    guard is explicit in BOTH engines — collapsed dimensions are
    exactly what this panel exists to surface, they must not crash
    or hash-mismatch on it).

    Shape: one posexplode, ONE corpus-sized hash aggregate keyed
    (dim, label) with map-side partials (d×|labels| groups: tiny,
    uniform — dimensions are the anti-skew key); everything after is
    algebra over d×|labels| rows via a dim-partitioned window + one
    final dim aggregate on the SAME key (no join, no further
    exchange). At 100 TB this is the cheapest query in the L3
    family: shuffle volume is O(partitions × d×|labels|), not
    O(rows)."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim0", "x"
        ),
    ).select((F.col("dim0") + 1).alias("dim"), "label", "x")
    cls = d.groupBy("dim", "label").agg(
        F.count(F.lit(1)).alias("n_l"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
    )
    w = Window.partitionBy("dim")
    enr = (
        cls.withColumn("n", F.sum("n_l").over(w))
        .withColumn("sxt", F.sum("sx").over(w))
        .withColumn("sx2t", F.sum("sx2").over(w))
    )
    lbl_mean = F.col("sx") / F.col("n_l")
    glob_mean = F.max("sxt") / F.max("n")
    per = enr.groupBy("dim").agg(
        F.max("n").alias("n"),
        glob_mean.alias("mean"),
        (
            F.max("sx2t") / F.max("n") - glob_mean * glob_mean
        ).alias("var"),
        (
            F.sum(
                F.col("n_l")
                * (lbl_mean - F.col("sxt") / F.col("n"))
                * (lbl_mean - F.col("sxt") / F.col("n"))
            )
            / F.max("n")
        ).alias("between_var"),
    )
    return per.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("n").cast("long").alias("n_vecs"),
        F.round("mean", 4).alias("mean"),
        F.round(F.sqrt(F.greatest(F.col("var"), F.lit(0.0))), 4).alias(
            "std"
        ),
        F.when(
            F.col("var") > 0,
            F.round(F.col("between_var") / F.col("var"), 4),
        ).alias("fisher_ratio"),
    )


@query(
    "l30_prefix_dedup_keep_longest",
    oracle=f"""
    WITH h AS (SELECT doc_id, source, lang, n_chars,
                 {PREFIX_FP_SQL}
                   AS prefix_fp
               FROM documents),
    r AS (SELECT *, row_number() OVER (PARTITION BY prefix_fp
                                       ORDER BY n_chars DESC, doc_id)
                      AS rk
          FROM h)
    SELECT doc_id, source, lang,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM r WHERE rk = 1
    """,
)
def l30_prefix_dedup_keep_longest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """L2-extension (materialized prefix dedup): keep ONE document per
    first-8-token prefix fingerprint, preferring the LONGEST content
    (n_chars DESC, doc_id tiebreak) — the keep-best companion to
    l22's diagnostic rate: l22 measures how much boilerplate-header
    duplication exists; this produces the deduplicated corpus a
    curation pipeline actually ships, keeping the most complete
    variant of each template instead of whichever arrived first
    (the RefinedWeb-style cheap pass that runs BEFORE MinHash).

    Shape: one shuffle keyed by the prefix fingerprint, rank-1 window
    inside it — no self-join, no candidate explosion; emits ≤ |docs|
    rows. Same skew posture as l22 (a hot template IS the thing being
    removed; at 100 TB key the shuffle on xxhash64(prefix) for
    narrower rows). The window never has an empty partition spec, so
    no single-partition global sort exists at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    pfx = _prefix_fp()
    w = Window.partitionBy("prefix_fp").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", "source", "lang", "n_chars", pfx.alias("prefix_fp"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "source", "lang", F.col("n_chars").cast("long").alias("n_chars"))
    )


@query(
    "l31_decontaminate_frac",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    sh AS (SELECT doc_id,
             list_distinct(list_filter(
               list_transform(list_zip(l, l[2:], l[3:]),
                              s -> s[1] || ' ' || s[2] || ' ' || s[3]),
               x -> x IS NOT NULL)) AS g
           FROM t),
    ex AS (SELECT doc_id, len(g) AS n_shingles, unnest(g) AS s FROM sh),
    b AS (SELECT DISTINCT s FROM ex WHERE doc_id % {BENCH_MOD} = 0),
    tr AS (SELECT doc_id, n_shingles, s FROM ex WHERE doc_id % {BENCH_MOD} != 0)
    SELECT tr.doc_id,
           CAST(tr.n_shingles AS BIGINT) AS n_shingles,
           CAST(count(DISTINCT tr.s) AS BIGINT) AS n_hit_shingles,
           round(count(DISTINCT tr.s) * 1.0 / tr.n_shingles, 4)
             AS hit_frac,
           count(DISTINCT tr.s) * 1.0 / tr.n_shingles >= 0.5
             AS is_contaminated
    FROM tr JOIN b ON tr.s = b.s
    GROUP BY tr.doc_id, tr.n_shingles
    """,
)
def l31_decontaminate_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6-extension (graded decontamination): per-train-doc fraction
    of distinct 3-gram shingles that appear anywhere in the benchmark
    slice (every 40th doc_id, as in l12), thresholded at 50% — the
    long-document companion to l12's any-hit filter: one shared
    phrase is noise, majority overlap is a leaked document. Same
    broadcast inverted-index shape as l12 (benchmark shingles
    broadcast, corpus streams map-side, one per-doc aggregate); the
    per-doc shingle total rides along row-locally, no second corpus
    pass."""
    from ..operators.dedup import decontaminate_frac

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    bench = docs.filter(F.col("doc_id") % BENCH_MOD == 0)
    train = docs.filter(F.col("doc_id") % BENCH_MOD != 0)
    return decontaminate_frac(train, bench, n=3, min_frac=0.5)


@query(
    "l32_incremental_dedup",
    oracle="""
    WITH d AS (SELECT doc_id, source, md5(text) AS dg FROM documents),
    corpus AS (SELECT DISTINCT dg FROM d WHERE doc_id % 3 = 0),
    batch AS (SELECT * FROM d WHERE doc_id % 3 != 0),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY dg
                                            ORDER BY doc_id) AS rk
               FROM batch)
    SELECT r.doc_id, r.source
    FROM ranked r
    LEFT JOIN corpus c USING (dg)
    WHERE r.rk = 1 AND c.dg IS NULL
    """,
)
def l32_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1-extension (incremental exact dedup): admit from a NEW batch
    (doc_id % 3 != 0) only documents whose content digest is (a) not
    already in the EXISTING corpus (doc_id % 3 = 0 plays the
    historical index) and (b) first-within-batch — the daily-crawl
    shape of l01: production dedup is never one static corpus, it is
    a stream of batches against an accumulated digest index.

    Shape: the corpus side reduces to a 1-column DISTINCT digest
    relation BEFORE the anti-join (at 100 TB this is the persisted
    dedup index, bucketed by digest; here it derives from the
    fixture); within-batch first-wins is a rank-1 window keyed by
    digest — both join and window share the digest-hash shuffle
    family, and no text column survives past the scan projection.
    md5 is used (not the house sha2) because BOTH engines ship it
    with identical output — the digest choice is certified by the
    hash match."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "source", F.md5("text").alias("dg"))
    corpus = d.filter(F.col("doc_id") % 3 == 0).select("dg").distinct()
    batch = d.filter(F.col("doc_id") % 3 != 0)
    w = Window.partitionBy("dg").orderBy("doc_id")
    return (
        batch.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .join(corpus, "dg", "left_anti")
        .select("doc_id", "source")
    )


@query(
    "l33_vocab_growth",
    oracle="""
    WITH b AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx
               FROM documents),
    d AS (SELECT CAST(floor((doc_id - b.mn) * 10.0 / (b.mx - b.mn + 1))
                   AS BIGINT) AS decile,
                 string_split(trim(text), ' ') AS toks
          FROM documents, b),
    t AS (SELECT decile, unnest(toks) AS tok FROM d),
    f AS (SELECT tok, min(decile) AS first_decile FROM t GROUP BY tok),
    newv AS (SELECT first_decile AS decile, count(*) AS n_new
             FROM f GROUP BY 1),
    occ AS (SELECT decile, count(*) AS n_occ FROM t GROUP BY 1)
    -- sums over BIGINT widen to HUGEINT in DuckDB (then float via
    -- pandas); CAST back to BIGINT for dtype parity with Spark.
    SELECT o.decile,
           coalesce(n.n_new, 0) AS n_new_tokens,
           CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY o.decile)
                AS BIGINT) AS cum_vocab,
           o.n_occ AS n_token_occurrences,
           CAST(sum(o.n_occ) OVER (ORDER BY o.decile) AS BIGINT)
             AS cum_tokens
    FROM occ o LEFT JOIN newv n USING (decile)
    """,
)
def l33_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 (corpus profiling: vocabulary growth / Heaps-law curve): the
    cumulative distinct-vocabulary count as the corpus grows decile by
    decile in ingestion order (doc_id) — the diagnostic that separates
    a diverse crawl (vocab keeps growing sublinearly, Heaps' law) from
    a templated/duplicated one (curve flattens immediately). Each
    decile row carries the new-token count, cumulative vocabulary,
    token occurrences, and cumulative corpus size in tokens.

    Shape: the decile label is pure arithmetic against a broadcast
    1-row bounds aggregate (NO global rank/window over the corpus —
    ingestion order is the doc_id value itself); token first-sightings
    are one explode + a token-keyed min-aggregate (map-side partial,
    uniform key); both decile rollups are 10-group hash aggregates.
    The only window runs over the ≤10-row decile relation — bounded by
    construction, which is why this global window is acceptable where
    a corpus-sized one never is (cf. the two-phase global ranks
    elsewhere)."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    d = docs.crossJoin(F.broadcast(b)).select(
        F.floor(
            (F.col("doc_id") - F.col("mn"))
            * 10.0
            / (F.col("mx") - F.col("mn") + 1)
        ).alias("decile"),
        "text",
    )
    t = d.select("decile", F.explode(T.tokens("text")).alias("tok"))
    # Optimization r11 (guide §2.3 "aggregate before you shuffle"):
    # both rollups (token first-sighting + per-decile occurrences)
    # previously re-planned the corpus tokenize. One shared
    # (token, decile)-grain count — vocab×10-sized, pinned lazily —
    # serves both exactly: min(decile) over a token's decile rows ≡
    # min over its occurrence rows, and Σ c per decile ≡ the row
    # count per decile. The corpus tokenizes ONCE.
    cnt = t.groupBy("tok", "decile").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=False)
    f = cnt.groupBy("tok").agg(F.min("decile").alias("decile"))
    newv = f.groupBy("decile").agg(F.count(F.lit(1)).alias("n_new"))
    occ = cnt.groupBy("decile").agg(F.sum("c").alias("n_occ"))
    w = (
        Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        occ.join(newv, "decile", "left")
        .select(
            "decile",
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
            .over(w)
            .alias("cum_vocab"),
            F.col("n_occ").alias("n_token_occurrences"),
            F.sum("n_occ").over(w).alias("cum_tokens"),
        )
    )


@query("l34_pq_topk")
def l34_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 (approximate, product quantization): 8×16 PQ codebooks +
    native ADC fold + 4× exact rerank for the same 20 queries as
    l03/l03b/l03c — the memory-compression ANN tier (8 code bytes per
    vector vs 256 raw): see operators/similarity.py::pq_topk.
    rerank_factor=10 (2% of this corpus) measures recall@5 = 0.72 on
    the synthetic near-uniform embeddings — PQ's worst case (no
    cluster structure for the codebooks to exploit; seeded random
    init, see the operator's fit notes); real embedding corpora sit
    far above this floor.
    Seeded and deterministic, but the codebooks are KMeans output —
    rows-only like every ANN variant; recall vs the exact operator is
    measured in tests/test_llm.py."""
    from ..operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    return pq_topk(
        queries_df, emb, k=5, n_subspaces=8, n_codes=16,
        rerank_factor=10, seed=42, dim=64,
        # fixture corpus is content-stable per path: fit once per
        # session, serve every call (see ivfpq_topk's docstring)
        fit_cache_key=sf_dir,
    )


@query(
    "l36_weighted_sample",
    oracle="""
    WITH w AS (SELECT doc_id, source,
                      len(string_split(trim(text), ' ')) AS n_tokens,
                      ((((doc_id % 2147483648) * 2654435761)
                          % 4294967296) + 1)
                        / 4294967297.0 AS u
               FROM documents),
    k AS (SELECT doc_id, source, n_tokens,
                 pow(u, 1.0 / n_tokens) AS key
          FROM w WHERE n_tokens >= 1)
    SELECT doc_id, source, n_tokens, round(key, 6) AS sample_key
    FROM k
    ORDER BY round(key, 12) DESC, doc_id
    LIMIT 100
    """,
)
def l36_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 (weighted sampling): a token-weighted sample WITHOUT
    replacement of 100 documents via A-ES keys (Efraimidis &
    Spirakis, "Weighted random sampling with a reservoir", IPL 2006:
    key = u^(1/w); the global top-k by key IS an exact weighted
    sample) — the one-pass distributed answer to "give me a
    length-weighted subset" that naive per-row Bernoulli sampling
    only approximates.

    u is a seeded multiplicative hash of doc_id (Knuth's 2654435761
    mod 2³², +1 so u>0) — pure integer arithmetic both engines
    compute bit-identically, which is what makes a randomized-looking
    operator ORACLE-ABLE: the randomness is a deterministic function
    of the data. doc_id is reduced mod 2³¹ BEFORE the multiply
    (registry backlog item (i), r10): the raw product wraps int64 for
    doc_id ≥ ~3.5e9 — Spark would silently emit a corrupt sample at
    100 TB doc counts while DuckDB errors — and the reduction keeps
    the max product at (2³¹-1)·2654435761 ≈ 5.7e18 < 2⁶³-1 while
    leaving every sub-2³¹ doc_id's hash (and thus the certified
    fixture sample) bit-identical. The ranking uses round(key, 12)
    with a doc_id tiebreak so a last-ulp libm pow() divergence
    between JVM and C cannot reorder the cutoff.

    Shape: map-side key computation, then global top-100 compiles to
    TakeOrderedAndProject (per-partition heaps, no full sort — the
    r15 pattern); nothing but the 100 winners crosses the network."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        (
            ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
            % F.lit(4294967296)
        )
        + 1
    ) / F.lit(4294967297.0)
    w = docs.select(
        "doc_id",
        "source",
        F.size(T.tokens("text")).cast("long").alias("n_tokens"),
        u.alias("u"),
    ).filter(F.col("n_tokens") >= 1)
    k = w.withColumn("key", F.pow(F.col("u"), 1.0 / F.col("n_tokens")))
    return (
        k.orderBy(F.round(F.col("key"), 12).desc(), F.col("doc_id"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.round(F.col("key"), 6).alias("sample_key"),
        )
        .limit(100)
    )


@query(
    "l37_collocations",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t
                  FROM documents),
    uni AS (SELECT unnest(t) AS w FROM toks),
    un AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    tot AS (SELECT sum(c) AS n FROM un),
    big AS (SELECT t[i] AS w1, t[i + 1] AS w2
            FROM toks, unnest(range(1, len(t))) AS u(i)),
    bn AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
    btot AS (SELECT sum(c12) AS nb FROM bn)
    SELECT w1, w2, c12 AS n_pair,
           round(ln((c12 * 1.0 / btot.nb)
                    / ((u1.c * 1.0 / tot.n) * (u2.c * 1.0 / tot.n))),
                 4) AS pmi
    FROM bn
    JOIN un u1 ON u1.w = bn.w1
    JOIN un u2 ON u2.w = bn.w2
    CROSS JOIN tot CROSS JOIN btot
    WHERE c12 >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 25
    """,
)
def l37_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 (collocation extraction): top-25 token bigrams by pointwise
    mutual information (PMI = ln(p(xy)/(p(x)p(y))), min pair count 5)
    — the classic corpus-linguistics collocation detector (Church &
    Hanks 1990), and in an LLM pipeline the cheap multi-word-entity /
    template-phrase surfacer.

    Shape: unigram and bigram counts are each ONE explode + hash
    aggregate (map-side partials; bigrams via the zip_with
    shifted-slice idiom — see dedup.shingles for why never to index
    the outer array in a transform lambda); the two totals are 1-row
    broadcast legs. Join orientation is the scale decision: the
    c12 >= 5 PRUNED bigram relation (Zipf: survivors are a small
    fraction) is the BROADCAST side and the vocabulary-sized unigram
    relation STREAMS — a vocabulary can be arbitrarily large at
    100 TB, the pruned survivor set cannot (self-review: the first
    cut broadcast the vocabulary side). Top-25 compiles to
    TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    t = T.tokens("text")
    toks = docs.select("doc_id", t.alias("t"))
    uni = toks.select(F.explode("t").alias("w"))
    # Optimization r11 (guide §2.3/§2.4): the unigram counts feed
    # THREE legs (tot + both join sides) and the bigram stream fed
    # TWO separate aggregates — unpinned, each consumer re-planned
    # its full corpus tokenize (the l37 plan held 5 Generates). Pin
    # the vocabulary-sized unigram counts and the bigram-grain counts
    # once each (lazy localCheckpoints — nothing runs at
    # construction, fresh per invocation); the bigram TOTAL derives
    # from the unfiltered bigram counts (Σ c12 ≡ the old
    # count-of-rows over the stream, exactly), so the corpus
    # tokenizes once per n-gram order instead of five times.
    un = uni.groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=False)
    tot = un.agg(F.sum("c").alias("n"))
    bigrams = T.shifted_pairs(
        F.col("t"), lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
    )
    big = toks.select(F.explode(bigrams).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    bg = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    ).localCheckpoint(eager=False)
    bn = bg.filter(F.col("c12") >= 5)
    btot = bg.agg(F.sum("c12").alias("nb"))
    u1 = un.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = un.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log(
            (F.col("c12") / F.col("nb"))
            / ((F.col("c1") / F.col("n")) * (F.col("c2") / F.col("n")))
        ),
        4,
    )
    j1 = u1.join(F.broadcast(bn), "w1")
    j2 = u2.join(F.broadcast(j1), "w2")
    return (
        j2.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select("w1", "w2", F.col("c12").alias("n_pair"), pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(25)
    )


@query(
    "l38_fuzzy_join",
    oracle="""
    WITH b AS (SELECT doc_id,
                      array_to_string((string_split(trim(text), ' '))[1:2],
                                      ' ') AS blk,
                      substr(text, 1, 80) AS head
               FROM documents)
    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
           levenshtein(a.head, c.head) AS edit_distance
    FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
    WHERE levenshtein(a.head, c.head) <= 10
    """,
)
def l38_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (typo-tolerant near-dup / entity-resolution join): document
    pairs whose 80-char heads are within Levenshtein distance 10,
    candidate-generated by a first-2-token blocking key — the
    classic blocked fuzzy join (never all-pairs: edit distance is
    O(len²) per pair, so the block join must bound the pair space
    first; 182 candidate pairs vs 124,750 all-pairs at sf0.01). The
    fixtures separate cleanly: 24 template-prefix dupes at distance
    0, one genuinely fuzzy pair at 4, then a gap to 40+ — the ≤10
    threshold is calibrated inside that gap, so the hash certifies
    both the blocking and the distance semantics (Spark and DuckDB
    implement the same unit-cost Levenshtein).

    Shape: one derived (doc, block-key, head) relation; self
    equi-join on the block key with the shuffle_hash hint (the
    relation is corpus-sized — it must never broadcast, the l02
    convention); the distance predicate runs only on block-mates.
    Hot blocks (a universally shared 2-token prefix) are the same
    skew class as hot shingles — l02's df-cap guard generalizes; at
    100 TB block on a longer prefix or (prefix, length-bucket)."""
    # EXPLICIT None: this registration is the oracle'd UNCAPPED exact
    # tier (its r5 driver row certifies the full pair space). The
    # OPERATOR's default is the capped form (max_block_size=1000) —
    # the signature a user copies is scale-safe by default; l38b is
    # the guard-FIRING certification.
    from ..operators.dedup import fuzzy_blocked_join

    return fuzzy_blocked_join(
        load_table(spark, sf_dir, "documents"), max_block_size=None
    )


@query(
    "l38b_fuzzy_join_capped",
    oracle="""
    WITH b AS (SELECT doc_id,
                      array_to_string((string_split(trim(text), ' '))[1:2],
                                      ' ') AS blk,
                      substr(text, 1, 80) AS head
               FROM documents),
    hot AS (SELECT blk FROM b GROUP BY blk HAVING count(*) > 3),
    k AS (SELECT b.* FROM b ANTI JOIN hot USING (blk))
    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
           levenshtein(a.head, c.head) AS edit_distance
    FROM k a JOIN k c ON a.blk = c.blk AND a.doc_id < c.doc_id
    WHERE levenshtein(a.head, c.head) <= 10
    """,
)
def l38b_fuzzy_join_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (blocked fuzzy join, guard FIRING — the l02g stance): the
    l38 join with the hot-block cap pinned at 3, UNDER the fixtures'
    max block size of 4-5, so the guard genuinely drops blocks (9 of
    25 pairs at sf0.01 disappear with their over-cap blocks) and the
    oracle recomputes the identical filtered universe in SQL — the
    cap's dropping behavior AND the post-cap pair space are
    hash-certified end-to-end. At 100 TB the cap is what bounds a
    hot prefix's block² pair blow-up (l38's measured ∝SF² exponent
    on the fixed-vocabulary fixtures); production would also block
    on a longer prefix or (prefix, length-bucket) — the cap is the
    backstop that makes the worst key affordable either way."""
    from ..operators.dedup import fuzzy_blocked_join

    return fuzzy_blocked_join(
        load_table(spark, sf_dir, "documents"), max_block_size=3
    )


@query(
    "l40_prep_pipeline2",
    oracle=f"""
    -- Stage 1: prefix dedup keep-longest (l30 semantics, verbatim)
    WITH h AS (SELECT doc_id, source, lang, n_chars, text,
                 {PREFIX_FP_SQL}
                   AS prefix_fp
               FROM documents),
    r AS (SELECT *, row_number() OVER (PARTITION BY prefix_fp
                                       ORDER BY n_chars DESC, doc_id)
                      AS rk
          FROM h),
    d0 AS (SELECT doc_id, source, lang, n_chars, text FROM r
           WHERE rk = 1),
    -- Stage 2: quality gate (l06 semantics, verbatim incl. the
    -- un-trimmed split)
    t AS (SELECT doc_id, source, n_chars, text,
                 string_split(text, ' ') AS l FROM d0),
    f AS (SELECT doc_id, source, text,
                 len(l) AS n_tokens,
                 (len(l) >= 5 AND n_chars BETWEEN 20 AND 10000
                  AND round(list_sum(list_transform(l, x -> len(x) * 1.0))
                            / len(l), 4) BETWEEN 2 AND 12
                  AND round(len(list_distinct(l)) * 1.0 / len(l), 4)
                      > 0.1) AS quality_pass
          FROM t),
    q AS (SELECT doc_id, source, text FROM f WHERE quality_pass),
    -- Stage 3: language-ID gate (l08 semantics: argmax > 0)
    lt AS (SELECT doc_id, source, text,
                  list_distinct(string_split(trim(text), ' ')) AS toks
           FROM q),
    ls AS (SELECT *,
             coalesce(len(list_intersect(toks,
               ['the','and','fast','query','table'])), -1) AS s_en,
             coalesce(len(list_intersect(toks,
               ['el','la','de','que','rapido'])), -1) AS s_es,
             coalesce(len(list_intersect(toks,
               ['der','die','und','schnell','tabelle'])), -1) AS s_de,
             coalesce(len(list_intersect(toks,
               ['le','la','et','rapide','requete'])), -1) AS s_fr,
             coalesce(len(list_intersect(toks,
               ['de5','shi4','kuai4','biao3','cha2'])), -1) AS s_zh
           FROM lt),
    keep AS (SELECT doc_id, source, text FROM ls
             WHERE greatest(s_en, s_es, s_de, s_fr, s_zh) > 0),
    -- Stage 4: temperature mixing over the SURVIVORS (l21 semantics)
    m AS (SELECT source, count(*) AS n_docs,
                 sum(len(string_split(trim(text), ' '))) AS n_tokens
          FROM keep GROUP BY source),
    p AS (SELECT *, sqrt(n_tokens) AS w_raw FROM m),
    s AS (SELECT sum(w_raw) AS tot FROM p)
    SELECT source,
           n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(w_raw / s.tot, 6) AS mix_weight,
           CAST(floor(w_raw / s.tot * 1000000) AS BIGINT)
             AS alloc_tokens
    FROM p CROSS JOIN s
    """,
)
def l40_prep_pipeline2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-pack flagship #2 (composed curation pipeline, the l25
    companion): prefix-dedup (keep-longest, l30) → Gopher quality
    gate (l06) → language-ID gate (l08 argmax, drop 'unknown') →
    temperature-scaled source-mixing weights over the SURVIVORS
    (l21, α=0.5, 1M-token budget) — four certified stages fused into
    ONE lazy plan, the shape a production prep job actually ships
    (each stage feeds the next; nothing materializes in between).
    The oracle rebuilds all four stages in one SQL chain, reusing
    each stage's certified fragment VERBATIM (including l06's
    untrimmed split vs l08's trimmed one — semantic seams stay
    exactly as individually certified), so the hash proves the
    COMPOSITION, not just the parts.

    Shape: one prefix-fp-keyed shuffle (rank-1 window), then every
    gate is a row-local projection/filter over the survivor stream —
    no joins at all until the final |sources|-row aggregate + 1-row
    broadcast normalizer. Catalyst fuses the three gates into the
    same stage as the dedup output; at 100 TB the whole pipeline is
    TWO shuffles (prefix window, source aggregate) regardless of how
    many row-local gates are added."""
    docs = load_table(spark, sf_dir, "documents")
    pfx = _prefix_fp()
    w = Window.partitionBy("prefix_fp").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    d0 = (
        docs.select(
            "doc_id", "source", "lang", "n_chars", "text",
            pfx.alias("prefix_fp"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "source", "lang", "n_chars", "text")
    )
    q = (
        T.quality_features(d0, carry=["source", "text"])
        .filter(F.col("quality_pass"))
        .select("doc_id", "lang", "source", "text")
    )
    keep = (
        T.langid_scores(q, carry=["source", "text"])
        .filter(F.col("predicted_lang") != "unknown")
        .select("doc_id", "source", "text")
    )
    budget = 1_000_000
    m = keep.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(T.tokens("text"))).cast("long").alias("n_tokens"),
    )
    p = m.withColumn("w_raw", F.sqrt(F.col("n_tokens")))
    s = p.agg(F.sum("w_raw").alias("tot"))
    wgt = F.col("w_raw") / F.col("tot")
    return p.crossJoin(F.broadcast(s)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(wgt, 6).alias("mix_weight"),
        F.floor(wgt * budget).cast("long").alias("alloc_tokens"),
    )


@query(
    "l41_token_gini",
    oracle="""
    WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
               FROM documents
               WHERE text IS NOT NULL AND source IS NOT NULL),
    c AS (SELECT source, tok, count(*) AS c FROM t GROUP BY source, tok),
    r AS (SELECT source, c,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY c, tok) AS rk
          FROM c)
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(c) AS BIGINT) AS total_tokens,
           round(2.0 * sum(rk * c) / (count(*) * sum(c))
                 - (count(*) + 1.0) / count(*), 4) AS gini
    FROM r GROUP BY source
    """,
)
def l41_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5-extension (corpus-health monitor): per-source Gini
    coefficient of the token-frequency distribution — 0 means every
    vocabulary word is used equally, →1 means a few tokens dominate.
    A collapsing or template-spammed source shows up as a Gini jump
    long before perplexity moves; the natural companion to l26's
    cross-source KL drift (this one is WITHIN-source concentration).

    Formula (sorted-ascending rank form): G = 2·Σ(rank·count) /
    (n·Σcount) − (n+1)/n, with ties broken by token so the rank
    assignment is deterministic on both engines (tied counts permute
    within equal values, leaving Σ(rank·count) unchanged — the
    tiebreak is for determinism hygiene, not correctness).

    Scale shape: explode → hash agg with map-side partials to the
    (source, token) relation — bounded by |sources|·|vocab|, NOT by
    corpus rows — then a window PARTITIONED by source over that
    bounded relation (the per-partition width is the source's
    vocabulary, the same bound every vocab leg in this pack leans
    on), and a final per-source agg that reuses the window's
    clustering. The oracle splits on single spaces per the fixture
    invariant (tests/test_fixture_invariants.py)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    counts = (
        docs.select("source", F.explode(T.tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy("c", "tok")
    ranked = counts.withColumn("rk", F.row_number().over(w))
    n, tot, s = F.count(F.lit(1)), F.sum("c"), F.sum(F.col("rk") * F.col("c"))
    return ranked.groupBy("source").agg(
        n.alias("vocab_size"),
        tot.alias("total_tokens"),
        F.round(
            F.lit(2.0) * s / (n * tot) - (n + F.lit(1.0)) / n, 4
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Round-6 promotions (staged round 5, locally certified in their test
# files; oracles moved VERBATIM from the staged SQL). Operator
# docstrings carry the scale posture; property/edge tests stay in the
# original test files.
# ---------------------------------------------------------------------------

@query(
    "l42_containment_pairs",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS l
               FROM documents
               WHERE text IS NOT NULL AND lang IS NOT NULL),
    sh AS (SELECT doc_id, lang,
                  list_distinct(list_filter(
                    list_transform(list_zip(l, l[2:], l[3:]),
                                   s -> s[1] || ' ' || s[2] || ' ' || s[3]),
                    x -> x IS NOT NULL)) AS g
           FROM t),
    e AS (SELECT doc_id, lang, len(g) AS n, unnest(g) AS s FROM sh),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n AS n_a, b.n AS n_b, count(*) AS c
          FROM e a JOIN e b
            ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
    SELECT doc_a, doc_b,
           round(c * 1.0 / n_a, 4) AS cont_a_in_b,
           round(c * 1.0 / n_b, 4) AS cont_b_in_a
    FROM p
    WHERE greatest(round(c * 1.0 / n_a, 4), round(c * 1.0 / n_b, 4)) >= 0.6
    """,
)
def l42_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-extension (asymmetric near-dup): n-gram CONTAINMENT join —
    |A∩B|/|A| and |A∩B|/|B| per candidate pair, flagging pairs where
    EITHER direction ≥ 0.6. Catches the quote-inside-a-document and
    subset-template cases symmetric Jaccard structurally cannot (a
    6-token quote in a 60-token doc is containment 1.0, Jaccard
    ~0.07 — hand pin in tests/test_containment.py). Rides the same
    lang-blocked inverted shingle index and hot-shingle df-cap core
    as l02/l02g (operators/dedup.py::ngram_containment_pairs);
    guard-neutrality on the fixtures is itself tested."""
    from ..operators.dedup import ngram_containment_pairs

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    return ngram_containment_pairs(docs, threshold=0.6, max_shingle_df=None)


@query(
    "l43_embedding_corr_matrix",
    oracle="""
    WITH x AS (SELECT vec_id, r.i::INT AS i, embedding[r.i]::DOUBLE AS v
               FROM embeddings, range(1, 65) r(i)
               WHERE embedding IS NOT NULL),
    m AS (SELECT i, avg(v) AS mu, stddev_pop(v) AS sd FROM x GROUP BY i),
    c AS (SELECT a.i AS i, b.i AS j, avg(a.v * b.v) AS exy
          FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
          GROUP BY 1, 2)
    SELECT c.i, c.j,
           CASE WHEN ma.sd > 0 AND mb.sd > 0
                -- + 0.0 pins -0.0 -> +0.0, matching the Spark side
                THEN round((c.exy - ma.mu * mb.mu) / (ma.sd * mb.sd), 4) + 0.0
           END AS corr
    FROM c JOIN m ma ON c.i = ma.i JOIN m mb ON c.j = mb.i
    """,
)
def l43_embedding_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-health monitor #2 (after l29's marginals): the full
    d×d Pearson correlation matrix of embedding dimensions, upper
    triangle (i ≤ j), NULL on constant dimensions — redundant/dead
    dimensions and copy-paste projection bugs show up as off-diagonal
    ~1.0 stripes. The operator reduces the corpus in ONE pass of
    d(d+1)/2 sufficient statistics (sum, sum², cross-products) via a
    single hash aggregate — never the naive O(N·d²) self-join the
    oracle uses (fine single-process at sf0.01, wrong at 100 TB).
    operators/embeddings.py::embedding_correlation; constant-dim /
    fp-cancellation / ragged-raise pins in tests/test_embeddings.py."""
    from ..operators.embeddings import embedding_correlation

    return embedding_correlation(
        load_table(spark, sf_dir, "embeddings"), dim=64
    )


@query("l44_embedding_spectrum")  # rows-only BY DESIGN: eigh has no SQL twin
def l44_embedding_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-health monitor #3: eigen-spectrum of the population
    covariance — one row (n_vectors, total_var, top1_share,
    effective_rank, n_components_90), the representation-collapse
    alarm (top1_share → 1 means the space has collapsed onto one
    axis; effective_rank ≪ d means anisotropy). Distributed part is
    the one-pass covariance sufficient-stats aggregate; the d×d
    eigendecomposition itself is a DRIVER-SIDE numpy eigh on the
    d²-sized (not N-sized) result — rows-only by design
    (eigendecomposition has no SQL twin); certified against a
    single-process numpy reference in tests/test_embeddings.py."""
    from ..operators.embeddings import embedding_spectrum

    return embedding_spectrum(
        load_table(spark, sf_dir, "embeddings"), dim=64
    )


@query(
    "l46_quantized_recall",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    recon AS (
      -- zero-scale guard (the l24 pin): an all-zero vector
      -- reconstructs as itself, never via x/0
      SELECT vec_id,
             CASE WHEN list_max(list_transform(v, y -> abs(y))) != 0
             THEN list_transform(
               list_transform(v, x -> round(
                 x / (list_max(list_transform(v, y -> abs(y))) / 127.0))),
               q -> q * (list_max(list_transform(v, y -> abs(y))) / 127.0))
             ELSE v END AS rv
      FROM e),
    q AS (SELECT * FROM e WHERE vec_id < 20),
    tp AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_sum(list_transform(list_zip(q.v, c.v), s -> s[1]*s[2]))
                   / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
                      * sqrt(list_sum(list_transform(c.v, x -> x*x)))), 4)
               AS cos_sim
      FROM q JOIN e c ON c.vec_id != q.vec_id),
    truth AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM tp QUALIFY rnk <= 5),
    cp AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_sum(list_transform(list_zip(q.v, c.rv), s -> s[1]*s[2]))
                   / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
                      * sqrt(list_sum(list_transform(c.rv, x -> x*x)))), 4)
               AS cos_sim
      FROM q JOIN recon c ON c.vec_id != q.vec_id),
    cand AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM cp QUALIFY rnk <= 5)
    SELECT t.query_id, count(*) AS n_relevant,
           CAST(count(c.rnk) AS BIGINT) AS n_hits,
           round(count(c.rnk) * 1.0 / count(*), 4) AS recall_at_k,
           round(coalesce(1.0 / min(c.rnk), 0.0), 4) AS mrr
    FROM truth t LEFT JOIN cand c
      ON t.query_id = c.query_id AND t.neighbor_id = c.neighbor_id
    GROUP BY t.query_id
    """,
)
def l46_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality metrics: recall@5 / MRR of the DETERMINISTIC
    int8-reconstruction ranking against the exact cosine ranking —
    the one ANN-family comparison that is fully oracle-able (no
    KMeans/LSH randomness; quantization is pure arithmetic on both
    engines, the l24 parity). Both sides rank on the 4dp-rounded
    similarity with an id tiebreak, so the top-5 SETS are
    engine-identical and the metrics hash exactly.
    operators/similarity.py::ranking_metrics; metric-semantics hand
    cases in tests/test_ranking_metrics.py."""
    from ..operators.similarity import ranking_metrics

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    scale = F.array_max(
        F.transform("embedding", lambda x: F.abs(x))
    ) / F.lit(127.0)
    # zero-scale guard (the l24 pin, code-review r8): an all-zero
    # vector reconstructs as itself — x/0 would NULL (Spark) / NaN
    # (DuckDB) the whole reconstructed vector.
    recon = emb.select(
        "vec_id",
        F.when(
            scale != 0,
            F.transform(
                F.transform("embedding", lambda x: F.round(x / scale)),
                lambda q: q * scale,
            ),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    queries_df = emb.filter(F.col("vec_id") < 20).limit(20)
    truth = cosine_topk_exact(queries_df, emb, k=5)
    cand = cosine_topk_exact(queries_df, recon, k=5)
    return ranking_metrics(cand, truth, k=5)


@query(
    "l47_calibrated_gate",
    oracle="""
    WITH s AS (
      SELECT doc_id, source,
             round(len(list_distinct(string_split(trim(text), ' '))) * 1.0
                   / len(string_split(trim(text), ' ')), 4) AS ttr
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
    r AS (
      SELECT doc_id, source, ttr,
             percent_rank() OVER (PARTITION BY source
                                  ORDER BY ttr DESC, doc_id) AS pr
      FROM s)
    SELECT doc_id, source, ttr, round(pr, 4) AS pct_rank,
           round(pr, 4) <= 0.8 AS is_kept
    FROM r
    """,
)
def l47_calibrated_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6-extension (cross-source calibration): keep the top 80% of
    each SOURCE by type-token ratio — per-stratum percent_rank, the
    calibration l20's global deciles cannot do (a strict source whose
    scores all run low still keeps its top fraction; strata
    independence pinned in tests/test_calibrated_gate.py). Best-first
    ordering (score DESC, doc_id ASC) is a total order; the window
    partitions by source, so no global sort exists at any scale.
    operators/text.py::rank_calibrated_gate."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select(
            "doc_id",
            "source",
            F.round(
                F.size(F.array_distinct(F.split(F.trim("text"), " ")))
                / F.size(F.split(F.trim("text"), " ")),
                4,
            ).alias("ttr"),
        )
    )
    return T.rank_calibrated_gate(
        docs, ["source"], "ttr", keep_frac=0.8, tiebreak_col="doc_id"
    )


L48_QUERY_TERMS = ["scan", "merge", "window", "stream"]
# interpolated into the l48/l49 oracle IN-lists so the Spark-side
# query terms and the oracle's literal list can never drift
# (hardening (j), r9 sweep -- the PREFIX_FP_SQL pattern)
_L48_TERMS_SQL = ", ".join(f"'{t}'" for t in L48_QUERY_TERMS)


@query(
    "l48_bm25_scores",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x != '')
               AS toks
      FROM documents WHERE text IS NOT NULL),
    m AS (
      SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM t),
    h AS (
      SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t),
    q AS (
      SELECT doc_id, dl, term FROM h
      WHERE term IN ({_L48_TERMS_SQL})),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS dfreq FROM q GROUP BY 1),
    tf AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM q GROUP BY 1, 2, 3)
    SELECT tf.doc_id, count(*) AS n_terms_matched,
           round(sum(
             ln((m.n_docs - df.dfreq + 0.5) / (df.dfreq + 0.5) + 1.0)
             * ((tf.tf * 2.2)
                / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / m.avgdl)))
           ), 4) AS score
    FROM tf JOIN df USING (term) CROSS JOIN m
    GROUP BY 1
    """,
)
def l48_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval ranker: Okapi BM25 of every document against
    a 4-term query (Lucene smoothed idf, (k1+1)-numerator tf
    saturation) — pairs with l03's embedding top-k for hybrid search
    (fused in l49). The query-term filter lands directly on the
    exploded tokens, so everything past the scan is matched-tokens-
    sized; df and the (N, avgdl) moments are broadcast back. ln and
    the idf·(sat) parenthesization match the oracle exactly so 4dp
    rounding absorbs only libm ulp. operators/text.py::bm25_scores;
    closed-form hand check in tests/test_bm25.py."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bm25_scores(docs, "doc_id", "text", L48_QUERY_TERMS)


@query(
    "l49_hybrid_rrf",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, string_split(trim(text), ' ') AS toks
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
    m AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM t),
    h AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t),
    q AS (SELECT doc_id, dl, term FROM h
          WHERE term IN ({_L48_TERMS_SQL})),
    df AS (SELECT term, count(DISTINCT doc_id) AS dfreq FROM q GROUP BY 1),
    tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM q GROUP BY 1, 2, 3),
    bm AS (SELECT tf.doc_id, sum(
             ln((m.n_docs - df.dfreq + 0.5) / (df.dfreq + 0.5) + 1.0)
             * ((tf.tf * 2.2)
                / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / m.avgdl)))) AS score
           FROM tf JOIN df USING (term) CROSS JOIN m GROUP BY 1),
    run1 AS (SELECT t.source, bm.doc_id,
                    row_number() OVER (PARTITION BY t.source
                                       ORDER BY bm.score DESC, bm.doc_id)
                      AS rnk
             FROM bm JOIN t ON t.doc_id = bm.doc_id),
    ttr AS (SELECT doc_id, source,
                   len(list_distinct(toks)) * 1.0 / len(toks) AS score
            FROM t),
    run2 AS (SELECT source, doc_id,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY score DESC, doc_id) AS rnk
             FROM ttr),
    u AS (SELECT source, doc_id, 1.0 / (60 + rnk) AS c FROM run1
          UNION ALL SELECT source, doc_id, 1.0 / (60 + rnk) FROM run2)
    SELECT source, doc_id, count(*) AS n_runs,
           round(sum(c), 4) AS rrf_score
    FROM u GROUP BY 1, 2
    """,
)
def l49_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval fusion: reciprocal-rank fusion (k = 60) of
    the l48 BM25 ranking with a type-token-ratio quality ranking,
    per source — the standard score-scale-free way to combine
    lexical and quality signals. Docs absent from a run contribute
    nothing (the classic RRF convention; n_runs is the
    signal-agreement count); ranks order by (score DESC, doc_id ASC),
    so ties are deterministic. Each run is ranked inside its own
    source partition — no global window at any scale.
    operators/similarity.py::rrf_fuse; closed-form rank arithmetic in
    tests/test_rrf.py."""
    from ..operators.similarity import rrf_fuse

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    # Plain equi-join, NO broadcast hint: (doc_id, source) is
    # corpus-sized — the pack's own "corpus-sized relations never
    # broadcast" convention (l02/l23/l38; code-review r8). The BM25
    # output side is matched-docs-sized; AQE picks the strategy.
    dim = docs.select("doc_id", "source")
    run1 = (
        T.bm25_scores(docs, "doc_id", "text", L48_QUERY_TERMS)
        .join(dim, "doc_id")
        .select("source", "doc_id", "score")
    )
    toks = F.split(F.trim("text"), " ")
    run2 = docs.select(
        "source",
        "doc_id",
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("score"),
    )
    return rrf_fuse([run1, run2], ["source"], "doc_id", "score")


@query(
    "l50_zipf_fit",
    oracle="""
    WITH c AS (
      SELECT term, count(*) AS n FROM (
        SELECT unnest(string_split(trim(text), ' ')) AS term
        FROM documents WHERE text IS NOT NULL)
      GROUP BY 1),
    r AS (SELECT row_number() OVER (ORDER BY n DESC, term) AS rank, n
          FROM c),
    l AS (SELECT log10(rank) AS t, log10(n) AS x FROM r)
    SELECT count(*) AS n_obs,
           round(CASE WHEN var_pop(t) > 0
                      THEN covar_pop(t, x) / var_pop(t) END, 4) + 0.0
             AS slope,
           round(avg(x) - (CASE WHEN var_pop(t) > 0
                                THEN covar_pop(t, x) / var_pop(t) END)
                          * avg(t), 4) + 0.0 AS intercept,
           round(pow(corr(t, x), 2), 4) AS r2
    FROM l
    """,
)
def l50_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-health flagship #3 (the l25/l40 stance —
    certified as a COMPOSITION): token counts → two-phase distributed
    global rank (global_row_number, never a single-partition window)
    → log-log OLS via series_trend, fused in ONE plan. A healthy
    natural corpus fits log f ≈ a + s·log r with s ≈ −1; templated or
    dedup-gone-wrong corpora bend away — the one-number
    vocabulary-shape monitor next to l33's Heaps curve. Rank ties:
    (count DESC, term ASC) is a total order, so the distributed rank
    and SQL row_number agree exactly; the fit runs on log10 of exact
    integers, the co-moment 4dp round absorbing libm ulp (the r57
    stance). Exact-power-law and flat-corpus pins in
    tests/test_zipf.py."""
    from ..operators.relational import global_row_number
    from ..operators.timeseries import series_trend

    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(F.split(F.trim("text"), " ")).alias("term"))
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    ranked = global_row_number(
        counts, [F.col("n").desc(), F.col("term").asc()], "rank"
    )
    logs = ranked.select(
        F.log10("rank").alias("t"), F.log10("n").alias("x")
    )
    return series_trend(logs, [], "t", "x")


@query(
    "l51_label_centroids",
    oracle="""
    WITH d AS (SELECT e.label, t.pos, e.embedding[t.pos]::DOUBLE AS x
               FROM embeddings e,
                    unnest(generate_series(1, len(e.embedding)))
                      AS t(pos)
               WHERE e.label IS NOT NULL AND e.embedding IS NOT NULL),
    cent AS (SELECT label, pos, avg(x) AS m, count(*) AS n
             FROM d GROUP BY 1, 2),
    p AS (SELECT a.label AS label_a, b.label AS label_b,
                 max(a.n) AS n_a, max(b.n) AS n_b,
                 sum(a.m * b.m) AS dot,
                 sum(a.m * a.m) AS naa,
                 sum(b.m * b.m) AS nbb
          FROM cent a JOIN cent b
            ON a.pos = b.pos AND a.label < b.label
          GROUP BY 1, 2)
    SELECT label_a, label_b,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CASE WHEN sqrt(naa) * sqrt(nbb) > 0
                THEN round(dot / (sqrt(naa) * sqrt(nbb)), 4) + 0.0
           END AS cosine
    FROM p
    """,
)
def l51_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-health monitor #4 (between-class geometry): pairwise
    cosine between per-LABEL centroid vectors — labels drifting
    toward cosine ≈ 1 are merging in embedding space (retrieval
    confusion incoming). One posexplode + (label, pos) aggregate
    reduces the corpus to a |labels|·d relation; the pair matrix is a
    dimension-sized self-join — the corpus is scanned once and
    nothing downstream scales with N. Zero-norm centroids yield NULL
    cosine; fixed-dimensionality contract asserted in
    tests/test_label_centroids.py.
    operators/embeddings.py::label_centroid_similarity."""
    from ..operators.embeddings import label_centroid_similarity

    return label_centroid_similarity(
        load_table(spark, sf_dir, "embeddings"), "label", "embedding"
    )


@query(
    "l52_bigram_backoff",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split(trim(text), ' ') AS toks
      FROM documents WHERE text IS NOT NULL),
    tr AS (SELECT toks FROM t WHERE lang = 'en'),
    toks AS (SELECT unnest(toks) AS w FROM tr),
    uni AS (SELECT w, count(*) AS cu FROM toks GROUP BY 1),
    tot AS (SELECT count(*) AS n_total FROM toks),
    trp AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
            FROM tr, unnest(generate_series(1, len(toks) - 1)) AS s(i)),
    bi AS (SELECT w1, w2, count(*) AS cb FROM trp GROUP BY 1, 2),
    p AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
          FROM t, unnest(generate_series(1, len(toks) - 1)) AS s(i))
    SELECT p.doc_id, count(*) AS n_bigrams,
           round(avg(-log2(
             CASE WHEN bi.cb IS NOT NULL THEN bi.cb / (u1.cu * 1.0)
                  ELSE 0.4 * coalesce(u2.cu, 1) / tot.n_total END)), 4)
             AS avg_neg_log2p
    FROM p
    LEFT JOIN bi ON bi.w1 = p.w1 AND bi.w2 = p.w2
    LEFT JOIN uni u1 ON u1.w = p.w1
    LEFT JOIN uni u2 ON u2.w = p.w2
    CROSS JOIN tot
    GROUP BY 1
    """,
)
def l52_bigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5-extension (context-aware LM quality): bigram Stupid-Backoff
    scoring — train counts on the English subset, score the whole
    multilingual pool (the CCNet framing, and the configuration
    where the backoff branch genuinely fires; self-trained scoring
    would make it dead code — pinned in tests/test_bigram_backoff.py).
    Per doc: (doc_id, n_bigrams, avg −log₂ S(w2|w1)) with
    S = c(w1w2)/c(w1) when trained, else 0.4·c(w2)/N with the OOV
    count floor 1 (the l15 stance). Scrambled-order docs score worse
    than fluent twins — the context signal unigram l15 cannot see.
    operators/text.py::bigram_backoff_score."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    train = docs.filter(F.col("lang") == "en")
    return T.bigram_backoff_score(docs, train_docs=train)


@query("l45_ivfpq_topk")  # rows-only BY DESIGN: KMeans output
def l45_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 (approximate, IVF×PQ — the RECOMMENDED at-scale tier): IVF
    posting lists prune candidates to the 8/16 probed cells, PQ's
    8-byte codes compress what the pruned scan reads, exact cosine
    reranks the 20× ADC survivors — the Jégou IVFADC layout that
    removes flat pq_topk's |Q|×|C| scan AND ivf_topk's raw-vector
    posting lists (operators/similarity.py::ivfpq_topk). Same 20
    queries as the l03 family; measured recall@5 = 0.88 vs the exact
    operator on the synthetic near-uniform embeddings (flat PQ: 0.79
    — pruning plus a deeper rerank wins on both cost AND recall
    here), floored in tests/test_llm.py. Seeded deterministic;
    rows-only like every ANN variant. dim passed explicitly — no
    scalar probe, the plan stays fully lazy. fit_cache_key=sf_dir:
    the fixture corpus is content-stable per path, so the seeded
    index fits are fit-once-serve-many (the production ANN posture)
    instead of re-paying MLlib's fixed per-fit overhead on every
    stateless registry call — bit-identical results either way."""
    from ..operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    return ivfpq_topk(
        queries_df, emb, k=5, n_clusters=16, n_probes=8,
        n_subspaces=8, n_codes=16, rerank_factor=20, seed=42, dim=64,
        fit_cache_key=sf_dir,
    )


# ---------------------------------------------------------------------------
# ROUND-7 PROMOTIONS (staged r6, oracles moved VERBATIM from their
# test files; property/edge tests stay there).
# ---------------------------------------------------------------------------


@query(
    "l53_textrank_keywords",
    oracle="""
WITH t AS (SELECT string_split(trim(text), ' ') AS l
           FROM documents WHERE text IS NOT NULL),
pr0 AS (SELECT unnest(list_filter(
          list_transform(list_zip(l, l[2:]),
            s -> CASE WHEN s[2] IS NOT NULL AND s[1] != s[2]
                      THEN struct_pack(a := least(s[1], s[2]),
                                       b := greatest(s[1], s[2])) END),
          x -> x IS NOT NULL)) AS pr
        FROM t),
p AS (SELECT DISTINCT pr.a AS s, pr.b AS d FROM pr0),
e AS (SELECT s, d FROM p UNION ALL SELECT d, s FROM p),
deg AS (SELECT s, count(*) AS dg FROM e GROUP BY s),
nodes AS (SELECT DISTINCT s AS id FROM e),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
r1 AS (SELECT nd.id,
              0.15 / (SELECT n FROM nn) + 0.85 * coalesce(f.c, 0) AS r
       FROM nodes nd LEFT JOIN (
         SELECT e.d AS id, sum(r0.r / deg.dg) AS c
         FROM e JOIN r0 ON e.s = r0.id JOIN deg ON e.s = deg.s
         GROUP BY e.d) f USING (id)),
r2 AS (SELECT nd.id,
              0.15 / (SELECT n FROM nn) + 0.85 * coalesce(f.c, 0) AS r
       FROM nodes nd LEFT JOIN (
         SELECT e.d AS id, sum(r1.r / deg.dg) AS c
         FROM e JOIN r1 ON e.s = r1.id JOIN deg ON e.s = deg.s
         GROUP BY e.d) f USING (id)),
r3 AS (SELECT nd.id,
              0.15 / (SELECT n FROM nn) + 0.85 * coalesce(f.c, 0) AS r
       FROM nodes nd LEFT JOIN (
         SELECT e.d AS id, sum(r2.r / deg.dg) AS c
         FROM e JOIN r2 ON e.s = r2.id JOIN deg ON e.s = deg.s
         GROUP BY e.d) f USING (id))
SELECT id AS word, round(r * (SELECT n FROM nn), 4) AS textrank
FROM r3
ORDER BY textrank DESC, word LIMIT 25
""",
)
def l53_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed flagship #4 (the l25/l40/r65/r73/l50 stance): TextRank
    keyword extraction — adjacent-token co-occurrence graph (the
    shared shifted_pairs seam; self-pairs dropped, canonicalized,
    symmetrized, so no dangling nodes) -> the m13-certified pagerank
    -> deterministic top-25, fused in ONE plan (Mihalcea & Tarau
    2004). The graph is vocabulary²-bounded via DISTINCT pairs, never
    corpus-sized; the 3-iteration recurrence shuffles the rank
    relation per round over the cached pre-partitioned edges (the m13
    posture). Ordering (textrank DESC, word) totals on the rounded
    rank, so the LIMIT boundary is deterministic.
    operators/graph.py::pagerank; hub/self-pair pins in
    tests/test_textrank.py."""
    from ..operators.graph import pagerank

    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(T.tokens("text").alias("t"))
    )
    pairs = (
        toks.select(
            F.explode(
                T.shifted_pairs(
                    F.col("t"),
                    lambda a, b: F.struct(
                        F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
                    ),
                )
            ).alias("p")
        )
        .filter(F.col("p.a") != F.col("p.b"))
        .select(F.col("p.a").alias("src"), F.col("p.b").alias("dst"))
        .distinct()
    )
    edges = pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, iterations=3)
    return (
        ranks.select(F.col("id").alias("word"),
                     F.col("pagerank").alias("textrank"))
        .orderBy(F.desc("textrank"), "word")
        .limit(25)
    )


@query(
    "l54_contamination_attribution",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
sh AS (SELECT doc_id,
         list_distinct(list_filter(
           list_transform(list_zip(l, l[2:], l[3:]),
                          s -> s[1] || ' ' || s[2] || ' ' || s[3]),
           x -> x IS NOT NULL)) AS g
       FROM t),
ex AS (SELECT doc_id, len(g) AS n_shingles, unnest(g) AS s FROM sh),
b AS (SELECT DISTINCT
        CASE WHEN doc_id % {2 * BENCH_MOD} = 0 THEN 'benchA'
             ELSE 'benchB' END
          AS benchmark,
        s
      FROM ex WHERE doc_id % {BENCH_MOD} = 0),
tr AS (SELECT doc_id, n_shingles, s FROM ex WHERE doc_id % {BENCH_MOD} != 0),
h AS (SELECT tr.doc_id, tr.n_shingles, b.benchmark,
             count(DISTINCT tr.s) AS n_hit
      FROM tr JOIN b ON tr.s = b.s
      GROUP BY 1, 2, 3)
SELECT doc_id, benchmark,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_hit AS BIGINT) AS n_hit_shingles,
       round(n_hit * 1.0 / n_shingles, 4) AS hit_frac,
       row_number() OVER (PARTITION BY doc_id
                          ORDER BY n_hit DESC, benchmark) = 1
         AS is_top
FROM h
""",
)
def l54_contamination_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-BENCHMARK contamination attribution: l31's single leaked
    pool refined to (doc, benchmark) grain — which suite leaked into
    which training doc, how much (hit_frac), and the top-attributed
    suite per doc (deterministic rank-1 on hits DESC, suite ASC).
    The action differs per suite (drop the doc vs mask the span vs
    re-split), so the single-pool answer is not actionable at
    curation time. Same broadcast-inverted-index shape as l31: suite
    shingles broadcast (benchmark suites are MB-sized by definition),
    the corpus streams map-side, never reshuffled; output is
    contaminated-docs-sized. The contaminated doc SET equals l31's
    single-pool set (proven in tests/test_contamination_attr.py).
    operators/dedup.py::decontaminate_attribution."""
    from ..operators.dedup import decontaminate_attribution

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    # every other bench doc plays suite A: 2*BENCH_MOD, derived (r10
    # review: a literal 80 here would silently detach from BENCH_MOD)
    bench = docs.filter(F.col("doc_id") % BENCH_MOD == 0).withColumn(
        "bench",
        F.when(
            F.col("doc_id") % (2 * BENCH_MOD) == 0, F.lit("benchA")
        ).otherwise(F.lit("benchB")),
    )
    train = docs.filter(F.col("doc_id") % BENCH_MOD != 0)
    return decontaminate_attribution(train, bench, "bench", n=3)


# ---------------------------------------------------------------------------
# Round-8 promotions: l55-l60 (staged + locally certified in round 7;
# oracles moved VERBATIM from their test files per the rotation flow)
# ---------------------------------------------------------------------------

from ..operators.dedup import (  # noqa: E402
    normalized_dedup_uplift,
    source_shingle_overlap,
)
from ..operators.multimodal import media_dedup  # noqa: E402
from ..operators.similarity import truncated_dim_recall  # noqa: E402
from ..operators.text import quality_gate_ablation  # noqa: E402


@query(
    "l55_source_overlap",
    oracle="""
WITH t AS (SELECT source, string_split(text, ' ') AS l FROM documents),
sh AS (SELECT DISTINCT source,
              unnest(list_filter(
                list_transform(list_zip(l, l[2:], l[3:]),
                               s -> s[1] || ' ' || s[2] || ' ' || s[3]),
                x -> x IS NOT NULL)) AS s
       FROM t),
sz AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
c AS (SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
      GROUP BY 1, 2)
SELECT c.source_a, c.source_b,
       CAST(za.n AS BIGINT) AS n_a,
       CAST(zb.n AS BIGINT) AS n_b,
       CAST(c.n_common AS BIGINT) AS n_common,
       round(c.n_common * 1.0 / (za.n + zb.n - c.n_common), 4)
         AS jaccard,
       round(c.n_common * 1.0 / za.n, 4) AS containment_a,
       round(c.n_common * 1.0 / zb.n, 4) AS containment_b
FROM c JOIN sz za ON za.source = c.source_a
       JOIN sz zb ON zb.source = c.source_b
""",
)
def l55_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level shingle-overlap matrix — pairwise Jaccard + both
    containments between corpus SOURCES (the dedup-planning question:
    which feeds duplicate each other, and which is a subset of
    which). DISTINCT (source, shingle) before the pair join on both
    engines; zero-overlap pairs never materialize (the shingle
    equi-join IS the filter — no |sources|^2 cross join). Scale: the
    join is shingle-keyed (bounded by shared-shingle frequency, the
    l54 shape), and sources are few — the output is at most
    |sources| choose 2. Ratios rounded 4dp, structurally
    non-negative. operators/dedup.py::source_shingle_overlap;
    closed-form + bound pins in tests/test_source_overlap.py."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", T.tokens("text")
    )
    return source_shingle_overlap(docs, "source", "tokens", n=3)


@query(
    "l56_truncated_recall",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 20),
fp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_sum(list_transform(list_zip(q.v, c.v),
                                       s -> s[1]*s[2]))
               / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x*x)))), 4)
           AS cs
  FROM q JOIN e c ON c.vec_id != q.vec_id),
f5 AS (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cs DESC, neighbor_id) AS r
       FROM fp QUALIFY r <= 5),
tp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_sum(list_transform(list_zip(q.v[1:16], c.v[1:16]),
                                       s -> s[1]*s[2]))
               / (sqrt(list_sum(list_transform(q.v[1:16], x -> x*x)))
                  * sqrt(list_sum(list_transform(c.v[1:16], x -> x*x)))),
               4) AS cs
  FROM q JOIN e c ON c.vec_id != q.vec_id),
t5 AS (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cs DESC, neighbor_id) AS r
       FROM tp QUALIFY r <= 5)
SELECT CAST(16 AS INT) AS trunc_dim,
       f.query_id,
       CAST(count(t.neighbor_id) AS BIGINT) AS n_hits,
       round(count(t.neighbor_id) * 1.0 / count(*), 4) AS recall_at_k
FROM f5 f LEFT JOIN t5 t
  ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
GROUP BY f.query_id
""",
)
def l56_truncated_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation recall — recall@5 of 16-dim-truncated
    exact search against full 64-dim exact search per query: the
    measurement that decides whether truncating stored embeddings
    (MRL-style) is safe for THIS corpus before anyone re-indexes.
    Fully deterministic (both rankings order by rounded-cosine DESC
    then neighbor id), so unlike the ANN family this one is
    hash-oracle-able. Scale: two bounded-query-set exact rankings
    (queries x corpus, query side explicitly small) + a rank-filtered
    join — the corpus is never self-joined.
    operators/similarity.py::truncated_dim_recall; identity and
    monotonicity pins in tests/test_truncated_recall.py."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 20)
    return truncated_dim_recall(q, emb, k=5, trunc_dims=(16,))


@query(
    "l57_normalized_dedup",
    oracle="""
WITH b AS (
  SELECT doc_id, source, text AS raw,
         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
           AS norm
  FROM documents),
rc AS (SELECT raw, count(*) AS c FROM b
       WHERE raw IS NOT NULL GROUP BY 1),
nc AS (SELECT norm, count(*) AS c FROM b
       WHERE norm IS NOT NULL GROUP BY 1)
SELECT b.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN coalesce(rc.c, 0) >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_raw_dup,
       CAST(sum(CASE WHEN coalesce(nc.c, 0) >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_norm_dup,
       CAST(sum(CASE WHEN coalesce(nc.c, 0) >= 2 THEN 1 ELSE 0 END)
            - sum(CASE WHEN coalesce(rc.c, 0) >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS uplift,
       round(sum(CASE WHEN coalesce(nc.c, 0) >= 2 THEN 1 ELSE 0 END)
             * 1.0 / count(*), 4) AS norm_dup_rate
FROM b
LEFT JOIN rc ON rc.raw = b.raw
LEFT JOIN nc ON nc.norm = b.norm
GROUP BY 1
""",
)
def l57_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization dedup uplift — per-source raw vs normalized
    duplicate-doc counts (normalization: lower -> every [^a-z0-9]+
    run to ONE space -> trim), quantifying how many near-identical
    docs exact dedup MISSES without canonicalization — the
    measurement that justifies l57's normalize-then-hash pipeline
    stage before anyone runs it. Duplicate keys are corpus-wide;
    attribution is by the doc's own source; raw-dup implies norm-dup
    (tested invariant: uplift >= 0). Scale: two digest-keyed counts
    + a source-keyed aggregate — no pair joins anywhere.
    operators/dedup.py::normalized_dedup_uplift;
    tests/test_norm_dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    return normalized_dedup_uplift(docs, "source", "doc_id", "text")


@query(
    "l58_gate_ablation",
    oracle="""
WITH t AS (
  SELECT n_chars,
         list_filter(string_split(trim(text), ' '), x -> x != '') AS l
  FROM documents),
g AS (
  SELECT len(l) >= 5 AS p_min_tokens,
         n_chars BETWEEN 20 AND 10000 AS p_char_bounds,
         round(coalesce(list_sum(list_transform(l, x -> len(x))) * 1.0
                        / nullif(len(l), 0), 0.0), 4)
           BETWEEN 2 AND 12 AS p_word_len_bounds,
         round(coalesce(len(list_distinct(l)) * 1.0
                        / nullif(len(l), 0), 0.0), 4)
           > 0.1 AS p_distinct_ratio
  FROM t),
w AS (
  SELECT count(*) AS n,
         sum(CASE WHEN NOT p_min_tokens THEN 1 ELSE 0 END) AS f1,
         sum(CASE WHEN NOT p_min_tokens AND p_char_bounds
                   AND p_word_len_bounds AND p_distinct_ratio
                  THEN 1 ELSE 0 END) AS s1,
         sum(CASE WHEN NOT p_char_bounds THEN 1 ELSE 0 END) AS f2,
         sum(CASE WHEN NOT p_char_bounds AND p_min_tokens
                   AND p_word_len_bounds AND p_distinct_ratio
                  THEN 1 ELSE 0 END) AS s2,
         sum(CASE WHEN NOT p_word_len_bounds THEN 1 ELSE 0 END) AS f3,
         sum(CASE WHEN NOT p_word_len_bounds AND p_min_tokens
                   AND p_char_bounds AND p_distinct_ratio
                  THEN 1 ELSE 0 END) AS s3,
         sum(CASE WHEN NOT p_distinct_ratio THEN 1 ELSE 0 END) AS f4,
         sum(CASE WHEN NOT p_distinct_ratio AND p_min_tokens
                   AND p_char_bounds AND p_word_len_bounds
                  THEN 1 ELSE 0 END) AS s4
  FROM g)
SELECT u.gate,
       CAST(w.n AS BIGINT) AS n_docs,
       CAST(u.f AS BIGINT) AS n_fail,
       CAST(u.s AS BIGINT) AS n_sole_fail,
       round(u.f * 1.0 / w.n, 4) AS fail_rate,
       round(u.s * 1.0 / w.n, 4) AS sole_rate
FROM w, LATERAL (
  SELECT 'min_tokens' AS gate, f1 AS f, s1 AS s
  UNION ALL SELECT 'char_bounds', f2, s2
  UNION ALL SELECT 'word_len_bounds', f3, s3
  UNION ALL SELECT 'distinct_ratio', f4, s4) u
""",
)
def l58_gate_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate ablation — one row per l06 gate: how many docs
    fail it (n_fail) and how many fail ONLY it (n_sole_fail, the docs
    that gate alone removes). The curation-tuning measurement: a gate
    with big n_fail but near-zero n_sole_fail is redundant; a gate
    with big n_sole_fail is the one whose threshold shapes the corpus
    and deserves the l47 calibration pass. Gates are EXACTLY
    quality_features' verdict conjuncts including its 4dp rounding of
    mean_word_len/distinct_ratio (ADVICE r7 boundary-doc fix), so the
    ablation can never drift from the filter it explains. Shape: ONE
    corpus scan, a single 8-counter aggregate, 4-row stack()ed
    output. operators/text.py::quality_gate_ablation;
    tests/test_gate_ablation.py."""
    return quality_gate_ablation(load_table(spark, sf_dir, "documents"))


@query(
    "l59_media_dedup",
    oracle="""
WITH m AS (SELECT doc_id, md5(text) AS media_md5 FROM documents
           WHERE text IS NOT NULL)
SELECT doc_id, media_md5,
       CAST(count(*) OVER (PARTITION BY media_md5) AS BIGINT)
         AS n_copies,
       row_number() OVER (PARTITION BY media_md5 ORDER BY doc_id) = 1
         AS is_kept
FROM m
""",
)
def l59_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media dedup — md5 over the BinaryType media column,
    digest-keyed copy count + keep-lowest-doc_id verdict: the exact
    tier of multimodal dedup (byte-identical payloads — re-crawled
    images, mirrored audio), l01's window shape on bytes instead of
    text. md5 over the SAME bytes is engine-independent (the media
    blob is attach_media's deterministic UTF-8 payload), so unlike
    the perceptual tiers this binary op is hash-oracle-able. Scale:
    only 16-byte digests enter the exchange, never payloads; the
    window is digest-keyed (uniform). operators/multimodal.py::
    media_dedup; pins in tests/test_media_dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    return media_dedup(attach_media(docs)).select(
        "doc_id", "media_md5", "n_copies", "is_kept"
    )


def _l60_oracle() -> str:
    """The l60 oracle SQL, GENERATED at registration time — one
    r74-shaped PSI block per seeded projection direction, UNION
    ALL'd. The projection constants bake into the SQL at full repr
    precision so both engines dot the IDENTICAL doubles, and the
    oracle reduces each dot with list_reduce — a SEQUENTIAL
    left-to-right fold matching Spark aggregate()'s order. Same
    seeded generation as the operator (numpy default_rng(42)), so
    the driver sees a static expanded string."""
    import numpy as np

    rng = np.random.default_rng(42)
    proj = rng.standard_normal((4, 64))
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)
    blocks = []
    for t, d in enumerate(proj):
        lits = ", ".join(repr(float(v)) for v in d)
        blocks.append(f"""
SELECT CAST({t} AS INT) AS direction, q.bin, q.n_ref, q.n_cur,
       q.ref_share, q.cur_share, q.psi_part
FROM (
  WITH pr AS (
    SELECT vec_id,
           round(list_reduce(
             list_transform(list_zip(CAST(embedding AS DOUBLE[]),
                                     [{lits}]),
                            s -> s[1] * s[2]),
             (a, b) -> a + b), 6) + 0.0 AS p
    FROM embeddings WHERE embedding IS NOT NULL),
  ref AS (SELECT p FROM pr WHERE vec_id % 2 = 0),
  cur AS (SELECT p FROM pr WHERE vec_id % 2 = 1),
  e AS (SELECT list_transform(
          quantile_cont(p, [0.1, 0.2, 0.3, 0.4, 0.5,
                            0.6, 0.7, 0.8, 0.9]),
          x -> round(x, 4)) AS edges FROM ref),
  rb AS (SELECT len(list_filter(e.edges, x -> r.p >= x)) AS bin,
                count(*) AS n_ref
         FROM ref r CROSS JOIN e GROUP BY 1),
  cb AS (SELECT len(list_filter(e.edges, x -> c.p >= x)) AS bin,
                count(*) AS n_cur
         FROM cur c CROSS JOIN e GROUP BY 1),
  j AS (SELECT coalesce(rb.bin, cb.bin) AS bin,
               coalesce(rb.n_ref, 0) AS n_ref,
               coalesce(cb.n_cur, 0) AS n_cur
        FROM rb FULL JOIN cb ON rb.bin = cb.bin),
  t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
  SELECT CAST(j.bin AS INT) AS bin, j.n_ref, j.n_cur,
         round(j.n_ref / t.tr, 4) AS ref_share,
         round(j.n_cur / t.tc, 4) AS cur_share,
         round((greatest(j.n_cur / t.tc, 0.0001)
                - greatest(j.n_ref / t.tr, 0.0001))
               * ln(greatest(j.n_cur / t.tc, 0.0001)
                    / greatest(j.n_ref / t.tr, 0.0001)), 4) + 0.0
           AS psi_part
  FROM j CROSS JOIN t) q""")
    return "\nUNION ALL\n".join(blocks)


@query("l60_embedding_drift", oracle=_l60_oracle())
def l60_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding projection drift — r74's PSI machinery over four
    SEEDED 1-D projections of the embedding column (even vec_ids as
    the reference corpus, odd as current): the monitor that catches
    "the new embedding batch came from a different model/checkpoint"
    BEFORE any retrieval metric moves. Marginal dim stats (l29) miss
    rotations; a handful of random projections inherit PSI's
    battle-tested <0.1 / >0.25 threshold lore (Cramér-Wold: a real
    shift shows on almost every projection — the planted-mean-shift
    test proves the alarm fires). Shape: codegen zip_with dot per
    direction (corpus scanned once per side), then reference-quantile
    bin aggregates — output is directions x bins rows. Signed
    psi_part carries the paired sign-of-zero pin.
    operators/embeddings.py::embedding_projection_drift;
    tests/test_embedding_drift.py."""
    from ..operators.embeddings import embedding_projection_drift

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    return embedding_projection_drift(ref, cur, "embedding", dim=64)


# --- BPE trainer/encoder (round-9 promotion of the round-8 staged
# pair). The oracles are GENERATED at registration time from
# queries/bpe_oracle.py at a FIXED n_merges — the l60 pattern — and
# tests/test_bpe.py certifies the SAME generators against the
# operators on the fixture, tie-heavy corpora, and early-stop cases,
# so the registered SQL can never drift from the certified SQL.

BPE_TRAIN_MERGES = 6  # fixture-certified depth (test_bpe: 3 and 6)
BPE_ENCODE_MERGES = 5  # fixture-certified depth (test_bpe: 5)

_BPE_SCHEMA = (
    "round int, left string, right string, merged string, "
    "pair_count long"
)


def _bpe_merges_memo(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """Train-once-serve-many for the registry's BPE queries
    (code-review r9, the l34/l45 fit-cache precedent): training runs
    n eager driver rounds, and l61 (depth 6) + l62 (depth 5) in one
    session re-derived overlapping tables from the same immutable
    fixture. The greedy merge sequence is PREFIX-STABLE (the k-merge
    table is exactly the first k rows of any deeper table — same
    deterministic argmax at every step), so one training at the max
    registered depth serves every shallower request bit-identically.
    Keyed by (applicationId, sf_dir) through the shared fit-cache
    seam so entries never outlive their SparkContext."""
    from ..operators.similarity import _FIT_CACHE, _fit_cache_put

    depth = max(n, BPE_TRAIN_MERGES)
    key = (spark.sparkContext.applicationId, "bpe-merges", sf_dir, depth)
    rows = _FIT_CACHE.get(key)
    if rows is None:
        docs = load_table(spark, sf_dir, "documents")
        rows = [
            tuple(r)
            for r in T.bpe_merge_rounds(docs, n_merges=depth)
            .orderBy("round")
            .collect()
        ]
        _fit_cache_put(key, rows)
    return spark.createDataFrame(rows[:n], _BPE_SCHEMA)


@query("l61_bpe_merges", oracle=bpe_oracle_sql(BPE_TRAIN_MERGES))
def l61_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 (tokenizer training): the first 6 BPE merges learned over
    the documents corpus — Sennrich-style freq-weighted pair argmax
    with a deterministic (count DESC, pair ASC) tiebreak and
    left-to-right non-overlapping rewrite. Scale: the corpus is
    scanned EXACTLY ONCE into a (word, freq) vocabulary; every round
    runs on the vocabulary relation (language-bounded, not
    corpus-bounded) with a 1-row argmax probe — see
    operators/text.py::bpe_merge_rounds. Oracle: unrolled-CTE round
    triples (count, gated argmax, replace-fold), queries/
    bpe_oracle.py; certified in tests/test_bpe.py."""
    return _bpe_merges_memo(spark, sf_dir, BPE_TRAIN_MERGES)


@query("l62_bpe_encode", oracle=bpe_encode_oracle_sql(BPE_ENCODE_MERGES))
def l62_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 (tokenization): encode every document with a merge table
    self-trained on the same corpus (n_merges=5) — the GPT-2-style
    rank-priority loop, provably equal to training-order replay on
    self-trained tables. The encoder is the one text operator that is
    a UDF by DESIGN (algorithmic loop): iterator-form pandas UDF with
    a per-worker rank dict and a size-capped word memo, row-local,
    zero shuffles — operators/text.py::bpe_encode. Oracle: the
    trainer CTEs plus per-round rank-order replace-folds over a
    sentinel-joined word encoding, queries/bpe_oracle.py; certified
    in tests/test_bpe.py (fixture equality + word-boundary pin).
    The registered output TAB-joins the token array (round-10 fix of
    the r9 red row: the driver's pandas canonicalizer cannot hash
    ARRAY columns; TAB is pinned absent from fixture text, so the
    join is lossless — the _itemset_str house rule)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = _bpe_merges_memo(spark, sf_dir, BPE_ENCODE_MERGES)
    return T.bpe_encode(docs, merges).select(
        "doc_id", F.concat_ws("\t", "bpe_tokens").alias("bpe_tokens")
    )
