"""Composed TextRank keyword extraction — round-7 window candidate
(future l53_textrank_keywords), locally certified NOW: adjacent-token
co-occurrence graph (shared shifted_pairs seam) → the m13-certified
pagerank → deterministic top-25, fused in ONE plan — the classic
graph-based keyword ranker (Mihalcea & Tarau 2004) and composed
flagship #4 beside l25/l40/r65/r73/l50. The DuckDB oracle below is
the exact SQL the future registration will carry (the m13 chained-CTE
recurrence over a string-keyed graph), plus closed-form hub pins and
the self-pair/boundary determinism checks."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators import text as T
from miningfrequentpattern_spark.operators.graph import pagerank
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future l53 oracle, verbatim. Graph: DISTINCT adjacent-token pairs,
# canonicalized least/greatest (self-pairs dropped — a repeated word
# is not co-occurrence evidence), symmetrized — so the graph has no
# dangling nodes and the 3-iteration m13 recurrence is the full
# PageRank. Ordering (textrank DESC, word) is a total order on the
# 4dp-rounded rank, so the LIMIT boundary is deterministic.
L53_ORACLE = """
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
"""


def _word_edges(spark, sf_dir):
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
    return pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _l53(spark, sf_dir):
    ranks = pagerank(_word_edges(spark, sf_dir), iterations=3)
    return (
        ranks.select(F.col("id").alias("word"),
                     F.col("pagerank").alias("textrank"))
        .orderBy(F.desc("textrank"), "word")
        .limit(25)
    )


def test_textrank_matches_duckdb_oracle(spark, duck):
    compare(_l53(spark, SF_ORACLE), duck, L53_ORACLE)


def test_textrank_hub_word_outranks_leaves(spark):
    """A star vocabulary — 'core' adjacent to 6 distinct words, the
    leaves only ever adjacent to 'core' — must rank the hub first;
    a repeated word ('dup dup') contributes NO self-edge."""
    rows = [(1, f"core w{i}") for i in range(6)] + [(2, "dup dup")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = df.select(T.tokens("text").alias("t"))
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
    got = {r["id"]: r["pagerank"] for r in pagerank(edges, 5).collect()}
    assert "dup" not in got  # self-pair dropped, no phantom node
    assert all(got["core"] > got[f"w{i}"] for i in range(6))


def test_textrank_top25_is_deterministic(spark):
    a = [tuple(r) for r in _l53(spark, SF_ORACLE).collect()]
    b = [tuple(r) for r in _l53(spark, SF_ORACLE).collect()]
    assert a == b and len(a) == 25
