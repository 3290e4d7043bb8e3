"""Similarity search over embedding columns (SURVEY.md §2.4 L3).

Two tiers, same output contract (query_id, neighbor_id, cos_sim, rank):

- `cosine_topk_exact`: brute force — query set × corpus cross join with
  the native-expression cosine, per-query top-k window. Correctness
  baseline and perfectly fine when |queries| is small (the common
  "probe a corpus" case): the corpus side streams, nothing collects.
- `ann_lsh_topk`: NATIVE random-projection LSH (seeded Gaussian
  directions as literal arrays; the hash is a codegen
  aggregate/zip_with dot product — no MLlib, no UDF, no optimizer
  barrier). On unit-normalized vectors, euclidean distance is
  monotone in cosine (d² = 2 - 2cos), so bucketing by euclidean LSH
  IS cosine ANN. Candidate generation touches only same-bucket
  pairs via a plain (table, bucket) equi-join.

- `ivf_topk`: IVF (inverted-file) — KMeans coarse quantizer assigns
  every corpus vector to a centroid; a query searches only its
  `n_probes` nearest centroids' posting lists, exact-reranked. The
  other classic ANN shape: needs a training pass (vs LSH's none) but
  gives directly tunable recall/cost via n_probes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.guards import reject_working_cols as _reject_working_cols
from ..functions.rounding import round4
from ..functions.vectors import cosine, l2_normalize


def _empty_topk_result(
    queries: DataFrame, corpus: DataFrame, id_col: str
) -> DataFrame:
    """Empty (query_id, neighbor_id, cos_sim, rank) result matching
    the operators' output contract. query_id takes the QUERIES side's
    id type and neighbor_id the CORPUS side's — exactly as the
    populated path types them — so the empty-corpus schema never
    diverges when the two sides' id columns differ (e.g. int queries
    against bigint corpus; ADVICE r4). The ANN operators
    short-circuit to this when the corpus is empty: MLlib's
    LSH/KMeans `.fit` THROWS on an empty dataset, but "no corpus →
    no neighbors" is the correct semantics for a pipeline stage (an
    upstream filter legitimately matches nothing; the 100 TB failure
    mode is a crashed job, not an empty join)."""
    from pyspark.sql import types as ST

    schema = ST.StructType(
        [
            ST.StructField("query_id", queries.schema[id_col].dataType),
            ST.StructField("neighbor_id", corpus.schema[id_col].dataType),
            ST.StructField("cos_sim", ST.DoubleType()),
            ST.StructField("rank", ST.LongType()),
        ]
    )
    return corpus.sparkSession.createDataFrame([], schema)


def _static_max_rows(df: DataFrame) -> int | None:
    """Catalyst's static row-count upper bound for a plan, or None.

    `LogicalPlan.maxRows` is defined (e.g.) when the lineage carries a
    LIMIT — the common way a bounded query side is built — making the
    bound check free: no job, no scan. Accessed through the private
    `_jdf` seam (py4j, Spark classic); any failure (Connect, API
    drift) degrades to None, i.e. "unknown", never to a wrong bound.
    """
    try:
        opt = df._jdf.queryExecution().optimizedPlan().maxRows()
        return int(opt.get()) if opt.isDefined() else None
    except Exception:
        return None


def _enforce_query_bound(
    queries: DataFrame, max_queries: int | None, op: str, hint: str
) -> None:
    """Two-tier |Q| bound shared by the crossJoin-shaped operators
    (cosine_topk_exact, pq_topk — previously verbatim copies,
    code-review r8): a FREE static check via Catalyst's maxRows, and
    only when that bound is unknown or too large to prove fitness, a
    bounded limit(max+1).count() probe. A big static bound alone
    never rejects — actual rows may be far fewer. Raises ValueError
    naming the operator with the caller's escape hint."""
    if max_queries is None:
        return
    static_bound = _static_max_rows(queries)
    if static_bound is not None and static_bound <= max_queries:
        return
    probed = queries.limit(max_queries + 1).count()
    if probed > max_queries:
        raise ValueError(
            f"{op}: query side exceeds max_queries={max_queries}; "
            f"{hint} Pass max_queries=None if the size is "
            "externally bounded."
        )


def cosine_topk_exact(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int | None = 10_000,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Excludes self-matches (same id). Deterministic tiebreak on
    neighbor id. The corpus side is broadcast only if Spark deems it
    small; the join is a crossJoin so AQE cannot help — |queries| must
    stay bounded. That contract is ENFORCED, not just documented, in
    two tiers: first a FREE static check — Catalyst's
    `LogicalPlan.maxRows` on the optimized query-side plan, which is
    defined whenever the lineage carries a LIMIT (so `df.limit(k)`
    query sides pay nothing) — and when that upper bound is unknown
    or not small enough to prove fitness, a runtime probe
    `limit(max_queries+1).count()` (a bounded action — the scan stops
    after max_queries+1 rows, it never counts the full side; a big
    static bound alone never rejects, since actual rows may be far
    fewer). An oversized query side raises with a pointer at
    the ANN operators, instead of silently planning an |Q|×|corpus|
    cartesian. Note the probe is EAGER: building the result DataFrame
    runs one small job and evaluates the query-side lineage once
    before the join does — the deliberate price of failing fast
    instead of launching the cartesian. `max_queries=None` opts out
    (no probe, fully lazy) for callers with their own bound.
    """
    _enforce_query_bound(
        queries, max_queries, "cosine_topk_exact",
        "the crossJoin would be |Q|x|corpus|. Use ann_lsh_topk / "
        "ivf_topk for large query sets.",
    )
    # NULL vectors dropped at the boundary on BOTH sides (the ANN
    # tiers' stance — code-review r8): a NULL query otherwise emits k
    # rows with NULL cos_sim ranked only by neighbor_id, and a NULL
    # corpus vector surfaces whenever fewer than k real neighbors
    # exist — exact vs ANN results diverging on identical data.
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).filter(F.col("_qv").isNotNull())
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).filter(F.col("_cv").isNotNull())
    # round4 pins -0.0 on near-orthogonal pairs (the l43 class)
    sim = round4(cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors via NATIVE random-projection
    LSH (round 6 — replaces the MLlib BucketedRandomProjectionLSH
    form): vectors are L2-normalized (euclidean LSH ≡ cosine ANN on
    the unit sphere), each of the `num_hash_tables` seeded unit
    Gaussian directions r_t hashes a vector to
    floor((v·r_t)/bucket_length), candidates are the pairs sharing
    ANY (table, bucket), and the exact cosine reranks them above the
    0.28 admission floor (≡ the euclidean-1.2 threshold the MLlib
    form used: cos = 1 − d²/2 on unit vectors). Precision on
    returned pairs is 1; recall is floored vs the exact operator in
    tests. Seeded → deterministic; registered rows-only like every
    ANN variant (the hash family changed with this rewrite, so the
    candidate SET differs from the MLlib form's — the recall floor
    and subset-of-exact properties are the contract, not the
    specific pairs).

    Why native: the hash is `aggregate(zip_with(v, r_t, *), +)` —
    whole-stage codegen, NO Python/JVM UDF anywhere. That removes
    the two structural costs of the MLlib form: (a) the hash UDF was
    not null-tolerant, and Catalyst pushing the join's inferred
    `isnotnull(hash_udf(v))` below the null filters could NPE — which
    forced a LAZY localCheckpoint optimizer barrier that sacrificed
    executor-loss recoverability on every call (SCALING.md "ANN
    fault tolerance", now historical); native expressions are
    null-strict (NULL vector → NULL bucket → never joins), so the
    plan needs NO barrier and keeps FULL lineage. (b) Candidate
    generation is a plain (table, bucket) shuffle equi-join — AQE
    can see and re-plan it, and the explode fan-out is exactly
    num_hash_tables rows per vector.

    The projection matrix is tiny (num_hash_tables × dim float64)
    and rides the plan as literal arrays — no broadcast variable, no
    fit job. `dim` sizes it; pass it explicitly to stay fully lazy
    (the registered l03b query does), else a documented bounded
    1-row probe reads it from the corpus.
    """
    import numpy as np

    if not bucket_length > 0:
        # ANSI off makes dot/0.0 an Infinity whose floor-cast collapses
        # every vector into ONE bucket per table — the candidate join
        # degenerates to the full |Q|x|C| cross product the operator
        # exists to avoid, silently (code-review r8; the ADVICE r6
        # fail-loudly stance).
        raise ValueError(
            f"bucket_length must be > 0, got {bucket_length}"
        )
    q_in = queries.filter(F.col(vec_col).isNotNull())
    c_in = corpus.filter(F.col(vec_col).isNotNull())
    if c_in.isEmpty():
        return _empty_topk_result(queries, corpus, id_col)
    if dim is None:
        # Bounded 1-row scalar probe (the pq_topk stance).
        dim = int(
            c_in.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
        )

    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((num_hash_tables, dim))
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)

    def hashed(df: DataFrame, out_id: str) -> DataFrame:
        base = df.select(
            F.col(id_col).alias(out_id),
            l2_normalize(vec_col).alias("_nv"),
        )
        # A mis-sized explicit `dim` would zip_with the fixed-length
        # projection literal against a shorter/longer vector, NULL-pad
        # the dot product, and silently drop EVERY row from the bucket
        # join — an empty result instead of an error (ADVICE r6).
        # assert_true keeps the check lazy and codegen-side: NULL on
        # pass, a loud runtime error on the first mismatched row.
        # NULL vectors are exempt (size(NULL) is NULL and
        # assert_true(NULL) would throw, ADVICE r7): they were always
        # excluded by the bucket join, so only genuinely mis-sized
        # non-NULL vectors raise.
        base = base.withColumn(
            "_nv",
            F.when(
                F.assert_true(
                    F.col("_nv").isNull()
                    | (F.size("_nv") == F.lit(int(dim))),
                    F.lit(
                        f"ann_lsh_topk: non-NULL vector length != dim={dim} "
                        "— pass the actual embedding width"
                    ),
                ).isNull(),
                F.col("_nv"),
            ),
        )

        def bucket(t: int):
            r_t = F.array(*[F.lit(float(x)) for x in proj[t]])
            dot = F.aggregate(
                F.zip_with(F.col("_nv"), r_t, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            return F.struct(
                F.lit(t).alias("t"),
                F.floor(dot / F.lit(float(bucket_length)))
                .cast("long")
                .alias("h"),
            )

        return base.select(
            out_id,
            F.explode(
                F.array(*[bucket(t) for t in range(num_hash_tables)])
            ).alias("_b"),
        ).select(out_id, F.col("_b.t").alias("t"), F.col("_b.h").alias("h"))

    # Candidate ids only ride the bucket join (vectors would multiply
    # the shuffle width for pairs that are about to dedup); the pair
    # set dedups across tables, then fetches vectors back by id for
    # the exact rerank — the pq_topk narrow-scan discipline.
    cand = (
        hashed(q_in, "query_id")
        .join(hashed(c_in, "neighbor_id").hint("shuffle_hash"), ["t", "h"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = q_in.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cv = c_in.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    # round4 pins -0.0 on near-orthogonal pairs (the l43 class)
    sim = round4(cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.28)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via an IVF index.

    1. train: MLlib KMeans (seeded) on the corpus -> coarse quantizer;
    2. index: assign each corpus vector its centroid id (one narrow
       column — the "inverted file");
    3. probe: each query computes distances to the (broadcast, tiny)
       centroid matrix in a pandas UDF and keeps its n_probes nearest
       centroid ids;
    4. search: equi-join query-probes to corpus postings on centroid id
       (shuffle bounded by posting-list sizes, the IVF win) and
       exact-rerank with the native cosine.

    Deterministic under the fixed seed; registered rows-only like all
    ANN variants. Recall vs the exact operator is asserted in tests.
    """
    import numpy as np
    import pandas as pd
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.functions import pandas_udf

    spark = corpus.sparkSession
    # NULL vectors can't quantize or score — drop at the boundary on
    # both sides (array_to_vector and the pandas probe throw on null;
    # the WHEN guard keeps the conversion row-local so it can never
    # run on a null even if a side filter is lost to relation dedup —
    # see ann_lsh_topk.prep).
    c_vec = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("_arr"))
        .withColumn(
            "_v",
            F.when(F.col("_arr").isNotNull(), array_to_vector("_arr")),
        )
        .filter(F.col("_v").isNotNull())
    )
    queries = queries.filter(F.col(vec_col).isNotNull())
    # KMeans.fit throws on empty input; empty corpus → empty result
    # (fit is already eager — see _empty_topk_result).
    if c_vec.isEmpty():
        return _empty_topk_result(queries, corpus, id_col)
    km = KMeans(k=n_clusters, seed=seed, featuresCol="_v", predictionCol="_cid")
    # Fit on a CACHED, coalesced projection: k-means|| + Lloyd re-scan
    # the fit relation once per init pass and per iteration, and an
    # uncached corpus lineage re-reads parquet + re-converts vectors
    # every time — the exact shape ivfpq_topk measured at ~18 s vs
    # ~1 s cached at sf0.1 (its coarse-fit comment), never back-ported
    # here until code-review r8. Target partition count scales with
    # the cluster (ADVICE r8 — a literal 8 capped fit parallelism on
    # big executors): coalesce never RAISES a count, so min(current,
    # target) is implicit.
    fit_parts = max(8, c_vec.sparkSession.sparkContext.defaultParallelism)
    fit_vec = c_vec.select("_v").coalesce(fit_parts).cache()
    try:
        model = km.fit(fit_vec)
    finally:
        fit_vec.unpersist()
    postings = model.transform(c_vec).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_arr").alias("_cv"),
        F.col("_cid").alias("cid"),
    )

    centers = np.array([np.asarray(c) for c in model.clusterCenters()])
    b_centers = spark.sparkContext.broadcast(centers)

    def _probe(vecs):
        # NOTE: no inline type hints — `from __future__ import
        # annotations` stringifies them, which pandas_udf's hint
        # inference can't resolve; the explicit returnType suffices.
        # Defense in depth for null vectors: the queries-side filter
        # above drops them, but a lost/reordered filter (the hazard
        # ann_lsh_topk documents for shared-lineage joins) would hand
        # this batch a None — emit an EMPTY probe list for such rows
        # so the downstream explode drops them (null vectors can't
        # participate), instead of np.array degrading to object
        # dtype and crashing the whole task.
        arrs = list(vecs)
        valid_idx = [i for i, a in enumerate(arrs) if a is not None]
        out = [[] for _ in arrs]
        if valid_idx:
            m = np.array([arrs[i] for i in valid_idx], dtype=np.float64)
            if m.ndim != 2 or m.shape[1] != b_centers.value.shape[1]:
                # name the defect instead of numpy's raw broadcasting
                # ValueError deep in an executor task (r10 sweep, the
                # ann_lsh/pq mis-sized-dim class)
                raise ValueError(
                    f"ivf_topk: query vector width "
                    f"{m.shape[1] if m.ndim == 2 else 'ragged'} != "
                    f"corpus/centroid width {b_centers.value.shape[1]}"
                )
            d = ((m[:, None, :] - b_centers.value[None, :, :]) ** 2).sum(
                axis=2
            )
            idx = np.argsort(d, axis=1)[:, :n_probes].astype("int32")
            for row, i in enumerate(valid_idx):
                out[i] = list(idx[row])
        return pd.Series(out)

    probe_cids = pandas_udf(_probe, returnType="array<int>")

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("cid", F.explode(probe_cids(F.col("_qv"))))

    # round4 pins -0.0 on near-orthogonal pairs (the l43 class)
    sim = round4(cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        q.join(postings, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk_portable(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine neighbors via a DETERMINISTIC IVF
    index — the value-hash-oracle-able sibling of ivf_topk (whose
    MLlib-KMeans quantizer is seeded but not reproducible outside
    Spark).

    The coarse quantizer is the n_clusters lowest-id corpus vectors
    used as fixed seed points (no Lloyd iterations): assignment and
    probing are plain L2 argmins any engine computes identically, so
    a DuckDB oracle can certify the full posting-list pipeline —
    assignment, multi-probe, posting join, exact rerank — value for
    value. KMeans centers buy tighter cells; seed points keep the
    IDENTICAL search structure (cells partition the corpus, queries
    probe n_probes nearest cells) with recall measured in tests, so
    this form certifies the machinery while ivf_topk remains the
    quality tier.

    Scale shape: the quantizer is dimension-sized and rides the
    driver->literal path like ivf_topk's broadcast centroid matrix
    (a bounded TakeOrdered of n_clusters rows — the documented
    vocabulary-sized materialization class); assignment/probing are
    then ROW-LOCAL expressions (argmin over an inline struct array —
    zero shuffle, no fit job, no Python), and the only exchange is
    the posting-list equi-join on cell id plus the per-query top-k
    window, both bounded by cell sizes — the IVF win.
    """
    q_in = queries.filter(F.col(vec_col).isNotNull())
    c_in = corpus.filter(F.col(vec_col).isNotNull())
    centers = [
        [float(x) for x in r[0]]
        for r in c_in.select(F.col(vec_col).cast("array<double>"))
        .orderBy(F.col(id_col))
        .limit(n_clusters)
        .collect()
    ]
    if not centers:
        return _empty_topk_result(queries, corpus, id_col)
    dims = {len(c) for c in centers}
    if len(dims) != 1:
        raise ValueError(
            f"ivf_topk_portable: ragged corpus vector widths {sorted(dims)}"
        )

    def _cells(v: F.Column) -> F.Column:
        """(d2, cid) structs vs every seed center — sorted ascending,
        so element 1 is the assignment and the first n_probes are the
        probe set. The sequential aggregate fold keeps summation
        order engine-portable."""
        return F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.aggregate(
                            F.zip_with(
                                v,
                                F.array(*[F.lit(x) for x in c]),
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ).alias("d2"),
                        F.lit(i).cast("long").alias("cid"),
                    )
                    for i, c in enumerate(centers)
                ]
            )
        )

    posts = c_in.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.element_at(
            _cells(F.col(vec_col).cast("array<double>")), 1
        )["cid"].alias("cid"),
    )
    probes = q_in.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(
            F.transform(
                F.slice(
                    _cells(F.col(vec_col).cast("array<double>")),
                    1,
                    n_probes,
                ),
                lambda s: s["cid"],
            )
        ).alias("cid"),
    )
    # round4 pins -0.0 on near-orthogonal pairs (the l43 class)
    sim = round4(cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        probes.join(posts, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


# Opt-in fit memo (VERDICT r7, l45 shave): ANN index fits are
# fit-once-serve-many in production — the only reason this module
# refit per call is the registry's stateless (spark, sf_dir) query
# interface, which re-pays MLlib's fixed per-fit overhead (~10 s of
# the l45 wall at sf0.1's 2000-row corpus — measured: coarse fit
# + 8 PQ sub-fits dominate; the actual search is ~2 s) on every
# invocation. Callers that KNOW their corpus is content-stable under
# a key (the registered queries: sf_dir names an immutable fixture)
# pass fit_cache_key to reuse the seeded fit. Keyed by applicationId
# so cached broadcasts never outlive their SparkContext, and by every
# fit parameter; the fits are seeded-deterministic, so a cache hit
# returns bit-identical centers/codebooks — recall and rows-only
# determinism are unchanged by construction.
_FIT_CACHE: dict[tuple, object] = {}
# The r11 two-thread fit overlap makes _fit_coarse and
# _pq_fit_codebooks call _fit_cache_put concurrently; the eviction
# scan must not iterate the dict while the other thread inserts
# (RuntimeError: dict changed size during iteration — ADVICE r11).
_FIT_CACHE_LOCK = __import__("threading").Lock()


def _fit_cache_put(key: tuple, value: object) -> None:
    """Insert a fit under its (applicationId-prefixed) key, evicting
    entries from STOPPED applications: stale-app broadcasts can never
    be reused (the appId prefix guarantees that) but would otherwise
    accumulate driver-side numpy copies across session restarts in a
    long-lived process (notebook kernels, repeated get_session/stop
    cycles — code-review r8 finding). Eviction spares any app whose
    SparkContext is still the process's ACTIVE one (ADVICE r8:
    blanket cross-app eviction would thrash-evict between two live
    engines; classic PySpark has one active context per process, so
    "not inserting and not active" == stopped)."""
    app = key[0]
    live = {app}
    try:
        from pyspark import SparkContext

        active = SparkContext._active_spark_context
        if active is not None:
            live.add(active.applicationId)
    except Exception:
        pass
    with _FIT_CACHE_LOCK:
        for k in [k for k in _FIT_CACHE if k[0] not in live]:
            del _FIT_CACHE[k]
        _FIT_CACHE[key] = value


def _pq_fit_codebooks(
    c: DataFrame,
    id_col: str,
    n_subspaces: int,
    n_codes: int,
    sub: int,
    seed: int,
    fit_mod: int,
    cache_key=None,
    op: str = "pq_topk",
):
    """Fit the per-subspace PQ codebooks on (a hash-mod sample of) the
    normalized corpus `c` (expects `_nv`) and broadcast the stacked
    (n_subspaces, n_codes, sub) array. Shared by pq_topk and
    ivfpq_topk — one definition so the seeding/caching/parallel-fit
    behavior cannot drift between the flat and pruned tiers.

    A fixed, small number of seeded MLlib fits (n_subspaces is a
    constant, not data-sized); clusterCenters() is the same
    driver-side model API ivf_topk uses — not a data collect.
    The fit relation is CACHED and pre-sliced once: without it each
    of the n_subspaces fits re-scans + re-normalizes the corpus per
    Lloyd iteration (measured 39 s at sf0.1 for 8 fits — almost all
    of it redundant scan + per-iteration stage overhead; cached and
    iteration-capped it is ~3 s). maxIter=10: sub-quantizers are
    8-dimensional and converge in a handful of rounds; codebook
    quality differences past that are far below the rerank margin.
    coalesce(4): the fit set is sample-sized; Lloyd runs
    iterations × subspaces jobs over it, and 32-task rounds on a
    5k-row relation are pure scheduler overhead. initMode="random"
    (seeded): k-means|| burns several extra passes per fit for an
    init whose quality difference an 8-dim sub-quantizer cannot
    show through the rerank margin.
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = c.sparkSession
    memo_key = None
    if cache_key is not None:
        # id_col is a fit parameter too: with fit_mod > 1 it drives
        # the hash-mod sample, so the same cache_key over a different
        # id column must not reuse codebooks trained on a different
        # sample (code-review r8 finding).
        memo_key = (
            spark.sparkContext.applicationId, "pq-codebooks", cache_key,
            (n_subspaces, n_codes, sub, seed, fit_mod, id_col),
        )
        with _FIT_CACHE_LOCK:
            hit = _FIT_CACHE.get(memo_key)
        if hit is not None:
            return hit
    fit_src = (
        c if fit_mod <= 1
        else c.filter(F.pmod(F.xxhash64(F.col(id_col)), fit_mod) == 0)
    )
    if fit_mod > 1 and fit_src.isEmpty():
        # The hash-mod sample can be empty on a small-but-nonempty
        # corpus; KMeans.fit would then throw MLlib's opaque
        # empty-dataset error. Raise the actionable message instead
        # (falling back to the full corpus silently would defeat the
        # bounded-fit contract the caller asked for).
        raise ValueError(
            f"{op}: fit_mod={fit_mod} selected no corpus rows to "
            "fit codebooks on; lower fit_mod (the fit set should be "
            ">= ~100x n_codes rows)"
        )
    fit_all = fit_src.select(
        *[
            array_to_vector(
                F.slice(F.col("_nv"), j * sub + 1, sub)
            ).alias(f"_sv{j}")
            for j in range(n_subspaces)
        ]
    ).coalesce(4).cache()
    try:
        # The fits are independent (separate estimators, separate
        # seeds, same cached input) — run them on concurrent driver
        # threads so Spark schedules the 8 job chains in parallel:
        # each fit carries ~1.3 s of fixed MLlib overhead even on a
        # cached 4-partition input, and serially that overhead is the
        # whole cost (measured 11 s → ~3 s at sf0.1).
        from concurrent.futures import ThreadPoolExecutor

        def _fit(j: int):
            km = KMeans(
                k=n_codes, seed=seed + j, maxIter=10,
                initMode="random",
                featuresCol=f"_sv{j}", predictionCol="_code",
            )
            return np.array(
                [
                    np.asarray(cc)
                    for cc in km.fit(fit_all).clusterCenters()
                ]
            )

        with ThreadPoolExecutor(max_workers=n_subspaces) as pool:
            codebooks = list(pool.map(_fit, range(n_subspaces)))
    finally:
        fit_all.unpersist()
    # A NON-empty fit sample smaller than n_codes passes the isEmpty
    # guard but random-init KMeans then returns fewer than n_codes
    # centers, and the ADC table write crashes with an opaque numpy
    # shape error mid-task (r10 sweep). Same actionable contract as
    # the empty-sample raise above.
    short = [c_.shape[0] for c_ in codebooks if c_.shape[0] != n_codes]
    if short:
        raise ValueError(
            f"{op}: fit sample yielded only {min(short)} distinct "
            f"KMeans centers < n_codes={n_codes}; lower fit_mod or "
            f"n_codes (the fit set should be >= ~100x n_codes rows)"
        )
    cb = np.stack(codebooks)  # (n_subspaces, n_codes, sub)
    b = spark.sparkContext.broadcast(cb)
    if memo_key is not None:
        _fit_cache_put(memo_key, b)
    return b


def _pq_encode_udf(b_cb, n_subspaces: int, sub: int):
    """Vectorized corpus→codes pandas UDF over the broadcast codebook
    stack (argmin sub-distance per subspace). Null-tolerant: a None
    vector encodes to [] so a downstream explode/filter drops it."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _encode(vecs):
        arrs = list(vecs)
        out = [[] for _ in arrs]
        valid = [i for i, a in enumerate(arrs) if a is not None]
        if valid:
            m = np.array([arrs[i] for i in valid], dtype=np.float64)
            codes = np.empty((len(valid), n_subspaces), dtype="int32")
            for j in range(n_subspaces):
                block = m[:, j * sub:(j + 1) * sub]
                d = (
                    (block[:, None, :] - b_cb.value[j][None, :, :]) ** 2
                ).sum(axis=2)
                codes[:, j] = np.argmin(d, axis=1)
            for row, i in enumerate(valid):
                out[i] = list(codes[row])
        return pd.Series(out)

    return pandas_udf(_encode, returnType="array<int>")


def _pq_adc_udf(b_cb, n_subspaces: int, n_codes: int, sub: int):
    """Per-query ADC table pandas UDF: L2-normalize, then squared L2
    from each query sub-vector to every codebook entry — a tiny
    n_subspaces×n_codes grid per query, flattened row-major."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _adc_table(vecs):
        arrs = list(vecs)
        out = [[] for _ in arrs]
        valid = [i for i, a in enumerate(arrs) if a is not None]
        if valid:
            m = np.array([arrs[i] for i in valid], dtype=np.float64)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            m = m / norms
            tabs = np.empty(
                (len(valid), n_subspaces * n_codes), dtype=np.float64
            )
            for j in range(n_subspaces):
                block = m[:, j * sub:(j + 1) * sub]
                d = (
                    (block[:, None, :] - b_cb.value[j][None, :, :]) ** 2
                ).sum(axis=2)
                tabs[:, j * n_codes:(j + 1) * n_codes] = d
            for row, i in enumerate(valid):
                out[i] = list(tabs[row])
        return pd.Series(out)

    return pandas_udf(_adc_table, returnType="array<double>")


def _pq_adc_fold(n_subspaces: int, n_codes: int):
    """Native ADC fold column: per (query, corpus-code) pair, sum the
    `_tab` entries the `_codes` select — table lookups in whole-stage
    codegen, no Python in the candidate hot path. element_at is
    1-based."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.col("_tab"),
            (j * n_codes + F.element_at(F.col("_codes"), j + 1) + 1).cast(
                "int"
            ),
        ),
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_subspaces: int = 8,
    n_codes: int = 16,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_mod: int = 1,
    max_queries: int | None = 10_000,
    dim: int | None = None,
    fit_cache_key: str | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors via product quantization
    (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011) — the memory-compression ANN tier beside
    ann_lsh_topk (hash buckets) and ivf_topk (coarse posting lists):

    1. fit: the L2-normalized vector space is split into
       `n_subspaces` contiguous sub-blocks; a seeded MLlib KMeans per
       sub-block (a fixed, small number of fits on a deterministic
       hash-mod sample — `fit_mod` is the 100 TB lever: fit_mod=m
       fits on ~1/m of the corpus, the standard bounded-training-set
       recipe, cf. semantic_neardup's sampled quantizer) learns a
       `n_codes`-entry codebook;
    2. encode: ONE vectorized pandas-UDF pass maps each corpus vector
       to `n_subspaces` uint codes — 8 bytes/vector at the defaults
       vs 256 for the raw float32[64]: the 32× memory win IS the
       operator (the scan itself stays |Q|×|C|; compose with
       ivf_topk's posting lists when candidate PRUNING is needed —
       PQ compresses memory, IVF prunes candidates);
    3. search: each query's ADC table (asymmetric distance: squared
       L2 from its sub-vectors to every codebook entry — a tiny
       `n_subspaces`×`n_codes` grid, computed once per query in a
       pandas UDF) is joined against the codes and folded NATIVELY:
       `aggregate(sequence, table[j*n_codes + code_j])` — table
       lookups in whole-stage codegen, no Python in the |Q|×|C| hot
       path;
    4. rerank: the `k*rerank_factor` best ADC candidates per query
       (window top-k) fetch their raw vectors back (equi-join on
       neighbor id) for EXACT cosine scoring; final rank is exact.

    On L2-normalized vectors ADC's squared-L2 ordering equals cosine
    ordering (||q-c||² = 2-2cosθ), which is why the fit normalizes.
    Deterministic under the fixed seed (hash-mod sample, seeded
    KMeans, id tiebreaks); registered rows-only like every ANN
    variant — recall vs cosine_topk_exact is measured in tests.
    The bounded-|Q| contract and enforcement are shared with
    cosine_topk_exact (same two-tier static/probe check, same
    rationale: the ADC scan is a crossJoin).
    """
    # Null vectors can't encode or score — drop at the boundary (same
    # WHEN-guard stance as ivf_topk; see ann_lsh_topk on why the
    # guard must stay row-local).
    c = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("_arr"))
        .filter(F.col("_arr").isNotNull())
        .withColumn("_nv", l2_normalize("_arr"))
    )
    queries = queries.filter(F.col(vec_col).isNotNull())
    if c.isEmpty():
        return _empty_topk_result(queries, corpus, id_col)
    _enforce_query_bound(
        queries, max_queries, "pq_topk",
        "the ADC scan is |Q|x|corpus|. Compose with ivf_topk for "
        "candidate pruning.",
    )

    if dim is None:
        # Bounded 1-row scalar probe (same documented stance as the
        # other scalar-sizing actions — mining.py's basket probe,
        # dedup.py's block sizing): pass dim= explicitly to stay
        # fully lazy.
        dim = int(c.select(F.size("_arr").alias("d")).first()["d"])
    if dim % n_subspaces != 0:
        raise ValueError(
            f"pq_topk: dim {dim} not divisible by n_subspaces "
            f"{n_subspaces}"
        )
    sub = dim // n_subspaces
    # Mis-sized explicit dim guard (the ADVICE r6 class, present in
    # ann_lsh_topk/ivfpq_topk but missing here until code-review r8):
    # a too-small dim silently trains/scores on a PREFIX of every
    # vector (recall collapses with no error), a too-large one fails
    # deep in MLlib. Lazy codegen-side check; NULLs exempt (already
    # filtered above, size(NULL) would NULL-trip assert_true).
    c = c.withColumn(
        "_nv",
        F.when(
            F.assert_true(
                F.col("_nv").isNull()
                | (F.size("_nv") == F.lit(int(dim))),
                F.lit(
                    f"pq_topk: non-NULL vector length != dim={dim} "
                    "— pass the actual embedding width"
                ),
            ).isNull(),
            F.col("_nv"),
        ),
    )

    b_cb = _pq_fit_codebooks(
        c, id_col, n_subspaces, n_codes, sub, seed, fit_mod,
        cache_key=fit_cache_key,
    )
    encode_udf = _pq_encode_udf(b_cb, n_subspaces, sub)
    adc_udf = _pq_adc_udf(b_cb, n_subspaces, n_codes, sub)

    codes_rel = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_arr").alias("_cv"),
        encode_udf(F.col("_nv")).alias("_codes"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        adc_udf(F.col(vec_col)).alias("_tab"),
    )
    adc = _pq_adc_fold(n_subspaces, n_codes)
    wa = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.col("neighbor_id")
    )
    # The |Q|x|C| scan and its candidate-cut window carry ONLY
    # (query_id, neighbor_id, adc_dist) — raw vectors would multiply
    # the window shuffle's width ~30x for rows that are about to be
    # discarded (self-review: the first cut rode _qv/_cv through the
    # scan). Survivors re-fetch vectors afterwards: queries-side by
    # broadcast (bounded by contract), corpus-side by equi-join on
    # neighbor id — |survivors| = k*rerank_factor*|Q| rows, not
    # |Q|x|C|.
    cand = (
        F.broadcast(q.select("query_id", "_tab"))
        .crossJoin(codes_rel.select("neighbor_id", "_codes"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc_dist"))
        .withColumn("_arank", F.row_number().over(wa))
        .filter(F.col("_arank") <= k * rerank_factor)
    )
    qv = q.select("query_id", "_qv")
    # vector re-fetch comes from the pre-encode relation: the rerank
    # leg must not re-run the encode UDF just to read raw vectors
    cv = c.select(
        F.col(id_col).alias("neighbor_id"), F.col("_arr").alias("_cv")
    )
    # round4 pins -0.0 on near-orthogonal pairs (the l43 class)
    sim = round4(cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probes: int = 4,
    n_subspaces: int = 8,
    n_codes: int = 16,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_mod: int = 1,
    dim: int | None = None,
    fit_cache_key: str | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF×PQ — the composed
    at-scale ANN tier (Jégou et al. 2011's IVFADC layout): IVF's
    coarse posting lists PRUNE candidates, PQ's 8-byte codes
    COMPRESS what the pruned scan reads. This removes the one
    100 TB caveat of each part alone: flat pq_topk still scans
    |Q|×|C| codes (cheap per row, but every row), and ivf_topk
    drags full raw vectors through its posting-list join; here the
    posting join carries (cid, code[8]) rows and only the probed
    cells are read, so the candidate scan is
    |Q| × (probed fraction of corpus) × 8 bytes.

    1. coarse: seeded MLlib KMeans on the normalized corpus
       (ivf_topk's quantizer) → each corpus vector a centroid id;
    2. fine: _pq_fit_codebooks on the SAME normalized space (plain
       PQ codebooks, not residual-encoded — the rerank step makes
       the residual refinement unnecessary at these code budgets:
       recall is floored against cosine_topk_exact in tests);
    3. probe: each query keeps its n_probes nearest centroid ids
       (ivf_topk's vectorized probe) and computes its ADC table
       (_pq_adc_udf) in the same pass;
    4. search: equi-join probes↔codes ON cid (NO crossJoin anywhere
       — the shape difference vs pq_topk), native ADC fold, per-query
       window cut to k·rerank_factor;
    5. rerank: survivors fetch raw vectors by equi-join and score
       exact cosine; final rank is exact (precision = 1 on returned
       pairs).

    Deterministic under the fixed seed; registered rows-only like
    every ANN tier. Unlike pq_topk there is no |Q| bound to enforce:
    nothing here is a crossJoin, so an unbounded query side degrades
    gracefully (bigger probe join), not quadratically.

    `fit_cache_key`: opt-in fit-once-serve-many (the production ANN
    posture). When the caller knows the corpus is content-stable
    under a key (the registered l45 passes its sf_dir — an immutable
    fixture path), the seeded coarse centers + PQ codebooks are
    memoized per (SparkContext, key, params) and reused — bit-
    identical results (the fits are deterministic), so recall and
    determinism are unchanged; only MLlib's fixed per-fit overhead
    (the dominant cost on a small corpus) stops being re-paid per
    call. Default None = refit every call (content unknown).
    """
    import numpy as np
    import pandas as pd
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.functions import pandas_udf

    spark = corpus.sparkSession
    c = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("_arr"))
        .filter(F.col("_arr").isNotNull())
        .withColumn("_nv", l2_normalize("_arr"))
    )
    queries = queries.filter(F.col(vec_col).isNotNull())
    if c.isEmpty():
        return _empty_topk_result(queries, corpus, id_col)

    if dim is None:
        # Bounded 1-row scalar probe — pass dim= explicitly to stay
        # fully lazy (the registered l45 query does).
        dim = int(c.select(F.size("_arr").alias("d")).first()["d"])
    if dim % n_subspaces != 0:
        raise ValueError(
            f"ivfpq_topk: dim {dim} not divisible by n_subspaces "
            f"{n_subspaces}"
        )
    sub = dim // n_subspaces
    # A mis-sized explicit `dim` would mis-slice the subspaces and
    # NULL out the codes — fail loudly on the first wrong-width
    # vector instead of returning zero neighbors (ADVICE r6; lazy
    # codegen-side check, same stance as ann_lsh_topk — NULL vectors
    # exempt, ADVICE r7: size(NULL) is NULL and assert_true(NULL)
    # throws, but NULLs were always dropped downstream).
    c = c.withColumn(
        "_nv",
        F.when(
            F.assert_true(
                F.col("_nv").isNull()
                | (F.size("_nv") == F.lit(int(dim))),
                F.lit(
                    f"ivfpq_topk: non-NULL vector length != dim={dim} "
                    "— pass the actual embedding width"
                ),
            ).isNull(),
            F.col("_nv"),
        ),
    )

    # Coarse quantizer on the NORMALIZED space (cosine ≡ L2 there, so
    # cell membership agrees with the ADC metric). Fit economics (the
    # _pq_fit_codebooks lesson, measured here too): the first cut fit
    # on the UNCACHED corpus lineage and paid ~18 s at sf0.1
    # re-scanning parquet per Lloyd/init pass — CACHED it is ~1 s.
    # Unlike the 8-dim PQ sub-quantizers, the coarse quantizer keeps
    # k-means|| init and full iterations: its cell boundaries decide
    # which candidates EXIST (recall), not how they score (the rerank
    # fixes scores, not absences) — an A/B on these fixtures measured
    # random-init recall 0.81/0.64 (sf0.01/0.1) vs 0.88 with k-means||
    # on identical probe budgets, and the polish is nearly free on
    # the cached input.
    coarse_key = None
    if fit_cache_key is not None:
        # dim is a fit parameter: the same fit_cache_key over a
        # different embedding width must not return stale centers of
        # the wrong shape (code-review r8 finding).
        coarse_key = (
            spark.sparkContext.applicationId, "ivfpq-coarse",
            fit_cache_key, (n_clusters, seed, dim),
        )
    with _FIT_CACHE_LOCK:
        b_centers = _FIT_CACHE.get(coarse_key) if coarse_key else None

    def _fit_coarse():
        # Same cluster-scaled fit parallelism as ivf_topk (ADVICE r8:
        # a literal 8 capped Lloyd's scan concurrency regardless of
        # corpus size; coalesce never raises the count).
        fit_vec = (
            c.select(array_to_vector(F.col("_nv")).alias("_v"))
            .coalesce(max(8, spark.sparkContext.defaultParallelism))
            .cache()
        )
        try:
            km = KMeans(
                k=n_clusters, seed=seed,
                featuresCol="_v", predictionCol="_cid",
            )
            model = km.fit(fit_vec)
        finally:
            fit_vec.unpersist()
        centers = np.array(
            [np.asarray(cc) for cc in model.clusterCenters()]
        )
        b = spark.sparkContext.broadcast(centers)
        if coarse_key is not None:
            _fit_cache_put(coarse_key, b)
        return b

    def _fit_pq():
        return _pq_fit_codebooks(
            c, id_col, n_subspaces, n_codes, sub, seed, fit_mod,
            cache_key=fit_cache_key, op="ivfpq_topk",
        )

    if b_centers is None:
        # Optimization r11 (guide §2.6 — overlap independent jobs):
        # the coarse quantizer fit and the 8 PQ sub-quantizer fits are
        # independent seeded estimators over the same normalized
        # corpus; running them sequentially left the cluster idle
        # through each fit's scheduling tail. Two driver threads let
        # Spark schedule both job chains at once — results are
        # bit-identical (separate estimators, separate seeds, same
        # inputs; each keeps its own fit cache entry). Same pattern as
        # _pq_fit_codebooks' own intra-fit thread pool.
        from concurrent.futures import ThreadPoolExecutor

        from concurrent.futures import wait as _fut_wait

        with ThreadPoolExecutor(max_workers=2) as pool:
            fut_coarse = pool.submit(_fit_coarse)
            fut_pq = pool.submit(_fit_pq)
            # Wait for BOTH to finish before collecting either result
            # (ADVICE r11): raising on the first .result() would rely
            # on the context-manager join alone to stop the other
            # thread and would silently drop its exception.
            _fut_wait([fut_coarse, fut_pq])
            b_centers = fut_coarse.result()
            b_cb = fut_pq.result()
    else:
        b_cb = _fit_pq()
    encode_udf = _pq_encode_udf(b_cb, n_subspaces, sub)
    adc_udf = _pq_adc_udf(b_cb, n_subspaces, n_codes, sub)

    def _nearest_cells(vecs, n):
        # Shared cell-assignment kernel: normalized argmin distance to
        # the broadcast centroid matrix. Corpus rows take n=1 (their
        # inverted-file cell — a vectorized pandas argmin instead of
        # MLlib model.transform's row-at-a-time JVM UDF), queries take
        # n=n_probes. Null rows get an empty list so a downstream
        # explode drops them.
        arrs = list(vecs)
        valid_idx = [i for i, a in enumerate(arrs) if a is not None]
        out = [[] for _ in arrs]
        if valid_idx:
            m = np.array([arrs[i] for i in valid_idx], dtype=np.float64)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            m = m / norms
            d = ((m[:, None, :] - b_centers.value[None, :, :]) ** 2).sum(
                axis=2
            )
            idx = np.argsort(d, axis=1)[:, :n].astype("int32")
            for row, i in enumerate(valid_idx):
                out[i] = list(idx[row])
        return pd.Series(out)

    assign_cid = pandas_udf(
        lambda v: _nearest_cells(v, 1).map(
            lambda cells: cells[0] if cells else None
        ),
        returnType="int",
    )
    probe_cids = pandas_udf(
        lambda v: _nearest_cells(v, n_probes), returnType="array<int>"
    )

    # The inverted file: (cid, 8-byte codes) — raw vectors do NOT
    # ride the posting lists (the ivf_topk caveat this composition
    # removes); they come back only for the rerank survivors.
    postings = c.select(
        F.col(id_col).alias("neighbor_id"),
        assign_cid(F.col("_nv")).alias("cid"),
        encode_udf(F.col("_nv")).alias("_codes"),
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        adc_udf(F.col(vec_col)).alias("_tab"),
        F.explode(probe_cids(F.col(vec_col))).alias("cid"),
    )
    adc = _pq_adc_fold(n_subspaces, n_codes)
    wa = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.col("neighbor_id")
    )
    cand = (
        q.select("query_id", "_tab", "cid")
        .join(postings, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc_dist"))
        .withColumn("_arank", F.row_number().over(wa))
        .filter(F.col("_arank") <= k * rerank_factor)
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cv = c.select(
        F.col(id_col).alias("neighbor_id"), F.col("_arr").alias("_cv")
    )
    # round4 pins -0.0 on near-orthogonal pairs (the l43 class)
    sim = round4(cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ranking_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Retrieval-quality metrics per query: recall@k and MRR of a
    candidate ranking against a ground-truth ranking — the evaluation
    harness every ANN tier in this module reports through in tests,
    promoted to a first-class distributed operator so recall can be
    monitored IN the pipeline (e.g. nightly: quantized index vs exact
    on a probe set), not just in CI.

    Returns (query_id, n_relevant, n_hits, recall_at_k, mrr): truth
    rows at rank ≤ k define the relevant set; recall divides by the
    ACTUAL per-query relevant count (= k normally, fewer when the
    corpus is small); MRR is 1/rank of the first relevant hit in the
    candidate list, 0 when nothing relevant was retrieved. Queries
    present in truth but absent from results score 0 — silent
    drop-outs are exactly what the monitor must surface.

    Shape: one equi-key LEFT join on (query, item) — both sides
    pre-filtered to rank ≤ k, so the join carries ≤ k rows per query
    per side regardless of corpus size — then one per-query hash
    aggregate. Nothing scales with the corpus; everything scales
    with |probe queries| × k.
    """
    t = truth.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query_id"),
        F.col(item_col).alias("_item"),
    )
    r = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query_id"),
        F.col(item_col).alias("_item"),
        F.col(rank_col).alias("_rrank"),
    )
    joined = t.join(r, ["query_id", "_item"], "left")
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_relevant"),
        F.count("_rrank").alias("n_hits"),
        F.round(F.count("_rrank") / F.count(F.lit(1)), 4).alias(
            "recall_at_k"
        ),
        F.round(
            F.coalesce(F.lit(1.0) / F.min("_rrank"), F.lit(0.0)), 4
        ).alias("mrr"),
    )


def rrf_fuse(
    runs: Sequence[DataFrame],
    keys: Sequence[str],
    id_col: str,
    score_col: str,
    k: int = 60,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N rankings — (keys…, id, n_runs,
    rrf_score) with rrf_score = Σ_runs 1/(k + rank_run) — the
    standard score-free way to combine heterogeneous retrieval
    signals (BM25 + embedding cosine + freshness) without
    normalizing their incomparable score scales; k = 60 is the
    Cormack/Clarke default that damps rank-1 dominance. An item
    missing from a run simply contributes nothing (the classic RRF
    convention), so n_runs doubles as a "how many signals agree"
    confidence column.

    Shape: one row_number window per run — partitioned by the query
    keys, NEVER global (pass the query/stratum columns; a truly
    global fusion should pre-limit each run to its top-N first) —
    then a union (no shuffle) and one (keys, id) hash aggregate
    which the window partitioning already clusters. Determinism:
    ranks order by (score DESC, tiebreak ASC); tie-break defaults to
    the id column so equal scores fuse identically run-to-run and
    engine-to-engine (the calibrated-gate stance).
    """
    if len(runs) < 2:
        raise ValueError(f"rrf_fuse needs >= 2 runs, got {len(runs)}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tb = tiebreak_col or id_col
    legs = []
    for run in runs:
        w = Window.partitionBy(*keys).orderBy(
            F.col(score_col).desc(), F.col(tb).asc()
        )
        legs.append(
            run.filter(F.col(score_col).isNotNull()).select(
                *keys,
                id_col,
                (
                    F.lit(1.0)
                    / (F.lit(float(k)) + F.row_number().over(w))
                ).alias("_contrib"),
            )
        )
    stacked = legs[0]
    for leg in legs[1:]:
        stacked = stacked.unionByName(leg)
    return stacked.groupBy(*keys, id_col).agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.round(F.sum("_contrib"), 4).alias("rrf_score"),
    )


def truncated_dim_recall(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    trunc_dims: Sequence[int] = (16,),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int | None = 10_000,
) -> DataFrame:
    """Matryoshka-style truncation evaluation: per query and per
    truncation width d, the overlap between the exact top-k under the
    FULL vectors and the exact top-k under vectors sliced to their
    first d dimensions — (trunc_dim, query_id, n_hits, recall_at_k).
    The go/no-go measurement before shipping truncated embeddings
    (MRL serving, cheap prefilter tiers, index-memory budgets): if
    recall@k at d=16 is already ~0.9, the 4× smaller index is free.

    Shape: one exact top-k per width plus one for the full vectors —
    each the l03 crossJoin tier with the same enforced max_queries
    bound (this is an EVAL operator: query panels are small by
    design; the candidate lists are ≤ k rows per query before the
    overlap join, so everything after the top-k windows is
    panel-sized). Deterministic: both rankings order by (rounded
    cosine DESC, neighbor id), the l03 tiebreak.
    """
    if not trunc_dims:
        raise ValueError("trunc_dims must be non-empty")
    # withColumn would REPLACE a user _tv column silently (r10 audit)
    for side in (queries, corpus):
        _reject_working_cols(side, ("_tv",), "truncated_dim_recall")
    full = cosine_topk_exact(
        queries, corpus, k=k, id_col=id_col, vec_col=vec_col,
        max_queries=max_queries,
    ).select("query_id", "neighbor_id")
    # Optimization r11: the full ranking feeds TWO legs per width
    # (the overlap join and the per-query denominator) — unpinned,
    # the optimizer expands the whole crossJoin+rank subtree once
    # per consumer (measured: the l56 plan held 12 parquet scans). A
    # LAZY localCheckpoint materializes the ≤ k·|queries|-row result
    # once; every leg reads the pinned RDD. Lazy ⇒ nothing runs at
    # construction; fresh per invocation ⇒ no cross-run caching.
    full = full.localCheckpoint(eager=False)
    out = None
    for d in trunc_dims:
        if d < 1:
            raise ValueError(f"trunc_dims must be >= 1, got {d}")
        # slice CLAMPS past the end, so d > actual width would
        # silently compare the FULL vectors and report recall 1.0
        # for a truncation that was never evaluated — a wrong
        # go/no-go shipping measurement (r10 sweep). Lazy
        # codegen-side check, NULLs exempt (the pq dim-guard form).
        def _tv(side: DataFrame) -> F.Column:
            return F.when(
                F.assert_true(
                    F.col(vec_col).isNull()
                    | (F.size(vec_col) >= F.lit(int(d))),
                    F.lit(
                        f"truncated_dim_recall: trunc_dim={d} exceeds "
                        "the embedding width — the sliced ranking "
                        "would silently equal the full one"
                    ),
                ).isNull(),
                F.slice(F.col(vec_col), 1, int(d)),
            )

        qd = queries.withColumn("_tv", _tv(queries))
        cd = corpus.withColumn("_tv", _tv(corpus))
        # The panel bound was already enforced (or opted out) on the
        # full pass over the same query set — don't re-probe per width.
        trunc = cosine_topk_exact(
            qd, cd, k=k, id_col=id_col, vec_col="_tv", max_queries=None
        ).select(
            "query_id", F.col("neighbor_id").alias("_tn")
        )
        hits = (
            full.join(
                trunc,
                (full["query_id"] == trunc["query_id"])
                & (F.col("neighbor_id") == F.col("_tn")),
            )
            .groupBy(full["query_id"].alias("qid"))
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        per_q = (
            full.groupBy(F.col("query_id").alias("qid"))
            .agg(F.count(F.lit(1)).alias("_n_full"))
            .join(hits, "qid", "left")
            .select(
                F.lit(int(d)).alias("trunc_dim"),
                F.col("qid").alias("query_id"),
                F.coalesce(F.col("n_hits"), F.lit(0))
                .cast("long")
                .alias("n_hits"),
                F.round(
                    F.coalesce(F.col("n_hits"), F.lit(0))
                    / F.col("_n_full"),
                    4,
                ).alias("recall_at_k"),
            )
        )
        out = per_q if out is None else out.unionByName(per_q)
    return out
