"""Embedding-matrix second-moment analytics: the d×d correlation
structure and its eigen-spectrum — the collapse/anisotropy/redundancy
monitors an embedding pipeline runs beside l29's per-dimension
marginals (a pair of dimensions can be individually healthy and
jointly redundant; only the cross-moments see it).

Scale posture — sufficient statistics, never pairwise explosion: the
naive relational form (explode to (vec, i, x), self-join on vec, agg
by (i, j)) shuffles N·d(d+1)/2 rows — a 2000× blow-up of the input
at d = 64 and the plan that dies first at 100 TB. Instead each Arrow
batch is reduced IN PLACE to one partial-row of sufficient stats
(n, Σx, Σxxᵀ as a d²-array — one numpy GEMM per batch), so the only
shuffled relation is #batches × (d² + d + 1) doubles, independent of
N; the partials combine with a native posexplode + hash aggregate
and everything after is d²-sized (broadcast joins). Same
partial-then-combine shape as the engine's two-level HLL rollup
(r48). The DuckDB oracle for the correlation output USES the naive
pairwise form — fine single-process at sf0.01, and exactly the
contrast the docstring above is about.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _moment_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One row of (n, s[d], ss[d²]) per Arrow batch. Null vectors are
    filtered upfront (documented: a null embedding has no moments); a
    RAGGED vector raises — silently padding/truncating would corrupt
    every downstream moment (the multimodal stub's
    partial-result-is-wrong-result stance)."""
    vecs = df.select(F.col(vec_col).alias("_v")).filter(
        F.col("_v").isNotNull()
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            try:
                m = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
                )
            except ValueError as exc:
                raise ValueError(
                    f"ragged {vec_col!r}: expected uniform dim {dim}"
                ) from exc
            if m.shape[1] != dim:
                raise ValueError(
                    f"{vec_col!r} has dim {m.shape[1]}, expected {dim}"
                )
            # A NULL/NaN ELEMENT inside a vector would flow into the
            # partial sums as NaN, which Arrow hands back as NULL and
            # F.sum then silently SKIPS — corrupting every moment in a
            # partition-dependent way while n still counts the row
            # (review r5, confirmed by execution). Same stance as
            # ragged: raise, never partially compute.
            if np.isnan(m).any():
                raise ValueError(
                    f"null/NaN element inside {vec_col!r}: filter or "
                    "impute upstream; moments over partial vectors "
                    "would be silently wrong"
                )
            yield pd.DataFrame(
                {
                    "n": [len(m)],
                    "s": [m.sum(axis=0)],
                    "ss": [(m.T @ m).ravel()],
                }
            )

    return vecs.mapInPandas(
        gen, schema="n long, s array<double>, ss array<double>"
    )


def _combined_moments(
    df: DataFrame, vec_col: str, dim: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Combine the per-batch partials into the three tiny relations
    every second-moment consumer needs: a 1-row count, a d-row
    (i, mu, sd) marginal relation (population sd), and a d²-row
    (i, j, exy) raw-cross-moment relation — 1-based indices so SQL
    twins read embedding[i] directly.

    ONE combined (pos, Σv) aggregate carries all of it: pos 0 is n,
    1..d the per-dim sums, d+1..d+d² the raveled cross products.
    Every downstream relation FILTERS this single (≤ 1+d+d²-row)
    aggregate behind a LAZY localCheckpoint barrier: the branch
    filters are all keyed on `pos`, so without the barrier Catalyst
    pushes each one below the aggregate's exchange, the subtrees
    stop being identical, exchange reuse dies, and the corpus-sized
    MapInPandas pass re-runs once per branch (review r5: 10
    MapInPandas nodes in the old plan, measured; still 4 with a
    shared aggregate and no barrier). Behind the barrier all
    branches reference ONE RDD, computed once, persisted — the
    ann_lsh_topk barrier idiom, with the same documented
    executor-loss trade scoped to a d²-sized relation (recompute =
    one corpus pass)."""
    parts = _moment_partials(df, vec_col, dim)
    stats = (
        parts.select(
            F.posexplode(
                F.concat(
                    F.array(F.col("n").cast("double")),
                    F.col("s"),
                    F.col("ss"),
                )
            ).alias("pos", "v")
        )
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .localCheckpoint(eager=False)
    )
    n_row = stats.filter(F.col("pos") == 0).select(F.col("v").alias("_n"))
    exy = (
        stats.filter(F.col("pos") > dim)
        .crossJoin(F.broadcast(n_row))
        .select(
            (F.floor((F.col("pos") - dim - 1) / dim) + 1).alias("i"),
            ((F.col("pos") - dim - 1) % dim + 1).alias("j"),
            (F.col("v") / F.col("_n")).alias("exy"),
        )
    )
    # One-pass E[x²] − μ² cancels catastrophically on an fp-constant
    # dimension (variance ~ ±1e−18): a negative residue would make
    # sqrt return NaN, and Spark's NaN > 0 = TRUE would wave it
    # through the sd guard (review r5, confirmed by execution). Clamp
    # variance below a RELATIVE floor to exactly 0, so sd = 0 → NULL
    # corr — matching the SQL twin, whose Welford stddev is an exact
    # 0 on a constant column. Residual seam, documented: a dimension
    # whose TRUE relative variance is below 1e−12 of E[x²] also
    # clamps; real embedding dims sit many orders above that.
    var = F.col("exy") - F.col("mu") ** 2
    mom = (
        stats.filter((F.col("pos") >= 1) & (F.col("pos") <= dim))
        .crossJoin(F.broadcast(n_row))
        .select(
            F.col("pos").alias("i"),
            (F.col("v") / F.col("_n")).alias("mu"),
        )
        .join(
            # Explicit broadcast: behind the checkpoint barrier the
            # RDD scan carries no size stats, so Catalyst would plan
            # a corpus-agnostic SortMergeJoin for this d-row stitch.
            F.broadcast(
                exy.filter(F.col("i") == F.col("j")).select("i", "exy")
            ),
            "i",
        )
        .select(
            "i",
            "mu",
            F.sqrt(
                F.when(
                    var > F.col("exy") * F.lit(1e-12), var
                ).otherwise(F.lit(0.0))
            ).alias("sd"),
        )
    )
    return n_row, mom, exy


def embedding_correlation(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Upper-triangle (i ≤ j, 1-based) Pearson correlation matrix of
    the embedding dimensions, population moments:

        corr_ij = (E[x_i x_j] − μ_i μ_j) / (σ_i σ_j)

    Returns (i, j, corr) with corr NULL when either σ is 0 (a
    constant dimension has no correlation; the explicit guard keeps
    Spark's NULL divide and a SQL engine's IEEE divide from hashing
    apart — the r44 flat-series pin)."""
    _, mom, exy = _combined_moments(df, vec_col, dim)
    dm = F.broadcast(mom)
    a = dm.select("i", F.col("mu").alias("_mu_i"), F.col("sd").alias("_sd_i"))
    b = dm.select(
        F.col("i").alias("j"),
        F.col("mu").alias("_mu_j"),
        F.col("sd").alias("_sd_j"),
    )
    return (
        exy.filter(F.col("i") <= F.col("j"))
        .join(a, "i")
        .join(b, "j")
        .select(
            "i",
            "j",
            F.when(
                (F.col("_sd_i") > 0) & (F.col("_sd_j") > 0),
                # + 0.0 pins the IEEE sign of zero: a near-orthogonal
                # dim pair's corr is fp-noise that can round to -0.0
                # in one engine and +0.0 in the other (the r6 driver
                # hash-fail at cell (6,10)); -0.0 + 0.0 = +0.0.
                F.round(
                    (F.col("exy") - F.col("_mu_i") * F.col("_mu_j"))
                    / (F.col("_sd_i") * F.col("_sd_j")),
                    4,
                )
                + F.lit(0.0),
            ).alias("corr"),
        )
    )


def embedding_spectrum(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """One-row eigen-spectrum summary of the embedding covariance:
    (n_vectors, total_var, top1_share, effective_rank,
    n_components_90) — trace, anisotropy (λ₁/Σλ), participation
    ratio ((Σλ)²/Σλ², the continuous effective dimensionality), and
    the component count covering 90% variance. The collapse metrics
    from the representation-degeneration literature, on the
    POPULATION covariance.

    Not SQL-expressible (eigendecomposition), so a registration would
    be rows-only by design — certified instead against a local numpy
    eigh on the same input (tests/test_embeddings.py). Shape: the
    same sufficient-stats seam, then ONE grouped-map over the d²-row
    (i, j, cov) relation (bounded by d², never by N) runs the d×d
    eigh — numpy on a 64×64 matrix inside an executor task, not a
    driver collect."""
    n_row, mom, exy = _combined_moments(df, vec_col, dim)
    a = F.broadcast(mom).select("i", F.col("mu").alias("_mu_i"))
    b = F.broadcast(mom).select(
        F.col("i").alias("j"), F.col("mu").alias("_mu_j")
    )
    cov = (
        exy.join(a, "i")
        .join(b, "j")
        .crossJoin(F.broadcast(n_row))
        .select(
            F.lit(1).alias("_g"),
            "i",
            "j",
            (F.col("exy") - F.col("_mu_i") * F.col("_mu_j")).alias("cov"),
            F.col("_n").alias("n"),
        )
    )

    def spec(pdf: pd.DataFrame) -> pd.DataFrame:
        n = int(pdf["n"].iloc[0])
        m = np.zeros((dim, dim))
        m[pdf["i"].to_numpy() - 1, pdf["j"].to_numpy() - 1] = pdf[
            "cov"
        ].to_numpy()
        lam = np.linalg.eigvalsh(m)[::-1]
        lam = np.clip(lam, 0.0, None)  # fp jitter below 0
        tot = float(lam.sum())
        share = float(lam[0] / tot) if tot > 0 else None
        erank = float(tot**2 / (lam @ lam)) if tot > 0 else None
        # Zero total variance (all-constant corpus): every spectrum
        # statistic is undefined — n_components_90 must be NULL like
        # top1_share/effective_rank, not 1 ("one component covers
        # 90%" reads as maximally-collapsed-but-well-defined, the
        # opposite of no-variance-at-all; code-review r9).
        n90 = (
            int(np.searchsorted(np.cumsum(lam) / tot, 0.9) + 1)
            if tot > 0
            else None
        )
        return pd.DataFrame(
            {
                "n_vectors": [n],
                "total_var": [round(tot, 4)],
                "top1_share": [None if share is None else round(share, 4)],
                "effective_rank": [
                    None if erank is None else round(erank, 4)
                ],
                "n_components_90": pd.array([n90], dtype="Int32"),
            }
        )

    return cov.groupBy("_g").applyInPandas(
        spec,
        schema=(
            "n_vectors long, total_var double, top1_share double, "
            "effective_rank double, n_components_90 int"
        ),
    )


def label_centroid_similarity(
    embs: DataFrame,
    label_col: str,
    vec_col: str,
) -> DataFrame:
    """Pairwise cosine similarity between per-LABEL centroid vectors
    — one row per unordered label pair (label_a < label_b):
    (label_a, label_b, n_a, n_b, cosine). The class-geometry monitor
    an embedding pipeline runs after re-training or re-indexing: two
    labels whose centroids drift toward cosine ≈ 1 are merging in
    embedding space (retrieval confusion incoming), and a centroid
    whose neighbors all move at once signals a scale/rotation shift
    rather than a data change. Complements l29 (per-dimension
    marginals) and l43/l44 (global second moments) with the
    BETWEEN-CLASS view.

    Shape: one posexplode + (label, pos) hash aggregate reduces the
    corpus to a |labels|·d centroid relation; the pair matrix is a
    self-equi-join ON pos of that dimension-sized relation plus one
    (label_a, label_b) aggregate — the corpus is scanned ONCE and
    nothing downstream scales with N. Norms ride the same aggregate
    (Σ m² per label), so no second pass. Pins: a zero-norm centroid
    (all-zero vectors under a label) yields NULL cosine, never
    NaN/±inf (the r44 pin); NULL embeddings are excluded; labels
    with a single vector are legitimate (a centroid of one).
    FIXED-DIMENSIONALITY CONTRACT: every non-NULL vector must have
    the same length — the pos equi-join computes the dot product
    over SHARED positions only, so ragged inputs would silently
    truncate the geometry instead of failing. The embeddings
    fixture satisfies it by construction and
    tests/test_label_centroids.py asserts it; n_a/n_b stay
    honest (count of non-empty vectors) even if it's violated.
    """
    base = embs.filter(
        F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(label_col).alias("_lab"),
        F.posexplode(F.col(vec_col)).alias("_pos", "_x"),
    )
    cent = base.groupBy("_lab", "_pos").agg(
        F.avg(F.col("_x").cast("double")).alias("_m"),
        F.count(F.lit(1)).alias("_n"),
    )
    a = cent.select(
        F.col("_lab").alias("label_a"),
        F.col("_pos").alias("_pos"),
        F.col("_m").alias("_ma"),
        F.col("_n").alias("_na"),
    )
    b = cent.select(
        F.col("_lab").alias("label_b"),
        F.col("_pos").alias("_pos"),
        F.col("_m").alias("_mb"),
        F.col("_n").alias("_nb"),
    )
    pairs = (
        a.join(b, "_pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            # max, not first: per-(label, pos) counts are all equal
            # under the fixed-dimensionality contract (below), and if
            # a malformed corpus ever violates it, max is still the
            # deterministic "number of non-empty vectors" (position 0
            # exists in every one) where first() is whatever partition
            # ordering the shuffle happened to produce (ADVICE r5).
            F.max("_na").alias("n_a"),
            F.max("_nb").alias("n_b"),
            F.sum(F.col("_ma") * F.col("_mb")).alias("_dot"),
            F.sum(F.col("_ma") * F.col("_ma")).alias("_naa"),
            F.sum(F.col("_mb") * F.col("_mb")).alias("_nbb"),
        )
    )
    denom = F.sqrt(F.col("_naa")) * F.sqrt(F.col("_nbb"))
    return pairs.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        # + 0.0 pins -0.0 on near-orthogonal centroids (the l43
        # class); paired with `+ 0.0` in the l51 oracle.
        (
            F.round(F.when(denom > 0, F.col("_dot") / denom), 4)
            + F.lit(0.0)
        ).alias("cosine"),
    )


def embedding_projection_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_bins: int = 10,
    seed: int = 42,
    n_directions: int = 4,
) -> DataFrame:
    """Embedding-distribution drift between a reference and a current
    corpus — r74's PSI lifted to vector columns: each vector is
    projected onto `n_directions` SEEDED unit directions (literal
    arrays — deterministic, no fit job, the ann_lsh projection seam),
    and each 1-D projection runs the psi_drift machinery with
    REFERENCE-quantile bins. One row per (direction, bin);
    SUM(psi_part) per direction is that axis's drift statistic, the
    max over directions the alarm. The monitor that catches "the new
    embedding batch came from a different model/checkpoint" BEFORE
    any retrieval metric moves — marginal stats (l29) miss rotations,
    the corr matrix (l43) is d² numbers with no threshold lore; a
    handful of random 1-D projections inherit PSI's battle-tested
    <0.1 / >0.25 thresholds (Cramér–Wold: distributions differing at
    all differ on almost every projection).

    Shape: ALL n_directions projections are codegen zip_with dots
    emitted as columns of ONE narrow (n_directions-wide double)
    relation per side, eagerly pinned — so each corpus really is
    scanned once per side, and psi_drift's per-direction quantile +
    bin aggregates (2×n_directions ref reads, n_directions cur
    reads) run over the pinned skinny relation, never the corpus
    (code-review r9: the first cut re-ran the corpus scan per
    psi_drift leg). The pin's lifetime is the returned plan's (the
    growth_accounting stance); everything after the two pinned scans
    is n_directions × n_bins rows. Malformed vectors follow the
    module's partial-result-is-wrong-result stance: a NULL vector
    has no projection (filtered, as documented), but a RAGGED vector
    or a NULL ELEMENT inside one raises — silently dropping rows
    from n_cur/cur_share would understate exactly the drift this
    monitor exists to catch.
    """
    import numpy as np

    from . import ckpt
    from .relational import psi_drift

    if n_directions < 1:
        raise ValueError(
            f"n_directions must be >= 1, got {n_directions}"
        )
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((n_directions, dim))
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)

    def projected(df: DataFrame) -> DataFrame:
        cols = []
        for t in range(n_directions):
            r_t = F.array(*[F.lit(float(v)) for v in proj[t]])
            dot = F.aggregate(
                F.zip_with(F.col(vec_col), r_t, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            # round the projection to 6dp BEFORE binning on both
            # engines: the bin edges are quantiles of these values,
            # and an unrounded last-ulp difference at an edge would
            # re-bin a row (the r74 4dp-edge stance, one digit finer
            # since projections are O(1) scale); + 0.0 pins the sign
            # of zero. A NULL dot under a NON-null vector means a
            # ragged vector (zip_with padded) or a NULL element —
            # raise, never drop (stance above); size is checked
            # explicitly so the error names the actual defect.
            pr = F.round(dot, 6) + F.lit(0.0)
            guarded = (
                F.when(F.size(F.col(vec_col)) != dim, F.raise_error(
                    F.format_string(
                        f"ragged {vec_col}: expected dim {dim}, got %s",
                        F.size(F.col(vec_col)).cast("string"),
                    )
                ).cast("double"))
                .when(pr.isNull() | F.isnan(pr), F.raise_error(F.lit(
                    f"null/NaN element inside {vec_col}: filter or "
                    "impute upstream; drift shares over partial "
                    "corpora would be silently wrong"
                )).cast("double"))
                .otherwise(pr)
            )
            cols.append(guarded.alias(f"_p{t}"))
        return ckpt.pin(
            df.filter(F.col(vec_col).isNotNull()).select(*cols)
        )

    ref_p, cur_p = projected(ref), projected(cur)
    out = None
    for t in range(n_directions):
        d = psi_drift(
            ref_p.select(F.col(f"_p{t}").alias("_p")),
            cur_p.select(F.col(f"_p{t}").alias("_p")),
            "_p",
            n_bins=n_bins,
        ).select(
            F.lit(t).alias("direction"),
            "bin",
            "n_ref",
            "n_cur",
            "ref_share",
            "cur_share",
            "psi_part",
        )
        out = d if out is None else out.unionByName(d)
    return out
