"""Degenerate-input sweep for the round-6 STAGED operators — the
same empty/NULL contract test_empty_inputs.py enforces for every
registered query, applied at the operator level before the
registrations exist. Empty relations and NULL payloads are routine
at 100 TB (a filter matching nothing, a new partition before data
lands); the guarded failure mode is a crashed stage, not a wrong
answer."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.functions.skew import key_skew_profile
from miningfrequentpattern_spark.operators.dedup import (
    ngram_containment_pairs,
)
from miningfrequentpattern_spark.operators.embeddings import (
    embedding_correlation,
    embedding_spectrum,
)
from miningfrequentpattern_spark.operators.graph import khop_distances
from miningfrequentpattern_spark.operators.relational import (
    binned_quantile_rollup,
    scd2_versions,
)
from miningfrequentpattern_spark.operators.timeseries import ewma


def test_containment_empty_and_null_docs(spark):
    empty = spark.createDataFrame(
        [], "doc_id long, lang string, text string"
    )
    assert ngram_containment_pairs(empty).count() == 0
    nulls = spark.createDataFrame(
        [(1, None, "a b c d"), (2, "en", None), (3, None, None)],
        "doc_id long, lang string, text string",
    )
    # NULL lang/text rows simply contribute no shingles — no crash,
    # no pairs (callers filter; the operator must still survive).
    assert ngram_containment_pairs(nulls).count() == 0


def test_khop_empty_edges_and_empty_seeds(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "id long")
    got = khop_distances(edges, seeds, 3).collect()
    assert [(r["id"], r["dist"]) for r in got] == [(1, 0)]
    no_seeds = spark.createDataFrame([], "id long")
    some_edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    assert khop_distances(some_edges, no_seeds, 3).count() == 0


def test_ewma_empty_and_null_values(spark):
    empty = spark.createDataFrame([], "k string, t int, x double")
    assert ewma(empty, ["k"], "t", "x", 0.5).count() == 0
    # NULL values propagate pandas' ewm NaN-skipping: the row is
    # emitted (its ewma carries the last non-null state), never
    # dropped or crashed.
    nulls = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, 30.0)],
        "k string, t int, x double",
    )
    out = {r["t"]: r["ewma"] for r in ewma(nulls, ["k"], "t", "x", 0.5).collect()}
    assert len(out) == 3 and out[1] == 10.0


def test_embedding_moments_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert embedding_correlation(empty, dim=4).count() == 0
    assert embedding_spectrum(empty, dim=4).count() == 0
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    assert embedding_correlation(nulls, dim=4).count() == 0
    assert embedding_spectrum(nulls, dim=4).count() == 0


def test_skew_profile_empty(spark):
    empty = spark.createDataFrame([], "k long, v long")
    assert key_skew_profile(empty, ["k"]).count() == 0


def test_histogram_rollup_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "g string, v double")
    assert binned_quantile_rollup(
        empty, ["g"], "v", [0.5], 0.0, 1.0, 4
    ).count() == 0
    nulls = spark.createDataFrame(
        [("a", None), ("b", None)], "g string, v double"
    )
    assert binned_quantile_rollup(
        nulls, ["g"], "v", [0.5], 0.0, 1.0, 4
    ).count() == 0


def test_scd2_empty(spark):
    empty = spark.createDataFrame(
        [], "user_id long, event_type string, ts timestamp, event_id long"
    )
    assert scd2_versions(
        empty, ["user_id"], ["event_type"], "ts", "event_id"
    ).count() == 0


def test_interval_merge_empty(spark):
    from miningfrequentpattern_spark.operators.timeseries import (
        interval_merge,
    )

    empty = spark.createDataFrame([], "k string, s int, e int")
    assert interval_merge(empty, ["k"], "s", "e").count() == 0
    all_null = spark.createDataFrame(
        [("a", None, None)], "k string, s int, e int"
    )
    assert interval_merge(all_null, ["k"], "s", "e").count() == 0


def test_twa_empty_and_all_null(spark):
    from miningfrequentpattern_spark.operators.timeseries import (
        time_weighted_avg,
    )

    empty = spark.createDataFrame([], "k string, t double, x double")
    assert time_weighted_avg(empty, ["k"], "t", "x").count() == 0
    nulls = spark.createDataFrame(
        [("a", None, 1.0), ("a", 2.0, None)],
        "k string, t double, x double",
    )
    assert time_weighted_avg(nulls, ["k"], "t", "x").count() == 0


def test_series_trend_empty_and_all_null(spark):
    from miningfrequentpattern_spark.operators.timeseries import (
        series_trend,
    )

    empty = spark.createDataFrame([], "k string, t double, x double")
    assert series_trend(empty, ["k"], "t", "x").count() == 0
    nulls = spark.createDataFrame(
        [("a", None, 1.0), ("a", 2.0, None)],
        "k string, t double, x double",
    )
    assert series_trend(nulls, ["k"], "t", "x").count() == 0


def test_acf_empty_and_single_row(spark):
    from miningfrequentpattern_spark.operators.timeseries import (
        autocorrelation,
    )

    empty = spark.createDataFrame([], "k string, t int, x double")
    assert autocorrelation(empty, ["k"], "t", "x", 3).count() == 0
    one = spark.createDataFrame([("a", 0, 1.0)], "k string, t int, x double")
    rows = autocorrelation(one, ["k"], "t", "x", 2).collect()
    # one row still yields a (lag, 0 pairs, NULL) line per lag
    assert {(r["lag"], r["n_pairs"], r["acf"]) for r in rows} == {
        (1, 0, None),
        (2, 0, None),
    }


def test_mad_outliers_empty(spark):
    from miningfrequentpattern_spark.operators.relational import (
        mad_outliers,
    )

    empty = spark.createDataFrame([], "g string, i int, v double")
    assert mad_outliers(empty, ["g"], "v", carry=["i"]).count() == 0


def test_join_audit_empty_sides(spark):
    from miningfrequentpattern_spark.operators.relational import (
        join_cardinality_audit,
    )

    empty = spark.createDataFrame([], "k int")
    some = spark.createDataFrame([(1,), (1,)], "k int")
    got = join_cardinality_audit(empty, some, ["k"]).collect()
    assert [(r["k"], r["n_left"], r["n_right"], r["out_rows"]) for r in got] == [
        (1, 0, 2, 0)
    ]
    assert join_cardinality_audit(empty, empty, ["k"]).count() == 0


def test_bm25_empty_and_null_text(spark):
    from miningfrequentpattern_spark.operators.text import bm25_scores

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_scores(empty, "doc_id", "text", ["a"]).count() == 0
    nulls = spark.createDataFrame(
        [(1, None), (2, "b c")], "doc_id long, text string"
    )
    # NULL text contributes nothing; no query term matches → empty
    assert bm25_scores(nulls, "doc_id", "text", ["a"]).count() == 0


def test_seasonal_profile_empty(spark):
    from miningfrequentpattern_spark.operators.timeseries import (
        seasonal_profile,
    )

    empty = spark.createDataFrame([], "k string, day timestamp, n double")
    assert seasonal_profile(empty, ["k"], "day", "n").count() == 0


def test_rrf_empty_runs(spark):
    from miningfrequentpattern_spark.operators.similarity import rrf_fuse

    empty = spark.createDataFrame([], "k string, id string, score double")
    some = spark.createDataFrame(
        [("q", "a", 1.0)], "k string, id string, score double"
    )
    got = rrf_fuse([empty, some], ["k"], "id", "score").collect()
    assert [(r["id"], r["n_runs"]) for r in got] == [("a", 1)]
    assert rrf_fuse([empty, empty], ["k"], "id", "score").count() == 0
    # NULL scores are unrankable and drop from that run only
    nulls = spark.createDataFrame(
        [("q", "a", None)], "k string, id string, score double"
    )
    assert rrf_fuse([nulls, some], ["k"], "id", "score").count() == 1


def test_benford_empty_and_all_excluded(spark):
    from miningfrequentpattern_spark.operators.relational import (
        benford_audit,
    )

    empty = spark.createDataFrame([], "g string, v double")
    assert benford_audit(empty, ["g"], "v").count() == 0
    zeros = spark.createDataFrame(
        [("g", 0.0), ("g", None)], "g string, v double"
    )
    assert benford_audit(zeros, ["g"], "v").count() == 0


def test_cadence_empty(spark):
    from miningfrequentpattern_spark.operators.timeseries import (
        cadence_audit,
    )

    empty = spark.createDataFrame([], "k string, ts timestamp")
    assert cadence_audit(empty, ["k"], "ts").count() == 0


def test_target_encode_empty_and_all_null(spark):
    from miningfrequentpattern_spark.operators.relational import (
        target_encode,
    )

    empty = spark.createDataFrame([], "c string, y double")
    assert target_encode(empty, ["c"], "y").count() == 0
    nulls = spark.createDataFrame(
        [("a", None), ("b", None)], "c string, y double"
    )
    # all-NULL targets inform nothing: empty dimension, no crash
    assert target_encode(nulls, ["c"], "y").count() == 0


def test_psi_empty_sides(spark):
    from miningfrequentpattern_spark.operators.relational import psi_drift

    ref = spark.createDataFrame([(float(i),) for i in range(20)], "v double")
    empty = spark.createDataFrame([], "v double")
    # empty CURRENT: every ref bin shows cur 0 with a finite psi_part
    rows = psi_drift(ref, empty, "v", n_bins=4).collect()
    assert len(rows) == 4
    assert all(r["n_cur"] == 0 and r["cur_share"] is None for r in rows)
    # empty REFERENCE: the quantile aggregate yields NULL edges, so
    # every current row lands on ONE NULL-bin line item with a
    # finite floor-clamped psi_part — "we have no baseline" is
    # visible, not a crash and not a silent empty result
    degen = psi_drift(empty, ref, "v", n_bins=4).collect()
    assert len(degen) == 1
    assert degen[0]["bin"] is None and degen[0]["n_cur"] == 20
    assert degen[0]["psi_part"] is not None


def test_rfm_empty(spark):
    from miningfrequentpattern_spark.operators.relational import rfm_scores

    empty = spark.createDataFrame([], "cust long, ts timestamp, amt double")
    assert rfm_scores(empty, "cust", "ts", "amt").count() == 0


def test_label_centroids_empty_and_single_label(spark):
    from miningfrequentpattern_spark.operators.embeddings import (
        label_centroid_similarity,
    )

    empty = spark.createDataFrame([], "label int, embedding array<double>")
    assert label_centroid_similarity(empty, "label", "embedding").count() == 0
    one = spark.createDataFrame(
        [(0, [1.0, 2.0])], "label int, embedding array<double>"
    )
    # a single label has no pair — empty matrix, no crash
    assert label_centroid_similarity(one, "label", "embedding").count() == 0


def test_theil_sen_empty(spark):
    from miningfrequentpattern_spark.operators.timeseries import (
        theil_sen_trend,
    )

    empty = spark.createDataFrame([], "k string, t double, x double")
    assert theil_sen_trend(empty, ["k"], "t", "x").count() == 0


def test_chi2_empty_and_single_cell(spark):
    from miningfrequentpattern_spark.operators.relational import (
        chi2_independence,
    )

    empty = spark.createDataFrame([], "a string, b string")
    assert chi2_independence(empty, "a", "b").count() == 0
    one = spark.createDataFrame([("x", "p")], "a string, b string")
    row = chi2_independence(one, "a", "b").collect()[0]
    # a 1×1 table is trivially independent: expected == observed
    assert row["expected"] == 1.0 and row["chi2_part"] == 0.0


def test_mannwhitney_empty_arm(spark):
    from miningfrequentpattern_spark.operators.relational import (
        mannwhitney_z,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, v double"
    )
    row = mannwhitney_z(df, "g", "v", "a", "b").collect()[0]
    assert (row["n_a"], row["n_b"]) == (2, 0)
    assert row["z"] is None  # zero-variance comparison: no verdict


def test_bigram_backoff_empty_and_empty_training(spark):
    from miningfrequentpattern_spark.operators.text import (
        bigram_backoff_score,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bigram_backoff_score(empty).count() == 0
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    # empty TRAINING corpus: no model — scores are NULL (N = 0 kills
    # the backoff denominator under non-ANSI), rows still emitted
    row = bigram_backoff_score(docs, train_docs=empty).collect()[0]
    assert row["n_bigrams"] == 1 and row["avg_neg_log2p"] is None


def test_cuped_empty(spark):
    from miningfrequentpattern_spark.operators.relational import (
        cuped_adjust,
    )

    empty = spark.createDataFrame([], "u long, pre double, post double")
    assert cuped_adjust(empty, "post", "pre", carry=["u"]).count() == 0


def test_interval_overlap_empty_sides(spark):
    from miningfrequentpattern_spark.operators.timeseries import (
        interval_overlap_join,
    )

    empty = spark.createDataFrame(
        [], "k string, span_start double, span_end double"
    )
    some = spark.createDataFrame(
        [("u", 0.0, 10.0)], "k string, span_start double, span_end double"
    )
    assert interval_overlap_join(empty, some, ["k"]).count() == 0
    assert interval_overlap_join(some, empty, ["k"]).count() == 0
    assert (
        interval_overlap_join(empty, some, ["k"], bucket="1 hour").count()
        == 0
    )


def test_ppr_null_free_contract(spark):
    from miningfrequentpattern_spark.operators.graph import (
        personalized_pagerank,
    )

    # seeds present but graph edges carry a NULL endpoint: the NULL
    # node participates like any other distinct key (graph ops treat
    # ids opaquely); no crash
    edges = spark.createDataFrame(
        [(1, 2), (2, 1)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (1,)], "id long")  # dup seeds
    got = {
        r["id"]: r["ppr"]
        # 20 rounds: the 2-cycle is bipartite (period-2 parity
        # wobble at small odd round counts — the test_ppr ring pin)
        for r in personalized_pagerank(edges, seeds, 20).collect()
    }
    # duplicate seed rows collapse (distinct) — teleport mass is 1/1
    assert got[1] > got[2]
