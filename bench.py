"""Benchmark harness (driver contract): times the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect cost). Timings include Catalyst planning; the
session is warmed with one throwaway action first so JVM startup isn't
attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: spans mining / relational / LLM / streaming packs and
# every physical-plan family (scan+agg, broadcast star join, window,
# range+asof join, LSH, crossJoin topk, session windows, FPGrowth).
# The LIKE_FOR_LIKE prefix is the committed 24-query gate basis
# (BASELINE.md denominator); later additions extend coverage without
# shifting the comparison — new queries go in ADDITIONS, never here.
LIKE_FOR_LIKE = [
    "m03_frequent_items",
    "m04_itemsets_market",
    "m04_itemsets_full_tokens",
    "m09_prefixspan_full",
    "r02_pricing_summary",
    "r03_local_supplier_volume",
    "r04_customer_order_counts",
    "r08_asof_last_click_before_purchase",
    "r11_rollup_status_priority",
    "r14_running_customer_spend",
    "l01_exact_dedup",
    "l02_ngram_jaccard_pairs",
    "l02d_embedding_neardup",
    "l03_cosine_topk",
    "l04_token_stats",
    "l06_quality_filter",
    "t01_tumbling_window",
    "t03_session_window",
    "t05b_stateful_user_counts_native",
    # round-2 additions — one per new plan family
    "l12_decontaminate",
    "l13_sequence_pack",
    "l15_unigram_logprob",
    "l17_tfidf_topterms",
    "r26_global_order_rank",
]

# Post-denominator additions (excluded from the like-for-like
# subtotal automatically — one list, no hand-synced twin).
ADDITIONS = [
    # round-4 — guard-firing inverted-index join with denominator
    # adjustment; bucketed as-of (equi-key + 2x explode); iterative
    # PageRank (cached-edge join loop); vocabulary-keyed
    # distribution-divergence aggregation
    "l02g_ngram_jaccard_capped",
    "r08b_asof_bucketed",
    "m13_part_pagerank",
    "l26_source_kl_drift",
    # round-4 later — two-pass LM scoring with broadcast vocab;
    # shingle-keyed firsts join-back; corpus-sized utility self-join
    # (pinned shuffle_hash); sequential funnel joins
    "l27_importance_resample",
    "l28_ngram_novelty",
    "m15_pair_utility",
    "r39_funnel_conversion",
    # round-5 — rules-relation self-join over an FPGrowth fit;
    # map-side WindowGroupLimit rank-1 dedup
    "m16_rule_chains",
    "l30_prefix_dedup_keep_longest",
    # round-5 continuation — single-pass multi-corr aggregate;
    # multi-table conditional-agg + anti-join constraint report;
    # generated calendar grid join; explode + min-agg vocab curve;
    # iterative semi-join peel; 8-fit trained PQ index + ADC scan
    "r41_correlation_matrix",
    "r42_data_quality_report",
    "r43_gapfill_daily",
    "l33_vocab_growth",
    "m18_part_kcore",
    "l34_pq_topk",
    # round-5 continuation, later batch — moment join-back; 4-term
    # delta union; x7 fan-out distinct; lead() window matrix; A-ES
    # TakeOrdered; PMI joins; blocked Levenshtein; metadata scan;
    # dense-grid negative associations
    "r44_daily_anomaly",
    "r45_delta_join_refresh",
    "r46_rolling_distinct_users",
    "r47_event_transitions",
    "l36_weighted_sample",
    "l37_collocations",
    "l38_fuzzy_join",
    "s15_metadata_scan",
    "m19_negative_pairs",
    # composed flagship #2: fused dedup->quality->langid->mixing
    "l40_prep_pipeline2",
    # table-argument UDTF sessionizer — the DELIBERATE row-at-a-time
    # Python surface (u03/u07/u08 family); timed so the slow path's
    # cost is recorded, not hidden (native twin: t03)
    "u08_udtf_table_args",
    # round-5 final session — bucketed prefix-max skyline; dual-window
    # single-exchange weighted median; rank-weighted concentration
    # statistic; time-banded user-keyed pair mining
    "r49_pareto_frontier",
    "r50_weighted_median",
    "l41_token_gini",
    "m20_gap_sequential_pairs",
    # round-6 — the promoted-flagship sample: two composed monitors
    # (trend+CUSUM; seasonality+MAD); the composed Zipf fit; the four
    # iterative graph ops (BFS, Bellman-Ford, truss peel, PPR); the
    # one-pass d x d correlation; BM25; mergeable histogram
    # quantiles; CDC snapshot; Theil-Sen pairwise median; bucketed
    # claim-cell interval overlap; IVF x PQ composed ANN; the
    # guard-firing capped fuzzy join
    "r65_ops_monitor",
    "r73_deseasonal_outliers",
    "l50_zipf_fit",
    "m21_part_khop_reach",
    "m23_part_cheapest_reach",
    "m25_part_ktruss",
    "m26_part_ppr",
    "l43_embedding_corr_matrix",
    "l48_bm25_scores",
    "r54_histogram_quantiles",
    "r61_cdc_snapshot",
    "r76_robust_trend",
    "r80_concurrent_activity",
    "l45_ivfpq_topk",
    "l38b_fuzzy_join_capped",
    # round-7 — the promoted-flagship sample: grouped-map Holt
    # recurrence; composed TextRank (co-occurrence graph -> pagerank
    # -> top-25 in one plan); dual-period pair contrast (two
    # basket-bounded self-joins + full-outer); SCD2 containment
    # lookup; MERGE upsert write path (partition-pruned rewrite);
    # IGNORE-NULLS attribution window; single-window PIT trailing
    # features is round-8 staged and joins after promotion
    "r82_holt_revenue",
    "l53_textrank_keywords",
    "m27_emerging_pairs",
    "r84_scd2_lookup",
    "s16_merge_upsert",
    "r62_attribution",
    # round-8 — the promoted-flagship sample: single-window PIT
    # trailing features; grouped-map TTL throttle chain (kept-ness
    # has no window closed form); list-buffer Holt-Winters grouped
    # map; iterative LPA over cached pre-hashed stubs; dual exact
    # rankings + rank-filtered join (truncation recall); the
    # iterator-form pandas UDF surface
    "r86_pit_features",
    "r87_ttl_dedup",
    "r90_holt_winters",
    "m28_part_communities",
    "l56_truncated_recall",
    "u09_iter_quantize",
    # round-9 — the promoted BPE pair: vocabulary-checkpoint training
    # loop with per-round 1-row argmax probes; iterator-pandas-UDF
    # encoder with per-worker rank dict + word memo
    "l61_bpe_merges",
    "l62_bpe_encode",
]

HEADLINE = LIKE_FOR_LIKE + ADDITIONS

# Scaling-curve tripwire (round 5): queries whose wall-time is EXPECTED
# to grow super-linearly in input rows, with the documented reason —
# these never count as flags. Everything else that grows faster than
# SUPERLINEAR_EXP between sf0.01 and sf0.1 is reported in
# "scaling.flagged": the mechanical catch for an accidental O(n²)
# that a single-SF bench cannot see.
EXPECTED_SUPERLINEAR = {
    "l02d_embedding_neardup": (
        "exact all-pairs block GEMM by design (O(n^2) compute, "
        "documented in operators/dedup.py); the ANN/semantic tiers "
        "are the at-scale path"
    ),
    "l03_cosine_topk": (
        "exact topk is |Q|x|corpus| by contract; both sides grow "
        "with SF here so compute is O(SF^2) — the enforced "
        "max_queries bound plus the ANN tiers are the at-scale path"
    ),
    "l38_fuzzy_join": (
        "the oracle'd UNCAPPED exact tier (explicit "
        "max_block_size=None): a hot blocking prefix grows its pair "
        "space ∝ block² on the fixed-vocabulary fixtures (measured "
        "0.98/decade). The OPERATOR defaults to the capped form "
        "(fuzzy_blocked_join max_block_size=1000, ADVICE r6) and "
        "l38b certifies the guard FIRING (measured 0.24/decade) — "
        "the at-scale path is the default, not this registration"
    ),
}
# Exponent threshold: time ratio t(sf0.1)/t(sf0.01) > 10^1.4 ≈ 25x
# for a 10x row growth. Generous on purpose: planning constants and
# noisy-neighbor swings (2-4x, BASELINE.md) sit in the numerator, and
# sub-second queries are skipped entirely (MIN_FLAG_SEC) — a true
# O(n^2) operator shows ~100x and clears this by a wide margin.
SUPERLINEAR_EXP = 1.4
MIN_FLAG_SEC = 1.0

# Watch list (VERDICT r8): queries with a DOCUMENTED, scale-sound
# sub-linear-per-decade growth that is nonetheless the largest in the
# headline — their measured exponent (r8 reading) and a per-query
# tripwire BELOW the generic 1.4 envelope, so a real regression flags
# instead of hiding inside it. Both are grouped-map/relation costs
# with no native escape: acceptable, but pinned.
WATCH_GROWTH = {
    # measured 0.52/decade r8: Python-seam serialization ∝ rows in
    # the provably-not-window-expressible TTL recurrence
    # (operators/timeseries.py) — one key shuffle, O(1) state per key
    "r87_ttl_dedup": 0.8,
    # measured 0.55/decade r8: per-round (node,label) relation ≈ |E|
    # in LPA (operators/graph.py) — the honest LPA cost model below
    # Spark's per-stage overhead crossover at sf0.1
    "m28_part_communities": 0.8,
    # measured ~0.67/decade idle (3.8-3.9 s at sf0.1; the r9 driver
    # reading of 7.03 s / 0.93 per decade was the contaminated run):
    # MLlib FPGrowth's own PFP fit jobs — the most expensive headline
    # query and the like-for-like set's biggest contention swing
    # factor (VERDICT r9 item 7). A genuine MLlib/plan regression
    # flags here instead of hiding inside the generic 1.4 envelope.
    "m04_itemsets_full_tokens": 1.0,
}


# Idle gate (VERDICT r8): telemetry alone did not stop a contaminated
# reading (the r8 driver bench ran at loadavg 3.5-5.9 → 2-6x per-query
# swings, memory/bench-contention-protocol). Busy-wait — BOUNDED — for
# the 1-min load to drop below IDLE_LOAD_1M before timing anything; if
# it never does, run anyway but stamp `contaminated: true` in BOTH
# output records so a hot reading is self-labeling rather than
# indistinguishable from a regression. Opt out (e.g. in CI smoke) with
# SPARK_GRAFT_IDLE_GATE=0.
IDLE_LOAD_1M = 0.5
# The 5-min average must ALSO be low: a momentary 1-min dip while the
# 5-min sits at 5+ means a neighbor paused, not finished — the first
# (and heaviest, sf0.1) timing loop then runs straight into resumed
# contention (observed: gate passed at [0.46, 5.3, 7.4], reading came
# back 1.12x with the slow queries swollen).
IDLE_LOAD_5M = 1.5
# The 15-min average must be sane too (VERDICT r9): the 1.99x driver
# reading passed the 1-min/5-min gate at loadavg [0.13, 1.48, 4.94] —
# heavy load had only JUST stopped, and it resumed into the timing
# loop (loadavg_after climbed back to 2.9/3.6). A 15-min average
# above ~2 says the box was busy within the decay horizon; wait it
# out (bounded) rather than trusting a momentary dip.
IDLE_LOAD_15M = 2.0
IDLE_WAIT_MAX_SEC = 600
IDLE_POLL_SEC = 10
# Committed like-for-like gate denominator (BASELINE.md, min-of-2
# over the 24-query set) and the self-check threshold: a subtotal
# beyond RETRY_FACTOR x denominator on a box whose demonstrated quiet
# envelope is 0.89-1.13x is contention with near-certainty — re-run
# the 24-query prefix ONCE and take the per-query min, stamping
# `retried` so the record shows it (VERDICT r9 item 2).
GATE_DENOMINATOR_SEC = 20.81
RETRY_FACTOR = 1.5

# Per-job latency canary (VERDICT r11 item 1): BOTH r11 driver runs
# were degraded by a host failure mode the loadavg gate provably
# cannot see — per-job scheduling latency floors at 200-600 ms
# (healthy ~10 ms) while loadavg stays under every IDLE_LOAD_* bar
# (observed loadavg_before [0.04, 0.64] on a run whose 8-core scaling
# block beat its 32-core run 4/5). A one-task count() on the warm
# session measures exactly that fixed per-job cost and nothing else
# (no shuffle, no Python worker, ~0 compute). Gate: min over
# CANARY_RUNS jobs must floor under CANARY_MS_MAX; if not, wait
# (bounded, like the idle gate) and re-probe; if it never recovers,
# run anyway but stamp `contaminated: true` — self-labeling, not
# silent. The canary re-runs AFTER the timing loop too, so
# degradation that starts mid-run also marks the record. Both
# readings land in the output as canary_ms_before/after.
CANARY_RUNS = 20
CANARY_MS_MAX = 50.0
CANARY_WAIT_MAX_SEC = 600
CANARY_POLL_SEC = 30


def _canary_min_ms(spark) -> float:
    rdd = spark.sparkContext.parallelize([1], 1)
    rdd.count()  # absorb any one-off scheduling warm-up
    best = float("inf")
    for _ in range(CANARY_RUNS):
        t0 = time.perf_counter()
        rdd.count()
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    return round(best, 1)


def _canary_gate(spark) -> tuple[float, int, bool]:
    """Probe the warm session's one-task job latency; wait (bounded)
    for the host to recover if degraded. Returns (final min ms,
    seconds waited, degraded?)."""
    ms = _canary_min_ms(spark)
    waited = 0
    if os.environ.get("SPARK_GRAFT_IDLE_GATE", "1") == "0":
        return ms, 0, ms > CANARY_MS_MAX
    while ms > CANARY_MS_MAX and waited < CANARY_WAIT_MAX_SEC:
        time.sleep(CANARY_POLL_SEC)
        waited += CANARY_POLL_SEC
        ms = _canary_min_ms(spark)
    return ms, waited, ms > CANARY_MS_MAX


def _idle_now() -> bool:
    one, five, fifteen = os.getloadavg()
    return (
        one < IDLE_LOAD_1M
        and five < IDLE_LOAD_5M
        and fifteen < IDLE_LOAD_15M
    )


def _wait_for_idle() -> tuple[int, bool]:
    """Returns (seconds waited, contaminated?)."""
    if os.environ.get("SPARK_GRAFT_IDLE_GATE", "1") == "0":
        return 0, not _idle_now()
    waited = 0
    while not _idle_now() and waited < IDLE_WAIT_MAX_SEC:
        time.sleep(IDLE_POLL_SEC)
        waited += IDLE_POLL_SEC
    return waited, not _idle_now()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    idle_wait_sec, contaminated = _wait_for_idle()
    # Host-contention telemetry (VERDICT r7): the driver's bench
    # reading swung 0.90x -> 1.49x with builder-measured load-avg ~5
    # from OUTSIDE this process. Recording 1/5/15-min load before and
    # after makes a contended reading distinguishable from a code
    # regression in the recorded JSON itself.
    load_before = [round(x, 2) for x in os.getloadavg()]
    from miningfrequentpattern_spark.session import get_session

    spark = get_session("mfp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Warm-up: session-level one-time costs that belong to no query —
    # parquet footer reads for every input table, the noop sink's
    # datasource registration, and a first whole-stage-codegen compile
    # through an explode+aggregate path (the same shape m03 plans).
    # Without this the first timed query absorbs ~3-4 s of session
    # bring-up that at 100 TB is amortized over hours of work.
    for t in ("lineitem", "orders", "documents", "events", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).limit(1).count()
    warm = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .limit(64)
        .select(F.explode(F.split("text", r"\s+")).alias("w"))
        .groupBy("w")
        .count()
    )
    warm.write.format("noop").mode("overwrite").save()
    # Python-worker warm-up: the first pandas/Arrow UDF in a session
    # spawns the executor-side Python worker pool (measured 2-4 s on
    # 32 cores) — session bring-up, not any one query's cost. A
    # 1-row grouped map touches the same worker path the UDF-backed
    # queries use.
    import pandas as pd  # noqa: F401

    (
        spark.range(32)
        .groupBy((F.col("id") % 32).alias("g"))
        .applyInPandas(lambda pdf: pdf[["id"]], schema="id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Per-job latency canary on the warm session (VERDICT r11 item 1):
    # the one degradation mode loadavg cannot see. Waits (bounded) for
    # recovery; a reading taken degraded is stamped contaminated.
    canary_ms_before, canary_wait_sec, canary_degraded = _canary_gate(spark)
    contaminated = contaminated or canary_degraded

    # Fit-memoized surfaces (VERDICT r11 item 5): these queries carry
    # a per-process fit memo (l34/l45 fit_cache_key=sf_dir KMeans/PQ
    # codebooks; l61/l62 the BPE merge-table memo), so min-of-2 takes
    # the memo-hit second run and the FRESH-fit cost is invisible to
    # the gate number. Record first-run (cold) and min-of-rest (warm)
    # separately in BENCH_DETAIL so the fit path stays measurable.
    # The gate definition (min-of-N in `queries`) is unchanged.
    FIT_MEMOIZED = {
        "l34_pq_topk",
        "l45_ivfpq_topk",
        "l61_bpe_merges",
        "l62_bpe_encode",
    }
    fit_cold_warm: dict[str, dict[str, float]] = {}

    # min over N_RUNS executions per query: a single cold execution
    # attributes one-off costs (whole-stage-codegen compile for that
    # plan shape, Python-worker pool spawn for pandas-UDF queries,
    # shuffle-file allocation) to whichever query pays them first, and
    # those costs swing 2-4x run-to-run under noisy-neighbor CPU.
    # min-of-N is the standard steady-state estimator; N=2 keeps the
    # whole bench under ~2 min while removing the worst of the noise.
    N_RUNS = 2

    def run_once(name: str, at_dir: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, at_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    def time_query(name: str, at_dir: str) -> float:
        runs = [run_once(name, at_dir) for _ in range(N_RUNS)]
        # Noise guard: this box shows 2-4x noisy-neighbor swings on
        # individual executions (BASELINE.md round-4 note). When the
        # two runs disagree by >3x, BOTH may have been hit, so take
        # ONE extra run before the min. Still a min-estimator, cost
        # bounded to one retry per flagged query, and the flag itself
        # fires only under demonstrated interference — quiet runs
        # measure exactly the committed min-of-2 methodology.
        if max(runs) > 3.0 * min(runs):
            runs.append(run_once(name, at_dir))
        if (
            name in FIT_MEMOIZED
            and at_dir == sf_dir
            and name not in fit_cold_warm
        ):
            fit_cold_warm[name] = {
                "cold_first_run": round(runs[0], 3),
                "warm_min": round(min(runs[1:]), 3),
            }
        return round(min(runs), 3)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = time_query(name, sf_dir)

    # Self-check (VERDICT r9): the r9 driver run's like-for-like came
    # back 1.99x purely from a load wave at run start — the prefix
    # queries were uniformly swollen while later ADDITIONS in the same
    # process timed at steady-state. If the gate subtotal exceeds
    # RETRY_FACTOR x the committed denominator, re-time the 24-query
    # prefix once (min with the first pass, the same estimator) and
    # stamp `retried: true` so a genuine regression — which survives
    # the retry — is distinguishable from a wave — which doesn't.
    retried = False
    first_pass_lfl = round(sum(timings[k] for k in LIKE_FOR_LIKE), 3)
    # The committed denominator is an sf0.1 quantity: at any other
    # headline SF the 1.5x threshold is meaningless (always-fires at
    # sf1, dead at sf0.01 — r10 review), so the self-check only arms
    # on the SF the denominator was recorded at.
    at_gate_sf = sf_dir.rstrip("/").endswith("sf0.1")
    if at_gate_sf and first_pass_lfl > RETRY_FACTOR * GATE_DENOMINATOR_SEC:
        retried = True
        for name in LIKE_FOR_LIKE:
            timings[name] = min(timings[name], time_query(name, sf_dir))

    total = round(sum(timings.values()), 3)
    # Like-for-like subtotal over the 24-query set every prior round
    # measured (BASELINE.md's committed gate denominator) — the
    # ADDITIONS extend coverage, not the comparison basis.
    like_for_like = round(
        sum(timings[k] for k in LIKE_FOR_LIKE), 3
    )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Per-query scaling curve (round 5): re-time the headline at the
    # two smaller SF fixtures and compute growth exponents
    # alpha = log10(t_hi / t_lo) per decade of rows. A query that is
    # linear-or-better shows alpha <= 1 (usually well below — planning
    # constants dominate small SFs); an accidental O(n^2) shows ~2.
    # Flags exclude the documented EXPECTED_SUPERLINEAR operators and
    # anything under MIN_FLAG_SEC at the large SF (constant-dominated
    # ratios are meaningless). Opt out with SPARK_GRAFT_SCALING=0.
    scaling: dict[str, object] | None = None
    base = os.path.dirname(sf_dir.rstrip("/"))
    small_dirs = [
        d
        for d in (os.path.join(base, "sf0.001"), os.path.join(base, "sf0.01"))
        if os.path.isdir(d) and d != sf_dir.rstrip("/")
    ]
    import math

    # The exponent is normalized by the ACTUAL decade gap between the
    # headline SF and sf0.01 — hardcoding 1 decade would falsely flag
    # a linear query as O(n^2) when SPARK_GRAFT_SF_DIR is e.g. sf1
    # (2 decades above sf0.01). Non-numeric or ≤ sf0.01 headline SFs
    # have no usable gap: skip the curve (and its runs) entirely.
    try:
        decades = math.log10(float(sf) / 0.01)
    except ValueError:
        decades = 0.0
    if (
        os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
        and len(small_dirs) == 2
        and decades > 0
    ):
        per_sf: dict[str, dict[str, float]] = {n: {} for n in HEADLINE}
        for d in small_dirs:
            tag = d.rsplit("sf", 1)[-1]
            for name in HEADLINE:
                per_sf[name][tag] = time_query(name, d)
        flagged: dict[str, float] = {}
        explained: dict[str, str] = {}
        per_query: dict[str, dict[str, float]] = {}
        for name in HEADLINE:
            t_hi, t_mid = timings[name], per_sf[name]["0.01"]
            curve = dict(per_sf[name])
            curve[sf] = t_hi
            exp = round(
                math.log10(max(t_hi, 1e-3) / max(t_mid, 1e-3)) / decades, 3
            )
            per_query[name] = {"sec_by_sf": curve, "exp_last_decade": exp}
            threshold = min(
                SUPERLINEAR_EXP, WATCH_GROWTH.get(name, SUPERLINEAR_EXP)
            )
            if exp > threshold and t_hi >= MIN_FLAG_SEC:
                if name in EXPECTED_SUPERLINEAR:
                    explained[name] = EXPECTED_SUPERLINEAR[name]
                else:
                    flagged[name] = exp
        scaling = {
            "sf_grid": [d.rsplit("sf", 1)[-1] for d in small_dirs] + [sf],
            "per_query": per_query,
            "flagged": flagged,
            "explained_superlinear": explained,
        }

    load_after = [round(x, 2) for x in os.getloadavg()]
    # Post-run canary: degradation that STARTS mid-run (the r11 8-core
    # record's inflated additions half) marks the record too. No wait
    # loop here — the timings are already taken; this only labels.
    canary_ms_after = _canary_min_ms(spark)
    contaminated = contaminated or canary_ms_after > CANARY_MS_MAX
    out: dict[str, object] = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "value_like_for_like_24q": like_for_like,
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "loadavg_before": load_before,
        "loadavg_after": load_after,
        "idle_wait_sec": idle_wait_sec,
        "canary_ms_before": canary_ms_before,
        "canary_ms_after": canary_ms_after,
        "canary_wait_sec": canary_wait_sec,
        "contaminated": contaminated,
        "retried": retried,
        "like_for_like_first_pass": first_pass_lfl,
    }
    if fit_cold_warm:
        out["fit_cold_warm"] = fit_cold_warm
    if scaling is not None:
        out["scaling"] = scaling
    # Full record: a file (always complete) plus a first stdout line
    # for anyone reading the terminal.
    detail_path = str(Path(__file__).resolve().parent / "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(out, f)
    except OSError:
        detail_path = None  # read-only checkout: stdout line still has it
    print(json.dumps(out))
    # Driver contract: the harness keeps only the LAST ~2000 chars of
    # output and parses the final JSON line. Round 5's single line grew
    # past that (55 per-query timings + the 3-SF scaling curve) and the
    # driver recorded "parsed": null — so the LAST line printed is a
    # compact record guaranteed to fit: headline metric, the committed
    # 24-query like-for-like gate subtotal, the scaling-tripwire flag
    # count, and only the top-8 slowest per-query timings (full map in
    # BENCH_DETAIL.json / the line above).
    top8 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:8]
    )
    compact: dict[str, object] = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "value_like_for_like_24q": like_for_like,
        "queries": top8,
        "queries_n": len(timings),
        "sf": out["sf"],
        "scaling_flagged": (
            len(scaling["flagged"]) if scaling is not None else None
        ),
        # 1/5/15-min host load before/after: a like-for-like reading
        # taken with load >> this process's own footprint is
        # contention, not regression (VERDICT r7 diagnosability ask).
        "loadavg_before": load_before,
        "loadavg_after": load_after,
        # Idle gate verdict (VERDICT r8): true = the 1/5/15-min load
        # never all dropped below the IDLE_LOAD_* bars within the
        # bounded wait — treat the reading as contention-suspect, not
        # a regression.
        "idle_wait_sec": idle_wait_sec,
        # Per-job latency canary (VERDICT r11): min ms over 20
        # one-task jobs on the warm session, probed before and after
        # the timing loop. A min above CANARY_MS_MAX (50 ms; healthy
        # ~10 ms) is the loadavg-invisible host degradation mode —
        # the reading is stamped contaminated.
        "canary_ms_before": canary_ms_before,
        "canary_ms_after": canary_ms_after,
        "canary_wait_sec": canary_wait_sec,
        "contaminated": contaminated,
        # Retry self-check (VERDICT r9): true = the first-pass 24-query
        # subtotal exceeded RETRY_FACTOR x the committed denominator
        # and the prefix was re-timed once (min taken) — the recorded
        # like_for_like survived a retry, so a high reading here is a
        # real regression, not a start-of-run load wave.
        "retried": retried,
        "like_for_like_first_pass": first_pass_lfl,
        "detail": detail_path,
    }
    line = json.dumps(compact)
    if len(line) > 1500:  # belt-and-braces: never outgrow the capture
        compact.pop("queries")
        line = json.dumps(compact)
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    main()
