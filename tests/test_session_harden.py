"""harden() scoping + the shared duration grammar + ANN fit-cache
hygiene — regression pins for the round-8 code-review findings."""

import pytest

from miningfrequentpattern_spark.functions.durations import duration_us
from miningfrequentpattern_spark.session import RUNTIME_CONF, harden


def test_harden_applies_to_sibling_new_session(spark):
    """SQLConf is per-SESSION while applicationId is per-context: a
    sibling spark.newSession() over the same SparkContext must be
    hardened on its own (an appId-keyed memo skipped it — timezone /
    nanosAsLong parity silently broke on the sibling)."""
    ns = spark.newSession()
    try:
        ns.conf.set("spark.sql.session.timeZone", "America/New_York")
        harden(ns)
        assert ns.conf.get("spark.sql.session.timeZone") == "UTC"
        for k, v in RUNTIME_CONF.items():
            assert ns.conf.get(k) == v
        # the parent session's conf is untouched by hardening the twin
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        # memory-only object; nothing to stop (shares the context)
        pass


def test_harden_memo_is_per_session_one_shot(spark):
    """Hardening is one-shot per session object (the py4j round-trip
    saver): a post-harden conf override survives later harden()
    calls. Documents the memo contract so a future 'reassert every
    call' change is a deliberate one."""
    ns = spark.newSession()
    harden(ns)
    ns.conf.set("spark.sql.session.timeZone", "America/New_York")
    harden(ns)
    assert (
        ns.conf.get("spark.sql.session.timeZone") == "America/New_York"
    )


def test_duration_us_grammar():
    assert duration_us("10 minutes") == 600 * 1_000_000
    assert duration_us("1 second") == 1_000_000
    assert duration_us("2 hours") == 7200 * 1_000_000
    assert duration_us("7 days", what="window") == 7 * 86400 * 1_000_000
    assert duration_us("  3 minutes  ") == 180 * 1_000_000
    with pytest.raises(ValueError, match="window"):
        duration_us("7 fortnights", what="window")
    with pytest.raises(ValueError, match="ttl"):
        duration_us("soon", what="ttl")
    with pytest.raises(ValueError):
        duration_us("-3 minutes")


def test_duration_grammar_shared_single_source():
    """The batch operators and the stream twin must accept the exact
    same duration inputs — one grammar definition, zero local copies
    of the regex (the pre-r8 state had three)."""
    import subprocess

    out = subprocess.run(
        [
            "grep", "-rn", r"second|minute|hour|day)s?",
            "miningfrequentpattern_spark/",
        ],
        capture_output=True, text=True,
    ).stdout
    hits = [ln for ln in out.splitlines() if ln.strip()]
    assert len(hits) == 1 and "functions/durations.py" in hits[0], hits


def test_fit_cache_evicts_stale_app_entries():
    """_fit_cache_put drops entries from OTHER applicationIds on
    insert: stale-app broadcasts are unreachable by key construction
    and would otherwise pin driver-side numpy copies across session
    restarts in one long-lived process."""
    from miningfrequentpattern_spark.operators import similarity as S

    saved = dict(S._FIT_CACHE)
    S._FIT_CACHE.clear()
    try:
        S._fit_cache_put(("app-1", "pq-codebooks", "k", (8,)), "a")
        S._fit_cache_put(("app-1", "ivfpq-coarse", "k", (64,)), "b")
        assert len(S._FIT_CACHE) == 2
        S._fit_cache_put(("app-2", "pq-codebooks", "k", (8,)), "c")
        assert list(S._FIT_CACHE) == [
            ("app-2", "pq-codebooks", "k", (8,))
        ]
    finally:
        S._FIT_CACHE.clear()
        S._FIT_CACHE.update(saved)
