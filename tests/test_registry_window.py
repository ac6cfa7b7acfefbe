"""Driver-window invariant (SURVEY.md §2.5).

The external correctness harness records at most the FIRST 50 entries of
``queries()`` (observed rounds 1-2). Registration priorities must therefore
keep every query that has NO prior driver-green CORRECTNESS row inside the
first 50 slots — otherwise adding a query can silently evict an unverified
one from the hard signal. These tests lock that accounting.
"""

from __future__ import annotations

import json
import os

from serverless_mapreduce_spark import registry

WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _prior_green() -> dict[str, int]:
    """Independent re-derivation of registry.driver_green() (ALL rounds'
    files, green = no err and no False check, value = latest green round)
    so a bug in the registry's parsing can't hide from the test that exists
    to police it."""
    names: dict[str, int] = {}
    for fname in sorted(os.listdir(REPO)):
        if not (fname.startswith("CORRECTNESS_r") and fname.endswith(".json")):
            continue
        rnd = int(fname[len("CORRECTNESS_r"):-len(".json")])
        data = json.load(open(os.path.join(REPO, fname)))
        for name, rec in data.items():
            if rec.get("err") is not None:
                continue
            checks = (
                rec.get("rows_match"),
                rec.get("schema_match"),
                rec.get("hash_match"),
            )
            if False not in checks:
                names[name] = max(names.get(name, 0), rnd)
    return names


def test_driver_green_matches_independent_scan():
    assert registry.driver_green() == _prior_green()


def test_verified_queries_rotate_oldest_evidence_first():
    """Verified queries must sort by their latest driver-green round
    ascending, so the 50-slot window re-checks the stalest evidence each
    round instead of the same static prefix (round-16 verdict item 1)."""
    prior = _prior_green()
    ordered = [n for n in registry.all_queries() if n in prior]
    rounds = [prior[n] for n in ordered]
    assert rounds == sorted(rounds), (
        "verified queries not in oldest-evidence-first order: "
        f"{[(n, prior[n]) for n in ordered[:10]]} ..."
    )


def test_window_recovers_longest_unchecked_names():
    """With every registered query verified at least once, the first-50
    window must now consist of the names whose driver evidence is oldest —
    including the core W1-W14 workload queries last driver-checked in
    round 2."""
    prior = _prior_green()
    ordered = list(registry.all_queries())
    window = ordered[:WINDOW]
    unverified = [n for n in ordered if n not in prior]
    if not unverified:
        # The window should be filled by the globally stalest evidence.
        threshold = sorted(prior[n] for n in ordered)[WINDOW - 1]
        assert all(prior[n] <= threshold for n in window)
        for core in ("q1_filter_scan", "q2_groupby_sum", "word_count"):
            if core in prior and prior[core] <= threshold:
                assert core in window


def test_unverified_queries_form_a_prefix():
    """Round 3's driver run produced no CORRECTNESS_r03.json, so its 50 new
    queries are still unverified and exactly fill the window; round-4
    additions (priority=50) must queue BEHIND them, not evict them. The
    checkable invariant is therefore prefix-optimality: every unverified
    query sorts before every verified one, so the first-50 window always
    carries the maximum possible number of unverified queries, and the
    overflow drains in FIFO order across subsequent rounds."""
    ordered = list(registry.all_queries())
    prior = set(_prior_green())
    seen_verified_at = None
    for i, n in enumerate(ordered):
        if n in prior:
            if seen_verified_at is None:
                seen_verified_at = i
        else:
            assert seen_verified_at is None, (
                f"unverified query {n!r} (slot {i + 1}) sorts after verified "
                f"query {ordered[seen_verified_at]!r} (slot "
                f"{seen_verified_at + 1}); demote verified queries "
                f"(priority>=100) so unverified ones fill the driver window."
            )
    # Sanity: the window is actually full.
    assert len(ordered) <= WINDOW or len(set(ordered[:WINDOW])) == WINDOW


def test_oracle_ordering_matches_query_ordering():
    """The driver zips queries() with oracle_sql() by name; both must share
    the priority ordering so the checked prefix is the same set."""
    q = [n for n in registry.all_queries() if n in registry.all_oracles()]
    o = list(registry.all_oracles())
    assert q == o
