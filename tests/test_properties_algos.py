"""Property-based checks (hypothesis) for the round-5 algorithmic
operators, against brute-force pure-Python references on generated
inputs — the fixture corpus exercises one data shape; these exercise the
boundary space (ties, cascades, empty cores, single-event users).

Spark is deliberately NOT in the loop here: both operators' Spark bodies
are thin compositions over the exact logic tested — the row_number
difference (streak islands) and monotone peeling (k-core) — so the
properties pin the ALGORITHM while the oracle-comparison tests pin the
distributed execution of it."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st


# --- gaps-and-islands: row_number difference == consecutive-run grouping ------

events = st.lists(st.sampled_from("abc"), min_size=1, max_size=50)


def runs_brute(seq: list[str]) -> list[tuple[str, int]]:
    out: list[tuple[str, int]] = []
    for x in seq:
        if out and out[-1][0] == x:
            out[-1] = (x, out[-1][1] + 1)
        else:
            out.append((x, 1))
    return out


def runs_via_island_trick(seq: list[str]) -> list[tuple[str, int]]:
    """The operator's exact formulation: global row_number minus per-type
    row_number is constant exactly within a consecutive same-type run."""
    per_type: dict[str, int] = defaultdict(int)
    groups: dict[tuple[str, int], int] = defaultdict(int)
    order: list[tuple[str, int]] = []
    for i, x in enumerate(seq, start=1):
        per_type[x] += 1
        island = i - per_type[x]
        key = (x, island)
        if groups[key] == 0:
            order.append(key)
        groups[key] += 1
    return [(x, groups[(x, isl)]) for (x, isl) in order]


@settings(max_examples=300, deadline=None)
@given(seq=events)
def test_island_trick_equals_brute_runs(seq):
    assert runs_via_island_trick(seq) == runs_brute(seq)


@settings(max_examples=300, deadline=None)
@given(seq=events)
def test_longest_streak_tiebreak(seq):
    # operator contract: max run length; ties -> lexicographically first type
    runs = runs_brute(seq)
    best = max(r for _, r in runs)
    expect = min(t for t, r in runs if r == best)
    picked = sorted(runs, key=lambda tr: (-tr[1], tr[0]))[0]
    assert picked == (expect, best)


# --- k-core: delta peeling == recompute-from-scratch peeling ------------------

edges_strategy = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(
        lambda ab: ab[0] != ab[1]
    ),
    min_size=0,
    max_size=60,
)


def kcore_recompute(edges: set[tuple[int, int]], k: int) -> dict[int, int]:
    """Reference: re-filter the edge set and recompute ALL degrees every
    round (the textbook definition)."""
    es = set(edges)
    while True:
        deg: dict[int, int] = defaultdict(int)
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        drop = {v for v, d in deg.items() if d < k}
        if not drop:
            return dict(deg)
        es = {(a, b) for a, b in es if a not in drop and b not in drop}


def kcore_delta(edges: set[tuple[int, int]], k: int) -> dict[int, int]:
    """The operator's formulation: immutable edge set, degree table updated
    by subtracting dropped-incident counts (operators/graph.py)."""
    deg: dict[int, int] = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    alive = dict(deg)
    while True:
        drop = {v for v, d in alive.items() if d < k}
        if not drop:
            return alive
        loss: dict[int, int] = defaultdict(int)
        for a, b in edges:
            if a in alive and b in alive:
                if a in drop and b not in drop:
                    loss[b] += 1
                if b in drop and a not in drop:
                    loss[a] += 1
        for v in drop:
            del alive[v]
        for v, n in loss.items():
            alive[v] -= n


@settings(max_examples=300, deadline=None)
@given(raw=edges_strategy, k=st.integers(1, 6))
def test_delta_peeling_equals_recompute(raw, k):
    edges = {(min(a, b), max(a, b)) for a, b in raw}
    assert kcore_delta(edges, k) == kcore_recompute(edges, k)
