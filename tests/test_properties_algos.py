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


# --- winnowing: selection guarantee + soundness --------------------------------

WK, WW, WP = 8, 4, 1000000007  #: mirrors text.WINNOW_K/WINNOW_W/WINNOW_P


def winnow_fps(s: str) -> set[int]:
    """Pure-python mirror of winnowing_fingerprints' per-row math (poly
    gram hash base 257 mod P, min per window of WW gram hashes)."""
    codes = [ord(c) for c in s]
    if len(codes) < WK:
        return set()
    gh = []
    for i in range(len(codes) - WK + 1):
        acc = 0
        for c in codes[i : i + WK]:
            acc = (acc * 257 + c) % WP
        gh.append(acc)
    if len(gh) < WW:
        return set()
    return {min(gh[j : j + WW]) for j in range(len(gh) - WW + 1)}


texts = st.text(alphabet="ab01", min_size=0, max_size=60)


@settings(max_examples=200, deadline=None)
@given(a=texts, b=texts, shared=st.text(alphabet="ab01", min_size=WK + WW - 1,
                                        max_size=WK + WW + 10))
def test_winnowing_shared_substring_guarantee(a, b, shared):
    # THE winnowing theorem: any shared substring of length >= k + w - 1
    # contains at least one full window of grams, whose min hash both docs
    # select — so the fingerprint sets must intersect.
    x, y = a + shared + b, b + shared + a
    assert winnow_fps(x) & winnow_fps(y)


@settings(max_examples=200, deadline=None)
@given(s=texts)
def test_winnowing_sound_and_bounded(s):
    fps = winnow_fps(s)
    codes = [ord(c) for c in s]
    all_gh = set()
    for i in range(max(0, len(codes) - WK + 1)):
        acc = 0
        for c in codes[i : i + WK]:
            acc = (acc * 257 + c) % WP
        all_gh.add(acc)
    # every fingerprint is a real gram hash, and at most one per window start
    assert fps <= all_gh
    if len(codes) >= WK + WW - 1:
        assert 1 <= len(fps) <= len(codes) - WK + 1


# --- substring-dup spans: gap<=K island merge == interval-cover union ----------

SK = 4  #: small gram length so tiny generated docs collide


def dup_spans_mirror(docs: list[list[str]]) -> dict[int, tuple[int, int]]:
    """Mirror of substring_dup_spans' math at gram length SK: positions of
    cross-doc duplicated grams, merged when the position gap is <= SK.
    Returns {doc: (n_spans, dup_tokens)}."""
    first: dict[str, int] = {}
    dup: set[str] = set()
    for d, toks in enumerate(docs):
        for i in range(len(toks) - SK + 1):
            g = " ".join(toks[i : i + SK])
            if g in first and first[g] != d:
                dup.add(g)
            first.setdefault(g, d)
    out: dict[int, tuple[int, int]] = {}
    for d, toks in enumerate(docs):
        pos = [
            i
            for i in range(len(toks) - SK + 1)
            if " ".join(toks[i : i + SK]) in dup
        ]
        if not pos:
            continue
        spans = 1
        tokens = 0
        start = prev = pos[0]
        for p in pos[1:]:
            if p - prev > SK:
                tokens += prev + SK - start
                spans += 1
                start = p
            prev = p
        tokens += prev + SK - start
        out[d] = (spans, tokens)
    return out


def dup_cover_brute(docs: list[list[str]]) -> dict[int, tuple[int, int]]:
    """Ground truth: a token position is duplicated iff covered by some
    SK-gram that appears in another doc; spans are the connected components
    of the covered set."""
    grams: dict[str, set[int]] = defaultdict(set)
    for d, toks in enumerate(docs):
        for i in range(len(toks) - SK + 1):
            grams[" ".join(toks[i : i + SK])].add(d)
    out: dict[int, tuple[int, int]] = {}
    for d, toks in enumerate(docs):
        covered = set()
        for i in range(len(toks) - SK + 1):
            if len(grams[" ".join(toks[i : i + SK])]) > 1:
                covered.update(range(i, i + SK))
        if not covered:
            continue
        spans = sum(1 for p in covered if p - 1 not in covered)
        out[d] = (spans, len(covered))
    return out


docs_strategy = st.lists(
    st.lists(st.sampled_from(["x", "y"]), min_size=0, max_size=24),
    min_size=2,
    max_size=5,
)


@settings(max_examples=300, deadline=None)
@given(docs=docs_strategy)
def test_dup_span_merge_equals_interval_cover(docs):
    # the gap<=K gaps-and-islands merge computes exactly the union of the
    # duplicated grams' [p, p+K-1] coverage intervals — span count and
    # duplicated-token count both match the brute-force cover
    assert dup_spans_mirror(docs) == dup_cover_brute(docs)


# --- large-star/small-star: converges to union-find components -----------------

def _ls_large(edges: set) -> set:
    """Pure-python mirror of graph._large_star (duplicate-tolerant output,
    canonicalized here for the set representation)."""
    nbrs: dict[int, set] = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    out = set()
    for s, ns in nbrs.items():
        m = min(min(ns), s)
        for t in ns:
            if t > s:
                out.add((min(m, t), max(m, t)))
    return {(u, v) for u, v in out if u != v}


def _ls_small(edges: set) -> set:
    """Pure-python mirror of graph._small_star."""
    smaller: dict[int, set] = defaultdict(set)
    for u, v in edges:  # canonical u < v
        smaller[v].add(u)
    out = set()
    for v, us in smaller.items():
        m = min(us)
        for u in us:
            if u != m:
                out.add((m, u))
        out.add((m, v))
    return {(u, v) for u, v in out if u != v}


def _union_find_comps(edges: set) -> dict:
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


star_edges = st.sets(
    st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=60,
)


@settings(max_examples=300, deadline=None)
@given(raw=star_edges)
def test_star_contraction_reaches_unionfind_components(raw):
    """Alternating large-star/small-star must reach a star-forest fixpoint
    whose labels equal union-find components, within the O(log n)-ish
    round bound the Spark loop assumes (CC_MAX_ITERS = 15 covers any
    41-node graph many times over)."""
    edges = {(min(a, b), max(a, b)) for a, b in raw}
    for rounds in range(1, 16):
        nxt = _ls_small(_ls_large(edges))
        if nxt == edges:
            break
        edges = nxt
    else:
        raise AssertionError("no fixpoint within 15 rounds")
    labels: dict[int, int] = {}
    for u, v in edges:
        labels[v] = min(labels.get(v, v), u)
        labels.setdefault(u, u)
    expect = _union_find_comps(raw and {(min(a, b), max(a, b)) for a, b in raw})
    assert labels == expect
    # fixpoint is star-form: no non-root node appears as a smaller endpoint
    roots = set(labels.values())
    assert all(u in roots for u, _ in edges)


# --- BFS frontier relaxation equals plain BFS ----------------------------------

def _bfs_relax(edges: set) -> dict:
    """Mirror of graph.graph_bfs_hops' per-round relaxation from min node."""
    sym: dict[int, set] = defaultdict(set)
    for u, v in edges:
        sym[u].add(v)
        sym[v].add(u)
    src = min(sym)
    dist = {src: 0}
    prev = (1, 0)
    for _ in range(100):
        nxt = dict(dist)
        for u, v in edges:
            for a, b in ((u, v), (v, u)):
                if a in dist:
                    nxt[b] = min(nxt.get(b, dist[a] + 1), dist[a] + 1)
        cur = (len(nxt), sum(nxt.values()))
        dist = nxt
        if cur == prev:
            return dist
        prev = cur
    raise AssertionError("BFS relaxation did not converge")


@settings(max_examples=300, deadline=None)
@given(raw=star_edges)
def test_bfs_relaxation_equals_plain_bfs(raw):
    from collections import deque

    edges = {(min(a, b), max(a, b)) for a, b in raw}
    sym: dict[int, set] = defaultdict(set)
    for u, v in edges:
        sym[u].add(v)
        sym[v].add(u)
    src = min(sym)
    expect = {src: 0}
    dq = deque([src])
    while dq:
        x = dq.popleft()
        for y in sym[x]:
            if y not in expect:
                expect[y] = expect[x] + 1
                dq.append(y)
    assert _bfs_relax(edges) == expect
