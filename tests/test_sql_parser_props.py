"""Property tests for the snapshot_sql statement scanners: the
depth-zero splitters must treat balanced parens and quoted strings as
opaque — commas, WHERE keywords, and closing parens inside them never
split the statement. Pure-Python, no Spark session needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from serverless_mapreduce_spark.sources.snapshot_sql import (
    _split_statement_where,
    _split_top,
    _take_source,
)

# atoms that are opaque at depth zero: balanced parens (with commas and
# WHERE inside), quoted strings (with commas and WHERE inside), words
_opaque = st.one_of(
    st.just("(a, b WHERE c)"),
    st.just("(SELECT x FROM t WHERE k = 1)"),
    st.just("'lit, where x'"),
    st.just('"q, where"'),
    st.just("((f(x, y)), z)"),
    st.just("`w,where`"),
    st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True).filter(
        lambda s: s.upper() != "WHERE"
    ),
    st.just("x + 1"),
)

_token = st.lists(_opaque, min_size=1, max_size=3).map(" ".join)


@given(st.lists(_token, min_size=1, max_size=6))
@settings(max_examples=200, deadline=None)
def test_split_top_roundtrips_tokens(tokens):
    joined = ", ".join(tokens)
    assert _split_top(joined) == [t.strip() for t in tokens]


@given(_token, _token)
@settings(max_examples=200, deadline=None)
def test_split_statement_where_finds_only_top_level(sets, cond):
    # no top-level WHERE: nothing splits
    body, c = _split_statement_where(sets)
    assert c is None and body == sets.strip()
    # one top-level WHERE: splits exactly there, even when the SET part
    # contains WHERE inside parens/quotes
    body, c = _split_statement_where(f"{sets} WHERE {cond}")
    assert body == sets.strip()
    assert c == cond.strip()


@given(_token)
@settings(max_examples=200, deadline=None)
def test_split_statement_where_word_boundary(token):
    # WHEREx / xWHERE are identifiers, not the keyword
    body, c = _split_statement_where(f"{token} WHEREX y")
    assert c is None
    body, c = _split_statement_where(f"{token} XWHERE y")
    assert c is None


@given(st.lists(_opaque, min_size=1, max_size=4).map(", ".join))
@settings(max_examples=200, deadline=None)
def test_take_source_balanced_subquery_roundtrip(inner):
    src = f"(SELECT {inner} FROM t)"
    rest = " s ON t.k = s.k WHEN MATCHED THEN DELETE"
    got, rem = _take_source(src + rest)
    assert got == src
    assert rem == rest
    # bare names stop at the first non-word char
    got, rem = _take_source("  src_tbl AS s ON ...")
    assert got == "src_tbl"
    assert rem == " AS s ON ..."


# --- _derive_scope soundness ---------------------------------------------------

from serverless_mapreduce_spark.sources.snapshot_sql import (  # noqa: E402
    _derive_scope,
    _split_conjuncts,
)

_num = st.integers(min_value=-50, max_value=50)
_strv = st.sampled_from(["a", "b", "c"])


@st.composite
def _conjunct(draw):
    kind = draw(st.sampled_from(["between", "cmp", "eq_num", "eq_str", "noise"]))
    col = draw(st.sampled_from(["k", "v"]))
    if kind == "between":
        lo, hi = sorted((draw(_num), draw(_num)))
        return f"{col} BETWEEN {lo} AND {hi}"
    if kind == "cmp":
        op = draw(st.sampled_from([">=", "<=", ">", "<"]))
        return f"{col} {op} {draw(_num)}"
    if kind == "eq_num":
        return f"{col} = {draw(_num)}"
    if kind == "eq_str":
        return f"p = '{draw(_strv)}'"
    # shapes the analyzer must IGNORE, not misread
    return draw(
        st.sampled_from(
            [
                "k = 1 OR v = 2",
                "NOT (k = 3)",
                "upper(p) = 'A'",
                "k + v > 10",
                "p LIKE 'a%'",
            ]
        )
    )


def _eval_conjunct(conj, row):
    """Reference evaluator for the generated grammar."""
    import re as _re

    k, v, p = row
    env = {"k": k, "v": v}
    m = _re.fullmatch(r"(\w+) BETWEEN (-?\d+) AND (-?\d+)", conj)
    if m:
        return float(m.group(2)) <= env[m.group(1)] <= float(m.group(3))
    m = _re.fullmatch(r"(\w+) (>=|<=|>|<) (-?\d+)", conj)
    if m:
        x, n = env[m.group(1)], float(m.group(3))
        return {"<": x < n, ">": x > n, ">=": x >= n, "<=": x <= n}[
            m.group(2)
        ]
    m = _re.fullmatch(r"(\w+) = (-?\d+)", conj)
    if m:
        return env[m.group(1)] == float(m.group(2))
    m = _re.fullmatch(r"p = '(\w+)'", conj)
    if m:
        return p == m.group(1)
    # noise shapes: evaluate permissively (True keeps the row matching,
    # the adversarial direction for soundness)
    return True


@given(
    st.lists(_conjunct(), min_size=1, max_size=4),
    st.lists(
        st.tuples(_num, _num, _strv), min_size=1, max_size=30
    ),
)
@settings(max_examples=300, deadline=None)
def test_derive_scope_is_sound(conjuncts, rows):
    """Every row matching the FULL condition must satisfy the derived
    box and partition scope — the derivation may keep extra files,
    never lose a matching row."""
    import re as _re

    cond = " AND ".join(conjuncts)
    # the splitter must reproduce the conjuncts (BETWEEN-aware)
    assert _split_conjuncts(cond) == conjuncts
    hints = _derive_scope(cond)
    # SQL precedence: a TOP-LEVEL OR anywhere (noise conjuncts inject
    # them un-parenthesized) makes `A AND B OR C` = `(A AND B) OR C`,
    # so NO conjunct bound is implied — derivation must yield nothing
    if any(
        _re.search(r"(?<![\w])OR(?![\w])", c)
        and "(" not in c  # parenthesized ORs stay opaque and are fine
        for c in conjuncts
    ):
        assert hints == {}
        return
    box = hints.get("prune")
    part = hints.get("partition_eq", {})
    env = {"k": 0, "v": 1}
    for row in rows:
        if not all(_eval_conjunct(c, row) for c in conjuncts):
            continue
        if box is not None:
            col, lo, hi = box
            val = row[env[col]] if col in env else None
            if val is not None:
                assert lo <= val <= hi
        if "p" in part:
            assert row[2] == part["p"]
