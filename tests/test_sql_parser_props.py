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
