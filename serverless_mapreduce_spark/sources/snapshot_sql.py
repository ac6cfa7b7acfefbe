"""SQL-TEXT DML over snapshot tables (r15 verdict item 6): parse the
four Delta DML statement shapes and dispatch to the library verbs —

- ``MERGE INTO t USING s ON ... WHEN [NOT] MATCHED [BY SOURCE] ...``
  → :meth:`SnapshotTable.merge_into` (ordered matched clauses,
  first-match-wins; ``UPDATE SET *`` / ``DELETE`` / ``INSERT *`` /
  NOT-MATCHED-BY-SOURCE ``DELETE`` / ``UPDATE SET col = expr``)
- ``UPDATE t SET col = expr[, ...] [WHERE cond]``
  → :meth:`SnapshotTable.update_where`
- ``DELETE FROM t [WHERE cond]`` → :meth:`SnapshotTable.delete_where`
- ``INSERT OVERWRITE t PARTITION (col = v[, ...]) SELECT ...``
  → :meth:`SnapshotTable.replace_where` (the atomic partition
  backfill); ``INSERT INTO t SELECT ...`` → :meth:`SnapshotTable.commit`

The reference's users wrote their workloads as SQL files
(``hive/Query1-3.q``, consumed by ``serverless_mr`` job configs); the
library verbs cover Delta's semantics but only as Python calls — this
front end closes that last-mile gap. The parser is deliberately a
STATEMENT parser, not an expression parser: conditions, SET
expressions, and the USING subquery pass through verbatim to Spark SQL
(Catalyst owns expression semantics); only the statement skeleton and
the clause ordering are interpreted here, so every dispatched call is
exactly the library call a Python caller would have written — pinned
by tests/test_round16.py clause-order parity.

Restrictions (each raises with the library alternative named):
``MERGE`` ``ON`` must be a conjunction of ``t.col = s.col`` equalities
(the library merge is key-based); matched ``UPDATE SET`` supports only
``*`` (the library's matched update is a full-row replace); matched
conditions may reference TARGET columns only (the library contract).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from serverless_mapreduce_spark.sources.snapshots import SnapshotTable

__all__ = ["sql_dml", "sql_select"]


def _scan(s: str):
    """THE depth/quote scanner every statement splitter shares: yield
    ``(i, ch, depth, in_quote)`` per character. Quotes (' \" \\`) are
    opaque; a backslash inside a quote escapes the next character
    (Spark accepts ``'don\\'t'``); parens nest. One implementation so
    escape handling can never diverge between splitters (round-16
    second review)."""
    depth, q, i = 0, None, 0
    while i < len(s):
        ch = s[i]
        if q is not None:
            if ch == "\\" and i + 1 < len(s):
                yield i, ch, depth, True
                i += 1
                yield i, s[i], depth, True
                i += 1
                continue
            yield i, ch, depth, True
            if ch == q:
                q = None
            i += 1
            continue
        if ch in "'\"`":
            q = ch
            yield i, ch, depth, True
        elif ch == "(":
            depth += 1
            yield i, ch, depth, False
        elif ch == ")":
            yield i, ch, depth, False
            depth -= 1
        else:
            yield i, ch, depth, False
        i += 1


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth zero."""
    out, cur = [], []
    for _i, ch, depth, in_q in _scan(s):
        if ch == sep and depth == 0 and not in_q:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    last = "".join(cur).strip()
    if last:
        out.append(last)
    return out


def _split_statement_where(text: str) -> tuple[str, str | None]:
    """Split off the STATEMENT-level WHERE: the first ``WHERE`` word at
    paren/quote depth zero. A WHERE inside a SET subquery or a string
    literal never splits (round-16 review). Case-compare happens on the
    original string's slice (``text[i:i+5].upper()``) — an uppercased
    COPY can be longer than the original (ß→SS) and desynchronize the
    index. A WHERE with an empty condition raises rather than silently
    meaning no-WHERE (which would turn a malformed statement into a
    full-table update)."""
    for i, _ch, depth, in_q in _scan(text):
        if (
            depth == 0
            and not in_q
            and text[i : i + 5].upper() == "WHERE"
            and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_"))
            and (
                i + 5 >= len(text)
                or not (text[i + 5].isalnum() or text[i + 5] == "_")
            )
        ):
            cond = text[i + 5 :].strip()
            if not cond:
                raise ValueError("WHERE with no condition")
            return text[:i].strip(), cond
    return text.strip(), None


def _split_conjuncts(s: str) -> list[str]:
    """Split a predicate on top-level ``AND``, case-insensitive and
    word-bounded — conjuncts inside parens/quotes stay whole, and the
    ``AND`` that belongs to a ``BETWEEN lo AND hi`` is part of its
    conjunct, not a split point."""

    def _word_at(i: int, w: str) -> bool:
        n = len(w)
        return (
            s[i : i + n].upper() == w
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (
                i + n >= len(s)
                or not (s[i + n].isalnum() or s[i + n] == "_")
            )
        )

    out, last, pending_between = [], 0, 0
    for i, _ch, depth, in_q in _scan(s):
        if depth != 0 or in_q:
            continue
        if _word_at(i, "BETWEEN"):
            pending_between += 1
        elif _word_at(i, "AND"):
            if pending_between:
                pending_between -= 1
                continue
            out.append(s[last:i].strip())
            last = i + 3
    out.append(s[last:].strip())
    return [p for p in out if p]


_NUM_RE = r"-?\d+(?:\.\d+)?"


def _derive_scope(condition: str) -> dict:
    """Derive SOUND pruning hints from a DML WHERE clause: any
    top-level AND-conjunct bound holds for every matching row, so a
    stats box / partition scope read off the conjuncts can only keep
    extra files, never miss one. Recognized (simple identifier vs
    literal only — anything else contributes nothing):

    - ``col BETWEEN n AND m`` / ``col >= n`` / ``col <= m`` /
      ``col = n`` (numeric) → ONE stats box ``prune=(col, lo, hi)``
      (the first column with a usable bound wins; the verbs take a
      single box);
    - ``col = 'str'`` → ``partition_eq={col: 'str'}`` (files recording
      a different partition value are untouched by proof; non-partition
      columns record nothing and stay candidates — harmless).

    This is what makes the SQL front end SCALE-CORRECT BY DEFAULT: a
    ``DELETE ... WHERE day = '2026-01-01'`` through sql_dml rewrites
    one partition, not the table, without the caller passing physical
    hints. Explicit kwargs always win (callers may know tighter
    scopes)."""
    # a TOP-LEVEL OR breaks the conjunct implication entirely: SQL
    # precedence makes `A AND B OR C` = `(A AND B) OR C`, so a row can
    # match via C alone without satisfying any AND-side bound — derive
    # nothing (parenthesized ORs stay opaque inside their conjunct)
    for i, _ch, depth, in_q in _scan(condition):
        if (
            depth == 0
            and not in_q
            and condition[i : i + 2].upper() == "OR"
            and (
                i == 0
                or not (
                    condition[i - 1].isalnum() or condition[i - 1] == "_"
                )
            )
            and (
                i + 2 >= len(condition)
                or not (
                    condition[i + 2].isalnum() or condition[i + 2] == "_"
                )
            )
        ):
            return {}
    boxes: dict[str, list] = {}
    part: dict[str, str] = {}
    inf = float("inf")

    def _num(text: str) -> int | float:
        # integral literals stay int: float() rounds beyond 2^53
        # (9007199254740993 -> ...992.0) and a rounded bound can
        # provably-skip a file whose rows actually match — a silent
        # wrong prune (round-16 advice 1). Python compares int/float
        # exactly, so mixed bounds downstream stay sound.
        return float(text) if "." in text else int(text)

    for conj in _split_conjuncts(condition):
        m = re.fullmatch(
            rf"(?is)\s*(\w+)\s+BETWEEN\s+({_NUM_RE})\s+AND\s+({_NUM_RE})\s*",
            conj,
        )
        if m:
            b = boxes.setdefault(m.group(1), [-inf, inf])
            b[0] = max(b[0], _num(m.group(2)))
            b[1] = min(b[1], _num(m.group(3)))
            continue
        m = re.fullmatch(
            rf"(?s)\s*(\w+)\s*(>=|<=|=|==|>|<)\s*({_NUM_RE})\s*", conj
        )
        if m:
            col, op, val = m.group(1), m.group(2), _num(m.group(3))
            b = boxes.setdefault(col, [-inf, inf])
            if op in (">=", ">"):
                b[0] = max(b[0], val)
            elif op in ("<=", "<"):
                b[1] = min(b[1], val)
            else:
                b[0], b[1] = max(b[0], val), min(b[1], val)
            continue
        m = re.fullmatch(
            r"(?s)\s*(\w+)\s*==?\s*'((?:[^'\\]|\\.)*)'\s*", conj
        )
        if m:
            part[m.group(1)] = m.group(2).replace("\\'", "'")
    hints: dict = {}
    for col, (lo, hi) in boxes.items():
        if lo != -inf or hi != inf:
            hints["prune"] = (col, lo, hi)
            break
    if part:
        hints["partition_eq"] = part
    return hints


def _strip_alias(expr: str, alias: str | None) -> str:
    if not alias:
        return expr
    return re.sub(
        rf"(?<![A-Za-z0-9_`]){re.escape(alias)}\.", "", expr
    ).strip()


def _refuses_alias(expr: str, alias: str | None, what: str) -> None:
    if alias and re.search(rf"(?<![A-Za-z0-9_`]){re.escape(alias)}\.", expr):
        raise ValueError(
            f"{what} may reference target columns only (the library "
            f"merge contract); found a {alias!r}-qualified reference in "
            f"{expr!r}"
        )


def _parse_assignments(text: str, alias: str | None) -> dict[str, str]:
    sets: dict[str, str] = {}
    for part in _split_top(text):
        m = re.fullmatch(
            r"(?:[A-Za-z_][\w]*\.)?([A-Za-z_][\w]*)\s*=\s*(.+)",
            part.strip(),
            re.DOTALL,
        )
        if m is None:
            raise ValueError(f"cannot parse SET assignment {part!r}")
        sets[m.group(1)] = _strip_alias(m.group(2).strip(), alias)
    return sets


_MERGE_HEAD_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[\w.]+)"
    r"(?:\s+AS)?(?:\s+(?P<talias>(?!USING\b)\w+))?"
    r"\s+USING\s+",
    re.IGNORECASE | re.DOTALL,
)

_MERGE_TAIL_RE = re.compile(
    r"^(?:\s*AS)?(?:\s+(?P<salias>(?!ON\b)\w+))?"
    r"\s+ON\s+(?P<on>.*?)"
    r"(?P<clauses>\s+WHEN\s+.*)$",
    re.IGNORECASE | re.DOTALL,
)


def _take_source(rest: str) -> tuple[str, str]:
    """Split off the USING source: a balanced-paren subquery or a bare
    name. Returns (source_text, remainder)."""
    rest = rest.lstrip()
    if rest.startswith("("):
        for i, ch, depth, in_q in _scan(rest):
            if ch == ")" and depth == 1 and not in_q:
                return rest[: i + 1], rest[i + 1 :]
        raise ValueError("unbalanced parentheses in MERGE USING source")
    m = re.match(r"[\w.]+", rest)
    if m is None:
        raise ValueError("cannot parse MERGE USING source")
    return m.group(0), rest[m.end() :]

def _top_word_positions(s: str, word: str) -> list[int]:
    """Positions where ``word`` appears as a whole word at paren/quote
    depth zero (the :func:`_scan` discipline) — so a ``WHEN MATCHED`` or
    ``THEN`` inside a string literal or a parenthesized subexpression
    never acts as a clause boundary (round-16 advice 3)."""
    n = len(word)
    out: list[int] = []
    for i, _ch, depth, in_q in _scan(s):
        if depth != 0 or in_q:
            continue
        if (
            s[i : i + n].upper() == word
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (
                i + n >= len(s)
                or not (s[i + n].isalnum() or s[i + n] == "_")
            )
        ):
            out.append(i)
    return out


_WHEN_HEAD_RE = re.compile(
    r"\s*WHEN\s+(?P<not>NOT\s+)?MATCHED"
    r"(?P<bysource>\s+BY\s+SOURCE)?(?:\s+BY\s+TARGET)?"
    r"(?:\s+AND\s+(?P<cond>.*?))?\s*",
    re.IGNORECASE | re.DOTALL,
)


def _split_when_clauses(text: str) -> list[tuple[re.Match, str]]:
    """Split the MERGE tail into WHEN clauses at TOP-LEVEL boundaries
    and locate each clause's top-level THEN, via the shared
    quote/paren scanner — the old regex split mis-split on ``' WHEN
    MATCHED'`` / ``' THEN '`` inside string literals. Returns
    ``(head_match, action)`` per clause. An unparenthesized CASE WHEN
    ... THEN inside a condition still confuses the boundary search —
    parenthesize such conditions (the error names the fix)."""
    starts = [
        i
        for i in _top_word_positions(text, "WHEN")
        if re.match(r"(?is)WHEN\s+(?:NOT\s+)?MATCHED\b", text[i:])
    ]
    if not starts or text[: starts[0]].strip():
        raise ValueError(f"cannot parse WHEN clauses {text[:60]!r}")
    out: list[tuple[re.Match, str]] = []
    for a, b in zip(starts, starts[1:] + [len(text)]):
        chunk = text[a:b]
        thens = _top_word_positions(chunk, "THEN")
        if not thens:
            raise ValueError(
                f"cannot find THEN in WHEN clause {chunk[:60]!r} "
                "(a CASE expression in the condition must be "
                "parenthesized)"
            )
        head, action = chunk[: thens[0]], chunk[thens[0] + 4 :]
        hm = _WHEN_HEAD_RE.fullmatch(head)
        if hm is None:
            raise ValueError(f"cannot parse WHEN clause {chunk[:60]!r}")
        out.append((hm, action))
    return out


def _parse_merge(
    spark: SparkSession, stmt: str, tables: dict[str, SnapshotTable]
):
    hm = _MERGE_HEAD_RE.match(stmt)
    if hm is None:
        raise ValueError("cannot parse MERGE statement")
    tname = hm.group("target")
    if tname not in tables:
        raise ValueError(f"unknown snapshot table {tname!r}")
    t = tables[tname]
    talias = hm.group("talias")
    src_txt, rest = _take_source(stmt[hm.end() :])
    m = _MERGE_TAIL_RE.match(rest)
    if m is None:
        raise ValueError("cannot parse MERGE statement after USING")
    salias = m.group("salias")
    if src_txt.startswith("("):
        if salias is None:
            raise ValueError(
                "MERGE USING (subquery) needs an alias — the ON clause "
                "has no name to qualify source columns with"
            )
        source = spark.sql(src_txt[1:-1])
    else:
        source = spark.table(src_txt)
    # alias-free Delta MERGE qualifies by table/source NAME — fall back
    # to those so 'MERGE INTO tbl USING src ON tbl.k = src.k' parses
    # (round-16 review). Dotted names qualify by their LAST component
    # (db.src → src.k), the SQL name-resolution rule — the ON regex
    # matches single-word qualifiers only.
    if talias is None:
        talias = tname.rsplit(".", 1)[-1]
    if salias is None:
        salias = src_txt.rsplit(".", 1)[-1]

    # ON: a conjunction of t.col = s.col equalities → the key tuple
    keys: list[str] = []
    renames: dict[str, str] = {}  # source col -> target col
    for eq in re.split(r"\s+AND\s+", m.group("on"), flags=re.IGNORECASE):
        em = re.fullmatch(
            r"\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*", eq, re.DOTALL
        )
        if em is None:
            raise ValueError(
                f"MERGE ON must be a conjunction of alias.col = "
                f"alias.col equalities (key-based merge); got {eq!r}"
            )
        a1, c1, a2, c2 = em.groups()
        if a1 == talias and a2 == salias:
            tcol, scol = c1, c2
        elif a1 == salias and a2 == talias:
            tcol, scol = c2, c1
        else:
            raise ValueError(
                f"ON equality {eq!r} must pair the target alias "
                f"{talias!r} with the source alias {salias!r}"
            )
        keys.append(tcol)
        if scol != tcol:
            renames[scol] = tcol
    if renames:
        # renaming s.b -> a when the source ALREADY has a column named a
        # (that is not itself renamed away) would yield duplicate 'a'
        # columns and ambiguous key data downstream (round-16 advice 4)
        clash = sorted(
            {
                tc
                for tc in renames.values()
                if tc in source.columns and tc not in renames
            }
        )
        vals = list(renames.values())
        if len(set(vals)) != len(vals):
            raise ValueError(
                "MERGE ON maps two source columns to the same target "
                f"column {sorted(vals)!r}"
            )
        if clash:
            raise ValueError(
                f"MERGE ON renames a source column to {clash!r}, but the "
                "source already has a column of that name — alias it "
                "away in the USING subquery"
            )
        source = source.withColumnsRenamed(renames)

    matched: list[tuple[str | None, str]] = []
    insert_unmatched = False
    insert_condition: str | None = None
    nmbs: str | None = None
    nmbs_condition: str | None = None
    nmbs_set: dict[str, str] | None = None
    # WHEN clauses split at TOP-LEVEL boundaries (quote/paren-aware
    # _scan, round-16 advice 3), parsed IN ORDER (first-match-wins
    # rides through to merge_into's ordered clause list verbatim)
    for wm, action in _split_when_clauses(m.group("clauses").strip()):
        cond = wm.group("cond")
        action = action.strip().rstrip(";").strip()
        is_not = wm.group("not") is not None
        by_source = wm.group("bysource") is not None
        if not is_not:  # WHEN MATCHED
            _refuses_alias(cond or "", salias, "a WHEN MATCHED condition")
            c = _strip_alias(cond, talias) if cond else None
            if re.fullmatch(r"(?i)DELETE", action):
                matched.append((c, "delete"))
            elif re.fullmatch(r"(?i)UPDATE\s+SET\s+\*", action):
                matched.append((c, "update"))
            else:
                raise ValueError(
                    "WHEN MATCHED supports THEN DELETE or THEN UPDATE "
                    "SET * (the library's matched update is a full-row "
                    f"replace); got {action!r}"
                )
        elif not by_source:  # WHEN NOT MATCHED [BY TARGET]
            _refuses_alias(
                cond or "", talias, "a WHEN NOT MATCHED condition"
            )
            if not re.fullmatch(r"(?i)INSERT\s+\*", action):
                raise ValueError(
                    f"WHEN NOT MATCHED supports THEN INSERT *; got "
                    f"{action!r}"
                )
            if insert_unmatched:
                # last-one-wins here would silently DROP the earlier
                # clause's condition and insert the wrong rows — Delta
                # permits multiple NOT MATCHED clauses, this front end
                # does not (round-16 advice 2)
                raise ValueError(
                    "multiple WHEN NOT MATCHED clauses are not "
                    "supported — combine the conditions into one "
                    "INSERT clause or use merge_into directly"
                )
            insert_unmatched = True
            insert_condition = _strip_alias(cond, salias) if cond else None
        else:  # WHEN NOT MATCHED BY SOURCE
            _refuses_alias(
                cond or "", salias, "a NOT MATCHED BY SOURCE condition"
            )
            if nmbs is not None:
                raise ValueError(
                    "multiple WHEN NOT MATCHED BY SOURCE clauses are "
                    "not supported — combine the conditions into one "
                    "clause or use merge_into directly"
                )
            nmbs_condition = _strip_alias(cond, talias) if cond else None
            if re.fullmatch(r"(?i)DELETE", action):
                nmbs = "delete"
            else:
                um = re.fullmatch(
                    r"(?i)UPDATE\s+SET\s+(.*)", action, re.DOTALL
                )
                if um is None:
                    raise ValueError(
                        f"NOT MATCHED BY SOURCE supports DELETE or "
                        f"UPDATE SET col = expr; got {action!r}"
                    )
                nmbs = "update"
                nmbs_set = _parse_assignments(um.group(1), talias)
    if not matched and not insert_unmatched and nmbs is None:
        raise ValueError("MERGE needs at least one WHEN clause")
    if matched:
        kw = {"when_matched": matched}
    else:
        # no matched clause: matched rows are kept unchanged (Delta) —
        # an always-false matched condition expresses exactly that
        kw = {"when_matched": "update", "matched_condition": "false"}
    return t.merge_into(
        spark,
        source,
        tuple(keys),
        insert_unmatched=insert_unmatched,
        insert_condition=insert_condition,
        not_matched_by_source=nmbs,
        nmbs_condition=nmbs_condition,
        nmbs_set=nmbs_set,
        **kw,
    )


def _parse_asof_ts(raw: str) -> float:
    """Parse a TIMESTAMP AS OF operand: ISO-8601 first (naive strings
    are UTC — the commit clock), then epoch seconds (the r16 advice-4
    rule, shared with RESTORE and the streaming reader)."""
    raw = raw.strip().strip("'\"")
    try:
        from datetime import datetime, timezone

        dt = datetime.fromisoformat(raw.replace("T", " "))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.timestamp()
    except ValueError:
        return float(raw)


_SELECT_VIEW_SEQ = [0]


def sql_select(
    spark: SparkSession,
    statement: str,
    tables: dict[str, SnapshotTable],
) -> DataFrame:
    """Execute a SELECT over registered snapshot ``tables`` with Delta's
    read-side time travel syntax (round-16 verdict item 3, completing
    the SQL surface whose write side is :func:`sql_dml`):

    - ``FROM t VERSION AS OF n`` → :meth:`SnapshotTable.read(version=n)`
    - ``FROM t TIMESTAMP AS OF ts`` → ``read(resolve_as_of(ts))`` (ISO
      string or epoch seconds, same parse as RESTORE)
    - a bare ``FROM t`` reads the latest version

    Each snapshot reference after a top-level-word ``FROM``/``JOIN`` is
    rewritten to a temp view backed by the pinned read (MOR deletes,
    column mapping, and stats pruning all ride the library read path);
    everything else in the statement — CTEs, aliases, subqueries, other
    Spark tables/views — passes through verbatim to ``spark.sql``.
    Comma-style cross joins (``FROM a, t``) are NOT rewritten: use JOIN
    (an unrewritten name fails resolution loudly). The reference's user
    surface was SQL files (``hive/Query1.q``); this closes the read
    side over the snapshot format."""
    stmt = statement.strip().rstrip(";").strip()
    # quoted-region mask so a table name inside a string literal is data
    quoted = {i for i, _ch, _d, in_q in _scan(stmt) if in_q}
    names = sorted(tables, key=len, reverse=True)
    for name in names:
        for m in re.finditer(
            rf"(?is)\b{re.escape(name)}\s+AS\s*\(", stmt
        ):
            if m.start() in quoted:
                continue  # '<name> AS (' inside a string literal is data
            raise ValueError(
                f"a CTE named {name!r} shadows a registered snapshot "
                "table — rename the CTE"
            )
    pat = re.compile(
        rf"(?is)\b(FROM|JOIN)\s+({'|'.join(re.escape(n) for n in names)})"
        r"(?![\w.])"
        r"(?:\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+"
        r"('(?:[^'\\]|\\.)*'|[^\s,);]+))?"
    )
    out: list[str] = []
    views: list[str] = []
    last = 0
    for m in pat.finditer(stmt):
        if m.start() in quoted:
            continue
        t = tables[m.group(2)]
        kind, raw = m.group(3), m.group(4)
        if kind is None:
            df = t.read(spark)
        elif kind.upper() == "VERSION":
            df = t.read(spark, version=int(raw.strip().strip("'\"")))
        else:
            df = t.read(spark, version=t.resolve_as_of(_parse_asof_ts(raw)))
        _SELECT_VIEW_SEQ[0] += 1
        view = f"snap_asof_{m.group(2)}_{_SELECT_VIEW_SEQ[0]}"
        df.createOrReplaceTempView(view)
        views.append(view)
        out.append(stmt[last : m.start()])
        out.append(f"{m.group(1)} {view}")
        last = m.end()
    out.append(stmt[last:])
    result = spark.sql("".join(out))
    # the analyzer substituted each view's plan into `result` at sql()
    # time, so the catalog entries are dead weight now — drop them or a
    # long-lived session issuing many SELECTs accumulates views without
    # bound (round-17 review)
    for view in views:
        spark.catalog.dropTempView(view)
    return result


def sql_dml(
    spark: SparkSession,
    statement: str,
    tables: dict[str, SnapshotTable],
    **kwargs,
) -> int | None:
    """Execute one DML/DDL/maintenance statement against the registered
    snapshot ``tables`` ({name: SnapshotTable}); returns the published
    version (``DESCRIBE HISTORY`` and ``SELECT``/``WITH`` — see
    :func:`sql_select` — instead return their result DataFrame). ``kwargs`` pass physical hints through to the verbs
    (``prune=``, ``partition_eq=``, ``stats_cols=``, ``change_feed=`` —
    the SQL text carries semantics; scale hints stay explicit, same as
    the library calls). Statements beyond the four DML shapes: ``ALTER
    TABLE`` (rename/drop/add column, widen type, add/drop constraint),
    ``OPTIMIZE [ZORDER BY]``, ``VACUUM [RETAIN n VERSIONS]``,
    ``RESTORE TABLE ... TO VERSION|TIMESTAMP AS OF``, ``DESCRIBE
    HISTORY``."""
    stmt = statement.strip().rstrip(";").strip()
    head = stmt.split(None, 1)[0].upper() if stmt else ""
    if head in ("SELECT", "WITH"):
        if kwargs:
            raise ValueError("SELECT takes no hint kwargs")
        return sql_select(spark, stmt, tables)
    if head == "ALTER":
        m = re.match(
            r"(?is)^ALTER\s+TABLE\s+([\w.]+)\s+(.*)$", stmt
        )
        if m is None:
            raise ValueError("cannot parse ALTER TABLE statement")
        name, action = m.group(1), m.group(2).strip()
        if name not in tables:
            raise ValueError(f"unknown snapshot table {name!r}")
        t = tables[name]
        am = re.match(
            r"(?is)^RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)$", action
        )
        if am:
            return t.rename_column(am.group(1), am.group(2))
        am = re.match(r"(?is)^DROP\s+COLUMN\s+(\w+)$", action)
        if am:
            return t.drop_column(am.group(1))
        am = re.match(
            r"(?is)^ADD\s+COLUMN\s+(\w+)\s+([\w()<>, ]+?)$", action
        )
        if am:
            return t.add_column_mapped(am.group(1), am.group(2).strip())
        am = re.match(
            r"(?is)^ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.*)\)$", action
        )
        if am:
            return t.add_check_constraint(spark, am.group(1), am.group(2))
        am = re.match(r"(?is)^DROP\s+CONSTRAINT\s+(\w+)$", action)
        if am:
            return t.drop_check_constraint(am.group(1))
        am = re.match(
            r"(?is)^ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+([\w()<>, ]+?)$",
            action,
        )
        if am:
            return t.widen_column_type(am.group(1), am.group(2).strip())
        raise ValueError(
            f"unsupported ALTER TABLE action {action[:40]!r} (RENAME "
            "COLUMN / DROP COLUMN / ADD COLUMN / ALTER COLUMN ... TYPE "
            "/ ADD CONSTRAINT ... CHECK (...) / DROP CONSTRAINT)"
        )
    if head == "OPTIMIZE":
        m = re.match(
            r"(?is)^OPTIMIZE\s+([\w.]+)"
            r"(?:\s+ZORDER\s+BY\s*\(?\s*([\w\s,]+?)\s*\)?)?$",
            stmt,
        )
        if m is None:
            raise ValueError("cannot parse OPTIMIZE statement")
        name, zcols = m.group(1), m.group(2)
        if name not in tables:
            raise ValueError(f"unknown snapshot table {name!r}")
        if zcols:
            cols = tuple(c.strip() for c in zcols.split(",") if c.strip())
            kwargs.setdefault("cluster_by", cols)
            kwargs.setdefault("cluster_mode", "zorder")
        return tables[name].compact_small_files(spark, **kwargs)
    if head == "VACUUM":
        m = re.match(
            r"(?is)^VACUUM\s+([\w.]+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?$",
            stmt,
        )
        if m is None:
            raise ValueError(
                "cannot parse VACUUM (VACUUM tbl [RETAIN n VERSIONS])"
            )
        name, keep = m.group(1), m.group(2)
        if name not in tables:
            raise ValueError(f"unknown snapshot table {name!r}")
        if keep is not None:
            kwargs.setdefault("keep_latest", int(keep))
        dropped, _doomed = tables[name].expire_versions(**kwargs)
        return tables[name].latest_version()
    if head == "RESTORE":
        m = re.match(
            r"(?is)^RESTORE\s+TABLE\s+([\w.]+)\s+TO\s+"
            r"(VERSION|TIMESTAMP)\s+AS\s+OF\s+(.+)$",
            stmt,
        )
        if m is None:
            raise ValueError(
                "cannot parse RESTORE (RESTORE TABLE t TO "
                "VERSION|TIMESTAMP AS OF x)"
            )
        name, kind, target = m.group(1), m.group(2).upper(), m.group(3)
        if name not in tables:
            raise ValueError(f"unknown snapshot table {name!r}")
        t = tables[name]
        if kind == "VERSION":
            return t.restore_version(int(target))
        return t.restore_version(t.resolve_as_of(_parse_asof_ts(target)))
    if head == "DESCRIBE":
        m = re.match(r"(?is)^DESCRIBE\s+HISTORY\s+([\w.]+)$", stmt)
        if m is None:
            raise ValueError("cannot parse DESCRIBE (DESCRIBE HISTORY t)")
        name = m.group(1)
        if name not in tables:
            raise ValueError(f"unknown snapshot table {name!r}")
        # the one statement that returns a DataFrame, not a version —
        # Delta's DESCRIBE HISTORY result-set shape
        return tables[name].versions_metadata(spark)
    if head == "MERGE":
        if kwargs:
            raise ValueError("MERGE takes no hint kwargs")
        return _parse_merge(spark, stmt, tables)
    if head == "UPDATE":
        m = re.match(r"(?is)^UPDATE\s+([\w.]+)\s+SET\s+(.*)$", stmt)
        if m is None:
            raise ValueError("cannot parse UPDATE statement")
        name = m.group(1)
        # split at the first DEPTH-ZERO WHERE: a WHERE inside a SET
        # subquery or a string literal belongs to the expression
        sets_txt, cond = _split_statement_where(m.group(2))
        if name not in tables:
            raise ValueError(f"unknown snapshot table {name!r}")
        if cond and "prune" not in kwargs and "partition_eq" not in kwargs:
            kwargs = {**_derive_scope(cond), **kwargs}
        return tables[name].update_where(
            spark,
            cond.strip() if cond else "true",
            _parse_assignments(sets_txt, None),
            **kwargs,
        )
    if head == "DELETE":
        m = re.match(
            r"(?is)^DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.*))?$", stmt
        )
        if m is None:
            raise ValueError("cannot parse DELETE statement")
        name, cond = m.group(1), m.group(2)
        if name not in tables:
            raise ValueError(f"unknown snapshot table {name!r}")
        if cond and "prune" not in kwargs and "partition_eq" not in kwargs:
            kwargs = {**_derive_scope(cond), **kwargs}
        return tables[name].delete_where(
            spark, cond.strip() if cond else "true", **kwargs
        )
    if head == "INSERT":
        m = re.match(
            r"(?is)^INSERT\s+(INTO|OVERWRITE)\s+([\w.]+)"
            r"(?:\s+PARTITION\s*\((.*?)\))?\s+(SELECT\b.*|VALUES\b.*)$",
            stmt,
        )
        if m is None:
            raise ValueError("cannot parse INSERT statement")
        verb, name, part_txt, select = (
            m.group(1).upper(),
            m.group(2),
            m.group(3),
            m.group(4),
        )
        if name not in tables:
            raise ValueError(f"unknown snapshot table {name!r}")
        df: DataFrame = spark.sql(select)
        if verb == "INTO":
            if part_txt:
                raise ValueError(
                    "INSERT INTO ... PARTITION is not a DML shape here; "
                    "plain INSERT INTO appends (partition values belong "
                    "in the rows)"
                )
            return tables[name].commit(df, **kwargs)
        if not part_txt:
            raise ValueError(
                "INSERT OVERWRITE without PARTITION replaces the whole "
                "table — use commit(mode='overwrite') explicitly"
            )
        partition_eq: dict[str, object] = {}
        for part in _split_top(part_txt):
            pm = re.fullmatch(
                r"\s*(\w+)\s*=\s*(.+?)\s*", part, re.DOTALL
            )
            if pm is None:
                raise ValueError(
                    f"cannot parse PARTITION equality {part!r}"
                )
            raw = pm.group(2).strip()
            if (raw.startswith("'") and raw.endswith("'")) or (
                raw.startswith('"') and raw.endswith('"')
            ):
                val: object = raw[1:-1]
            elif raw.upper() == "NULL":
                val = None
            else:
                try:
                    val = int(raw)
                except ValueError:
                    val = float(raw)
            partition_eq[pm.group(1)] = val
        return tables[name].replace_where(
            spark, partition_eq, df, **kwargs
        )
    raise ValueError(
        f"unsupported DML statement (MERGE/UPDATE/DELETE/INSERT): "
        f"{stmt[:50]!r}"
    )


# --- registered query ----------------------------------------------------------


def _register_query() -> None:
    from pyspark.sql import functions as F

    from serverless_mapreduce_spark.catalog import table
    from serverless_mapreduce_spark.paths import scratch, sf_tag
    from serverless_mapreduce_spark.registry import query
    from serverless_mapreduce_spark.sources.snapshots import (
        DEL_HI,
        DEL_LO,
        _cents,
    )

    @query(
        "snapshot_sql_merge",
        priority=150,
        oracle=f"""
        WITH base AS (
          SELECT o_orderkey, o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders
        ),
        boxed AS (
          SELECT * FROM base
          WHERE o_custkey BETWEEN {DEL_LO} AND {DEL_HI}
        ),
        final AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_custkey BETWEEN {DEL_LO} AND {DEL_HI}
                      THEN cents + 7 ELSE cents END AS cents
          FROM base
          WHERE NOT (o_custkey BETWEEN {DEL_LO} AND {DEL_HI}
                     AND cents % 3 = 0)
          UNION ALL
          SELECT o_orderkey + 10000000, o_custkey, cents + 7 FROM boxed
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents,
               CAST(SUM(CASE WHEN o_orderkey > 10000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_inserted
        FROM final
        """,
    )
    def snapshot_sql_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
        """SQL-TEXT MULTI-CLAUSE MERGE (r15 verdict item 6): the exact
        statement a Delta user would write — ordered WHEN MATCHED
        clauses (DELETE before UPDATE SET *, first-match-wins) plus
        WHEN NOT MATCHED INSERT * — parsed by :func:`sql_dml` and
        dispatched to :meth:`SnapshotTable.merge_into`, against a
        snapshot table built from orders. The reference's users wrote
        their workloads as SQL files (``hive/Query1.q`` ff.); this
        closes that surface over the DML verbs.
        tests/test_round16.py pins statement-vs-library clause-order
        parity on the same inputs."""
        import shutil

        from serverless_mapreduce_spark.sources.snapshots import (
            SnapshotTable,
        )

        base = scratch(sf_tag(sf_dir), "snapshot_sql_merge")
        shutil.rmtree(base, ignore_errors=True)
        t = SnapshotTable(base)
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", _cents("o_totalprice").alias("cents")
        )
        t.commit(orders.repartitionByRange(8, "o_custkey"))
        boxed = orders.filter(
            F.col("o_custkey").between(DEL_LO, DEL_HI)
        ).withColumn("cents", F.col("cents") + 7)
        boxed.unionByName(
            boxed.withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000
            )
        ).createOrReplaceTempView("sql_merge_src")
        sql_dml(
            spark,
            """
            MERGE INTO tbl t USING sql_merge_src s
            ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED AND t.cents % 3 = 0 THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            """,
            {"tbl": t},
        )
        return t.read(spark).agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
            F.sum(
                F.when(F.col("o_orderkey") > 10_000_000, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_inserted"),
        )


def _register_widening_query() -> None:
    from pyspark.sql import functions as F

    from serverless_mapreduce_spark.catalog import table
    from serverless_mapreduce_spark.paths import scratch, sf_tag
    from serverless_mapreduce_spark.registry import query
    from serverless_mapreduce_spark.sources.snapshots import (
        PRUNE_HI,
        PRUNE_LO,
        _cents,
    )

    @query(
        "snapshot_type_widening",
        priority=150,
        oracle=f"""
        WITH base AS (
          SELECT o_orderkey, o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders
        ),
        wide AS (
          SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
                 cents * 100000 AS cents
          FROM base WHERE o_custkey BETWEEN {PRUNE_LO} AND {PRUNE_HI}
        ),
        unioned AS (
          SELECT o_orderkey, cents FROM base
          UNION ALL SELECT o_orderkey, cents FROM wide
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents,
               CAST(MAX(cents) AS BIGINT) AS max_cents,
               CAST(SUM(CASE WHEN o_orderkey > 10000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_wide
        FROM unioned
        """,
    )
    def snapshot_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
        """METADATA-ONLY TYPE WIDENING (Delta type widening, SURVEY
        §2.19.9): commit orders with an INT cents column, `ALTER TABLE
        ... ALTER COLUMN cents TYPE bigint` through the SQL front end
        (the audit asserts the file set is IDENTICAL — zero bytes
        moved), then append a batch whose values OVERFLOW int32 (cents
        × 100000 for the custkey box, keys shifted +10M). The aggregate
        proves both directions at once: the old INT32 files read intact
        under the bigint pin, and the beyond-int32 max lands — a wrong
        upcast truncates max_cents, a rewrite-based widen breaks the
        file-identity audit."""
        import shutil

        from serverless_mapreduce_spark.sources.snapshots import (
            SnapshotTable,
        )

        base = scratch(sf_tag(sf_dir), "snapshot_widen")
        shutil.rmtree(base, ignore_errors=True)
        t = SnapshotTable(base)
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            _cents("o_totalprice").cast("int").alias("cents"),
        )
        v1 = t.commit(orders, stats_cols=("cents",))
        files = sorted(t._files(v1))
        v2 = sql_dml(
            spark,
            "ALTER TABLE tbl ALTER COLUMN cents TYPE bigint",
            {"tbl": t},
        )
        if sorted(t._files(v2)) != files:
            raise AssertionError(
                "widen_column_type must be metadata-only: the file set "
                "moved"
            )
        wide = (
            table(spark, sf_dir, "orders")
            .filter(F.col("o_custkey").between(PRUNE_LO, PRUNE_HI))
            .select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_custkey",
                (_cents("o_totalprice") * 100_000).alias("cents"),
            )
        )
        t.commit(wide, stats_cols=("cents",))
        return t.read(spark).agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
            F.max("cents").cast("bigint").alias("max_cents"),
            F.sum(
                F.when(F.col("o_orderkey") > 10_000_000, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_wide"),
        )


def _register_scoped_dml_query() -> None:
    from pyspark.sql import functions as F

    from serverless_mapreduce_spark.catalog import table
    from serverless_mapreduce_spark.paths import scratch, sf_tag
    from serverless_mapreduce_spark.registry import query
    from serverless_mapreduce_spark.sources.snapshots import (
        DEL_HI,
        DEL_LO,
        _cents,
    )

    @query(
        "snapshot_sql_dml_scoped",
        priority=150,
        oracle=f"""
        WITH base AS (
          SELECT o_orderkey, o_custkey, o_orderpriority,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders
        ),
        after_delete AS (
          SELECT * FROM base WHERE NOT (o_orderpriority = '5-LOW')
        ),
        after_update AS (
          SELECT o_orderkey, o_custkey, o_orderpriority,
                 CASE WHEN o_custkey BETWEEN {DEL_LO} AND {DEL_HI}
                      THEN cents + 50 ELSE cents END AS cents
          FROM after_delete
        )
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM after_update GROUP BY o_orderpriority
        """,
    )
    def snapshot_sql_dml_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
        """SCALE-CORRECT-BY-DEFAULT SQL DML (SURVEY §2.19.14): a plain
        ``DELETE FROM t WHERE o_orderpriority = '5-LOW'`` and a plain
        ``UPDATE t SET cents = cents + 50 WHERE o_custkey BETWEEN
        {DEL_LO} AND {DEL_HI}`` through :func:`sql_dml`, with ZERO
        caller hints — the front end derives the partition scope and
        the stats box from the WHERE conjuncts itself. Both audits are
        load-bearing: the delete must leave every non-5-LOW partition
        file path-identical (derived ``partition_eq``), and the update
        must leave every out-of-box file path-identical (derived
        ``prune``); a derivation regression rewrites the table and
        RAISES here before the oracle ever compares values."""
        import shutil

        from serverless_mapreduce_spark.sources.snapshots import (
            SnapshotTable,
        )

        base = scratch(sf_tag(sf_dir), "snapshot_sql_scoped")
        shutil.rmtree(base, ignore_errors=True)
        t = SnapshotTable(base)
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            _cents("o_totalprice").alias("cents"),
        )
        # partition by priority AND range-cluster custkey inside each
        # partition with stats: both derivations have metadata to prove
        # their scopes against
        v1 = t.commit(
            orders.repartitionByRange(8, "o_custkey"),
            partition_by=("o_orderpriority",),
            stats_cols=("o_custkey",),
        )
        keep = {
            e["path"]
            for e in t._data_entries(v1)
            if e.get("partitions", {}).get("o_orderpriority") != "5-LOW"
        }
        v2 = sql_dml(
            spark,
            "DELETE FROM tbl WHERE o_orderpriority = '5-LOW'",
            {"tbl": t},
        )
        after_del = {e["path"] for e in t._data_entries(v2)}
        if not keep <= after_del:
            raise AssertionError(
                "derived partition scope failed: the delete rewrote "
                "files outside the 5-LOW partition"
            )
        out_of_box = {
            e["path"]
            for e in t._data_entries(v2)
            if (rng := e.get("stats", {}).get("o_custkey")) is not None
            and rng[0] is not None
            and (rng[1] < DEL_LO or rng[0] > DEL_HI)
        }
        v3 = sql_dml(
            spark,
            f"UPDATE tbl SET cents = cents + 50 "
            f"WHERE o_custkey BETWEEN {DEL_LO} AND {DEL_HI}",
            {"tbl": t},
        )
        after_up = {e["path"] for e in t._data_entries(v3)}
        if not out_of_box <= after_up:
            raise AssertionError(
                "derived stats box failed: the update rewrote files "
                "outside the custkey box"
            )
        return (
            t.read(spark)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("sum_cents"),
            )
        )


def _register_time_travel_query() -> None:
    from serverless_mapreduce_spark.catalog import table
    from serverless_mapreduce_spark.paths import scratch, sf_tag
    from serverless_mapreduce_spark.registry import query
    from serverless_mapreduce_spark.sources.snapshots import (
        DEL_HI,
        DEL_LO,
        _cents,
    )

    @query(
        "snapshot_sql_time_travel",
        priority=150,
        oracle=f"""
        WITH base AS (
          SELECT o_orderkey, o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders
        ),
        latest AS (
          SELECT * FROM base
          WHERE NOT (o_custkey BETWEEN {DEL_LO} AND {DEL_HI})
        )
        SELECT 'v1' AS probe, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM base
        UNION ALL
        SELECT 'ts_v1' AS probe, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM base
        UNION ALL
        SELECT 'latest' AS probe, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM latest
        """,
    )
    def snapshot_sql_time_travel(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """SQL READ-SIDE TIME TRAVEL (round-16 verdict item 3): the
        whole lifecycle in SQL text — commit orders, ``DELETE`` a
        custkey box through :func:`sql_dml` (derived stats-box scope),
        then ONE ``SELECT`` that reads three states of the table via
        :func:`sql_select`: ``VERSION AS OF`` the pre-delete version,
        ``TIMESTAMP AS OF`` that version's commit wall-clock, and the
        bare latest. The pre-delete probes must both see the deleted
        rows (versioned reads ride the pinned library read path —
        MOR deletes, column mapping, pruning); the latest probe must
        not. Reference analog: the users' interface was SQL files
        (``hive/Query1.q``) — this closes the read side of that
        surface over the snapshot format."""
        import shutil

        from serverless_mapreduce_spark.sources.snapshots import (
            SnapshotTable,
        )

        base = scratch(sf_tag(sf_dir), "snapshot_sql_tt")
        shutil.rmtree(base, ignore_errors=True)
        t = SnapshotTable(base)
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", _cents("o_totalprice").alias("cents")
        )
        v1 = t.commit(
            orders.repartitionByRange(8, "o_custkey"),
            stats_cols=("o_custkey",),
        )
        v1_ts = t._manifest_body(v1)["ts"]
        sql_dml(
            spark,
            f"DELETE FROM tbl WHERE o_custkey BETWEEN {DEL_LO} "
            f"AND {DEL_HI}",
            {"tbl": t},
        )
        # the ts probe must deterministically resolve v1 (commit clocks
        # are µs floats clamped monotonic; fail loudly, not mismatch)
        if t.resolve_as_of(v1_ts) != v1:
            raise AssertionError(
                "v1 commit timestamp no longer resolves to v1"
            )
        return sql_dml(
            spark,
            f"""
            SELECT 'v1' AS probe, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents
            FROM tbl VERSION AS OF {v1}
            UNION ALL
            SELECT 'ts_v1' AS probe, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents
            FROM tbl TIMESTAMP AS OF {v1_ts!r}
            UNION ALL
            SELECT 'latest' AS probe, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents
            FROM tbl
            """,
            {"tbl": t},
        )


_register_query()
_register_widening_query()
_register_scoped_dml_query()
_register_time_travel_query()
