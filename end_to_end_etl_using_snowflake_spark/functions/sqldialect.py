"""Snowflake-dialect SQL shims.

The reference's queries are written in Snowflake SQL. Most of that
dialect is ANSI and runs through ``spark.sql`` unchanged (sql1-sql4
prove the shared-text surface); the one construct the reference
idiom leans on that OSS Spark's parser rejects is ``QUALIFY`` —
Snowflake's post-window filter (the standard way to write
latest-per-key: ``QUALIFY row_number() OVER (...) = 1``,
item-end-to-end-pipeline-script.sql:72-75 expresses exactly this
with a subquery).

``rewrite_qualify`` lowers a QUALIFY query to the ANSI subquery form
Spark executes:

    SELECT <list> FROM <rest> QUALIFY <pred>
      ->
    SELECT * EXCEPT (__qualify)
    FROM (SELECT <list>, (<pred>) AS __qualify FROM <rest>)
    WHERE __qualify

The rewrite is purely textual and deliberately conservative: it
handles ONE top-level SELECT ... QUALIFY [ORDER BY ...] [LIMIT n]
(parens, string literals, ``"quoted"`` identifiers and ``--``/``/*``
comments are respected when locating top-level keywords; a trailing
ORDER BY / LIMIT re-attaches OUTSIDE the subquery, matching
Snowflake's QUALIFY-before-ORDER-BY evaluation order); set operations
or stacked QUALIFYs should be pre-split by the caller.
"""

from __future__ import annotations

import re

_WORD = re.compile(r"[A-Za-z_]+")


def _top_level_keyword(sql: str, keyword: str, start: int = 0) -> int:
    """Index of the first top-level (paren-depth-0, outside string
    literals, ``"quoted"`` identifiers, and ``--``/``/* */`` comments)
    occurrence of ``keyword``; -1 if absent."""
    depth = 0
    i = start
    kw = keyword.upper()
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "(":
            depth += 1
            i += 1
        elif c == ")":
            depth -= 1
            i += 1
        elif c == "'" or c == '"':
            quote = c
            i += 1
            while i < n and sql[i] != quote:
                i += 1
            i += 1
        elif c == "-" and sql[i : i + 2] == "--":
            i = sql.find("\n", i)
            if i < 0:
                return -1
        elif c == "/" and sql[i : i + 2] == "/*":
            end = sql.find("*/", i + 2)
            if end < 0:
                return -1
            i = end + 2
        elif c.isalpha() or c == "_":
            m = _WORD.match(sql, i)
            word = m.group(0)
            if depth == 0 and word.upper() == kw:
                return i
            i = m.end()
        else:
            i += 1
    return -1


def rewrite_qualify(sql: str) -> str:
    """Lower a single top-level ``QUALIFY`` to the ANSI subquery form;
    returns the input unchanged when no top-level QUALIFY exists."""
    q = _top_level_keyword(sql, "QUALIFY")
    if q < 0:
        return sql
    sel = _top_level_keyword(sql, "SELECT")
    frm = _top_level_keyword(sql, "FROM", start=sel)
    if sel < 0 or frm < 0 or not (sel < frm < q):
        raise ValueError("unsupported QUALIFY query shape (need SELECT ... FROM ... QUALIFY ...)")
    select_list = sql[sel + len("SELECT"):frm].strip()
    rest = sql[frm:q].strip()
    # A trailing top-level ORDER BY / LIMIT belongs to the OUTER query
    # (Snowflake applies QUALIFY before ORDER BY/LIMIT): split it off
    # the predicate and re-attach it outside the subquery.
    after = q + len("QUALIFY")
    tail_at = len(sql)
    for kw in ("ORDER", "LIMIT"):
        k = _top_level_keyword(sql, kw, start=after)
        if 0 <= k < tail_at:
            tail_at = k
    pred = sql[after:tail_at].strip().rstrip(";").strip()
    tail = sql[tail_at:].strip().rstrip(";").strip()
    if not pred:
        raise ValueError("QUALIFY with empty predicate")
    return (
        "SELECT * EXCEPT (__qualify) FROM ("
        f"SELECT {select_list}, ({pred}) AS __qualify {rest}"
        ") WHERE __qualify"
        + (f" {tail}" if tail else "")
    )


def _balanced_span(sql: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at ``open_idx``
    (string-literal aware)."""
    depth = 0
    i = open_idx
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        elif c == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 1
        i += 1
    raise ValueError("unbalanced parentheses in FLATTEN call")


_FLATTEN_HEAD = re.compile(r",?\s*LATERAL\s+FLATTEN\s*\(", re.IGNORECASE)
_FLATTEN_ALIAS = re.compile(r"\s*(?:AS\s+)?([A-Za-z_][A-Za-z_0-9]*)")


def _split_top_level_commas(text: str) -> list[str]:
    """Split on commas at paren depth 0, skipping string literals."""
    parts: list[str] = []
    depth = 0
    start = 0
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "'":
            i += 1
            while i < n and text[i] != "'":
                i += 1
        elif c == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
        i += 1
    parts.append(text[start:])
    return parts


def _parse_flatten_args(inner: str) -> tuple[str, bool, str]:
    """Parse FLATTEN's named arguments into (input_expr, outer, mode).

    Snowflake FLATTEN takes named args (INPUT, PATH, OUTER, RECURSIVE,
    MODE). Arguments are split on TOP-LEVEL commas and dispatched by
    NAME — so ``outer => true`` after ``input =>`` is seen (it used to
    slip past a before-the-first-'=>' scan), and an input expression
    that merely mentions a column like ``recursive_depth`` is NOT
    misread as the RECURSIVE mode (ADVICE r5). ``mode`` accepts
    'ARRAY' (default) and 'OBJECT'; RECURSIVE and PATH refuse."""
    input_expr: str | None = None
    outer = False
    mode = "ARRAY"
    for part in _split_top_level_commas(inner):
        part = part.strip()
        if not part:
            continue
        arrow = part.find("=>")
        if arrow < 0:
            raise ValueError(
                "FLATTEN requires named arguments (input => <expr>"
                f" [, outer => true]); got positional: {part!r}"
            )
        name = part[:arrow].strip().lower()
        value = part[arrow + 2:].strip()
        if name == "input":
            input_expr = value
        elif name == "outer":
            flag = value.rstrip(";").strip().lower()
            if flag not in {"true", "false"}:
                raise ValueError(f"FLATTEN OUTER expects TRUE/FALSE, got: {value!r}")
            outer = flag == "true"
        elif name == "mode":
            m = value.rstrip(";").strip().strip("'\"").upper()
            if m not in {"ARRAY", "OBJECT"}:
                raise ValueError(
                    f"FLATTEN MODE supports 'ARRAY'/'OBJECT', got: {value!r}"
                )
            mode = m
        elif name in {"recursive", "path"}:
            raise ValueError(
                f"FLATTEN {name.upper()} mode is not supported by this shim"
            )
        else:
            raise ValueError(f"unknown FLATTEN argument: {name!r}")
    if input_expr is None:
        raise ValueError("FLATTEN requires the input => <expr> form")
    return input_expr, outer, mode


def rewrite_flatten(sql: str) -> str:
    """Lower Snowflake ``[,] LATERAL FLATTEN(input => <array expr>[,
    outer => true]) f`` to Spark's ``LATERAL VIEW [OUTER]
    posexplode(<expr>) f AS index, value``.

    The lowered alias exposes the two FLATTEN output columns this
    surface supports — ``f.index`` (0-based position, matching
    Snowflake) and ``f.value`` — which is the portion of FLATTEN's
    (SEQ, KEY, PATH, INDEX, VALUE, THIS) row the array-input form
    meaningfully populates. ``OUTER => TRUE`` maps to ``LATERAL VIEW
    OUTER``: both engines emit one (NULL index, NULL value) row for an
    empty or NULL array, which is Snowflake's left-join-like contract.
    ``MODE => 'OBJECT'`` flattens a flat JSON object into (key, value)
    rows via ``explode(from_json(..., 'map<string,string>'))``;
    RECURSIVE and PATH raise rather than mistranslate. Arguments are
    parsed as name => value
    pairs split on top-level commas, so flag detection keys on
    argument NAMES, never substrings of the input expression. Every
    occurrence is rewritten; the comma Snowflake places before LATERAL
    is dropped (Spark's LATERAL VIEW is clause syntax, not a join
    item).
    """
    out = sql
    while True:
        m = _FLATTEN_HEAD.search(out)
        if m is None:
            return out
        open_idx = out.index("(", m.start() + out[m.start():m.end()].upper().find("FLATTEN"))
        close = _balanced_span(out, open_idx)
        inner = out[open_idx + 1:close - 1].strip()
        expr, outer, mode = _parse_flatten_args(inner)
        am = _FLATTEN_ALIAS.match(out, close)
        if am is None or am.group(1).upper() in {
            "WHERE", "GROUP", "ORDER", "LIMIT", "HAVING", "QUALIFY",
            "JOIN", "LEFT", "RIGHT", "INNER", "CROSS", "ON", "UNION",
        }:
            raise ValueError("FLATTEN requires a table alias")
        alias = am.group(1)
        view = "LATERAL VIEW OUTER" if outer else "LATERAL VIEW"
        if mode == "OBJECT":
            # Snowflake's OBJECT flatten emits (KEY, VALUE) per field.
            # Lowering: parse the JSON text as a string map and explode
            # it — scalar values render identically to Snowflake/DuckDB
            # text extraction ('69', 'x', '1.5', 'true', NULL). Flat
            # objects only: a NESTED object value is out of contract
            # (from_json's string map nulls it where VARIANT engines
            # return the subtree text).
            replacement = (
                f" {view} explode(from_json({expr}, 'map<string,string>'))"
                f" {alias} AS key, value"
            )
        else:
            replacement = f" {view} posexplode({expr}) {alias} AS index, value"
        out = out[:m.start()] + replacement + out[am.end():]
