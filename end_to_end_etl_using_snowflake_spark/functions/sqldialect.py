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
handles ONE top-level SELECT ... QUALIFY (parens and string literals
are respected when locating the top-level FROM / QUALIFY keywords);
set operations or stacked QUALIFYs should be pre-split by the caller.
"""

from __future__ import annotations

import re

_WORD = re.compile(r"[A-Za-z_]+")


def _top_level_keyword(sql: str, keyword: str, start: int = 0) -> int:
    """Index of the first top-level (paren-depth-0, outside string
    literals) occurrence of ``keyword``; -1 if absent."""
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
        elif c == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 1
            i += 1
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
    pred = sql[q + len("QUALIFY"):].strip()
    return (
        "SELECT * EXCEPT (__qualify) FROM ("
        f"SELECT {select_list}, ({pred}) AS __qualify {rest}"
        ") WHERE __qualify"
    )
