"""Presto → Spark SQL dialect rewriter (textual, function-call aware).

A user pasting Presto SQL hits a handful of names Spark either lacks or
gives different default semantics (``pm/metadata/
BuiltInFunctionNamespaceManager.java:433-700`` is the reference's registry).
Most compat names are installed as SQL temp functions / UDFs
(:mod:`functions.presto`); the names handled HERE are the ones a temp
function cannot express:

* aggregates (``approx_distinct`` → ``approx_count_distinct``) — Spark's
  ``CREATE TEMPORARY FUNCTION`` is scalar-only;
* arity-dependent defaults (Presto 2-arg ``regexp_extract_all(s, p)``
  returns FULL matches = Spark's explicit group 0, while Spark's 2-arg
  default is group 1) — needs argument counting, not name substitution.

The rewriter is deliberately conservative: it tokenizes string literals,
quoted identifiers and comments so rewrites never fire inside them, and it
only touches calls of the registered names. ``TRY(expr)`` has NO generic
Spark equivalent (Presto ``pm/sql/relational/`` special form): use Spark's
``try_cast`` / ``try_add`` / ``try_subtract`` / ``try_multiply`` /
``try_divide`` / ``try_element_at`` / ``try_to_timestamp`` per operation
(tested in tests/test_presto_sql.py); the rewriter raises a clear error
when it sees TRY( so the user gets guidance instead of a resolution error.
"""

from __future__ import annotations

import re

# name (lowercased) -> replacement name. Applied at any arity.
RENAMES: dict[str, str] = {
    "approx_distinct": "approx_count_distinct",
}

# name -> {arity: trailing args to append}. Fires only at the given arity.
ARITY_DEFAULTS: dict[str, dict[int, str]] = {
    # Presto's 2-arg form returns full matches (group 0); Spark defaults
    # to group 1. RegexpFunctions.java regexp_extract_all.
    "regexp_extract_all": {2: ", 0"},
    # Presto's 2-arg regexp_extract is also full-match.
    "regexp_extract": {2: ", 0"},
}

_TOKEN = re.compile(
    r"""
      '(?:[^']|'')*'            # SQL string literal ('' escape)
    | "(?:[^"]|"")*"            # quoted identifier
    | `(?:[^`]|``)*`            # backtick identifier
    | --[^\n]*                  # line comment
    | /\*.*?\*/                 # block comment
    | [A-Za-z_][A-Za-z0-9_]*    # identifier / keyword
    | .                         # anything else (single char)
    """,
    re.VERBOSE | re.DOTALL,
)


def _top_level_commas(tokens: list[str], open_idx: int) -> tuple[int, int]:
    """From tokens[open_idx] == '(' find the matching ')' and count
    top-level commas. Returns (close_idx, n_commas)."""
    depth = 0
    commas = 0
    for i in range(open_idx, len(tokens)):
        t = tokens[i]
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
            if depth == 0:
                return i, commas
        elif t == "," and depth == 1:
            commas += 1
    raise ValueError("unbalanced parentheses in SQL text")


# A double-quoted token that is identifier-shaped. Presto double quotes are
# ALWAYS identifiers (SqlBase.g4 quotedIdentifier); Spark (ANSI off) reads
# them as string literals — the single biggest paste-blocker for reference
# SQL like "dt"."d_year". Only identifier-shaped content is rewritten, so a
# genuinely-Spark string literal like "yyyy-MM-dd'T'HH" (non-identifier
# chars) is left alone.
_IDENTISH = re.compile(r'^"[A-Za-z_][A-Za-z0-9_]*"$')


def rewrite_presto_sql(query: str) -> str:
    """Rewrite the Presto-only spellings above into Spark SQL."""
    tokens = _TOKEN.findall(query)
    out: list[str] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        low = t.lower()
        if t.startswith('"') and _IDENTISH.match(t):
            out.append("`" + t[1:-1] + "`")
            i += 1
            continue
        # next non-space token must be '(' for this to be a call
        j = i + 1
        while j < len(tokens) and tokens[j].isspace():
            j += 1
        is_call = j < len(tokens) and tokens[j] == "("
        if is_call and low == "try":
            raise ValueError(
                "Presto TRY(expr) has no generic Spark equivalent; use the "
                "operation-specific try_* function (try_cast, try_add, "
                "try_subtract, try_multiply, try_divide, try_element_at, "
                "try_to_timestamp) for the failing sub-expression."
            )
        if is_call and low in RENAMES:
            out.append(RENAMES[low])
            i += 1
            continue
        if is_call and low in ARITY_DEFAULTS:
            close, commas = _top_level_commas(tokens, j)
            extra = ARITY_DEFAULTS[low].get(commas + 1)
            if extra is not None:
                tokens[close] = extra + ")"
        out.append(t)
        i += 1
    return "".join(out)
