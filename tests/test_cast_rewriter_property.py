"""Property-based tests (hypothesis) for the oracle DOUBLE-cast rewriter.

``registry._portable_double_casts`` runs over EVERY oracle SQL string at
registration time; a rewrite bug would silently skew all 193 differential
comparisons, so its invariants get generated coverage, not just examples:

  1. idempotent — rewriting a rewritten string changes nothing;
  2. complete — no bare ``CAST(x AS DOUBLE)`` survives (every one gains the
     ``AS VARCHAR`` inner hop), at any nesting depth;
  3. conservative — strings without a DOUBLE cast pass through unchanged,
     and non-DOUBLE casts are never touched;
  4. structure-preserving — stripping both cast wrappers recovers the
     original inner expressions (nothing is lost or duplicated).
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from datafusion_distributed_spark.operators.registry import _portable_double_casts

# -- expression generator: SQL-ish fragments with nested casts ---------------

_atom = st.sampled_from(
    ["x", "t.col", "1.5", "SUM(v)", "a + b", "len(w)", "f(g(y), 2)"]
)

_types = st.sampled_from(["DOUBLE", "BIGINT", "INTEGER", "VARCHAR", "DECIMAL(14,2)"])


def _exprs(children):
    wrap = st.sampled_from(["CAST({e} AS {t})", "({e})", "h({e}, {e2})", "{e} / {e2}"])

    def build(w, e, e2, t):
        return w.format(e=e, e2=e2, t=t)

    return st.builds(build, wrap, children, children, _types)


sql_exprs = st.recursive(_atom, _exprs, max_leaves=8)


def _bare_double_casts(s: str) -> list[str]:
    """Find CAST( ... AS DOUBLE) whose inner expr does NOT end in AS VARCHAR)."""
    found = []
    upper = s.upper()
    i = 0
    while True:
        i = upper.find("CAST(", i)
        if i < 0:
            return found
        depth, k = 0, i + 4
        while k < len(s):
            if s[k] == "(":
                depth += 1
            elif s[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        inner = s[i + 5 : k]
        m = re.match(r"(?is)^(.*\S)\s+AS\s+DOUBLE\s*$", inner)
        if m and not re.search(r"(?is)AS\s+VARCHAR\s*\)\s*$", m.group(1)):
            found.append(inner)
        i += 5


@settings(max_examples=300, deadline=None)
@given(sql_exprs)
def test_rewrite_is_idempotent(expr):
    once = _portable_double_casts(expr)
    assert _portable_double_casts(once) == once


@settings(max_examples=300, deadline=None)
@given(sql_exprs)
def test_no_bare_double_cast_survives(expr):
    assert _bare_double_casts(_portable_double_casts(expr)) == []


@settings(max_examples=300, deadline=None)
@given(sql_exprs)
def test_strings_without_double_casts_unchanged(expr):
    if not _bare_double_casts(expr):
        assert _portable_double_casts(expr) == expr


def _matching_paren(s: str, open_idx: int) -> int:
    """Index of the ')' closing the '(' at open_idx, or -1."""
    depth = 0
    for k in range(open_idx, len(s)):
        if s[k] == "(":
            depth += 1
        elif s[k] == ")":
            depth -= 1
            if depth == 0:
                return k
    return -1


def _collapse_hops(s: str) -> str:
    """Rewrite every CAST(CAST(e AS VARCHAR) AS DOUBLE) -> CAST(e AS DOUBLE),
    innermost-first, with real paren balancing (a regex .*? here can span
    across sibling arguments — hypothesis found exactly that)."""
    while True:
        upper = s.upper()
        changed = False
        i = 0
        while True:
            i = upper.find("CAST(CAST(", i)
            if i < 0:
                break
            inner_open = i + 9  # the second '('
            inner_close = _matching_paren(s, inner_open)
            outer_close = _matching_paren(s, i + 4)
            if inner_close < 0 or outer_close < 0:
                i += 1
                continue
            inner_body = s[inner_open + 1 : inner_close]
            between = s[inner_close + 1 : outer_close]
            m = re.match(r"(?is)^(.*\S)\s+AS\s+VARCHAR\s*$", inner_body)
            if m and re.match(r"(?is)^\s*AS\s+DOUBLE\s*$", between):
                s = s[:i] + f"CAST({m.group(1)} AS DOUBLE)" + s[outer_close + 1 :]
                changed = True
                break
            i += 1
        if not changed:
            return s


@settings(max_examples=300, deadline=None)
@given(sql_exprs)
def test_varchar_hop_is_reversible(expr):
    """Collapsing VARCHAR hops maps the rewritten string to the SAME normal
    form as the input — the rewrite adds exactly the one wrapper and nothing
    else. (Comparing normal forms, not raw input: an input that already
    contains the portable CAST(CAST(x AS VARCHAR) AS DOUBLE) spelling is
    deliberately left untouched by the rewriter, so collapsing the input is
    the fair baseline — a flaw in this test's first version that hypothesis
    itself found.)"""
    assert _collapse_hops(_portable_double_casts(expr)) == _collapse_hops(expr)


def test_known_examples():
    f = _portable_double_casts
    assert f("CAST(x AS DOUBLE)") == "CAST(CAST(x AS VARCHAR) AS DOUBLE)"
    assert f("CAST(x AS BIGINT)") == "CAST(x AS BIGINT)"
    assert (
        f("CAST(SUM(CAST(v AS DECIMAL(14,2))) AS DOUBLE)")
        == "CAST(CAST(SUM(CAST(v AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE)"
    )
    # already-portable casts are left alone
    assert f("CAST(CAST(x AS VARCHAR) AS DOUBLE)") == "CAST(CAST(x AS VARCHAR) AS DOUBLE)"
