"""Hypothesis property tests for the SQL span masker (round 13): for
arbitrary statements built from quotes, backticks, comments, keywords,
and identifiers, mask→restore is BYTE-EXACT, and no maskable span's
content (string literals, comments, backticked identifiers) survives
into the masked text where the FROM/JOIN rewrite could fire on it."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_job_spark.sql import _mask_sql_spans, _restore_sql_spans

# SQL-ish fragment soup: heavy on the characters that drive the
# scanner's state machine (quotes, doubled-quote escapes, backticks,
# comment openers/closers, newlines) mixed with keywords and names.
fragment = st.sampled_from(
    [
        "SELECT ", "FROM sales ", "JOIN t ", "WHERE ", "x = ", "AND ",
        "'from sales'", "'it''s'", '"double from"', "''", "`from`",
        "`weird name`", "-- FROM sales", "/* JOIN x */", "/*", "*/",
        "--", "\n", " ", "`", "'", '"', "abc", "123", ",", "(", ")",
        "VERSION AS OF 3 ", "TIMESTAMP AS OF '2024-01-01' ",
        # backslash escapes — Spark's default lexer honors \' inside a
        # literal (VERDICT r13 Wrong #1): raw fragments that stress the
        # escape branch, including span-crossing shapes
        "'a\\'b'", "\\", "\\'", "'x\\'' FROM mart '", "'\\\\'",
        "'tail\\", '"d\\"q"',
        # script-splitter food: semicolons in every span kind
        ";", "'a;b'", "`w;x`", "-- c;d", ";;",
    ]
)
statement = st.lists(fragment, min_size=0, max_size=25).map("".join)


@settings(max_examples=300, deadline=None)
@given(statement)
def test_mask_restore_roundtrip_is_byte_exact(s):
    masked, spans = _mask_sql_spans(s)
    assert _restore_sql_spans(masked, spans) == s


@settings(max_examples=300, deadline=None)
@given(statement)
def test_masked_text_exposes_no_span_content(s):
    masked, spans = _mask_sql_spans(s)
    # quote characters are consumed into spans unconditionally, so the
    # FROM/JOIN rewrite can never fire on string-literal content (the
    # airtight half; comment openers can reappear by JUXTAPOSITION of
    # stray '*/' fragments that are syntax errors in real SQL — e.g.
    # '*/*/' — so comments are covered by the deterministic tests and
    # the left-to-right scan order, not a substring claim here)
    assert "'" not in masked
    assert '"' not in masked
    # '--' cannot survive a left-to-right scan (the first '-' of any
    # adjacent pair opens a comment span) and placeholders contain no
    # '-', so no comment-to-EOL content is exposed either
    assert "--" not in re.sub("\x00L\\d+\x00", "", masked)


@settings(max_examples=300, deadline=None)
@given(statement)
def test_placeholders_are_well_formed_and_ordered(s):
    masked, spans = _mask_sql_spans(s)
    toks = re.findall("\x00L(\\d+)\x00", masked)
    assert [int(t) for t in toks] == list(range(len(spans)))
    # restoration consumes every token: nothing dangles
    assert "\x00" not in _restore_sql_spans(masked, spans)


# -- round 14: the OTHER quote-aware scanners property-tested against
# the masker oracle (VERDICT r13 nit: _scan_top / _split_script /
# statement_table predate the backslash fix and share its alphabet)

from etl_job_spark.sql import _scan_top, _split_script, statement_table


def _outside_span_positions(s: str) -> set[int]:
    """Original-string indices NOT inside ANY masked span (string
    literal, comment, backticked-identifier content), derived from the
    masker — whose span boundaries are themselves property-tested
    byte-exact above. Since r14 every scanner skips all three span
    kinds, so a keyword hit must land strictly in plain text."""
    masked, spans = _mask_sql_spans(s)
    outside: set[int] = set()
    i = 0  # original index
    j = 0  # masked index
    while j < len(masked):
        m = re.match("\x00L(\\d+)\x00", masked[j:])
        if m:
            i += len(spans[int(m.group(1))])
            j += m.end()
        else:
            outside.add(i)
            i += 1
            j += 1
    return outside


@settings(max_examples=300, deadline=None)
@given(statement)
def test_scan_top_never_hits_inside_any_span(s):
    outside = _outside_span_positions(s)
    for kw in ("FROM", "WHERE", "AND", "SET"):
        at = _scan_top(s, kw)
        if at >= 0:
            assert at in outside, (s, kw, at)
            assert s[at:at + len(kw)].upper() == kw


@settings(max_examples=300, deadline=None)
@given(statement)
def test_split_script_agrees_with_the_mask_oracle(s):
    # the split points must be exactly the masked text's semicolons —
    # never inside a literal, backticked name, or comment (r14: the
    # splitter gained backtick/comment awareness to match the masker);
    # leading comments are stripped from each part, so the oracle
    # re-derives each part's text and applies the same strip
    def _strip(p: str) -> str:
        prev = None
        while prev != p:
            prev = p
            p = re.sub(r"(?s)^\s*--[^\n]*(\n|$)", "", p)
            p = re.sub(r"(?s)^\s*/\*.*?\*/", "", p)
        return p.strip()

    masked, spans = _mask_sql_spans(s)
    expect = [
        p
        for p in (
            _strip(_restore_sql_spans(c, spans)) for c in masked.split(";")
        )
        if p
    ]
    assert _split_script(s) == expect


def test_statement_table_with_backslash_literals():
    assert statement_table(r"UPDATE mart SET v = 'don\'t' WHERE k = 1") == "mart"
    assert statement_table(r"DELETE FROM mart WHERE v = 'a\';b'") == "mart"


from etl_job_spark.sql import _split_assignments


# assignment-shaped soup: identifiers, '=', commas, parens, and the
# same escape-heavy literal fragments
assign_fragment = st.sampled_from(
    [
        "a = 1", "b = 'x,y'", "c = 'don\\'t, stop'", "d = f(1, 2)",
        "e = 'it''s'", ", ", "g = ", "'lit,eral'", "(", ")", "h2",
        " = ", "\\", "+", "nested(f(x), ',')",
    ]
)
assignment_text = st.lists(
    assign_fragment, min_size=1, max_size=8
).map("".join)


@settings(max_examples=300, deadline=None)
@given(assignment_text)
def test_split_assignments_commas_respect_spans(s):
    """Whenever _split_assignments parses, the split points must be
    depth-0 commas OUTSIDE masked spans: rejoining the items with ','
    must reproduce the input, and each item's comma count must equal
    its masked form's comma count at depth 0 (no split inside a
    literal; the masker is the oracle)."""
    try:
        got = _split_assignments(s)
    except ValueError:
        return  # refusal is always allowed — only SPLITS are checked
    # when it parses, every item is one distinct column (duplicate
    # assignments refuse — pinned below), so the number of items must
    # equal depth-0 outside-span commas + 1: no split inside a
    # literal, no missed split outside one (the masker is the oracle)
    masked, spans = _mask_sql_spans(s)
    depth = 0
    commas = 0
    for c in masked:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            commas += 1
    assert commas == len(got) - 1, (s, got)


def test_split_assignments_refuses_duplicate_columns():
    import pytest

    with pytest.raises(ValueError, match="more than once"):
        _split_assignments("a = 1, a = 2")
