"""Delimiter analyzer CSV-quote semantics
(delimited_token_stream.cpp:37-87)."""

from iresearch_spark.analysis.analyzers import get_analyzer


def _terms(text, **opts):
    return get_analyzer("delimiter", **opts).analyze(text)[0]


def test_quoted_delimiter_not_split():
    assert _terms('a,"b,c",d') == ["a", "b,c", "d"]


def test_escaped_quotes_unescape():
    assert _terms('"a""b",c') == ['a"b', "c"]


def test_midfield_quote_opens_quoting():
    # reference find_delimiter: ANY unquoted '"' starts a quoted
    # section, so the comma is protected; eval_term then returns the
    # field verbatim (does not start with '"')
    assert _terms('a"b,c') == ['a"b,c']


def test_mismatched_quote_identity():
    assert _terms('"ab,c') == ['"ab,c']  # unterminated quote swallows delim


def test_multichar_delimiter():
    assert _terms('a::"b::c"::d', delimiter="::") == ["a", "b::c", "d"]


def test_empty_fields_dropped_by_chain():
    assert _terms("a,,b") == ["a", "b"]
