"""Planner rewrite unit tests (reference boolean_filter.cpp rewrites,
SURVEY §4.1)."""

from iresearch_spark.search import ast
from iresearch_spark.search.planner import normalize


def T(t, **kw):
    return ast.Term(t, **kw)


def test_double_negation():
    assert normalize(ast.Not(ast.Not(T("x")))) == T("x")


def test_empty_propagation():
    assert isinstance(
        normalize(ast.And([T("x"), ast.Empty()])), ast.Empty
    )
    assert normalize(ast.Or([T("x"), ast.Empty()])) == T("x")
    assert isinstance(normalize(ast.Or([ast.Empty()])), ast.Empty)


def test_single_child_flattening():
    assert normalize(ast.And([T("x")])) == T("x")
    assert normalize(ast.Or([T("x")])) == T("x")


def test_boost_folds_on_flatten():
    out = normalize(ast.And([T("x", boost=2.0)], boost=3.0))
    assert out == T("x", boost=6.0)


def test_min_match_specialization():
    # n == min_match -> And
    out = normalize(ast.Or([T("a"), T("b")], min_match=2))
    assert isinstance(out, ast.And)
    # min_match > n -> Empty
    assert isinstance(
        normalize(ast.Or([T("a")], min_match=3)), ast.Empty
    )


def test_all_absorption():
    # mixed group keeps AllDocs (its constant boost adds to the score)
    out = normalize(ast.And([ast.AllDocs(), T("x")]))
    assert isinstance(out, ast.And) and len(out.children) == 2
    out = normalize(ast.And([ast.AllDocs(boost=2.0), ast.AllDocs(boost=3.0)]))
    assert isinstance(out, ast.AllDocs) and out.boost == 5.0


def test_pure_negation_group():
    out = normalize(ast.And([ast.Not(T("x"))]))
    assert isinstance(out, ast.And)
    kinds = {type(c) for c in out.children}
    assert ast.AllDocs in kinds and ast.Not in kinds


def test_singleton_terms_and_phrase():
    assert normalize(ast.Terms(["x"])) == T("x")
    assert normalize(ast.Phrase(["x"])) == T("x")
