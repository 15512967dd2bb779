"""Lucene-style query-string parser: golden parse trees, error cases,
and end-to-end equivalence with the programmatic AST on a real index."""

import random

import pytest

from iresearch_spark.index.builder import build_index
from iresearch_spark.search import (
    And,
    Field,
    Fuzzy,
    Not,
    Or,
    Phrase,
    Prefix,
    Range,
    SearchEngine,
    Should,
    Term,
    Wildcard,
)
from iresearch_spark.search.querystring import QueryParseError, parse_query


# ---------- parse-tree goldens ----------

def test_bare_terms_default_or():
    assert parse_query("Hello World") == Or((Term("hello"), Term("world")))
    assert parse_query("hello world", default_operator="and") == And(
        (Term("hello"), Term("world"))
    )
    assert parse_query("single") == Term("single")


def test_boolean_operators_and_precedence():
    # NOT > AND > OR
    assert parse_query("a AND b OR c") == Or(
        (And((Term("a"), Term("b"))), Term("c"))
    )
    assert parse_query("a OR b AND c") == Or(
        (Term("a"), And((Term("b"), Term("c"))))
    )
    assert parse_query("a AND NOT b") == And((Term("a"), Not(Term("b"))))
    assert parse_query("a OR NOT b") == Or((Term("a"), Not(Term("b"))))
    assert parse_query("(a OR b) AND c") == And(
        (Or((Term("a"), Term("b"))), Term("c"))
    )


def test_occurs_flags():
    # Lucene BooleanQuery: with a MUST present, bare clauses stay
    # OPTIONAL (score-only) — Should wrapper, not a required child
    assert parse_query("+a b -c") == And(
        (Term("a"), Should(Term("b")), Not(Term("c")))
    )
    assert parse_query("+a b c") == And(
        (Term("a"), Should(Or((Term("b"), Term("c")))))
    )
    # no MUSTs: shoulds require >=1 match, as before
    assert parse_query("a b -c") == And(
        (Or((Term("a"), Term("b"))), Not(Term("c")))
    )
    assert parse_query("+a") == Term("a")


def test_float_fuzzy_and_unclosed_range():
    import pytest

    from iresearch_spark.search.querystring import QueryParseError

    # legacy float similarity maps via floatToEdits: (1-0.8)*5 = 1
    assert parse_query("apple~0.8") == Fuzzy("apple", distance=1)
    assert parse_query("apple~0.99") == Fuzzy("apple", distance=0)
    assert parse_query("apple~0.0") == Fuzzy("apple", distance=2)  # capped
    with pytest.raises(QueryParseError):
        parse_query("apple~1.5")
    with pytest.raises(QueryParseError):
        parse_query("a AND [b TO")
    with pytest.raises(QueryParseError):
        parse_query("{open AND more")


def test_phrase_wildcard_prefix_fuzzy_range():
    assert parse_query('"quick brown fox"') == Phrase(
        ("quick", "brown", "fox")
    )
    assert parse_query('"Single"') == Term("single")
    assert parse_query("quick*") == Prefix("quick")
    assert parse_query("qu*ck") == Wildcard("qu%ck")
    assert parse_query("qu?ck*") == Wildcard("qu_ck%")
    assert parse_query("fuzzy~1") == Fuzzy("fuzzy", distance=1)
    assert parse_query("fuzzy~") == Fuzzy("fuzzy", distance=2)
    assert parse_query("[aaa TO bbb]") == Range(
        min_term="aaa", max_term="bbb"
    )
    assert parse_query("{aaa TO bbb]") == Range(
        min_term="aaa", max_term="bbb", include_min=False
    )
    assert parse_query("[* TO bbb}") == Range(
        min_term=None, max_term="bbb", include_max=False
    )


def test_boost_and_field():
    assert parse_query("a^2.5") == Term("a", boost=2.5)
    assert parse_query("a^2 AND b") == And((Term("a", boost=2.0), Term("b")))
    assert parse_query('"a b"^3') == Phrase(("a", "b"), boost=3.0)
    assert parse_query("title:a") == Field("title", Term("a"))
    assert parse_query("title:(a b)") == Field(
        "title", Or((Term("a"), Term("b")))
    )
    # the boost binds to the innermost clause (score-equivalent)
    assert parse_query("title:a^2") == Field("title", Term("a", boost=2.0))


def test_escapes():
    assert parse_query(r"foo\*bar") == Term("foo*bar")
    assert parse_query(r"foo\*bar*") == Prefix("foo*bar")
    # trailing-* with a literal % stays a (literal) Prefix…
    assert parse_query("a%b*") == Prefix("a%b")
    # …while a true wildcard pattern escapes % and _ for the engine
    assert parse_query("a%b*c") == Wildcard(r"a\%b%c")
    assert parse_query("a_b?c") == Wildcard(r"a\_b_c")
    assert parse_query(r'"say \"hi\""') == Phrase(("say", '"hi"'))


def test_errors():
    for bad in (
        "",
        "   ",
        "NOT a",          # pure negative root
        "-a",             # pure negative group
        "(a OR b",        # unbalanced
        '"a b"~2',        # phrase slop unsupported
        "a AND",          # dangling operator
    ):
        with pytest.raises(QueryParseError):
            parse_query(bad)


def test_custom_analyzer():
    node = parse_query(
        "Running", analyzer=lambda t: t.lower().removesuffix("ning")
    )
    assert node == Term("run")


# ---------- end-to-end equivalence on a real index ----------

VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "spark", "index", "search", "engine",
]


@pytest.fixture(scope="module")
def engine(spark):
    rng = random.Random(5)
    rows = [
        (i, " ".join(rng.choices(VOCAB, k=rng.randint(5, 30))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, id_col="doc_id", text_col="text")
    return SearchEngine(idx)


@pytest.mark.parametrize(
    "qs,ast",
    [
        ("quick AND brown", And((Term("quick"), Term("brown")))),
        ("quick OR lazy^2", Or((Term("quick"), Term("lazy", boost=2.0)))),
        ('"quick brown"', Phrase(("quick", "brown"))),
        ("qui*", Prefix("qui")),
        ("quik~1", Fuzzy("quik", distance=1)),
        ("dog -lazy", And((Term("dog"), Not(Term("lazy"))))),
        ("[dog TO fox]", Range(min_term="dog", max_term="fox")),
    ],
)
def test_parsed_equals_programmatic(engine, qs, ast):
    a = engine.search(parse_query(qs), k=10).collect()
    b = engine.search(ast, k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in a] == [
        (r["doc_id"], round(r["score"], 9)) for r in b
    ]
    assert len(a) > 0


def test_should_is_optional_but_scores(engine):
    # '+quick lazy': match set == Term('quick') alone; docs ALSO
    # containing 'lazy' score strictly higher than their quick-only
    # score (Lucene BooleanQuery MUST + SHOULD semantics)
    must_only = {
        r["doc_id"]: r["score"]
        for r in engine.matches(Term("quick")).collect()
    }
    both = {
        r["doc_id"]: r["score"]
        for r in engine.matches(parse_query("+quick lazy")).collect()
    }
    assert set(both) == set(must_only)  # lazy never constrains the match
    lazy_docs = {
        r["doc_id"] for r in engine.matches(Term("lazy")).collect()
    }
    for d, s in both.items():
        if d in lazy_docs:
            assert s > must_only[d] + 1e-12
        else:
            assert abs(s - must_only[d]) < 1e-9


def test_should_wrapped_equals_sum_when_both_match(engine):
    # on docs matching both terms the score equals the plain And sum
    both = {
        r["doc_id"]: r["score"]
        for r in engine.matches(parse_query("+quick lazy")).collect()
    }
    and_scores = {
        r["doc_id"]: r["score"]
        for r in engine.matches(And((Term("quick"), Term("lazy")))).collect()
    }
    for d, s in and_scores.items():
        assert abs(both[d] - s) < 1e-9
