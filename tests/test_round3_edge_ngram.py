"""edgeNgram option of the text analyzer — golden vectors from the
reference's tests (text_analyzer_tests.cpp edgeNgram cases, input
" A  hErd of   quIck " with stopwords ["a"])."""

from __future__ import annotations

from iresearch_spark.analysis.analyzers import get_analyzer

DATA = " A  hErd of   quIck "


def _an(**edge):
    return get_analyzer("text_en", stopwords=["a"], edge_ngram=edge)


def test_edge_min2_max3():
    terms, _ = _an(min=2, max=3, preserve_original=False).analyze(DATA)
    assert terms == ["he", "her", "of", "qu", "qui"]


def test_edge_min0_max3():
    terms, _ = _an(min=0, max=3, preserve_original=False).analyze(DATA)
    assert terms == ["h", "he", "her", "o", "of", "q", "qu", "qui"]


def test_edge_preserve_original():
    terms, _ = _an(min=2, max=3, preserve_original=True).analyze(DATA)
    assert terms == ["he", "her", "herd", "of", "qu", "qui", "quick"]


def test_edge_min1_max1_preserve():
    terms, _ = _an(min=1, max=1, preserve_original=True).analyze(DATA)
    assert terms == ["h", "herd", "o", "of", "q", "quick"]


def test_edge_positions_share_word_position():
    an = _an(min=2, max=3, preserve_original=True)
    terms, pos = an.analyze(DATA)
    # stopword "a" leaves a gap at position 0
    assert list(zip(terms, pos)) == [
        ("he", 1), ("her", 1), ("herd", 1),
        ("of", 2),
        ("qu", 3), ("qui", 3), ("quick", 3),
    ]


def test_edge_short_word_only_with_preserve():
    an = _an(min=5, max=6, preserve_original=False)
    assert an.analyze("of herd")[0] == []
    an2 = _an(min=5, max=6, preserve_original=True)
    assert an2.analyze("of herd")[0] == ["of", "herd"]


def test_edge_prefix_search_demo(spark):
    """Autocomplete pattern: index edge-ngrams, query exact short
    prefixes as plain terms — no wildcard scan needed."""
    from iresearch_spark.index.builder import build_index
    from iresearch_spark.search import SearchEngine, Term

    rows = [(0, "sparkling water"), (1, "sparse matrix"), (2, "joyful")]
    idx = build_index(
        spark.createDataFrame(rows, "doc_id long, text string"),
        analyzer=get_analyzer(
            "text_en", edge_ngram={"min": 2, "max": 4, "preserve_original": True}
        ),
        bucket_bits=4,
    )
    eng = SearchEngine(idx)
    assert {r["doc_id"] for r in eng.matches(Term("spar")).collect()} == {0, 1}
    assert {r["doc_id"] for r in eng.matches(Term("joy")).collect()} == {2}
