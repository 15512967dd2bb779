"""Analyzer golden tests — byte-identical term sequences per fixture
string (mirrors the reference's `tests/analysis/text_analyzer_tests.cpp`
golden token/offset assertions). The chain is FROZEN: changing any
expected value here invalidates every index built so far."""

from iresearch_spark.analysis import get_analyzer
from iresearch_spark.analysis.porter2 import stem


def test_porter2_known_vectors():
    # vectors from the published Snowball English sample behavior
    cases = {
        "caresses": "caress",
        "flies": "fli",
        "ties": "tie",
        "cries": "cri",
        "running": "run",
        "hoping": "hope",
        "hopping": "hop",
        "sized": "size",
        "agreed": "agre",
        "falling": "fall",
        "generate": "generat",
        "generates": "generat",
        "generated": "generat",
        "generating": "generat",
        "national": "nation",
        "consistency": "consist",
        "conflated": "conflat",
        "skies": "sky",
        "sky": "sky",
        "dying": "die",
        "news": "news",
        "inning": "inning",
        "proceed": "proceed",
        "cats": "cat",
        "cat": "cat",
        "fry": "fri",
        "say": "say",
        "by": "by",
        "happy": "happi",
        "12": "12",
        "1929": "1929",
        "": "",
    }
    for word, want in cases.items():
        assert stem(word) == want, f"{word!r}: got {stem(word)!r}, want {want!r}"


def test_simple_analyzer():
    a = get_analyzer("simple")
    terms, pos = a.analyze("The  Quick brown FOX")
    assert terms == ["the", "quick", "brown", "fox"]
    assert pos == [0, 1, 2, 3]
    assert a.analyze("") == ([], [])
    assert a.analyze("   ") == ([], [])


def test_whitespace_analyzer_preserves_case():
    a = get_analyzer("whitespace")
    assert a.analyze("Foo BAR")[0] == ["Foo", "BAR"]


def test_text_en_golden():
    a = get_analyzer("text_en")
    # tokenize -> NFC -> lower -> porter2
    terms, pos = a.analyze("The houses' doors, quickly OPENED; running!")
    assert terms == ["the", "hous", "door", "quick", "open", "run"]
    assert pos == [0, 1, 2, 3, 4, 5]
    # apostrophes: house's is one token; 's stripped by step 0
    assert a.analyze("house's")[0] == ["hous"]
    # numerals pass through
    assert a.analyze("in 1929 about 12")[0] == ["in", "1929", "about", "12"]


def test_text_en_stopwords_leave_position_gap():
    a = get_analyzer("text_en", stopwords=["the", "a"])
    terms, pos = a.analyze("the quick fox")
    assert terms == ["quick", "fox"]
    assert pos == [1, 2]


def test_text_en_unicode():
    a = get_analyzer("text_en", stemming=False)
    # NFC: e + combining acute == precomposed é
    assert a.analyze("café")[0] == a.analyze("café")[0]
    a2 = get_analyzer("text_en", stemming=False, accent=True)
    assert a2.analyze("café")[0] == ["cafe"]


def test_ngram_analyzer():
    a = get_analyzer("ngram", min_gram=2, max_gram=3)
    terms, pos = a.analyze("abcd")
    assert terms == ["ab", "bc", "cd", "abc", "bcd"]
    assert pos == [0, 1, 2, 0, 1]


def test_delimiter_analyzer():
    a = get_analyzer("delimiter", delimiter=",")
    assert a.analyze("a,b,,c")[0] == ["a", "b", "c"]


def test_norm_and_stem_analyzers():
    assert get_analyzer("norm").analyze("  FoO  ")[0] == ["  foo  "]
    assert get_analyzer("stem").analyze("Running")[0] == ["run"]


def test_segmentation_analyzer():
    a = get_analyzer("segmentation")
    assert a.analyze("Hello, World! 42")[0] == ["hello", "world", "42"]


def test_flat_path_matches_batch_path():
    """The Arrow-vectorized analyze_flat must be byte-identical to the
    regex analyze_batch chain (the fast path feeds the index build)."""
    import numpy as np

    fixtures = [
        "Hello, World_foo don't 'quoted' a''b  CAFÉ naïve 12x",
        "house's September 1929 — déjà vu; zürich/über?",
        "", None, "   ", "'''", "_", "a_b", "tab\tsep\nnewline",
        "ALL CAPS and MiXeD 42x7",
        "decomposed cafe\u0301 and nai\u0308ve forms",  # NFC must compose
        "\u0130stanbul and \u039f\u03a3 sigma",  # simple case fold parity
    ]
    from iresearch_spark.corpus import build_vocab

    vocab = build_vocab(200)
    fixtures.append(" ".join(vocab.tolist()))
    for name in ("simple", "whitespace", "segmentation", "text_en"):
        a = get_analyzer(name)
        assert a._flat_fn is not None, name
        ft = a.analyze_flat(fixtures)
        slow = a.analyze_batch(fixtures)
        # reassemble per-doc terms/positions from the flat form
        bounds = np.concatenate(([0], np.cumsum(ft.n_tokens)))
        for i, (terms, pos) in enumerate(slow):
            lo, hi = bounds[i], bounds[i + 1]
            got_terms = [ft.uniques[c] for c in ft.codes[lo:hi]]
            got_pos = ft.positions[lo:hi].tolist()
            assert got_terms == terms, (name, i, got_terms, terms)
            assert got_pos == pos, (name, i, got_pos, pos)


def test_flat_fallback_for_generic_analyzer():
    import numpy as np

    # stopwords force the generic per-token fallback (position gaps)
    a = get_analyzer("text_en", stopwords=["the"])
    assert a._flat_fn is None
    ft = a.analyze_flat(["Running runs", "cats"])
    assert ft.n_tokens.tolist() == [2, 1]
    terms = [ft.uniques[c] for c in ft.codes]
    assert terms == ["run", "run", "cat"]


def test_pipeline_position_increment_algebra():
    """Reference pipeline_token_stream.cpp:331-347 — gaps accumulate
    across stages."""
    from iresearch_spark.analysis import get_analyzer

    # delimiter -> simple: positions are the running flat index when
    # nothing leaves gaps
    p = get_analyzer("pipeline", analyzers=[
        get_analyzer("delimiter", delimiter=","), "simple",
    ])
    assert p.analyze("a b,c") == (["a", "b", "c"], [0, 1, 2])
    # child stream with a LEADING gap (stopword at child position 0):
    # the gap carries into the pipeline positions
    stop = get_analyzer("stopwords", stopwords=["x"])
    p2 = get_analyzer("pipeline", analyzers=[
        get_analyzer("delimiter", delimiter=","), stop,
    ])
    assert p2.analyze("x a,b") == (["a", "b"], [1, 2])
    # parent token whose child stream is EMPTY vacates one position
    assert p2.analyze("a,x,b") == (["a", "b"], [0, 2])
    # parent-level gap + child-level gap accumulate
    assert p2.analyze("a,x x,x b") == (["a", "b"], [0, 3])
