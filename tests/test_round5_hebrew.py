"""Round-5: Hebrew light stemmer (text_he).

DOCUMENTED SIMPLIFICATION like Polish/Ukrainian/Greek — Hebrew has no
official Snowball algorithm and the published analyzers (HebMorph)
need a morphological lexicon. The implemented shape is Arabic
Light10's (normalize + one prefix + ordered suffix sweep) adapted to
Hebrew: niqqud/cantillation dropped, final letters folded to regular
forms, ONLY the article family stripped as prefix (bare prepositions
ב כ ל מ ש deliberately kept — see the module docstring), pronominal /
plural / feminine suffix sweep. Goldens hand-traced through the rule
list.
"""

import warnings

from iresearch_spark.analysis.analyzers import get_analyzer
from iresearch_spark.analysis.snowball import get_stemmer, stem_he


def test_hebrew_noun_families_conflate():
    # ספר book: article, conjunction, plural, possessives
    for w in ["ספר", "הספר", "ספרים", "וספרים", "ספריו", "ספריהם"]:
        assert stem_he(w) == "ספר", (w, stem_he(w))
    # ילד child: masc plural, feminine, fem plural, pronominal plural
    for w in ["ילד", "ילדים", "ילדה", "ילדות", "ילדיהם", "הילדים",
              "וכשהילדים"]:
        assert stem_he(w) == "ילד", (w, stem_he(w))
    # ־יה nouns: singular and the -iyot plural meet at the same stem
    assert stem_he("ספרייה") == stem_he("ספריות") == "ספר"


def test_hebrew_final_letter_folding():
    # final-form folding makes suffix-exposed stems byte-equal to the
    # free-standing surface form
    assert stem_he("שולחן") == stem_he("שולחנות") == "שולחנ"
    assert stem_he("השולחן") == "שולחנ"
    assert stem_he("מלך") == stem_he("מלכות") == "מלכ"
    assert stem_he("עין") == stem_he("עיניים") == "עינ"  # dual


def test_hebrew_suffix_sweep_multiple():
    # מידותיו loses יו then ות; singular מידה loses the feminine ה
    assert stem_he("מידותיו") == stem_he("מידה") == "מיד"


def test_hebrew_prefix_discipline():
    # bare prepositions are NOT stripped (lexicon-free stripping would
    # split families: שולחן would lose its ש, מלכות its מ)
    assert stem_he("שלום") == "שלומ"          # ש kept
    assert stem_he("מאוד") == "מאוד"          # מ kept
    assert stem_he("בבית") == "בבית"          # ב kept
    assert stem_he("ובבית") == "בבית"         # but ו comes off
    assert stem_he("כשקוראים") == "קורא"      # כש stack comes off
    # guards: short function words untouched
    for w in ["של", "לא", "זה", "על", "אני", "שם", "ומה"]:
        assert stem_he(w) == stem_he(w)  # total (no exception)
    assert stem_he("זה") == "זה"
    assert stem_he("אני") == "אני"
    assert stem_he("ומה") == "ומה"  # keep-guard blocks the stack


def test_hebrew_niqqud_normalization():
    # vocalized spelling conflates with unvocalized
    assert stem_he("סֵפֶר") == "ספר"
    # maqaf is punctuation, not a point — never deleted by normalize
    from iresearch_spark.analysis.snowball import _he_normalize

    assert "־" in _he_normalize("בית־ספר")


def test_registered_and_chain():
    assert get_stemmer("he") is stem_he
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no fallback warning anymore
        a = get_analyzer("text", locale="he_IL.UTF-8")
    assert a.analyze("הילדים קוראים ספרים")[0] == ["ילד", "קורא", "ספר"]
    # default stopwords ride the same chain
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        b = get_analyzer("text_he", stopwords="default")
    terms, _ = b.analyze("זה הספר של הילדים")
    assert "ספר" in terms and "ילד" in terms and "זה" not in terms


def test_flat_fast_path_differential():
    a = get_analyzer("text_he")
    assert a._flat_fn is not None
    texts = [
        "הספר על השולחן",
        "ילדים קוראים ספריו",
        "שלום וברכה לכולם",
        "",
        "מידותיו טובות מאוד",
    ]
    ft = a.analyze_flat(texts)
    fast = [ft.uniques[c] for c in ft.codes]
    slow_docs = a.analyze_batch(texts)
    slow = [t for terms, _ in slow_docs for t in terms]
    assert fast == slow


def test_hebrew_indexed_search(spark):
    from iresearch_spark.index.builder import build_index
    from iresearch_spark.search.ast import Term
    from iresearch_spark.search.executor import SearchEngine

    docs = [
        (0, "הספר על השולחן"),
        (1, "ספרים רבים כאן"),
        (2, "ילדים קוראים ספריו"),
        (3, "הבית גדול מאוד"),
        (4, "וספרים ישנים שם"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = build_index(df, analyzer=get_analyzer("text_he"), bucket_bits=4)
    eng = SearchEngine(idx)
    hits = {r.doc_id for r in eng.matches(Term("ספר")).collect()}
    assert hits == {0, 1, 2, 4}
