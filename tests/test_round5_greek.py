"""Round-5: Greek light stemmer — accent + final-sigma fold, longest
regular inflectional ending, exposed degree marker. DOCUMENTED
SIMPLIFICATION vs the full Ntais (2006)/Snowball Greek algorithm (its
long exception lists aren't reproducible here); the goldens below are
hand-traced through the standard Modern Greek inflection paradigms the
docstring lists, not derived from the implementation.
"""

import warnings

from iresearch_spark.analysis.analyzers import get_analyzer
from iresearch_spark.analysis.snowball import get_stemmer, stem_el


def test_noun_paradigms_conflate():
    # masc -ος: all four cases x two numbers meet at one stem
    for w in ["άνθρωπος", "ανθρώπου", "άνθρωπο", "άνθρωποι",
              "ανθρώπων", "ανθρώπους"]:
        assert stem_el(w) == "ανθρωπ", (w, stem_el(w))
    # fem -α / -ες
    assert stem_el("θάλασσα") == "θαλασσ"
    assert stem_el("θάλασσες") == "θαλασσ"
    # fem -η with -εις/-εων plurals
    for w in ["πόλη", "πόλης", "πόλεις", "πόλεων"]:
        assert stem_el(w) == "πολ", (w, stem_el(w))
    # neuter -ι
    for w in ["παιδί", "παιδιού", "παιδιά", "παιδιών"]:
        assert stem_el(w) == "παιδ", (w, stem_el(w))
    # neuter -ο with the -ιο- theme
    for w in ["βιβλίο", "βιβλίου", "βιβλία", "βιβλίων"]:
        assert stem_el(w) == "βιβλ", (w, stem_el(w))
    # neuter -μα paradigm
    for w in ["γράμμα", "γράμματα", "γραμμάτων"]:
        assert stem_el(w) == "γραμ", (w, stem_el(w))


def test_verb_paradigms_conflate():
    for w in ["γράφω", "γράφεις", "γράφει", "γράφουμε", "γράφετε",
              "γράφουν"]:
        assert stem_el(w) == "γραφ", (w, stem_el(w))
    # -ησ- aorist
    for w in ["αγάπησα", "αγάπησες", "αγαπήσαμε"]:
        assert stem_el(w) == "αγαπ", (w, stem_el(w))
    # mediopassive
    for w in ["έρχομαι", "έρχεται", "έρχονται"]:
        assert stem_el(w) == "ερχ", (w, stem_el(w))


def test_degree_markers():
    assert stem_el("ομορφότερος") == "ομορφ"   # comparative -οτερ-
    assert stem_el("ωραιότατος") == "ωραι"     # superlative -οτατ-


def test_guards_and_fold():
    # short function words survive the >=3 guard
    for w in ["και", "το", "τα", "την", "εδώ", "η", "οι"]:
        out = stem_el(w)
        assert len(out) >= len(w) - 1 and len(out) >= 1
    assert stem_el("και") == "και"
    assert stem_el("το") == "το"
    # fold is unconditional: final sigma + accents normalize even
    # when no ending strips ("εξης" is too short for the -ησ guard)
    assert stem_el("εξής") == "εξησ"
    assert stem_el("ΕΔΏ".lower()) == "εδω"


def test_registered_and_analyzer_chain():
    assert get_stemmer("el") is stem_el
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        a = get_analyzer("text", locale="el_GR.UTF-8")
    terms, _ = a.analyze("Οι άνθρωποι γράφουν βιβλία")
    assert terms == ["οι", "ανθρωπ", "γραφ", "βιβλ"]


def test_flat_fast_path_differential():
    a = get_analyzer("text_el")
    texts = [
        "το βιβλίο είναι εδώ", "τα βιβλία και τα γράμματα",
        "η πόλη και οι πόλεις", "βιβλίων γραμμάτων ανθρώπων", "",
    ]
    assert a._flat_fn is not None
    ft = a.analyze_flat(texts)
    fast = [ft.uniques[c] for c in ft.codes]
    slow_docs = a.analyze_batch(texts)
    slow = [t for terms, _ in slow_docs for t in terms]
    assert fast == slow
    assert list(ft.n_tokens) == [len(t[0]) for t in slow_docs]
