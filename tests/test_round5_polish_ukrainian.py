"""Round-5: Polish + Ukrainian light inflectional stemmers.

Both are DOCUMENTED SIMPLIFICATIONS (neither language has an official
Snowball algorithm; Polish's standard Stempel is a trained statistical
table): longest regular declension/conjugation ending, >=3-letter stem
guard, boundary consonant mutations not undone. Goldens hand-traced
through the paradigm tables in the module docstrings.
"""

import warnings

from iresearch_spark.analysis.analyzers import get_analyzer
from iresearch_spark.analysis.snowball import (
    get_stemmer,
    stem_pl,
    stem_uk,
)


def test_polish_noun_paradigm():
    for w in ["dom", "domy", "domu", "domem", "domach", "domami",
              "domów", "domowi"]:
        assert stem_pl(w) == "dom", (w, stem_pl(w))
    for w in ["kobieta", "kobiety", "kobietą", "kobietom",
              "kobietami", "kobietach"]:
        assert stem_pl(w) == "kobiet", (w, stem_pl(w))
    assert stem_pl("panowie") == "pan"       # -owie plural
    assert stem_pl("studentów") == "student"


def test_polish_adjective_and_verb():
    for w in ["dobry", "dobra", "dobre", "dobrego", "dobremu",
              "dobrych", "dobrymi", "dobrym", "dobrej"]:
        assert stem_pl(w) == "dobr", (w, stem_pl(w))
    for w in ["pisać", "pisał", "pisała", "pisali"]:
        assert stem_pl(w) == "pis", (w, stem_pl(w))
    for w in ["piszesz", "piszemy"]:
        assert stem_pl(w) == "pisz", (w, stem_pl(w))


def test_polish_guards():
    # short function words survive the >=3 guard untouched
    for w in ["nie", "ale", "dla", "to", "ma", "i"]:
        assert stem_pl(w) == w, (w, stem_pl(w))


def test_ukrainian_noun_paradigm():
    for w in ["книга", "книги", "книгу", "книгою", "книгами",
              "книгах", "книгам"]:
        assert stem_uk(w) == "книг", (w, stem_uk(w))
    for w in ["місто", "міста", "місті", "містах"]:
        assert stem_uk(w) == "міст", (w, stem_uk(w))
    assert stem_uk("людей") == "люд"
    assert stem_uk("українців") == "українц"


def test_ukrainian_adjective_and_verb():
    for w in ["добрий", "доброго", "доброму", "добрими", "добрих"]:
        assert stem_uk(w) == "добр", (w, stem_uk(w))
    for w in ["читати", "читають", "читала", "читали", "читає"]:
        assert stem_uk(w) == "чита", (w, stem_uk(w))


def test_ukrainian_guards():
    for w in ["він", "та", "що", "не"]:
        assert stem_uk(w) == w, (w, stem_uk(w))


def test_registered_and_chains():
    assert get_stemmer("pl") is stem_pl
    assert get_stemmer("uk") is stem_uk
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no fallback warning anymore
        a = get_analyzer("text", locale="pl_PL.UTF-8")
        b = get_analyzer("text", locale="uk_UA.UTF-8")
    assert a.analyze("Kobiety piszą listy")[0] == ["kobiet", "pisz", "list"]
    assert b.analyze("Книги читають тут")[0] == ["книг", "чита", "тут"]


def test_flat_fast_path_differential():
    for lang, texts in [
        ("pl", ["dom jest wielki", "domy i domach tutaj",
                "kobieta pisze list", ""]),
        ("uk", ["книга лежить тут", "книги та книгами",
                "місто велике гарне", ""]),
    ]:
        a = get_analyzer(f"text_{lang}")
        assert a._flat_fn is not None
        ft = a.analyze_flat(texts)
        fast = [ft.uniques[c] for c in ft.codes]
        slow_docs = a.analyze_batch(texts)
        slow = [t for terms, _ in slow_docs for t in terms]
        assert fast == slow
