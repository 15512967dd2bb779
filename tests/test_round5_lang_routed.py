"""Per-document language routing (analysis/multilang.py): the routed
Arrow fast path must be token- and position-identical to running each
document through its language's chain individually, unify the term
dictionary across languages, and build a searchable index through
build_index(lang_col=) with doc ids unchanged.

Reference: core/analysis/text_token_stream.cpp:509 — one analyzer per
locale; a multilingual corpus is the union of per-locale chains."""

import numpy as np
import pyarrow as pa
import pytest

from iresearch_spark.analysis.multilang import (
    LangRoutedAnalyzer,
    lang_routed_analyzer,
)
from iresearch_spark.analysis.analyzers import get_analyzer
from iresearch_spark.index.builder import build_index
from iresearch_spark.search import SearchEngine, Term

TEXTS = [
    "the cats are running fast",
    "Die Häuser der Kinder",
    "ฉันกินข้าวทุกวัน",
    "我们今天学习中文",
    "",
    "unknown language text here",
    "los gatos corren en las casas",
]
LANGS = ["en", "de", "th", "zh", "en", None, "es"]


def _per_doc(ft, n_docs):
    off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(ft.n_tokens, out=off[1:])
    toks = [
        [ft.uniques[c] for c in ft.codes[off[i] : off[i + 1]]]
        for i in range(n_docs)
    ]
    pos = [list(ft.positions[off[i] : off[i + 1]]) for i in range(n_docs)]
    return toks, pos


def test_routed_differential_vs_per_doc_chains():
    r = lang_routed_analyzer(stopwords="default")
    ft = r.analyze_flat_routed(
        pa.array(TEXTS), np.array(LANGS, dtype=object)
    )
    toks, pos = _per_doc(ft, len(TEXTS))
    slow = r.analyze_with_langs(TEXTS, LANGS)
    for i, ((st, sp), t, p) in enumerate(zip(slow, toks, pos)):
        assert t == st, (i, t, st)
        assert p == sp, (i, p, sp)


def test_routed_dictionary_is_unified():
    # the same surface term emitted by two languages' chains gets ONE
    # dictionary entry (otherwise a term would carry two posting runs)
    r = lang_routed_analyzer(stopwords=None)
    ft = r.analyze_flat_routed(
        pa.array(["spark rocks", "spark rocks"]),
        np.array(["en", "de"], dtype=object),
    )
    assert len(set(ft.uniques)) == len(ft.uniques)
    assert "spark" in set(ft.uniques)
    toks, _ = _per_doc(ft, 2)
    assert toks[0][0] == toks[1][0] == "spark"
    # and the codes are literally equal, not just the strings
    assert ft.codes[0] == ft.codes[2]


def test_routed_stopword_gaps_survive_scatter():
    r = lang_routed_analyzer(stopwords="default")
    ft = r.analyze_flat_routed(
        pa.array(["the cats and the dogs"]),
        np.array(["en"], dtype=object),
    )
    _, pos = _per_doc(ft, 1)
    assert pos[0] == [1, 4]  # gaps where the/and fell


def test_unknown_and_null_langs_use_default():
    en = get_analyzer("text_en")
    r = LangRoutedAnalyzer({}, default=en)
    ft = r.analyze_flat_routed(
        pa.array(["running quickly", "running quickly"]),
        np.array([None, "xx"], dtype=object),
    )
    toks, _ = _per_doc(ft, 2)
    assert toks[0] == toks[1] == ["run", "quick"]


def test_routed_all_empty():
    r = lang_routed_analyzer(langs=["en"])
    ft = r.analyze_flat_routed(
        pa.array(["", ""]), np.array(["en", "de"], dtype=object)
    )
    assert ft.n_tokens.tolist() == [0, 0]
    assert len(ft.uniques) == 0


def test_build_index_lang_col(spark):
    rows = [
        ("a", "the cats are running fast", "en"),
        ("b", "Die Häuser der Kinder", "de"),
        ("c", "ฉันกินข้าวทุกวัน", "th"),
        ("d", "我们今天学习中文", "zh"),
        ("e", "los gatos corren en las casas", "es"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    r = lang_routed_analyzer(stopwords="default")
    idx = build_index(
        df, id_col=None, sort_key="url", analyzer=r, lang_col="lang",
        bucket_bits=4,
    )
    eng = SearchEngine(idx)

    def hits(t):
        return sorted(x["doc_id"] for x in eng.matches(Term(t)).collect())

    assert hits("cat") == [1]      # en porter2
    assert hits("haus") == [4]     # de snowball
    assert hits("ข้าว") == [2]     # th dictionary break
    assert hits("学习") == [3]     # zh dictionary break
    assert hits("gat") == [0]      # es snowball (gatos)
    assert hits("casas") == []     # surface form was stemmed away


def test_lang_col_validation(spark):
    df = spark.createDataFrame(
        [("a", "x", "en")], "url string, text string, lang string"
    )
    r = lang_routed_analyzer(langs=["en"])
    with pytest.raises(ValueError, match="LangRoutedAnalyzer"):
        build_index(df, id_col=None, sort_key="url",
                    analyzer="simple", lang_col="lang")
    with pytest.raises(ValueError, match="requires lang_col"):
        build_index(df, id_col=None, sort_key="url", analyzer=r)
