"""CJK dictionary segmentation (segmentation analyzer, cjk=True):
longest-match goldens for zh/ja, custom dictionaries, mixed-script
text, kana/Thai run handling, and an indexed-search round trip."""

import pytest

from iresearch_spark.analysis.analyzers import get_analyzer
from iresearch_spark.index.builder import build_index
from iresearch_spark.search import SearchEngine, Term


def _an(**kw):
    return get_analyzer("segmentation", cjk=True, **kw)


def test_zh_longest_match():
    a = _an()
    terms, pos = a.analyze("我们今天学习中文")
    assert terms == ["我们", "今天", "学习", "中文"]
    assert pos == [0, 1, 2, 3]


def test_zh_unmatched_falls_to_single_chars():
    a = _an()
    terms, _ = a.analyze("我们爱猫")  # 爱/猫 not in the built-in list
    assert terms == ["我们", "爱", "猫"]


def test_ja_kanji_and_kana_runs():
    a = _an()
    terms, _ = a.analyze("東京大学の学生です")
    # kanji compounds via dictionary; single-word hiragana runs pass
    # through the full-cover kana segmenter unchanged
    assert terms == ["東京", "大学", "の", "学生", "です"]


def test_hiragana_full_cover_splits():
    # a hiragana run splits ONLY when entirely composed of dictionary
    # words (greedy-longest among valid covers)
    a = _an()
    assert a.analyze("これはなんですか")[0] == [
        "これ", "は", "なん", "です", "か",
    ]
    assert a.analyze("東京大学の学生でしたが")[0] == [
        "東京", "大学", "の", "学生", "でした", "が",
    ]
    # longest word wins over a shorter sub-cover (でしょう, not で+?)
    assert a.analyze("そうでしょう")[0] == ["そう", "でしょう"]


def test_hiragana_uncoverable_run_stays_whole():
    # an unknown content word anywhere in the run blocks the cover ->
    # the whole run is ONE token (the lexicon can never shred)
    a = _an()
    assert a.analyze("わたしはがくせい")[0] == ["わたしはがくせい"]
    assert a.analyze("ひらがなのれんしゅう")[0] == ["ひらがなのれんしゅう"]


def test_katakana_run_is_one_token():
    a = _an()
    terms, _ = a.analyze("コンピュータを使う")
    assert terms[0] == "コンピュータ"
    assert "を" in terms  # hiragana particle run


def test_mixed_latin_and_cjk():
    a = _an()
    terms, _ = a.analyze("Spark で中国のデータ処理 rocks")
    assert "spark" in terms and "rocks" in terms
    assert "中国" in terms and "データ" in terms


def test_custom_dictionary_replaces_builtin():
    a = _an(cjk_dict=["爱猫"])
    terms, _ = a.analyze("我们爱猫")
    # custom dict: 爱猫 matches; 我们 no longer does (dict replaced)
    assert terms == ["我", "们", "爱猫"]


def test_thai_run_single_token():
    a = _an()
    terms, _ = a.analyze("ภาษาไทย test")
    assert terms == ["ภาษาไทย", "test"]


def test_case_handling_still_applies():
    a = get_analyzer("segmentation", cjk=True, case="none")
    terms, _ = a.analyze("Tokyo 東京")
    assert terms == ["Tokyo", "東京"]
    with pytest.raises(ValueError):
        get_analyzer("segmentation", cjk=True, word_break="graphic")


def test_indexed_cjk_search(spark):
    rows = [
        (0, "我们今天学习中文"),
        (1, "他们昨天学习日本語"),
        (2, "no cjk here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, id_col="doc_id", text_col="text", analyzer=_an())
    eng = SearchEngine(idx)
    assert {r["doc_id"] for r in eng.matches(Term("学习")).collect()} == {0, 1}
    assert {r["doc_id"] for r in eng.matches(Term("中文")).collect()} == {0}


def test_text_chain_dict_break_zh_ja():
    # text(locale=zh|ja) routes through the dictionary segmenter with
    # the full text chain (NFC + lower + stopwords); stemming is the
    # optional-stemmer fallback (none exists for zh/ja)
    import warnings

    from iresearch_spark.analysis.analyzers import get_analyzer

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        zh = get_analyzer("text", locale="zh", stopwords="default")
        ja = get_analyzer("text", locale="ja_JP.UTF-8", stopwords="default")
    # 我们 is a zh default stopword; the rest dictionary-segment
    assert zh.analyze("我们今天学习中文")[0] == ["今天", "学习", "中文"]
    # の is a ja default stopword; kanji compounds segment, kana stay
    assert ja.analyze("東京大学の学生です")[0] == ["東京", "大学", "学生", "です"]


def test_text_chain_plain_tokenizer_for_spaced_langs():
    import warnings

    from iresearch_spark.analysis.analyzers import get_analyzer

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vi = get_analyzer("text", locale="vi")
    assert vi.analyze("tôi học tiếng Việt")[0] == ["tôi", "học", "tiếng", "việt"]
