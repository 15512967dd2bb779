"""Thai dictionary segmentation (segmentation analyzer, cjk=True):
greedy longest-match goldens, SPAN fallback for unmatched stretches
(one token, never shredded into combining marks), the two syllable
guards (no match ending before a bound sign, none starting after an
unmatched preposed vowel), custom dictionaries, mixed-script text,
and an indexed-search round trip.

Reference: core/analysis/segmentation_token_stream.cpp — ICU's
dictionary-based break iterator ships a Thai frequency dictionary;
this is the same mechanism over the built-in THAI_WORDS list."""

from iresearch_spark.analysis.analyzers import get_analyzer
from iresearch_spark.index.builder import build_index
from iresearch_spark.search import SearchEngine, Term


def _an(**kw):
    return get_analyzer("segmentation", cjk=True, **kw)


def test_thai_longest_match_golden():
    a = _an()
    terms, pos = a.analyze("ฉันกินข้าวทุกวัน")
    assert terms == ["ฉัน", "กิน", "ข้าว", "ทุก", "วัน"]
    assert pos == [0, 1, 2, 3, 4]


def test_thai_preposed_vowel_words():
    a = _an()
    terms, _ = a.analyze("เขาอ่านหนังสือ")
    assert terms == ["เขา", "อ่าน", "หนังสือ"]


def test_thai_longest_beats_prefix():
    # ภาษาไทย and วันนี้ must win over their prefixes ภาษา / วัน
    a = _an()
    terms, _ = a.analyze("เราเรียนภาษาไทยวันนี้")
    assert terms == ["เรา", "เรียน", "ภาษาไทย", "วันนี้"]


def test_thai_compound_words():
    a = _an()
    terms, _ = a.analyze("นักเรียนอ่านหนังสือในโรงเรียน")
    assert terms == ["นักเรียน", "อ่าน", "หนังสือ", "ใน", "โรงเรียน"]


def test_thai_unknown_stretch_is_one_span_token():
    # ฟกฟก is not in the dictionary: it must come out as ONE token,
    # not per-character fragments (Han-style unigram fallback would
    # strand combining marks on real Thai text)
    a = _an()
    terms, _ = a.analyze("ฉันกินฟกฟก")
    assert terms == ["ฉัน", "กิน", "ฟกฟก"]


def test_thai_all_unknown_run_stays_whole():
    a = _an(cjk_dict=["中文"])  # custom dict with no Thai at all
    terms, _ = a.analyze("ฉันกินข้าว")
    assert terms == ["ฉันกินข้าว"]


def test_thai_bound_sign_guard():
    # dict match คน may not end immediately before the bound sign ื —
    # accepting it would strand a combining vowel at the start of the
    # next token; the whole stretch falls back to one span
    a = _an(cjk_dict=["คน"])
    terms, _ = a.analyze("คนื")
    assert terms == ["คนื"]
    # and with no sign following, the same dict word matches
    terms, _ = a.analyze("คนดี")
    assert terms == ["คน", "ดี"]


def test_thai_preposed_vowel_guard():
    # เขา is not in this custom dict; ขา is — but a match may not
    # start right after the unmatched preposed vowel เ (it belongs to
    # the syllable that starts at ข)
    a = _an(cjk_dict=["ขา"])
    terms, _ = a.analyze("เขา")
    assert terms == ["เขา"]
    # the same dict word matches when nothing preposed precedes it
    terms, _ = a.analyze("ขาดี")
    assert terms == ["ขา", "ดี"]


def test_thai_mixed_with_latin():
    a = _an()
    terms, _ = a.analyze("ไปโรงเรียน school today")
    assert terms == ["ไป", "โรงเรียน", "school", "today"]


def test_thai_and_cjk_in_one_text():
    a = _an()
    terms, _ = a.analyze("ฉันเรียน中文")
    assert terms == ["ฉัน", "เรียน", "中文"]


def test_indexed_thai_search(spark):
    rows = [
        (0, "ฉันกินข้าวทุกวัน"),
        (1, "เขากินผลไม้"),
        (2, "no thai here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, id_col="doc_id", text_col="text", analyzer=_an())
    eng = SearchEngine(idx)
    assert {r["doc_id"] for r in eng.matches(Term("กิน")).collect()} == {0, 1}
    assert {r["doc_id"] for r in eng.matches(Term("ข้าว")).collect()} == {0}


def test_text_chain_dict_break_th():
    # the locale-driven text analyzer uses the dictionary segmenter
    # for unspaced scripts (the reference's ICU BreakIterator is
    # dictionary-based there); Thai has no Snowball stemmer, so the
    # chain runs unstemmed (optional-stemmer fallback)
    import warnings

    from iresearch_spark.analysis.analyzers import get_analyzer

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        a = get_analyzer("text", locale="th")
    terms, _ = a.analyze("ฉันกินข้าวทุกวัน")
    assert terms == ["ฉัน", "กิน", "ข้าว", "ทุก", "วัน"]


def test_text_names_registered_for_unstemmed_langs():
    # text_zh/ja/ko/th/vi resolve like every other language's name;
    # default warns (optional-stemmer fallback), explicit
    # stemming=False is silent
    import warnings

    import pytest as _pytest

    from iresearch_spark.analysis.analyzers import get_analyzer

    with _pytest.warns(UserWarning, match="without stemming"):
        a = get_analyzer("text_th")
    assert a.analyze("ฉันกินข้าว")[0] == ["ฉัน", "กิน", "ข้าว"]
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        b = get_analyzer("text_ko", stemming=False)
    assert b.analyze("한국어 텍스트")[0] == ["한국어", "텍스트"]
