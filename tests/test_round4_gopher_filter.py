"""Full Gopher quality-filter rule set (ops/textstats.py
gopher_quality_filter; Rae et al. 2021 §A1.1 Table A1) — one flag per
rule plus the conjunction, all JVM column expressions."""

import pytest

from iresearch_spark.ops.textstats import gopher_quality_filter

# relaxed thresholds so each fixture doc trips exactly the rule it
# targets (the paper's 50..100k word bounds need longer docs)
KW = dict(min_words=5, max_words=20, min_stop_hits=2)

ROWS = [
    # 0: passes everything (9 words, stopwords 'the of and', alpha)
    (0, "the cat sat and most of the dogs slept"),
    # 1: too short (2 words)
    (1, "the of"),
    # 2: symbol ratio: 3 '#' over 6 words = 0.5 > 0.1
    (2, "the # cat # and # of"),
    # 3: mean word length < 3
    (3, "an it of be at the me we so no"),
    # 4: bullet lines: every line starts with '-'
    (4, "- the first item of all\n- and the second item here"),
    # 5: ellipsis lines: both lines end with '...'
    (5, "the cat sat of it and...\nmore of the same here..."),
    # 6: alpha fraction: 6 digit 'words' of 8 -> 0.25 < 0.8
    (6, "the of 11 22 33 44 55 66"),
    # 7: only one distinct stopword ('the' twice still counts once)
    (7, "the cat ran around the block quickly today"),
    # 8: too long (21 words > max_words=20)
    (8, " ".join(["the", "of"] + ["word"] * 19)),
    # 9: mean word length > 10
    (9, "the of extraordinarily incomprehensibilities antidisestablishmentarian " * 2),
]


@pytest.fixture(scope="module")
def flags(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_filter(df, **KW).collect()
    }


def test_clean_doc_keeps(flags):
    f = flags[0]
    assert f["keep"] == 1
    for k in (
        "words_ok wordlen_ok symbol_ok bullet_ok ellipsis_ok "
        "alpha_ok stop_ok"
    ).split():
        assert f[k] == 1, k


@pytest.mark.parametrize(
    "doc_id,failed",
    [
        (1, "words_ok"),
        (2, "symbol_ok"),
        (3, "wordlen_ok"),
        (4, "bullet_ok"),
        (5, "ellipsis_ok"),
        (6, "alpha_ok"),
        (7, "stop_ok"),
        (8, "words_ok"),
        (9, "wordlen_ok"),
    ],
)
def test_each_rule_trips(flags, doc_id, failed):
    f = flags[doc_id]
    assert f[failed] == 0, f
    assert f["keep"] == 0


def test_word_count_column(flags):
    assert flags[0]["n_words"] == 9
    assert flags[1]["n_words"] == 2


def test_ellipsis_unicode_and_bullet_star(spark):
    df = spark.createDataFrame(
        [
            (0, "• the bullet of dots here\n* and a star line too"),
            (1, "the end of it trails…\nthe next one also ends…"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_filter(df, **KW).collect()
    }
    assert out[0]["bullet_ok"] == 0
    assert out[1]["ellipsis_ok"] == 0


def test_empty_text_never_divides_by_zero(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   ")], "doc_id long, text string"
    )
    out = gopher_quality_filter(df, **KW).collect()
    assert {r["keep"] for r in out} == {0}
