"""Gopher-style repetition signals: hand-computed goldens + edge cases."""

import pytest

from iresearch_spark.ops import textstats


def _rows(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_repetition_hand_computed(spark):
    # doc 1: "a b a b a" -> 5 tokens, 2 unique
    #   2-grams: [a b, b a, a b, b a] -> max2 = 2 -> top2 = 4/5
    #   3-grams: [a b a, b a b, a b a] -> max3 = 2 -> top3 = 6/5 -> 1.2
    #   5-grams: [a b a b a] -> none duplicated -> dup5 = 0
    # doc 2: "x y z w v u" all unique -> rep 0, max2=max3=1
    # doc 3: "c c c c c c c c c c" 10 tokens 1 unique
    #   2-grams: 9x "c c" -> top2 = 18/10 -> clamp? top fracs are NOT
    #   clamped (only dup5 is) - they can exceed 1 by overlap; assert raw
    #   3-grams: 8x -> top3 = 24/10
    #   5-grams: 6x "c c c c c" -> dup5 = 30/10 -> clamped to 1.0
    df = _rows(
        spark,
        [
            (1, "a b a b a"),
            (2, "x y z w v u"),
            (3, "c c c c c c c c c c"),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in textstats.repetition_signals(df).collect()
    }
    assert out[1]["rep_token_frac"] == pytest.approx(1 - 2 / 5)
    assert out[1]["top2_frac"] == pytest.approx(4 / 5)
    assert out[1]["top3_frac"] == pytest.approx(6 / 5)
    assert out[1]["dup5_frac"] == 0.0
    assert out[2]["rep_token_frac"] == 0.0
    assert out[2]["top2_frac"] == pytest.approx(2 / 6)
    assert out[2]["top3_frac"] == pytest.approx(3 / 6)
    assert out[3]["rep_token_frac"] == pytest.approx(0.9)
    assert out[3]["top2_frac"] == pytest.approx(1.8)
    assert out[3]["top3_frac"] == pytest.approx(2.4)
    assert out[3]["dup5_frac"] == 1.0  # clamped


def test_repetition_short_docs_survive(spark):
    # docs shorter than the shingle sizes must still appear, with 0.0
    df = _rows(spark, [(1, "solo"), (2, "two words"), (3, "one two three")])
    out = {
        r["doc_id"]: r.asDict()
        for r in textstats.repetition_signals(df).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["top2_frac"] == 0.0
    assert out[1]["top3_frac"] == 0.0
    assert out[1]["dup5_frac"] == 0.0
    assert out[1]["rep_token_frac"] == 0.0
    assert out[2]["top2_frac"] == pytest.approx(1.0)  # one 2-gram, count 1
    assert out[2]["top3_frac"] == 0.0
    assert out[3]["top3_frac"] == pytest.approx(1.0)


def test_repetition_case_and_whitespace_normalized(spark):
    df = _rows(spark, [(1, "  The THE the  ")])
    out = textstats.repetition_signals(df).collect()[0]
    assert out["rep_token_frac"] == pytest.approx(2 / 3)
    assert out["top2_frac"] == pytest.approx(4 / 3)
