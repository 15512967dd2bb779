"""Exact-substring (n-token window) duplicate detection + removal
(ops/dedup.py duplicate_span_windows / drop_duplicate_spans) — the
Spark-native analogue of the suffix-array pass in Lee et al. 2021,
'Deduplicating Training Data Makes Language Models Better'."""

import pytest

from iresearch_spark.ops.dedup import (
    drop_duplicate_spans,
    duplicate_span_windows,
)

# n=3 fixture: 'a b c' occurs in docs 0/1/2 (global first = (0,1));
# doc 4 repeats its own 'p q r' cycle internally; doc 3 is too short
ROWS = [
    (0, "a b c d e"),
    (1, "x a b c y"),
    (2, "a b c"),
    (3, "short one"),
    (4, "p q r p q r p q"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_flagged_windows_exact(spark, docs):
    got = {
        (r["doc_id"], r["start"])
        for r in duplicate_span_windows(docs, n=3).collect()
    }
    # 'a b c': first at (0,1), flagged (1,2) and (2,1);
    # doc 4 windows 'p q r'/'q r p'/'r p q' each occur twice — the
    # second occurrence (starts 4,5,6) is flagged, firsts kept
    assert got == {(1, 2), (2, 1), (4, 4), (4, 5), (4, 6)}


def test_drop_spans_rebuild(spark, docs):
    out = {
        r["doc_id"]: r["text"]
        for r in drop_duplicate_spans(docs, n=3).collect()
    }
    assert out[0] == "a b c d e"  # canonical copy untouched
    assert out[1] == "x y"  # middle 3 tokens cut
    assert out[2] == ""  # whole doc was a duplicate window
    assert out[3] == "short one"  # < n tokens: passthrough
    assert out[4] == "p q r"  # tail indexes 4..8 cut
    assert len(out) == 5


def test_no_duplicates_noop(spark):
    df = spark.createDataFrame(
        [(0, "one two three four"), (1, "five six seven")],
        "doc_id long, text string",
    )
    assert duplicate_span_windows(df, n=3).count() == 0
    out = {r["doc_id"]: r["text"] for r in drop_duplicate_spans(df, n=3).collect()}
    assert out == {0: "one two three four", 1: "five six seven"}


def test_whitespace_normalized_windows_match(spark):
    # the op is defined over the token stream: extra whitespace does
    # not distinguish windows
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "  a   b\tc  z ")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["start"])
        for r in duplicate_span_windows(df, n=3).collect()
    }
    assert got == {(1, 1)}  # 'a b c' again, first at (0,1)


def test_window_longer_than_every_doc(spark, docs):
    assert duplicate_span_windows(docs, n=50).count() == 0
    out = {
        r["doc_id"]: r["text"]
        for r in drop_duplicate_spans(docs, n=50).collect()
    }
    assert out[4] == "p q r p q r p q"
