"""ngram start/end markers (ngram_token_stream.hpp:64-67 semantics)."""

from iresearch_spark.analysis.analyzers import get_analyzer


def _toks(an, text):
    terms, positions = an.analyze(text)
    return list(zip(terms, positions))


def test_start_marker_replaces_plain_at_offset_zero():
    an = get_analyzer("ngram", min_gram=2, max_gram=2, start_marker="^")
    got = _toks(an, "abc")
    assert ("^ab", 0) in got
    assert ("ab", 0) not in got
    assert ("bc", 1) in got  # non-anchored stays plain


def test_end_marker_appends_at_stream_end():
    an = get_analyzer("ngram", min_gram=2, max_gram=2, end_marker="$")
    got = _toks(an, "abc")
    assert ("bc$", 1) in got
    assert ("bc", 1) not in got
    assert ("ab", 0) in got


def test_whole_input_ngram_emits_both_marked_forms():
    an = get_analyzer(
        "ngram", min_gram=3, max_gram=3, start_marker="^", end_marker="$"
    )
    got = _toks(an, "abc")
    assert got == [("^abc", 0), ("abc$", 0)]


def test_preserve_original_carries_markers():
    an = get_analyzer(
        "ngram",
        min_gram=2,
        max_gram=2,
        preserve_original=True,
        start_marker="^",
        end_marker="$",
    )
    got = _toks(an, "abcd")
    assert ("^abcd", 0) in got and ("abcd$", 0) in got


def test_no_markers_unchanged():
    an = get_analyzer("ngram", min_gram=2, max_gram=3)
    got = _toks(an, "abc")
    assert got == [("ab", 0), ("bc", 1), ("abc", 0)]
