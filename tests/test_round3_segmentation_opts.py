"""Segmentation case/word_break options (segmentation_token_stream.hpp
case_convert_t / word_break_t)."""

import pytest

from iresearch_spark.analysis.analyzers import get_analyzer


def _terms(an, text):
    return an.analyze(text)[0]


def test_case_modes():
    assert _terms(get_analyzer("segmentation"), "Foo BAR") == ["foo", "bar"]
    assert _terms(get_analyzer("segmentation", case="none"), "Foo BAR") == [
        "Foo",
        "BAR",
    ]
    assert _terms(get_analyzer("segmentation", case="upper"), "Foo bar") == [
        "FOO",
        "BAR",
    ]


def test_word_break_graphic_keeps_symbol_runs():
    text = "a-b$ c 4.5 --"
    alpha = _terms(get_analyzer("segmentation"), text)
    graphic = _terms(
        get_analyzer("segmentation", word_break="graphic"), text
    )
    assert alpha == ["a", "b", "c", "4", "5"]
    assert graphic == ["a-b$", "c", "4.5", "--"]


def test_invalid_options_raise():
    with pytest.raises(ValueError):
        get_analyzer("segmentation", case="title")
    with pytest.raises(ValueError):
        get_analyzer("segmentation", word_break="all")
