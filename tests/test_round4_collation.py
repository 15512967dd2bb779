"""Round-4: `collation` analyzer (reference
collation_token_stream.cpp — ICU sort key of the whole input as a
single term; here the documented root-collation UCA approximation)."""

import pytest
from pyspark.sql import SparkSession

from iresearch_spark.analysis.analyzers import (
    collation_sort_key,
    get_analyzer,
)
from iresearch_spark.index.builder import build_index
from iresearch_spark.search import Range, SearchEngine, Term


def test_root_collation_order():
    """UCA root level semantics: accents break primary ties, case
    breaks accent ties — the classic cote < Cote < coté < côte."""
    words = ["côte", "coté", "Cote", "cote"]
    assert sorted(words, key=collation_sort_key) == [
        "cote", "Cote", "coté", "côte",
    ]
    # primary strength: case- and accent-insensitive equality
    keys1 = {collation_sort_key(w, strength=1) for w in words}
    assert len(keys1) == 1
    # secondary strength: case-insensitive, accent-sensitive
    assert collation_sort_key("Cote", 2) == collation_sort_key("cote", 2)
    assert collation_sort_key("coté", 2) != collation_sort_key("cote", 2)


def test_casefold_expansion_and_levels():
    # ß casefolds to ss at the primary level
    assert collation_sort_key("straße", 1) == collation_sort_key("strasse", 1)
    assert collation_sort_key("straße", 3) != collation_sort_key("strasse", 3)
    # level separator sorts below content: prefix string sorts first
    assert collation_sort_key("ab") < collation_sort_key("abc")
    assert collation_sort_key("ab") < collation_sort_key("ába")


def test_analyzer_emits_one_key_term():
    a = get_analyzer("collation")
    terms, pos = a.analyze("Côte d'Ivoire")
    assert len(terms) == 1 and pos == [0]
    assert terms[0] == collation_sort_key("Côte d'Ivoire")
    assert a.analyze("") == ([], [])


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("round4-collation")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    yield s


def test_collation_index_range_query(spark):
    """Range over collation keys follows collation order, not code
    point order: ['côte'..'créme'] must include 'coté' (code point
    order would put 'coté' after 'côte' is false — ô > o² … exactly
    the bug collation fixes) and exclude 'cote'/'Cote'."""
    names = ["cote", "Cote", "coté", "côte", "créme", "daft"]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(names)], "doc_id long, text string"
    )
    idx = build_index(
        docs, analyzer=get_analyzer("collation"), bucket_bits=4,
        with_positions=False,
    )
    eng = SearchEngine(idx)
    lo = collation_sort_key("coté")
    hi = collation_sort_key("créme")
    got = sorted(
        r["doc_id"]
        for r in eng.matches(Range(min_term=lo, max_term=hi)).collect()
    )
    assert got == [2, 3, 4]  # coté, côte, créme — not cote/Cote/daft
    # case-insensitive exact match via strength=2 keys
    idx2 = build_index(
        docs,
        analyzer=get_analyzer("collation", strength=2),
        bucket_bits=4,
        with_positions=False,
    )
    eng2 = SearchEngine(idx2)
    got2 = sorted(
        r["doc_id"]
        for r in eng2.matches(Term(collation_sort_key("COTE", 2))).collect()
    )
    assert got2 == [0, 1]
