"""Offset (OFFS) posting feature: span tokenizer parity, build/decode
round-trip, highlight API, consolidation/purge preservation."""

import re

import pytest

from iresearch_spark.analysis.analyzers import get_analyzer
from iresearch_spark.index.builder import build_index
from iresearch_spark.index.merge import consolidate, purge_deleted
from iresearch_spark.search import SearchEngine, Term

ROWS = [
    (0, "The quick brown Fox jumps"),
    (1, "quick   quick fox"),
    (2, "a lone token"),
    (3, ""),
    (4, "Fox FOX fox"),
]


def _ground_truth_spans(analyzer_name):
    """(doc_id, term) -> [(start, len)] computed by plain re over the
    lowered text (simple lowercase is length-preserving)."""
    out = {}
    pat = re.compile(r"\S+") if analyzer_name in ("simple", "whitespace") else None
    for doc_id, text in ROWS:
        t = text.lower() if analyzer_name == "simple" else text
        for m in pat.finditer(t):
            out.setdefault((doc_id, m.group()), []).append(
                (m.start(), m.end() - m.start())
            )
    return out


def test_span_tokenizer_matches_chain():
    for name in ("simple", "whitespace", "segmentation"):
        an = get_analyzer(name)
        assert an.supports_offsets
        texts = [t for _, t in ROWS] + ["  padded   text  ", "don't stop"]
        flat = an.analyze_flat(texts)
        spans = an.analyze_flat_spans(texts)
        assert list(flat.n_tokens) == list(spans.n_tokens)
        assert [flat.uniques[c] for c in flat.codes] == [
            spans.uniques[c] for c in spans.codes
        ]
        assert list(flat.positions) == list(spans.positions)
        # spans index the original text: extracting them re-yields the
        # token (modulo the chain's lowercasing)
        doc_of = []
        for i, n in enumerate(spans.n_tokens):
            doc_of.extend([i] * n)
        for k in range(len(spans.codes)):
            tok = spans.uniques[spans.codes[k]]
            src = texts[doc_of[k]]
            s, l = int(spans.starts[k]), int(spans.lens[k])
            piece = src[s : s + l]
            if name == "whitespace":
                assert piece == tok
            else:
                assert piece.lower() == tok.lower()


def test_unsupported_analyzer_raises(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    with pytest.raises(ValueError):
        build_index(df, analyzer="ngram", with_offsets=True, bucket_bits=7)


@pytest.fixture(scope="module")
def offs_idx(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    ix = build_index(df, analyzer="simple", bucket_bits=7, with_offsets=True)
    ix.cache()
    yield ix
    ix.unpersist()


def _spans_of(idx, terms, spark=None):
    eng = SearchEngine(idx)
    out = {}
    for r in eng.highlight(terms).collect():
        out.setdefault((r["doc_id"], r["term"]), []).append(
            (r["start"], r["length"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_highlight_spans_match_ground_truth(offs_idx):
    truth = _ground_truth_spans("simple")
    for terms in (["fox"], ["quick", "the"], ["token"]):
        got = _spans_of(offs_idx, terms)
        want = {
            k: sorted(v) for k, v in truth.items() if k[1] in terms
        }
        assert got == want, (terms, got, want)


def test_search_unaffected_by_offsets(spark, offs_idx):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    plain = build_index(df, analyzer="simple", bucket_bits=7)
    a = {
        (r["doc_id"], round(r["score"], 9))
        for r in SearchEngine(offs_idx).matches(Term("fox")).collect()
    }
    b = {
        (r["doc_id"], round(r["score"], 9))
        for r in SearchEngine(plain).matches(Term("fox")).collect()
    }
    assert a == b


def test_offsets_survive_save_load_consolidate_purge(spark, offs_idx, tmp_path):
    path = str(tmp_path / "offix")
    offs_idx.save(path)
    loaded = offs_idx.load(spark, path)
    assert loaded.with_offsets
    truth = _spans_of(offs_idx, ["fox", "quick"])
    assert _spans_of(loaded, ["fox", "quick"]) == truth
    cons = consolidate(loaded, bucket_bits=7)
    assert _spans_of(cons, ["fox", "quick"]) == truth
    mask = spark.createDataFrame([(1,)], "doc_id long")
    purged = purge_deleted(loaded.delete_docs(mask), bucket_bits=7)
    want = {k: v for k, v in truth.items() if k[0] != 1}
    assert _spans_of(purged, ["fox", "quick"]) == want


def test_highlight_doc_filter_and_delete_mask(spark, offs_idx):
    some = spark.createDataFrame([(0,), (4,)], "doc_id long")
    got = _spans_of_filtered(offs_idx, ["fox"], some)
    assert set(d for d, _ in got) == {0, 4}
    masked = offs_idx.delete_docs(spark.createDataFrame([(4,)], "doc_id long"))
    got = _spans_of_filtered(masked, ["fox"], some)
    assert set(d for d, _ in got) == {0}


def _spans_of_filtered(idx, terms, doc_ids):
    eng = SearchEngine(idx)
    return [
        (r["doc_id"], (r["start"], r["length"]))
        for r in eng.highlight(terms, doc_ids=doc_ids).collect()
    ]
