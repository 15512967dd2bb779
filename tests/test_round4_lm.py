"""Round-4 continuation: bigram-LM perplexity (CCNet shape) and DSIR
importance weights — closed-form goldens + determinism."""

import hashlib
import math

import pytest
from pyspark.sql import Row, functions as F

from iresearch_spark.ops.lm import (
    dsir_log_weights,
    dsir_sample,
    lm_cross_entropy,
    perplexity_filter,
    train_bigram_lm,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


REF = ["the cat sat", "the cat ran"]


@pytest.fixture(scope="module")
def model(spark):
    ref = spark.createDataFrame([Row(text=t) for t in REF])
    return train_bigram_lm(ref)


def test_bigram_lm_counts(spark, model):
    bigrams, unigrams, v = model
    assert v == 4  # the cat sat ran
    uni = {r["w1"]: r["c1"] for r in unigrams.collect()}
    assert uni == {"the": 2, "cat": 2, "sat": 1, "ran": 1}
    bi = {(r["w1"], r["w2"]): r["c2"] for r in bigrams.collect()}
    assert bi == {("the", "cat"): 2, ("cat", "sat"): 1, ("cat", "ran"): 1}


def test_cross_entropy_closed_form(spark, model):
    bigrams, unigrams, v = model
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat"),
            Row(doc_id=2, text="dog runs"),
            Row(doc_id=3, text="x"),
            Row(doc_id=4, text=""),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in lm_cross_entropy(docs, bigrams, unigrams, v).collect()
    }
    # doc 1: P(cat|the)=(2+1)/(2+4), P(sat|cat)=(1+1)/(2+4)
    ce1 = -(math.log(3 / 6) + math.log(2 / 6)) / 2
    assert out[1]["n_bigrams"] == 2
    assert out[1]["cross_entropy"] == pytest.approx(ce1, abs=1e-6)
    assert out[1]["ppl"] == pytest.approx(math.exp(ce1), abs=1e-3)
    # doc 2: both words OOV -> P = 1/(0+4)
    assert out[2]["cross_entropy"] == pytest.approx(math.log(4), abs=1e-6)
    # docs 3/4: too short to score
    for d in (3, 4):
        assert out[d]["n_bigrams"] == 0
        assert out[d]["cross_entropy"] is None
        assert out[d]["ppl"] is None


def test_tokenizer_unicode_and_punct(spark):
    ref = spark.createDataFrame([Row(text="Héllo, wörld! Héllo wörld?")])
    bigrams, unigrams, v = train_bigram_lm(ref)
    uni = {r["w1"]: r["c1"] for r in unigrams.collect()}
    assert uni == {"héllo": 2, "wörld": 2}
    assert v == 2
    bi = {(r["w1"], r["w2"]): r["c2"] for r in bigrams.collect()}
    # punctuation splits: "wörld! Héllo" is still adjacent after split
    assert bi[("héllo", "wörld")] == 2
    assert bi[("wörld", "héllo")] == 1


def test_perplexity_filter(spark):
    ref = spark.createDataFrame([Row(text=t) for t in REF])
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat"),      # in-domain, low ppl
            Row(doc_id=2, text="zzz qqq www eee"),  # all-OOV, ppl = V
            Row(doc_id=3, text="x"),                # unscorable -> dropped
        ]
    )
    ce1 = -(math.log(3 / 6) + math.log(2 / 6)) / 2
    cutoff = (math.exp(ce1) + 4.0) / 2  # between doc1's ppl and doc2's
    # n=2 pins the bigram closed form this test derives (round 5 made
    # the interpolated 5-gram the default)
    kept = sorted(
        r["doc_id"]
        for r in perplexity_filter(docs, ref, max_ppl=cutoff, n=2).collect()
    )
    assert kept == [1]


def test_dsir_log_weights_closed_form(spark):
    n_buckets = 64
    raw_rows = [(1, "aa bb"), (2, "cc dd")]
    tgt_rows = ["aa bb aa"]
    docs = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    tgt = spark.createDataFrame([Row(text=t) for t in tgt_rows])
    out = {
        r["doc_id"]: r
        for r in dsir_log_weights(docs, tgt, n_buckets=n_buckets).collect()
    }

    def feats(text):
        toks = text.split()
        return [_h60(t) % n_buckets for t in toks] + [
            _h60(f"{a} {b}") % n_buckets for a, b in zip(toks, toks[1:])
        ]

    raw_feats = [b for _, t in raw_rows for b in feats(t)]
    tgt_feats = [b for t in tgt_rows for b in feats(t)]
    t_tot, r_tot = len(tgt_feats), len(raw_feats)
    for doc_id, text in raw_rows:
        expect = sum(
            math.log((tgt_feats.count(b) + 1) / (t_tot + n_buckets))
            - math.log((raw_feats.count(b) + 1) / (r_tot + n_buckets))
            for b in feats(text)
        )
        assert out[doc_id]["n_features"] == len(feats(text))
        assert out[doc_id]["log_weight"] == pytest.approx(expect, abs=1e-6)
    # target-like doc must outweigh the off-target doc
    assert out[1]["log_weight"] > out[2]["log_weight"]


def test_dsir_empty_doc(spark):
    docs = spark.createDataFrame([(1, "aa"), (2, "")], ["doc_id", "text"])
    tgt = spark.createDataFrame([Row(text="aa")])
    out = {r["doc_id"]: r for r in dsir_log_weights(docs, tgt).collect()}
    assert out[2]["n_features"] == 0
    assert out[2]["log_weight"] == 0.0


def test_dsir_sample_deterministic_and_weighted(spark):
    docs = spark.createDataFrame(
        [(i, "target phrase here" if i % 2 == 0 else "noise junk spam")
         for i in range(40)],
        ["doc_id", "text"],
    )
    tgt = spark.createDataFrame([Row(text="target phrase here target phrase")])
    got1 = [r["doc_id"] for r in dsir_sample(docs, tgt, k=10, seed=7).collect()]
    got2 = [
        r["doc_id"]
        for r in dsir_sample(
            docs.repartition(7), tgt, k=10, seed=7
        ).collect()
    ]
    assert got1 == got2  # seeded + partitioning-independent
    assert len(got1) == 10
    # weights dominate the bounded Gumbel noise here: mostly even ids
    assert sum(1 for d in got1 if d % 2 == 0) >= 8
    got3 = [r["doc_id"] for r in dsir_sample(docs, tgt, k=10, seed=8).collect()]
    assert got1 != got3  # seed actually feeds the noise


def test_trigram_interpolated_closed_form(spark):
    from iresearch_spark.ops.lm import train_trigram_lm, trigram_cross_entropy

    ref = spark.createDataFrame([Row(text="a b c a b d")])
    tri, bi, uni, v, t = train_trigram_lm(ref)
    assert (v, t) == (4, 6)
    assert {(r["w1"], r["w2"], r["w3"]): r["c3"] for r in tri.collect()} == {
        ("a", "b", "c"): 1, ("b", "c", "a"): 1,
        ("c", "a", "b"): 1, ("a", "b", "d"): 1,
    }
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c"), Row(doc_id=2, text="x y z"),
         Row(doc_id=3, text="a b")]
    )
    out = {
        r["doc_id"]: r
        for r in trigram_cross_entropy(docs, tri, bi, uni, v, t).collect()
    }
    p1 = 0.5 * 2 / 6 + 0.3 * 2 / 6 + 0.2 * 2 / 10
    assert out[1]["n_trigrams"] == 1
    assert out[1]["cross_entropy"] == pytest.approx(-math.log(p1), abs=1e-6)
    p2 = 0.5 * 1 / 4 + 0.3 * 1 / 4 + 0.2 * 1 / 10
    assert out[2]["cross_entropy"] == pytest.approx(-math.log(p2), abs=1e-6)
    assert out[3]["n_trigrams"] == 0 and out[3]["cross_entropy"] is None
    # in-domain text scores better than OOV text
    assert out[1]["ppl"] < out[2]["ppl"]


def test_trigram_lambda_validation(spark):
    from iresearch_spark.ops.lm import train_trigram_lm, trigram_cross_entropy

    ref = spark.createDataFrame([Row(text="a b c")])
    tri, bi, uni, v, t = train_trigram_lm(ref)
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    with pytest.raises(ValueError):
        trigram_cross_entropy(docs, tri, bi, uni, v, t, lambdas=(0.5, 0.5, 0.5))
