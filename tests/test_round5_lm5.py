"""Interpolated n-gram LM (CCNet 5-gram parity): closed-form check,
pruning semantics, n=3 equivalence with the legacy trigram, and the
5-gram perplexity_filter default."""

import math

import pytest
from pyspark.sql import Row

from iresearch_spark.ops.lm import (
    ngram_cross_entropy,
    perplexity_filter,
    train_ngram_lm,
    train_trigram_lm,
    trigram_cross_entropy,
)


REF = ["the cat sat on the mat today and then the cat ran home fast"]


def test_train_counts_and_pruning(spark):
    ref = spark.createDataFrame([Row(text=t) for t in REF * 2])
    counts, v, t = train_ngram_lm(ref, n=5, min_count=2)
    assert len(counts) == 5
    uni = {r["w1"]: r["c1"] for r in counts[0].collect()}
    assert uni["the"] == 6 and uni["cat"] == 4
    assert v == len(uni)
    assert t == sum(uni.values())
    # every distinct 5-gram appears twice (corpus duplicated) -> none
    # pruned; with min_count=3 all orders >= 3 prune away
    assert counts[4].count() > 0
    pruned, _, _ = train_ngram_lm(ref, n=5, min_count=3)
    assert pruned[4].count() == 0
    assert pruned[0].count() == v  # unigrams never pruned


def test_ngram3_equals_legacy_trigram(spark):
    ref = spark.createDataFrame([Row(text=t) for t in REF])
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat"),
            Row(doc_id=2, text="completely novel words here today"),
            Row(doc_id=3, text="to o"),  # < 3 tokens -> NULLs
        ]
    )
    tri, bi, uni, v, t = train_trigram_lm(ref)
    old = {
        r["doc_id"]: (r["n_trigrams"], r["cross_entropy"], r["ppl"])
        for r in trigram_cross_entropy(
            docs, tri, bi, uni, v, t, lambdas=(0.5, 0.3, 0.2)
        ).collect()
    }
    counts, v2, t2 = train_ngram_lm(ref, n=3, min_count=1)
    new = {
        r["doc_id"]: (r["n_ngrams"], r["cross_entropy"], r["ppl"])
        for r in ngram_cross_entropy(
            docs, counts, v2, t2, lambdas=(0.2, 0.3, 0.5)
        ).collect()
    }
    assert (v, t) == (v2, t2)
    assert old == new


def test_5gram_scores_and_ranks_in_domain_lower(spark):
    ref = spark.createDataFrame([Row(text=t) for t in REF * 3])
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat today and then"),
            Row(doc_id=2, text="qqq zzz www eee rrr ttt yyy uuu iii"),
            Row(doc_id=3, text="too short"),
        ]
    )
    counts, v, t = train_ngram_lm(ref, n=5, min_count=1)
    out = {
        r["doc_id"]: r for r in ngram_cross_entropy(docs, counts, v, t).collect()
    }
    assert out[1]["ppl"] < out[2]["ppl"]
    assert out[3]["n_ngrams"] == 0 and out[3]["ppl"] is None
    assert out[1]["n_ngrams"] == 9 - 4


def test_perplexity_filter_5gram_default(spark):
    ref = spark.createDataFrame([Row(text=t) for t in REF * 3])
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat today and then"),
            Row(doc_id=2, text="qqq zzz www eee rrr ttt yyy uuu iii"),
            Row(doc_id=3, text="too short"),  # < 5 tokens -> dropped
        ]
    )
    counts, v, t = train_ngram_lm(ref, n=5)
    ppl1 = ngram_cross_entropy(docs, counts, v, t).collect()
    p = {r["doc_id"]: r["ppl"] for r in ppl1 if r["ppl"] is not None}
    cutoff = (p[1] + p[2]) / 2
    kept = sorted(
        r["doc_id"]
        for r in perplexity_filter(docs, ref, max_ppl=cutoff).collect()
    )
    assert kept == [1]


def test_lambda_validation(spark):
    ref = spark.createDataFrame([Row(text=REF[0])])
    counts, v, t = train_ngram_lm(ref, n=3, min_count=1)
    docs = spark.createDataFrame([Row(doc_id=1, text=REF[0])])
    with pytest.raises(ValueError):
        ngram_cross_entropy(docs, counts, v, t, lambdas=(0.5, 0.5))
    with pytest.raises(ValueError):
        train_ngram_lm(ref, n=9)
