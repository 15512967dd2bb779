"""topk_join (query-set vs corpus exact cosine top-k): numpy oracle
differential, partition invariance, self-match handling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from iresearch_spark.ops import similarity


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=12)]) for i in range(80)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _numpy_oracle(rows, query_ids, k, quantize=1_000_000, exclude_same=True):
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    v = M * quantize
    Mq = np.trunc(v + np.copysign(0.5, v)).astype(np.int64)
    norm = np.sqrt((Mq * Mq).sum(axis=1).astype(np.float64))
    out = {}
    for qid in query_ids:
        qi = int(np.nonzero(ids == qid)[0][0])
        cos = (Mq @ Mq[qi]).astype(np.float64) / (norm * norm[qi])
        cand = [
            (ids[j], cos[j])
            for j in range(len(ids))
            if np.isfinite(cos[j]) and (not exclude_same or ids[j] != qid)
        ]
        cand.sort(key=lambda t: (-t[1], t[0]))
        out[qid] = cand[:k]
    return out


def test_matches_numpy_oracle(spark, emb):
    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    qids = [0, 25, 50, 75]
    queries = emb.filter(F.col("vec_id").isin(qids))
    got = similarity.topk_join(queries, emb, k=3).collect()
    exp = _numpy_oracle(rows, qids, k=3)
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["cosine"])
        )
    assert set(by_q) == set(qids)
    for qid in qids:
        assert [n for n, _ in by_q[qid]] == [n for n, _ in exp[qid]]
        for (_, got_c), (_, exp_c) in zip(by_q[qid], exp[qid]):
            assert got_c == pytest.approx(exp_c, abs=1e-12)


def test_partition_invariant(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    a = similarity.topk_join(queries, emb, k=4).collect()
    b = similarity.topk_join(queries, emb.repartition(7), k=4).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in a) == \
        sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in b)
    # exact float equality across partitionings (deterministic math)
    assert {key(r): r["cosine"] for r in a} == {key(r): r["cosine"] for r in b}


def test_self_match_toggle(spark, emb):
    queries = emb.filter(F.col("vec_id") == 7)
    incl = similarity.topk_join(
        queries, emb, k=2, exclude_same_id=False
    ).collect()
    top = [r for r in incl if r["rank"] == 1][0]
    assert top["neighbor_id"] == 7
    assert top["cosine"] == pytest.approx(1.0, abs=1e-9)
    excl = similarity.topk_join(queries, emb, k=2).collect()
    assert all(r["neighbor_id"] != 7 for r in excl)


def test_k_exceeds_corpus(spark):
    rows = [(i, [1.0, float(i)]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.topk_join(df.filter(F.col("vec_id") == 0), df, k=10)
    assert out.count() == 2  # corpus minus self


def test_max_queries_guard(spark, emb):
    with pytest.raises(ValueError):
        similarity.topk_join(emb, emb, k=1, max_queries=10)


def test_ivf_external_queries_match_self_join(spark, emb):
    """ivf_topk(queries=subset of corpus) must reproduce exactly the
    self-join results for those query ids (same centroids, same probe
    cells, same candidates)."""
    full = similarity.ivf_topk(emb, k=3, n_centroids=4, n_probe=2)
    qids = [2, 40, 71]
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], round(r["cosine"], 9))
        for r in full.collect()
        if r["query_id"] in qids
    )
    sub = similarity.ivf_topk(
        emb,
        k=3,
        n_centroids=4,
        n_probe=2,
        queries=emb.filter(F.col("vec_id").isin(qids)),
    )
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], round(r["cosine"], 9))
        for r in sub.collect()
    )
    assert got == want


def test_lsh_external_queries_match_self_join(spark, emb):
    """lsh_topk(queries=subset of corpus) must reproduce the self-join
    results for those ids exactly (same sign matrix -> same buckets)."""
    for mp in (False, True):
        full = similarity.lsh_topk(emb, k=3, n_bits=4, multi_probe=mp)
        qids = [5, 33, 64]
        want = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in full.collect()
            if r["query_id"] in qids
        )
        sub = similarity.lsh_topk(
            emb,
            k=3,
            n_bits=4,
            multi_probe=mp,
            queries=emb.filter(F.col("vec_id").isin(qids)),
        )
        got = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in sub.collect()
        )
        assert got == want, f"multi_probe={mp}"
