"""Round-3 ANN/dedup additions: banded multi-table LSH bucket
candidates (the scale path of embedding_dup_pairs) and multi-probe
LSH top-k (recall controls at high n_bits).
"""

from __future__ import annotations

import numpy as np
import pytest

from iresearch_spark.ops import dedup, similarity


@pytest.fixture(scope="module")
def near_dup_emb(spark):
    """60 base vectors + 2 perturbed near-duplicates each: real
    high-cosine pairs so LSH recall is measurable (random vectors have
    no near-dups)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 16))
    rows = []
    vid = 0
    for i in range(60):
        for rep in range(3):
            noise = 0.0 if rep == 0 else 0.05
            v = base[i] + noise * rng.normal(size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_lsh_bucket_candidates_no_false_pairs_and_high_recall(near_dup_emb):
    exact = _pairs(
        dedup.embedding_dup_pairs(near_dup_emb, threshold=0.95, method="exact")
    )
    assert len(exact) >= 60  # each triple yields >= 1 high-cosine pair
    lsh = _pairs(
        dedup.embedding_dup_pairs(
            near_dup_emb, threshold=0.95, method="lsh", n_bits=8, n_tables=8
        )
    )
    # exact-verify step => no false positives, ever
    assert lsh <= exact
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, recall


def test_embedding_dup_pairs_auto_routing(near_dup_emb):
    # under the row threshold auto == exact
    auto = _pairs(
        dedup.embedding_dup_pairs(near_dup_emb, threshold=0.95, method="auto")
    )
    exact = _pairs(
        dedup.embedding_dup_pairs(near_dup_emb, threshold=0.95, method="exact")
    )
    assert auto == exact
    # over the threshold auto routes to lsh (subset, non-empty here)
    routed = _pairs(
        dedup.embedding_dup_pairs(
            near_dup_emb,
            threshold=0.95,
            method="auto",
            exact_max_rows=10,
            n_bits=8,
            n_tables=8,
        )
    )
    assert routed <= exact and routed


def test_lsh_bucket_candidates_table0_matches_single_signature(near_dup_emb):
    """Table 0 of the banded construction is bit-identical to
    hyperplane_signature — the two APIs share one hash family."""
    single = {
        (r["id"], r["sig"])
        for r in similarity.hyperplane_signature(near_dup_emb, n_bits=6).collect()
    }
    multi = {
        (r["id"], r["sig_0"])
        for r in similarity.multi_signatures(near_dup_emb, 6, 3).collect()
    }
    assert single == multi


def _topk_set(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_multi_probe_recall_curve(near_dup_emb):
    """Multi-probe must dominate single-bucket at every n_bits, and
    keep recall from cliff-diving as n_bits grows (the round-2 gap)."""
    k = 2
    exact = _topk_set(similarity.brute_force_topk(near_dup_emb, k=k))
    prev = None
    for n_bits in (8, 12, 16):
        single = _topk_set(
            similarity.lsh_topk(near_dup_emb, k=k, n_bits=n_bits)
        )
        multi = _topk_set(
            similarity.lsh_topk(
                near_dup_emb, k=k, n_bits=n_bits, multi_probe=True
            )
        )
        r_single = len(single & exact) / len(exact)
        r_multi = len(multi & exact) / len(exact)
        # probe set includes the exact bucket -> candidate superset
        assert r_multi >= r_single, (n_bits, r_single, r_multi)
        prev = (n_bits, r_single, r_multi)
    # at the highest n_bits multi-probe must retain usable recall
    assert prev[2] >= 0.5, prev


def test_multi_probe_results_are_valid_topk(near_dup_emb):
    """Every multi-probe (query, rank) row must carry the same cosine
    the exact computation gives, ranks contiguous from 1."""
    rows = similarity.lsh_topk(
        near_dup_emb, k=3, n_bits=8, multi_probe=True
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        cos = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cos == sorted(cos, reverse=True)
