"""SemDeDup (within-cell semantic duplicate pairs + keep-one)."""

import math

import numpy as np
import pytest

from iresearch_spark.ops.dedup import (
    drop_semantic_duplicates,
    semantic_dup_pairs,
)


def _vecs():
    rng = np.random.RandomState(7)
    base_a = np.array([1.0, 0.0, 0.0, 0.0])
    base_b = np.array([0.0, 1.0, 0.0, 0.0])
    rows = []
    # cluster A: ids 0-2 (near-identical), cluster B: ids 3-4,
    # singletons: ids 5-6 (orthogonal-ish)
    for i in range(3):
        rows.append((i, [float(x) for x in base_a + rng.uniform(-0.01, 0.01, 4)]))
    for i in range(3, 5):
        rows.append((i, [float(x) for x in base_b + rng.uniform(-0.01, 0.01, 4)]))
    rows.append((5, [0.0, 0.0, 1.0, 0.0]))
    rows.append((6, [0.0, 0.0, 0.0, 1.0]))
    return rows


def _cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _vecs(), "vec_id long, embedding array<double>"
    )


def test_single_cell_equals_brute_force(spark, emb):
    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in semantic_dup_pairs(emb, threshold=0.9, n_centroids=1).collect()
    }
    rows = _vecs()
    expect = {}
    for i, (ia, va) in enumerate(rows):
        for ib, vb in rows[i + 1:]:
            c = _cos(va, vb)
            if c >= 0.9:
                expect[(ia, ib)] = round(c, 6)
    assert set(got) == set(expect)
    for k in got:
        assert got[k] == pytest.approx(expect[k], abs=2e-6)


def test_kmeans_cells_pair_within_clusters(spark, emb):
    pairs = semantic_dup_pairs(
        emb, threshold=0.9, n_centroids=2, centroids="kmeans"
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # all within-cluster pairs found, nothing across clusters
    assert got == {(0, 1), (0, 2), (1, 2), (3, 4)}


def test_drop_semantic_duplicates_keep_one(spark, emb):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(7)], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"]
        for r in drop_semantic_duplicates(
            docs, emb, threshold=0.9, n_centroids=1
        ).collect()
    )
    # min id survives each cluster; singletons untouched
    assert kept == [0, 3, 5, 6]


def test_partitioning_invariance(spark, emb):
    a = sorted(
        map(tuple, semantic_dup_pairs(emb, threshold=0.9, n_centroids=1).collect())
    )
    b = sorted(
        map(
            tuple,
            semantic_dup_pairs(
                emb.repartition(5), threshold=0.9, n_centroids=1
            ).collect(),
        )
    )
    assert a == b
