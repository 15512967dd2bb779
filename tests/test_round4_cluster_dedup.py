"""Duplicate clustering (ops/dedup.cluster_duplicates): connected
components over near-dup pairs with the smallest doc id as the
deterministic canonical representative."""

import pytest

from iresearch_spark.ops.dedup import cluster_duplicates, drop_duplicate_docs


def _clusters(spark, edges, **kw):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_duplicates(pairs, **kw).collect()
    }


def test_chain_and_disjoint_components(spark):
    got = _clusters(spark, [(1, 2), (2, 3), (3, 4), (6, 5), (8, 9)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 8: 8, 9: 8}


def test_long_chain_converges(spark):
    # a 12-hop chain needs several propagation rounds
    edges = [(i, i + 1) for i in range(100, 112)]
    got = _clusters(spark, edges)
    assert set(got.values()) == {100} and len(got) == 13


def test_differential_vs_union_find(spark):
    import random

    rng = random.Random(23)
    nodes = list(range(40))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(35)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {a for e in edges for a in e}
    want = {n: find(n) for n in touched}
    got = _clusters(spark, edges)
    assert got == want


def test_empty_pair_set(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert cluster_duplicates(pairs).count() == 0
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    assert drop_duplicate_docs(df, pairs).count() == 2


def test_drop_duplicate_docs(spark):
    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(3, 1), (1, 5), (6, 7)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r["doc_id"] for r in drop_duplicate_docs(df, pairs).collect()
    )
    # cluster {1,3,5} keeps 1; {6,7} keeps 6; 0,2,4 unpaired
    assert kept == [0, 1, 2, 4, 6]
