"""Spark-free IVF serving (`EmbeddedIvfIndex`): row-identical to the
Spark `IvfIndex.search` over the same `ivf_save` directory, reading
ONLY the probed `cid=<n>/` dirs — the embedded analogue of the probed
partition pruning."""

import random

import pytest

from iresearch_spark.ops.ann_index import EmbeddedIvfIndex, IvfIndex, ivf_save


@pytest.fixture(scope="module")
def ivf_dir(spark, tmp_path_factory):
    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    d = str(tmp_path_factory.mktemp("ivf_emb") / "ix")
    ivf_save(emb, d, n_centroids=8)
    return d, rows


def _spark_rows(spark, ivf_dir, q_rows, k, n_probe, exclude=True):
    d, _ = ivf_dir
    q = spark.createDataFrame(q_rows, "vec_id long, embedding array<double>")
    return sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in IvfIndex.load(spark, d)
        .search(q, k=k, n_probe=n_probe, exclude_same_id=exclude)
        .collect()
    )


def test_embedded_ivf_matches_spark(spark, ivf_dir):
    d, rows = ivf_dir
    queries = rows[::23]  # in-corpus query subset
    emb = EmbeddedIvfIndex(d)
    got = sorted(emb.search(queries, k=5, n_probe=3))
    want = _spark_rows(spark, ivf_dir, queries, k=5, n_probe=3)
    assert got == want
    # only the probed dirs were read
    assert 0 < len(emb.last_read_cells) <= 8


def test_embedded_ivf_external_queries_and_flags(spark, ivf_dir):
    d, _ = ivf_dir
    rng = random.Random(99)
    queries = [
        (1000 + i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(7)
    ]
    emb = EmbeddedIvfIndex(d)
    for k, n_probe, exc in ((3, 1, True), (10, 8, False)):
        got = sorted(emb.search(queries, k=k, n_probe=n_probe,
                                exclude_same_id=exc))
        want = _spark_rows(spark, ivf_dir, queries, k=k, n_probe=n_probe,
                           exclude=exc)
        assert got == want


def test_embedded_ivf_prunes_directories(ivf_dir):
    d, rows = ivf_dir
    emb = EmbeddedIvfIndex(d)
    emb.search(rows[:2], k=3, n_probe=1)
    # 2 queries x 1 probe -> at most 2 distinct cell dirs touched
    assert 1 <= len(emb.last_read_cells) <= 2


def test_embedded_ivf_empty_and_dict_queries(ivf_dir):
    d, rows = ivf_dir
    emb = EmbeddedIvfIndex(d)
    assert emb.search([], k=3) == []
    as_dict = {i: v for i, v in rows[:3]}
    assert emb.search(as_dict, k=3) == emb.search(sorted(as_dict.items()), k=3)


def test_embedded_ivf_cell_cache(ivf_dir, monkeypatch):
    d, rows = ivf_dir
    emb = EmbeddedIvfIndex(d)
    first = emb.search(rows[:5], k=4, n_probe=2)
    reads = []
    orig = EmbeddedIvfIndex._cell_table
    monkeypatch.setattr(
        EmbeddedIvfIndex, "_cell_table",
        lambda self, cid: (reads.append(cid), orig(self, cid))[1],
    )
    again = emb.search(rows[:5], k=4, n_probe=2)
    assert again == first
    # every probed cell was already pinned -> zero parquet reads
    assert reads == []


def test_embedded_ivf_kmeans_variant(spark, tmp_path):
    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(150)]
    emb_df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    d = str(tmp_path / "ivfkm")
    ivf_save(emb_df, d, n_centroids=5, centroids="kmeans")
    emb = EmbeddedIvfIndex(d)
    got = sorted(emb.search(rows[::31], k=4, n_probe=2))
    q = spark.createDataFrame(rows[::31], "vec_id long, embedding array<double>")
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in IvfIndex.load(spark, d).search(q, k=4, n_probe=2).collect()
    )
    assert got == want


def test_embedded_ivf_unsorted_and_duplicate_queries(spark, ivf_dir):
    """Output is sorted by (query_id, rank) regardless of input order,
    and duplicate query ids merge into ONE ranked group — the Spark
    window's partition-by-query_id semantics."""
    d, rows = ivf_dir
    emb = EmbeddedIvfIndex(d)
    a, b = rows[10], rows[3]
    got = emb.search([a, b], k=3, n_probe=2)
    assert got == sorted(got, key=lambda r: (r[0], r[3]))  # (qid, rank)
    assert got[0][0] < got[-1][0]  # qid 3 rows precede qid 10 rows
    # duplicates: same rows as the Spark path's merged window
    dup = [a, a]
    got_dup = emb.search(dup, k=4, n_probe=2)
    q = spark.createDataFrame(dup, "vec_id long, embedding array<double>")
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in IvfIndex.load(spark, d).search(q, k=4, n_probe=2).collect()
    )
    assert sorted(got_dup) == want


def test_embedded_ivf_cache_budget(ivf_dir):
    d, rows = ivf_dir
    # tiny budget: nothing pins, results still correct and repeatable
    small = EmbeddedIvfIndex(d, max_cache_bytes=64)
    r1 = small.search(rows[:4], k=3, n_probe=2)
    r2 = small.search(rows[:4], k=3, n_probe=2)
    assert r1 == r2
    ms = small.memory_stats()
    assert ms["cells_pinned"] == 0 and ms["cache_bytes"] == 0
    assert ms["budget_bytes"] == 64 and ms["centroid_bytes"] > 0
    # default budget pins the probed cells and counts bytes
    big = EmbeddedIvfIndex(d)
    assert big.search(rows[:4], k=3, n_probe=2) == r1
    ms2 = big.memory_stats()
    assert ms2["cells_pinned"] >= 1 and ms2["cache_bytes"] > 0
