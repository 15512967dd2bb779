"""Persisted IVF index: save/load/search round trip, exactness when
probing all cells, and partition pruning on the cell layout."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from iresearch_spark.ops import similarity
from iresearch_spark.ops.ann_index import IvfIndex, ivf_save


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(23)
    rows = [(i, [float(x) for x in rng.normal(size=10)]) for i in range(120)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def ivf_dir(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "ix")
    ivf_save(emb, path, n_centroids=8)
    return path


def _key(rows):
    return sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in rows)


def test_probe_all_cells_equals_exact_topk_join(spark, emb, ivf_dir):
    """With n_probe = n_centroids every vector is a candidate, so the
    persisted-IVF search must equal the exact corpus-stationary
    topk_join (identical quantized math)."""
    queries = emb.filter(F.col("vec_id") % 30 == 0)
    idx = IvfIndex.load(spark, ivf_dir)
    got = idx.search(queries, k=4, n_probe=8).collect()
    want = similarity.topk_join(queries, emb, k=4).collect()
    assert _key(got) == _key(want)
    gc = {(r["query_id"], r["rank"]): r["cosine"] for r in got}
    wc = {(r["query_id"], r["rank"]): r["cosine"] for r in want}
    assert gc == wc  # exact float equality — same deterministic math


def test_low_probe_results_are_subset_with_exact_cosines(spark, emb, ivf_dir):
    """n_probe=2: every returned neighbor must carry its exact cosine
    and ranks must be contiguous."""
    queries = emb.filter(F.col("vec_id") == 7)
    idx = IvfIndex.load(spark, ivf_dir)
    rows = idx.search(queries, k=3, n_probe=2).collect()
    assert rows
    exact = {
        r["neighbor_id"]: r["cosine"]
        for r in similarity.topk_join(queries, emb, k=120).collect()
    }
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["cosine"] == exact[r["neighbor_id"]]


def test_partition_pruning_on_cell_dirs(spark, emb, ivf_dir):
    """The probed-cell filter must reach the scan as a partition
    filter — only probed cid directories are read."""
    idx = IvfIndex.load(spark, ivf_dir)
    some_cells = sorted({int(r["cid"]) for r in idx._cent_rows})[:2]
    pruned = idx.cells.filter(F.col("cid").isin(some_cells))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan
    files = {
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert files
    assert all(any(f"cid={c}/" in f for c in some_cells) for f in files)


def test_partition_invariance(spark, emb, tmp_path):
    path = str(tmp_path / "ix2")
    ivf_save(emb.repartition(7), path, n_centroids=4)
    idx = IvfIndex.load(spark, path)
    queries = emb.filter(F.col("vec_id") < 3)
    a = idx.search(queries, k=3, n_probe=2).collect()
    b = idx.search(queries.repartition(2), k=3, n_probe=2).collect()
    assert _key(a) == _key(b)


def test_recall_reasonable_on_clustered_data(spark, tmp_path):
    rng = np.random.default_rng(5)
    base = rng.normal(size=(30, 12))
    rows = []
    vid = 0
    for i in range(30):
        for rep in range(3):
            noise = 0.0 if rep == 0 else 0.05
            v = base[i] + noise * rng.normal(size=12)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ix3")
    ivf_save(df, path, n_centroids=6, centroids="kmeans")
    idx = IvfIndex.load(spark, path)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in idx.search(df, k=2, n_probe=3).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(df, k=2).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, recall
