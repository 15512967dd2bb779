"""Snapshot commits (Iceberg design point over parquet + atomic
manifests): commit = new immutable version + pointer swap, time travel
via load(snapshot_id=), expiry keeps the pointer's version."""

import os

import pytest

from iresearch_spark.index.builder import build_index
from iresearch_spark.index.model import InvertedIndex
from iresearch_spark.search import SearchEngine, Term


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_snapshot_commit_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "snapix")
    idx1 = build_index(
        _docs(spark, ["alpha beta", "alpha", "beta gamma"]),
        id_col="doc_id", text_col="text",
    )
    s1 = idx1.save_snapshot(path)
    assert s1 == 1
    idx2 = build_index(
        _docs(spark, ["alpha beta", "alpha", "beta gamma", "alpha delta"]),
        id_col="doc_id", text_col="text",
    )
    s2 = idx2.save_snapshot(path)
    assert s2 == 2

    log = InvertedIndex.snapshots(path)
    assert [s["id"] for s in log] == [1, 2]
    assert [s["n_docs"] for s in log] == [3, 4]

    latest = InvertedIndex.load(spark, path)
    assert latest.field_stats.n_docs == 4
    hits = {
        r["doc_id"]
        for r in SearchEngine(latest).matches(Term("alpha")).collect()
    }
    assert hits == {0, 1, 3}

    old = InvertedIndex.load(spark, path, snapshot_id=1)
    assert old.field_stats.n_docs == 3
    hits_old = {
        r["doc_id"]
        for r in SearchEngine(old).matches(Term("alpha")).collect()
    }
    assert hits_old == {0, 1}

    with pytest.raises(ValueError):
        InvertedIndex.load(spark, path, snapshot_id=9)


def test_expire_snapshots(spark, tmp_path):
    path = str(tmp_path / "exp")
    for n in (2, 3, 4):
        idx = build_index(
            _docs(spark, ["alpha"] * n), id_col="doc_id", text_col="text"
        )
        idx.save_snapshot(path)
    expired = InvertedIndex.expire_snapshots(path, keep_last=1)
    assert expired == [1, 2]
    assert not os.path.exists(os.path.join(path, "v1"))
    assert os.path.exists(os.path.join(path, "v3"))
    # the survivor still loads; expired ids refuse
    assert InvertedIndex.load(spark, path).field_stats.n_docs == 4
    with pytest.raises(ValueError):
        InvertedIndex.load(spark, path, snapshot_id=1)


def test_plain_save_rejects_snapshot_id(spark, tmp_path):
    path = str(tmp_path / "plain")
    idx = build_index(
        _docs(spark, ["alpha beta"]), id_col="doc_id", text_col="text"
    )
    idx.save(path)
    with pytest.raises(ValueError):
        InvertedIndex.load(spark, path, snapshot_id=1)
    assert InvertedIndex.load(spark, path).field_stats.n_docs == 1
