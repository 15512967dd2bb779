"""Physical-plan audits: the things `.explain("formatted")` must show
for the 100 TB read path — term predicates pushed into the parquet scan
of a saved index, and column pruning on the WAND metadata pass."""

import pytest
from pyspark.sql import functions as F

from iresearch_spark.index.builder import build_index
from iresearch_spark.index.model import InvertedIndex
from iresearch_spark.search import SearchEngine, Term


@pytest.fixture(scope="module")
def disk_index(spark, tmp_path_factory):
    rows = [(i, f"alpha beta doc{i % 5} gamma delta") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, analyzer="simple", bucket_bits=7)
    path = str(tmp_path_factory.mktemp("ix") / "index")
    idx.save(path)
    return InvertedIndex.load(spark, path)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_term_filter_pushed_to_parquet(disk_index):
    scan = disk_index.postings.filter(F.col("term") == "alpha")
    plan = _plan(scan)
    assert "PushedFilters" in plan
    assert "IsNotNull(term)" in plan or "EqualTo(term,alpha)" in plan, plan


def test_wand_metadata_scan_prunes_blob_columns(disk_index):
    meta = disk_index.postings.filter(F.col("term") == "alpha").select(
        "term", "block_id", "n_docs", "block_max_freq", "block_min_dl"
    )
    plan = _plan(meta)
    # ReadSchema must not include the posting blobs
    assert "docs:binary" not in plan.replace(" ", "")
    assert "positions:binary" not in plan.replace(" ", "")


def test_search_on_disk_index_is_correct(disk_index):
    eng = SearchEngine(disk_index)
    got = eng.search(Term("doc1"), k=10).collect()
    assert len(got) == 10
    assert all(r["score"] > 0 for r in got)
    assert disk_index.field_stats.n_docs == 500
