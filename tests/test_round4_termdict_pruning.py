"""Round-4: term-dictionary file pruning for multi-term expansion.

A saved index's term_stats is range-partitioned and term-sorted; the
manifest records each file's [min_term, max_term] (the burst-trie block
index, formats_burst_trie.cpp:953-966). Prefix/Range (and
literal-prefix Wildcard, prefixed Fuzzy) expansion then reads only the
files whose interval intersects the query's — the plan-level evidence
VERDICT r3 #3 asks for: pruned file counts + identical results.
"""

import json
import os

import pytest
from pyspark.sql import SparkSession

from iresearch_spark.index.builder import build_index
from iresearch_spark.index.model import InvertedIndex
from iresearch_spark.search import (
    Fuzzy,
    Prefix,
    Range,
    SearchEngine,
    Term,
    Wildcard,
)
from iresearch_spark.search.executor import SearchEngine as _SE


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("round4-termdict")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def saved(spark, tmp_path_factory):
    # vocabulary spread across the alphabet so range partitions carry
    # distinct intervals: w<letter><i> terms + a few shared high-df ones
    rows = []
    for i in range(400):
        letter = chr(ord("a") + (i % 26))
        rows.append(
            (i, f"{letter}term{i} {letter}x{i % 7} common shared{i % 3}")
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    mem = build_index(docs, analyzer="simple", bucket_bits=8)
    path = str(tmp_path_factory.mktemp("ixdict") / "ix")
    mem.save(path)
    return mem, InvertedIndex.load(spark, path), path


def test_manifest_records_file_ranges(saved):
    _, idx, path = saved
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    ranges = manifest["term_stats_ranges"]
    assert len(ranges) >= 16
    assert idx.term_stats_ranges is not None
    # files are disjoint, sorted intervals covering the vocabulary
    sorted_r = sorted(idx.term_stats_ranges, key=lambda r: r[1])
    for (_, _, mx1), (_, mn2, _) in zip(sorted_r, sorted_r[1:]):
        assert mx1 <= mn2


def test_prefix_expansion_prunes_files(saved):
    _, idx, _ = saved
    df, n_sel, n_total = idx.pruned_term_stats("s", "t", hi_inclusive=False)
    assert n_total >= 16
    assert 0 < n_sel < n_total
    # pruning loses nothing: every s-prefixed term is still there
    full = {
        r["term"]
        for r in idx.term_stats.filter("term like 's%'").collect()
    }
    pruned = {r["term"] for r in df.filter("term like 's%'").collect()}
    assert pruned == full and full


def test_exact_term_lookup_prunes_to_one_file(saved):
    _, idx, _ = saved
    got = {
        r["term"]: r["df"]
        for r in idx.term_stats_for_terms(["common"])
        .filter("term = 'common'")
        .collect()
    }
    assert got == {"common": 400}
    # absent term entirely outside every interval -> empty frame,
    # zero files read
    assert (
        idx.term_stats_for_terms(["￿ zzz"]).count() == 0
    )


def test_pruned_results_identical(saved):
    mem, idx, _ = saved
    e_mem = SearchEngine(mem)
    e_disk = SearchEngine(idx)
    nodes = [
        Prefix("bterm"),
        Range(min_term="m", max_term="p"),
        Wildcard("cterm1%"),
        Fuzzy("1", distance=1, prefix="aterm"),
        Term("common"),
    ]
    for node in nodes:
        a = sorted(
            (r["doc_id"], round(r["score"], 9))
            for r in e_mem.matches(node).collect()
        )
        b = sorted(
            (r["doc_id"], round(r["score"], 9))
            for r in e_disk.matches(node).collect()
        )
        assert a == b and a, node


def test_reversed_dict_prunes_leading_wildcard(saved):
    """A leading-wildcard pattern with a literal suffix seeks the
    REVERSED dictionary: '%m1' reversed is the prefix '1m' of
    reverse(term) — only intersecting files are read; results match the
    in-memory (full-scan) engine."""
    mem, idx, path = saved
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    assert len(manifest["term_stats_rev_ranges"]) >= 16
    df, n_sel, n_total = idx.pruned_rev_term_stats("1m", "1n")
    assert n_total >= 16 and 0 < n_sel < n_total
    full = {
        r["term"]
        for r in idx.term_stats.filter("term like '%m1'").collect()
    }
    pruned = {r["term"] for r in df.filter("term like '%m1'").collect()}
    assert pruned == full and full
    # end-to-end: same scores as the in-memory engine
    a = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in SearchEngine(mem).matches(Wildcard("%erm1")).collect()
    )
    b = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in SearchEngine(idx).matches(Wildcard("%erm1")).collect()
    )
    assert a == b and a


def test_wildcard_literal_suffix():
    f = _SE._wildcard_literal_suffix
    assert f("%tion") == "tion"
    assert f("s%k") == "k"
    assert f("pre%") == ""
    assert f(r"%ta\%il") == "ta%il"
    assert f("plain") == "plain"
    assert f("%a_b") == "b"


def test_wildcard_literal_prefix():
    f = _SE._wildcard_literal_prefix
    assert f("sta%") == "sta"
    assert f("s_k") == "s"
    assert f("%tail") == ""
    assert f(r"li\%ter%al") == "li%ter"
    assert f("plain") == "plain"


def test_prefix_successor():
    f = _SE._prefix_successor
    assert f("abc") == "abd"
    assert f("a\U0010ffff") == "b"
    assert f("\U0010ffff") is None
    assert "abcz" < f("abc")
    assert not ("abd" < f("abc"))
