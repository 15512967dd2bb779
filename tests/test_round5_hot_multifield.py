"""HotMultiFieldEngine: per-field driver-resident replicas,
differential vs the cluster MultiFieldEngine on field-routed, boosted,
cross-field-boolean, expansion-leaf, and WAND query shapes."""

import pytest

from iresearch_spark.index.multifield import build_multi_field_index
from iresearch_spark.search import (
    And,
    Field,
    Not,
    Or,
    Prefix,
    Term,
)
from iresearch_spark.search.hot import HotMultiFieldEngine
from iresearch_spark.search.multifield import MultiFieldEngine


@pytest.fixture(scope="module")
def mf(spark):
    rows = []
    for i in range(120):
        title = (
            f"doc{'x' if i % 3 == 0 else 'y'} spark" if i % 2 == 0 else "plain title"
        )
        body = (
            f"alpha beta {'spark shuffle' if i % 5 == 0 else 'gamma delta'} "
            f"tail{i % 7}"
        )
        rows.append((f"u{i:03d}", title, body))
    df = spark.createDataFrame(rows, "url string, title string, body string")
    idx = build_multi_field_index(
        df, ["title", "body"], sort_key="url", bucket_bits=8,
        extra_doc_cols=["url"],
    )
    eng = MultiFieldEngine(idx)
    hot = HotMultiFieldEngine(eng)
    yield eng, hot
    idx.unpersist()


QUERIES = [
    Field("body", Term("shuffle")),
    Field("title", Term("spark"), boost=2.0),
    Field("body", Prefix("tail")),
    And([Field("title", Term("spark")), Field("body", Term("shuffle"))]),
    Or([Field("title", Term("docx")), Field("body", Term("gamma"))]),
    Or(
        [Field("body", Term("alpha")), Not(Field("title", Term("spark")))],
    ),
    And(
        [Field("body", Term("alpha")), Field("body", Term("beta"))],
        merge_type="max",
    ),
]


@pytest.mark.parametrize("q", QUERIES, ids=[str(i) for i in range(len(QUERIES))])
def test_hot_multifield_matches_cluster(mf, q):
    eng, hot = mf
    want = sorted(
        (r["doc_id"], round(r["score"], 9)) for r in eng.matches(q).collect()
    )
    got = sorted((d, round(s, 9)) for d, s in hot.matches(q))
    assert got == want and got


def test_hot_multifield_topk_and_wand(mf):
    eng, hot = mf
    q = Field("body", Or([Term("alpha"), Term("shuffle"), Term("gamma")]))
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in eng.search(q, k=15, mode="wand").collect()
    ]
    got = [(d, round(s, 9)) for d, s in hot.search(q, k=15, mode="wand")]
    assert got == want
    got_ex = [(d, round(s, 9)) for d, s in hot.search(q, k=15)]
    assert got_ex == want  # rank+score identical across modes


def test_hot_multifield_served_not_fallback(mf):
    eng, hot = mf
    from iresearch_spark.search import planner

    for q in QUERIES:
        norm = planner.normalize(q)
        h, qq = hot._route(norm)
        assert h._servable(planner.normalize(qq)), q


def test_hot_multifield_unknown_field(mf):
    eng, hot = mf
    with pytest.raises(ValueError, match="no indexed field"):
        hot.matches(Field("nope", Term("x")))
    with pytest.raises(ValueError, match="no indexed field"):
        hot.matches(And([Field("body", Term("alpha")), Field("nope", Term("x"))]))


def test_hot_multifield_memory_stats(mf):
    eng, hot = mf
    s = hot.memory_stats()
    assert set(s["fields"]) == {"title", "body"}
    assert s["blob_bytes"] == sum(
        f["blob_bytes"] for f in s["fields"].values()
    )
    assert s["budget_bytes"] == s["fields"]["title"]["budget_bytes"]
    assert s["resident_bytes"] >= s["blob_bytes"]
