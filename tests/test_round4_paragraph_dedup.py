"""Corpus-wide repeated-paragraph removal (ops/dedup.py
drop_repeated_paragraphs) — the CCNet/RefinedWeb boilerplate step a
Common-Crawl training pipeline runs before indexing."""

import pytest
from pyspark.sql import functions as F

from iresearch_spark.ops.dedup import drop_repeated_paragraphs

BOILER = "subscribe to our newsletter"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, f"alpha one|{BOILER}|beta two"),
        (1, f"{BOILER}|gamma three"),
        (2, f"delta four|{BOILER}"),
        (3, BOILER),  # fully boilerplate
        (4, "unique only"),
        (5, "twice para|epsilon"),
        (6, "twice para|zeta"),
        (7, "a||b"),  # empty paragraph ignored
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _texts(df):
    return {r["doc_id"]: r["text"] for r in df.collect()}


def test_unique_kept_boiler_dropped_order_preserved(spark, docs):
    out = _texts(drop_repeated_paragraphs(docs, sep="|"))
    assert out[0] == "alpha one|beta two"
    assert out[1] == "gamma three"
    assert out[2] == "delta four"
    assert out[3] == ""  # fully-boilerplate doc retained, emptied
    assert out[4] == "unique only"
    # df=2 paragraph also dropped at max_df=1
    assert out[5] == "epsilon" and out[6] == "zeta"
    assert out[7] == "a|b"
    assert len(out) == 8


def test_max_df_threshold(spark, docs):
    out = _texts(drop_repeated_paragraphs(docs, sep="|", max_df=2))
    # df=2 'twice para' survives, df=4 boilerplate still dropped
    assert out[5] == "twice para|epsilon"
    assert out[6] == "twice para|zeta"
    assert out[0] == "alpha one|beta two"


def test_within_doc_repeat_counts_once(spark):
    df = spark.createDataFrame(
        [(0, "x|x|y"), (1, "z")], "doc_id long, text string"
    )
    # 'x' appears twice in ONE doc: document frequency 1 -> kept twice
    out = _texts(drop_repeated_paragraphs(df, sep="|"))
    assert out[0] == "x|x|y" and out[1] == "z"


def test_differential_vs_python(spark):
    import random

    rng = random.Random(7)
    paras = [f"p{j}" for j in range(12)]
    rows = [
        (i, "|".join(rng.choice(paras) for _ in range(rng.randint(1, 6))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from collections import defaultdict

    docs_of = defaultdict(set)
    for i, t in rows:
        for p in t.split("|"):
            if p:
                docs_of[p].add(i)
    want = {
        i: "|".join(p for p in t.split("|") if p and len(docs_of[p]) <= 1)
        for i, t in rows
    }
    got = _texts(drop_repeated_paragraphs(df, sep="|"))
    assert got == want


def test_extra_columns_preserved(spark, docs):
    df = docs.withColumn("lang", F.lit("en"))
    out = drop_repeated_paragraphs(df, sep="|")
    assert set(out.columns) == {"doc_id", "text", "lang"}
    assert out.filter(F.col("lang") != "en").count() == 0
