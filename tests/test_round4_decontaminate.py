"""Benchmark decontamination (ops/dedup.decontaminate): drop documents
sharing an n-gram of lowercased whitespace tokens with an eval set —
the GPT-3-style 13-gram training-data hygiene step."""

import pytest

from iresearch_spark.ops.dedup import decontaminate


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "completely unrelated text about spark shuffles and joins"),
            (2, "short doc"),
            (3, "QUICK BROWN FOX jumps over the lazy dog extra tail"),
            (4, None),
        ],
        "doc_id long, text string",
    )


def test_contaminated_docs_dropped_case_insensitive(spark, corpus):
    ev = spark.createDataFrame(
        [("quick brown fox jumps over the lazy dog",)], "text string"
    )
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, ev, n=5).collect()
    )
    assert kept == [1, 2, 4]  # 0 and 3 share 5-grams (case-folded)


def test_short_docs_and_short_eval_never_match(spark, corpus):
    ev = spark.createDataFrame([("short doc",)], "text string")
    # n=5 > eval length: no eval grams at all -> nothing dropped
    assert decontaminate(corpus, ev, n=5).count() == 5
    # n=2: 'short doc' IS a 2-gram of doc 2
    kept = sorted(r["doc_id"] for r in decontaminate(corpus, ev, n=2).collect())
    assert kept == [0, 1, 3, 4]


def test_differential_vs_python(spark):
    import random

    rng = random.Random(11)
    vocab = [f"w{j}" for j in range(20)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25))))
        for i in range(80)
    ]
    evals = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10)))
        for _ in range(5)
    ]
    n = 4

    def grams(t):
        toks = t.lower().split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    eg = set().union(*(grams(e) for e in evals))
    want = sorted(i for i, t in rows if not (grams(t) & eg))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame([(e,) for e in evals], "text string")
    got = sorted(r["doc_id"] for r in decontaminate(df, ev, n=n).collect())
    assert got == want
