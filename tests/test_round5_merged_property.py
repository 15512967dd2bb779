"""Property differential for multi-segment embedded serving: for a
randomized corpus split into a randomized number of incremental
segments, the Spark-free merged replica (`LocalMergedIndex` →
HotEngine) must equal the Spark-built hot replica over the cluster
merged read, for a query mix covering terms, booleans, phrases and
multiterm expansion. Catches segment-boundary bugs (block interleave,
df summing, stats merging) that a fixed 3-segment fixture could miss."""

import random

import pytest

from iresearch_spark.search import (
    And,
    Fuzzy,
    Not,
    Or,
    Phrase,
    Prefix,
    SearchEngine,
    Term,
)
from iresearch_spark.search.hot import HotEngine
from iresearch_spark.streaming.incremental import IncrementalIndexer

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
    "theta", "iota", "kappa", "lam", "mu",
]


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_merged_embedded_random_segments(spark, tmp_path, seed):
    rng = random.Random(seed)
    n_docs = rng.randint(40, 140)
    docs = [
        (
            f"u{seed}-{i:04d}",
            " ".join(rng.choices(WORDS, k=rng.randint(2, 18))),
        )
        for i in range(n_docs)
    ]
    # random contiguous split into 2-5 segments
    n_seg = rng.randint(2, 5)
    cuts = sorted(rng.sample(range(1, n_docs), n_seg - 1))
    bounds = [0] + cuts + [n_docs]
    d = str(tmp_path / f"ix{seed}")
    ix = IncrementalIndexer(index_dir=d, bucket_bits=7)
    for e, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        ix.process_batch(
            spark.createDataFrame(docs[lo:hi], "url string, text string"), e
        )
    hot = HotEngine(SearchEngine(ix.read(spark).cache()))
    emb = HotEngine.from_dir(d)
    w = rng.sample(WORDS, 6)
    queries = [
        Term(w[0]),
        Term(w[1], boost=1.7),
        And([Term(w[0]), Term(w[2])]),
        And([Term(w[3]), Not(Term(w[4]))]),
        Or([Term(w[0]), Term(w[1]), Term(w[5])], min_match=2),
        Phrase((w[2], w[3])),
        Prefix(w[4][:2]),
        Fuzzy(w[5][:-1] + "x", distance=1),
    ]
    for q in queries:
        assert emb.search(q, k=30) == hot.search(q, k=30), (seed, q)
    disj = Or([Term(t) for t in w[:4]])
    assert emb.search(disj, k=15, mode="wand") == hot.search(disj, k=15)
