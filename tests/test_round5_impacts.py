"""Block-max impacts (tf/dl class pairs): unit soundness, index-level
invariants, and WAND rank-identity on a corpus engineered to break the
loose (max_tf, min_dl) bound (short docs mixed with high-tf long docs)."""

import random

import numpy as np
import pytest

from iresearch_spark.index.builder import (
    _block_impacts_arrays,
    build_index,
)
from iresearch_spark.search import Or, SearchEngine, Term


def test_impacts_dominate_every_posting():
    rng = random.Random(11)
    for _ in range(50):
        n = rng.randint(1, 400)
        freqs = np.array([rng.randint(1, 50) for _ in range(n)], np.int64)
        dls = np.array([rng.randint(1, 5000) for _ in range(n)], np.int64)
        # blocks tile [0, n)
        cuts = sorted(rng.sample(range(1, n), min(n - 1, rng.randint(0, 5))))
        bs = np.array([0] + cuts, np.int64)
        be = np.array(cuts + [n], np.int64)
        g_tf, g_dl, offsets = _block_impacts_arrays(freqs, dls, bs, be)
        for bi in range(bs.size):
            pairs = [
                (g_tf[j], g_dl[j])
                for j in range(offsets[bi], offsets[bi + 1])
            ]
            assert pairs, "non-empty block must emit pairs"
            for r in range(bs[bi], be[bi]):
                assert any(
                    t >= freqs[r] and d <= dls[r] for t, d in pairs
                ), (bi, r)
            # pair count bounded by dl classes present
            assert len(pairs) <= 24


def test_index_blocks_carry_impacts(spark):
    rows = [(i, " ".join(["alpha"] * (1 + i % 7) + ["beta"] * 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, id_col="doc_id", text_col="text")
    blocks = idx.postings.filter("term = 'alpha'").collect()
    assert blocks
    for b in blocks:
        imps = b["block_impacts"]
        assert imps is not None and len(imps) >= 1
        assert max(p["tf"] for p in imps) == b["block_max_freq"]
        assert min(p["dl"] for p in imps) == b["block_min_dl"]


def test_wand_rank_identity_on_mixed_length_corpus(spark):
    # short docs (tiny dl => huge loose bound) interleaved with long
    # topical docs (high tf): the loose (max_tf, min_dl) bound pairs
    # extremes from different docs; impacts must stay sound AND the
    # forced-WAND top-k must equal exhaustive exactly
    rng = random.Random(23)
    rows = []
    for i in range(4000):
        if i % 4 == 0:
            rows.append((i, " ".join(rng.choices(["x", "y", "alpha"], k=6))))
        else:
            body = rng.choices(
                ["filler%d" % rng.randint(0, 200), "alpha", "beta"],
                weights=[80, 12, 8],
                k=rng.randint(80, 300),
            )
            rows.append((i, " ".join(body)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, id_col="doc_id", text_col="text")
    eng = SearchEngine(idx)
    node = Or([Term("alpha"), Term("beta")])
    exh = eng.search(node, k=10).collect()
    eng.collect_wand_stats = True
    wnd = eng.search(node, k=10, mode="wand").collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in exh] == [
        (r["doc_id"], round(r["score"], 9)) for r in wnd
    ]
    assert eng.last_wand_stats["blocks_total"] >= eng.last_wand_stats[
        "blocks_kept"
    ]
