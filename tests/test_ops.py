"""Training-data ops: dedup / similarity / textstats / multimodal,
verified against brute-force Python."""

import hashlib
import itertools
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from iresearch_spark.ops import dedup, multimodal, similarity, textstats


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),        # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),        # near dup
    (3, "completely different text about spark indexes"),
    (4, "the quick brown fox jumps over a sleepy cat"),        # partial
    (5, "spark indexes text different completely about"),      # same tokens as 3
    (6, "short doc"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_shingles(text, n=3):
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_jaccard(a, b, n=3):
    sa, sb = _py_shingles(a, n), _py_shingles(b, n)
    return len(sa & sb) / len(sa | sb)


def test_exact_duplicates(docs_df):
    rows = {r["doc_id"]: r for r in dedup.exact_duplicates(docs_df).collect()}
    assert rows[0]["keep_doc_id"] == 0 and not rows[0]["is_duplicate"]
    assert rows[1]["keep_doc_id"] == 0 and rows[1]["is_duplicate"]
    assert not rows[2]["is_duplicate"]
    assert rows[0]["content_hash"] == h60(DOCS[0][1])


def test_minhash_signatures_match_python(docs_df):
    got = {r["doc_id"]: r for r in dedup.minhash_signatures(docs_df, num_hashes=4).collect()}
    for doc_id, text in DOCS:
        sh = _py_shingles(text)
        for i in range(4):
            want = min(h60(f"{i}:{s}") for s in sh)
            assert got[doc_id][f"sig_{i}"] == want, (doc_id, i)


def test_ngram_jaccard_pairs(docs_df):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs_df, threshold=0.3).collect()
    }
    want = {}
    for (ida, ta), (idb, tb) in itertools.combinations(DOCS, 2):
        j = _py_jaccard(ta, tb)
        if j >= 0.3:
            want[(ida, idb)] = j
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-12)


def test_minhash_lsh_finds_exact_and_near_dups(docs_df):
    # bands of 1 row: collision prob per band = jaccard; at j=0.4 the
    # deterministic md5 family collides on minhashes {1,4,9,11} for (0,2)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(
            docs_df, num_hashes=16, bands=16, threshold=0.3
        ).collect()
    }
    assert (0, 1) in pairs and math.isclose(pairs[(0, 1)], 1.0)
    assert (0, 2) in pairs  # near dup shares most shingles
    # verified jaccard values are exact
    for (a, b), j in pairs.items():
        assert math.isclose(j, _py_jaccard(DOCS[a][1], DOCS[b][1]), rel_tol=1e-12)


def test_simhash_close_for_near_dups(docs_df):
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(docs_df).collect()}
    assert fp[0] == fp[1]  # identical docs -> identical fingerprints

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(fp[0], fp[2]) < ham(fp[0], fp[3])


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(30, 8)).astype(np.float32)
    vecs[1] = vecs[0] * 1.5 + 0.01  # near-parallel to 0
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(30)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def _py_topk(vecs, k=3):
    vn = vecs / np.linalg.norm(vecs.astype(np.float64), axis=1, keepdims=True)
    sims = vn @ vn.T
    out = {}
    for i in range(len(vecs)):
        cand = [(float(sims[i, j]), j) for j in range(len(vecs)) if j != i]
        cand.sort(key=lambda t: (-t[0], t[1]))
        out[i] = [j for _, j in cand[:k]]
    return out


def test_brute_force_topk(emb_df):
    df, vecs = emb_df
    got = {}
    for r in similarity.brute_force_topk(df, k=3).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    want = _py_topk(vecs, 3)
    for q, lst in got.items():
        lst.sort()
        assert [n for _, n in lst] == want[q], q


def test_lsh_topk_subset_of_exact_scores(emb_df):
    df, vecs = emb_df
    got = similarity.lsh_topk(df, k=3, n_bits=4).collect()
    assert len(got) > 0
    # every reported cosine must equal the exact cosine
    vn = vecs.astype(np.float64)
    vn = vn / np.linalg.norm(vn, axis=1, keepdims=True)
    for r in got:
        want = float(vn[r["query_id"]] @ vn[r["neighbor_id"]])
        assert math.isclose(r["cosine"], want, rel_tol=1e-9)
    # near-parallel pair must collide in the same bucket
    qs = {r["query_id"]: r for r in got if r["rank"] == 1}
    assert 0 in qs and qs[0]["neighbor_id"] == 1


def test_ivf_topk_runs_and_scores_exact(emb_df):
    df, vecs = emb_df
    got = similarity.ivf_topk(df, k=3, n_centroids=4, n_probe=2).collect()
    assert len(got) > 0
    vn = vecs.astype(np.float64)
    vn = vn / np.linalg.norm(vn, axis=1, keepdims=True)
    for r in got:
        want = float(vn[r["query_id"]] @ vn[r["neighbor_id"]])
        assert math.isclose(r["cosine"], want, rel_tol=1e-9)


def test_token_counts(docs_df):
    got = {r["doc_id"]: r for r in textstats.token_counts(docs_df).collect()}
    assert got[0]["n_tokens"] == 9
    assert got[0]["n_unique"] == 8  # 'the' twice
    assert got[6]["n_tokens"] == 2


def test_quality_and_lang(docs_df):
    q = {r["doc_id"]: r["quality"] for r in textstats.quality_score(docs_df).collect()}
    assert all(0.0 <= v <= 1.0 for v in q.values())
    langs = {r["doc_id"]: r["pred_lang"] for r in textstats.lang_id(docs_df).collect()}
    assert langs[0] == "en"


def test_doc_fingerprint(docs_df):
    fp = {r["doc_id"]: r for r in textstats.doc_fingerprint(docs_df).collect()}
    assert fp[0]["full_hash"] == fp[1]["full_hash"]
    assert fp[0]["full_hash"] != fp[2]["full_hash"]
    assert fp[0]["full_hash"] == h60(DOCS[0][1])
    assert fp[0]["winnow_hash"] == min(
        h60(s)
        for s in (
            " ".join(DOCS[0][1].split()[i : i + 4])
            for i in range(len(DOCS[0][1].split()) - 3)
        )
    )


def test_multimodal_feature_extract(spark):
    rows = [
        (1, "image", bytes(range(64)), "image/fake", 8, 8, None),
        (2, "image", None, None, None, None, None),
        (3, "audio", b"\x01\x02\x03\x04" * 100, "audio/fake", None, None, 400),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in multimodal.feature_extract(media).collect()}
    assert got[1]["ok"] and got[1]["n_bytes"] == 64
    assert len(got[1]["feature"]) == 8
    assert math.isclose(sum(got[1]["feature"]), 1.0, rel_tol=1e-6)
    assert not got[2]["ok"]
    assert got[3]["ok"]


def test_multimodal_real_decoder_is_stubbed(spark):
    rows = [(1, "image", b"xx", None, None, None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    import pytest as _pt

    with _pt.raises(Exception):
        multimodal.feature_extract(media, use_real_decoder=True).collect()


def test_frame_sample(spark):
    rows = [(1, "video", b"v", None, None, None, 3500), (2, "image", b"i", None, None, None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = multimodal.frame_sample(media, every_ms=1000).collect()
    ts = sorted(r["sample_ts"] for r in got)
    assert ts == [0, 1000, 2000, 3000]


def test_ngram_jaccard_skew_guard(spark):
    """A boilerplate shingle shared by every doc must not explode the
    pair join: the opt-in guard drops it, union sizes stay unfiltered
    (Jaccard only under-counts — no false pairs)."""
    from iresearch_spark.ops import dedup as _dedup

    rows = [
        (i, "c1 c2 c3 " + ("x y z" if i < 2 else f"u{i} v{i} w{i}"))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
        for r in _dedup.ngram_jaccard_pairs(
            df, n=3, threshold=0.5, max_shingle_df=5
        ).collect()
    }
    # docs 0,1 share 3 rare shingles of 4 total each -> 3/(4+4-3)
    assert got == {(0, 1): round(3 / 5, 6)}
    # without the guard the boilerplate shingle joins every pair
    exact = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
        for r in _dedup.ngram_jaccard_pairs(
            df, n=3, threshold=0.5, max_shingle_df=None
        ).collect()
    }
    assert exact[(0, 1)] == 1.0


def test_resize_images(spark):
    rows = [
        (1, "image", b"0123456789abcdef", "image/x-raw", 4, 4, None),
        (2, "image", None, None, None, None, None),
        (3, "video", b"zz", "video/x-raw", None, None, 1000),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in multimodal.resize_images(media, 2, 3).collect()}
    assert set(got) == {1, 2}  # video rows filtered out
    assert got[1]["ok"] and len(got[1]["payload"]) == 6
    assert got[1]["width"] == 2 and got[1]["height"] == 3
    assert not got[2]["ok"] and got[2]["payload"] is None
    # deterministic: same input -> same bytes
    again = {r["media_id"]: r for r in multimodal.resize_images(media, 2, 3).collect()}
    assert again[1]["payload"] == got[1]["payload"]
