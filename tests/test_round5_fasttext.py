"""fastText .vec / .bin loaders: parse fixtures written to the public
format spec, feed the result into the classification /
nearest_neighbors analyzers, and reproduce the existing gate
semantics."""

import struct

import numpy as np
import pytest

from iresearch_spark.analysis.analyzers import get_analyzer
from iresearch_spark.analysis.fasttext_io import (
    FASTTEXT_MAGIC,
    load_bin,
    load_model,
    load_vec,
    split_labels,
)


VOCAB = {
    "cat": [1.0, 0.0, 0.0],
    "dog": [0.9, 0.1, 0.0],
    "car": [0.0, 1.0, 0.0],
    "bus": [0.0, 0.9, 0.1],
}
LABELS = {"animal": [1.0, 0.0, 0.0], "vehicle": [0.0, 1.0, 0.0]}


def _write_vec(path, with_header=True):
    rows = list(VOCAB.items()) + [
        (f"__label__{k}", v) for k, v in LABELS.items()
    ]
    with open(path, "w", encoding="utf-8") as f:
        if with_header:
            f.write(f"{len(rows)} 3\n")
        for w, v in rows:
            f.write(w + " " + " ".join(str(x) for x in v) + "\n")


def _write_bin(path):
    """A minimal spec-conformant non-quantized supervised .bin."""
    words = list(VOCAB)
    labels = [f"__label__{k}" for k in LABELS]
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, 12))
        # args: dim ws epoch minCount neg wordNgrams loss model bucket
        # minn maxn lrUpdateRate + t
        f.write(struct.pack("<12i", 3, 5, 5, 1, 5, 1, 3, 3, 0, 0, 0, 100))
        f.write(struct.pack("<d", 1e-4))
        f.write(struct.pack("<3i", len(words) + len(labels), len(words), len(labels)))
        f.write(struct.pack("<2q", 100, 0))  # ntokens, pruneidx_size
        for w in words:
            f.write(w.encode() + b"\x00" + struct.pack("<qb", 7, 0))
        for lb in labels:
            f.write(lb.encode() + b"\x00" + struct.pack("<qb", 3, 1))
        in_mat = np.asarray([VOCAB[w] for w in words], dtype="<f4")
        f.write(struct.pack("<b", 0))
        f.write(struct.pack("<2q", in_mat.shape[0], in_mat.shape[1]))
        f.write(in_mat.tobytes())
        out_mat = np.asarray(list(LABELS.values()), dtype="<f4")
        f.write(struct.pack("<b", 0))
        f.write(struct.pack("<2q", out_mat.shape[0], out_mat.shape[1]))
        f.write(out_mat.tobytes())


def test_vec_roundtrip(tmp_path):
    p = str(tmp_path / "m.vec")
    _write_vec(p)
    table = load_vec(p)
    assert set(table) == set(VOCAB) | {f"__label__{k}" for k in LABELS}
    np.testing.assert_allclose(table["cat"], [1.0, 0.0, 0.0])
    model = split_labels(table)
    assert set(model["labels"]) == {"animal", "vehicle"}
    assert set(model["vocab"]) == set(VOCAB)


def test_vec_without_header(tmp_path):
    p = str(tmp_path / "nh.vec")
    _write_vec(p, with_header=False)
    assert set(load_vec(p)) == set(VOCAB) | {
        f"__label__{k}" for k in LABELS
    }


def test_vec_header_dim_mismatch(tmp_path):
    p = str(tmp_path / "bad.vec")
    with open(p, "w") as f:
        f.write("1 4\ncat 1.0 0.0 0.0\n")
    with pytest.raises(ValueError):
        load_vec(p)


def test_bin_roundtrip(tmp_path):
    p = str(tmp_path / "m.bin")
    _write_bin(p)
    model = load_bin(p)
    assert set(model["vocab"]) == set(VOCAB)
    assert set(model["labels"]) == set(LABELS)
    np.testing.assert_allclose(model["vocab"]["car"], [0.0, 1.0, 0.0])
    np.testing.assert_allclose(model["labels"]["vehicle"], [0.0, 1.0, 0.0])


def test_load_model_detects_format(tmp_path):
    pv, pb = str(tmp_path / "a.vec"), str(tmp_path / "b.bin")
    _write_vec(pv)
    _write_bin(pb)
    mv, mb = load_model(pv), load_model(pb)
    for m in (mv, mb):
        assert set(m["vocab"]) == set(VOCAB)
        assert set(m["labels"]) == set(LABELS)


def test_classification_from_loaded_model(tmp_path):
    p = str(tmp_path / "m.bin")
    _write_bin(p)
    model = load_model(p)
    a = get_analyzer("classification", model=model)
    terms, pos = a.analyze("the cat and the dog")
    assert terms == ["animal"] and pos == [0]
    terms2, _ = a.analyze("car bus car")
    assert terms2 == ["vehicle"]


def test_nearest_neighbors_from_loaded_model(tmp_path):
    p = str(tmp_path / "m.vec")
    _write_vec(p)
    model = load_model(p)
    a = get_analyzer("nearest_neighbors", model=model["vocab"], top_k=1)
    terms, _ = a.analyze("cat")
    assert terms == ["dog"]  # nearest non-self neighbor


# ---------------------------------------------------------------------------
# Subword (character n-gram) composition: fastText hash, gram walk,
# in-vocab composition, and OOV vectors through both analyzers.
# ---------------------------------------------------------------------------

import pickle

from iresearch_spark.analysis.fasttext_io import (
    SubwordVectors,
    compute_subwords,
    fnv1a_hash,
    subword_ids,
)

BUCKET, MINN, MAXN = 8, 2, 3


def _write_bin_sub(path, gram_mat):
    """Spec .bin with subwords: bucket=8 minn=2 maxn=3, input matrix =
    word rows then gram rows."""
    words = list(VOCAB)
    labels = [f"__label__{k}" for k in LABELS]
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, 12))
        f.write(
            struct.pack("<12i", 3, 5, 5, 1, 5, 1, 3, 3, BUCKET, MINN, MAXN, 100)
        )
        f.write(struct.pack("<d", 1e-4))
        f.write(
            struct.pack("<3i", len(words) + len(labels), len(words), len(labels))
        )
        f.write(struct.pack("<2q", 100, 0))
        for w in words:
            f.write(w.encode() + b"\x00" + struct.pack("<qb", 7, 0))
        for lb in labels:
            f.write(lb.encode() + b"\x00" + struct.pack("<qb", 3, 1))
        in_mat = np.concatenate(
            [np.asarray([VOCAB[w] for w in words], dtype="<f4"), gram_mat]
        )
        f.write(struct.pack("<b", 0))
        f.write(struct.pack("<2q", in_mat.shape[0], in_mat.shape[1]))
        f.write(in_mat.astype("<f4").tobytes())
        out_mat = np.asarray(list(LABELS.values()), dtype="<f4")
        f.write(struct.pack("<b", 0))
        f.write(struct.pack("<2q", out_mat.shape[0], out_mat.shape[1]))
        f.write(out_mat.tobytes())


def test_fnv_hash_goldens():
    # Pinned values of the spec formula (h=2166136261; h=(h^int8(b))*16777619
    # mod 2^32 per UTF-8 byte) — a regression in the walk or the
    # signed-char cast moves every bucket id.
    assert fnv1a_hash("<wh") == 1048167652
    assert fnv1a_hash("whe") == 888420941
    assert fnv1a_hash("her") == 4105473420
    assert fnv1a_hash("ab") == 1294271946
    # non-ASCII bytes sign-extend: differs from the unsigned variant
    assert fnv1a_hash("é") == 1023043777 != 513665217


def test_compute_subwords_paper_example():
    # Bojanowski et al. (2017) §3.2: "where" with n=3 gives
    # <wh, whe, her, ere, re> (the full "<where>" is length 7 > maxn).
    assert compute_subwords("where", 3, 3) == [
        "<wh", "whe", "her", "ere", "re>",
    ]


def test_compute_subwords_boundary_unigrams_excluded():
    assert compute_subwords("ab", 1, 1) == ["a", "b"]  # never "<" or ">"


def test_compute_subwords_whole_word_gram():
    assert "<cat>" in compute_subwords("cat", 3, 5)


def test_compute_subwords_utf8_multibyte():
    # multi-byte chars count as ONE gram position and never split
    assert compute_subwords("où", 2, 2) == ["<o", "où", "ù>"]


def test_bin_subword_composition(tmp_path):
    rng = np.random.RandomState(7)
    gram_mat = rng.randn(BUCKET, 3).astype("<f4")
    p = str(tmp_path / "sub.bin")
    _write_bin_sub(p, gram_mat)
    model = load_bin(p)
    assert isinstance(model.get("oov"), SubwordVectors)
    for w, base in VOCAB.items():
        ids = subword_ids(w, BUCKET, MINN, MAXN)
        want = np.concatenate(
            [np.asarray([base], dtype=np.float32), gram_mat[ids]]
        ).mean(axis=0)
        np.testing.assert_allclose(model["vocab"][w], want, rtol=1e-6)
    # OOV = mean of gram rows only
    ids = subword_ids("zzz", BUCKET, MINN, MAXN)
    np.testing.assert_allclose(
        model["oov"]("zzz"), gram_mat[ids].mean(axis=0), rtol=1e-6
    )


def test_subword_vectors_no_grams_and_pickle():
    sv = SubwordVectors(np.eye(4, dtype=np.float32), 5, 5)
    assert sv("a") is None  # "<a>" shorter than minn
    sv2 = pickle.loads(pickle.dumps(sv))  # rides Spark task closures
    np.testing.assert_array_equal(sv2.gram_mat, sv.gram_mat)
    assert (sv2.minn, sv2.maxn) == (5, 5)


def test_non_subword_bin_has_no_oov(tmp_path):
    p = str(tmp_path / "m.bin")
    _write_bin(p)
    assert "oov" not in load_bin(p)


def test_classification_oov_via_subwords(tmp_path):
    gram_mat = np.zeros((BUCKET, 3), dtype="<f4")
    gram_mat[subword_ids("catt", BUCKET, MINN, MAXN)] = [1.0, 0.0, 0.0]
    p = str(tmp_path / "sub.bin")
    _write_bin_sub(p, gram_mat)
    model = load_bin(p)
    a = get_analyzer("classification", model=model)
    terms, pos = a.analyze("catt")  # OOV-only input still classifies
    assert terms == ["animal"] and pos == [0]
    # without the oov composer the same input yields nothing
    a0 = get_analyzer(
        "classification",
        model={"vocab": model["vocab"], "labels": model["labels"]},
    )
    assert a0.analyze("catt") == ([], [])


def test_nearest_neighbors_oov_via_subwords(tmp_path):
    gram_mat = np.zeros((BUCKET, 3), dtype="<f4")
    gram_mat[subword_ids("catt", BUCKET, MINN, MAXN)] = [1.0, 0.0, 0.0]
    p = str(tmp_path / "sub.bin")
    _write_bin_sub(p, gram_mat)
    model = load_bin(p)
    # loaded-model form accepted directly; OOV "catt" composes to
    # ~[1,0,0] whose nearest vocab word is "cat"
    a = get_analyzer("nearest_neighbors", model=model, top_k=1)
    # note: in-vocab rows were themselves gram-composed, so compute the
    # expected neighbor from the composed table
    words = sorted(model["vocab"])
    mat = np.asarray([model["vocab"][w] for w in words], dtype=np.float32)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = model["oov"]("catt")
    q = q / np.linalg.norm(q)
    expect = words[int(np.argmax(mat @ q))]
    terms, pos = a.analyze("catt")
    assert terms == [expect] and pos == [0]
    # bare-table form (no oov): OOV emits nothing, positions unchanged
    a0 = get_analyzer("nearest_neighbors", model=model["vocab"], top_k=1)
    assert a0.analyze("catt") == ([], [])


# ---------------------------------------------------------------------------
# Quantized (.ftz) models: product-quantized matrices reconstructed at
# load, optional quantized output matrix (qout), pruned dictionaries.
# ---------------------------------------------------------------------------

from iresearch_spark.analysis.fasttext_io import load_model as _lm  # noqa: F401


def _pq_pack(mat, dsub):
    """Exact-by-construction PQ encoding: row i's code in every
    subquantizer is i, and centroid i of subquantizer j equals row i's
    j-th subvector — so spec-conformant decode reproduces `mat`
    bit-for-bit. Returns (nsubq, dsub, lastdsub, centroids, codes)."""
    m, dim = mat.shape
    assert m <= 256
    nsubq = (dim + dsub - 1) // dsub
    lastdsub = dim - (nsubq - 1) * dsub
    cents = np.zeros(dim * 256, dtype="<f4")
    codes = np.zeros((m, nsubq), dtype=np.uint8)
    for j in range(nsubq):
        d = dsub if j < nsubq - 1 else lastdsub
        sub = mat[:, j * dsub : j * dsub + d]
        block = j * 256 * dsub
        for i in range(m):
            codes[i, j] = i
            cents[block + i * d : block + i * d + d] = sub[i]
    return nsubq, dsub, lastdsub, cents, codes


def _write_quant_matrix(f, mat, qnorm=True, dsub=2):
    """QuantMatrix::save layout (the caller writes the quant flag)."""
    mat = np.asarray(mat, dtype=np.float32)
    m, dim = mat.shape
    if qnorm:
        norms = np.linalg.norm(mat, axis=1).astype(np.float32)
        coded = mat / norms[:, None]
    else:
        coded = mat
    nsubq, dsub, lastdsub, cents, codes = _pq_pack(coded, dsub)
    f.write(struct.pack("<b", 1 if qnorm else 0))
    f.write(struct.pack("<2q", m, dim))
    f.write(struct.pack("<i", codes.size))
    f.write(codes.tobytes())
    f.write(struct.pack("<4i", dim, nsubq, dsub, lastdsub))
    f.write(cents.tobytes())
    if qnorm:
        ncents = np.zeros(256, dtype="<f4")
        ncents[:m] = norms
        f.write(np.arange(m, dtype=np.uint8).tobytes())
        f.write(struct.pack("<4i", 1, 1, 1, 1))
        f.write(ncents.tobytes())


def _write_ftz(path, qnorm=True, qout=False, dsub=2):
    """A spec-conformant quantized supervised model over VOCAB/LABELS."""
    words = list(VOCAB)
    labels = [f"__label__{k}" for k in LABELS]
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, 12))
        f.write(struct.pack("<12i", 3, 5, 5, 1, 5, 1, 3, 3, 0, 0, 0, 100))
        f.write(struct.pack("<d", 1e-4))
        f.write(struct.pack(
            "<3i", len(words) + len(labels), len(words), len(labels)
        ))
        f.write(struct.pack("<2q", 100, 0))  # pruned-to-nothing gram space
        for w in words:
            f.write(w.encode() + b"\x00" + struct.pack("<qb", 7, 0))
        for lb in labels:
            f.write(lb.encode() + b"\x00" + struct.pack("<qb", 3, 1))
        in_mat = np.asarray([VOCAB[w] for w in words], dtype=np.float32)
        f.write(struct.pack("<b", 1))  # quant input
        _write_quant_matrix(f, in_mat, qnorm=qnorm, dsub=dsub)
        out_mat = np.asarray(list(LABELS.values()), dtype=np.float32)
        f.write(struct.pack("<b", 1 if qout else 0))
        if qout:
            _write_quant_matrix(f, out_mat, qnorm=qnorm, dsub=dsub)
        else:
            f.write(struct.pack("<2q", out_mat.shape[0], out_mat.shape[1]))
            f.write(out_mat.astype("<f4").tobytes())


def test_ftz_roundtrip_qnorm(tmp_path):
    p = str(tmp_path / "m.ftz")
    _write_ftz(p, qnorm=True)
    model = load_bin(p)
    assert set(model["vocab"]) == set(VOCAB)
    for w, v in VOCAB.items():
        np.testing.assert_allclose(model["vocab"][w], v, atol=1e-6)
    np.testing.assert_allclose(model["labels"]["vehicle"], [0.0, 1.0, 0.0])


def test_ftz_roundtrip_no_qnorm(tmp_path):
    p = str(tmp_path / "m2.ftz")
    _write_ftz(p, qnorm=False)
    model = load_bin(p)
    for w, v in VOCAB.items():
        np.testing.assert_allclose(model["vocab"][w], v, atol=1e-6)


def test_ftz_qout(tmp_path):
    p = str(tmp_path / "m3.ftz")
    _write_ftz(p, qout=True)
    model = load_bin(p)
    for k, v in LABELS.items():
        np.testing.assert_allclose(model["labels"][k], v, atol=1e-6)


def test_ftz_uneven_dsub_tail(tmp_path):
    # dim=3 with dsub=2 -> nsubq=2, lastdsub=1: exercises the packed
    # tail-subquantizer centroid layout
    p = str(tmp_path / "m4.ftz")
    _write_ftz(p, qnorm=True, dsub=2)
    model = load_bin(p)
    np.testing.assert_allclose(model["vocab"]["dog"], VOCAB["dog"], atol=1e-6)


def test_ftz_classification_analyzer(tmp_path):
    p = str(tmp_path / "m5.ftz")
    _write_ftz(p, qnorm=True, qout=True)
    model = load_model(p)  # magic-detected like .bin
    a = get_analyzer("classification", model=model)
    assert a.analyze("the cat and the dog") == (["animal"], [0])
    assert a.analyze("car bus car")[0] == ["vehicle"]


def _write_ftz_pruned(path, gram_keep):
    """Quantized SUBWORD model with a pruned dictionary: only the gram
    hash-ids in `gram_keep` survive, mapped (in order) onto the gram
    rows after the words — the `quantize -cutoff` file shape."""
    words = list(VOCAB)
    labels = [f"__label__{k}" for k in LABELS]
    pruneidx = {g: i for i, g in enumerate(gram_keep)}
    gram_mat = np.asarray(
        [[float(i + 1), 0.5 * i, -1.0] for i in range(len(gram_keep))],
        dtype=np.float32,
    )
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, 12))
        f.write(struct.pack(
            "<12i", 3, 5, 5, 1, 5, 1, 3, 3, BUCKET, MINN, MAXN, 100
        ))
        f.write(struct.pack("<d", 1e-4))
        f.write(struct.pack(
            "<3i", len(words) + len(labels), len(words), len(labels)
        ))
        f.write(struct.pack("<2q", 100, len(pruneidx)))
        for w in words:
            f.write(w.encode() + b"\x00" + struct.pack("<qb", 7, 0))
        for lb in labels:
            f.write(lb.encode() + b"\x00" + struct.pack("<qb", 3, 1))
        for g, row in pruneidx.items():
            f.write(struct.pack("<2i", g, row))
        in_mat = np.concatenate(
            [np.asarray([VOCAB[w] for w in words], dtype=np.float32), gram_mat]
        )
        f.write(struct.pack("<b", 1))
        _write_quant_matrix(f, in_mat, qnorm=True, dsub=2)
        out_mat = np.asarray(list(LABELS.values()), dtype=np.float32)
        f.write(struct.pack("<b", 0))
        f.write(struct.pack("<2q", out_mat.shape[0], out_mat.shape[1]))
        f.write(out_mat.astype("<f4").tobytes())
    return pruneidx, gram_mat


def test_ftz_pruned_subword_composition(tmp_path):
    ids_cat = subword_ids("cat", BUCKET, MINN, MAXN)
    keep = sorted(set(ids_cat[:2]))  # survive only some of cat's grams
    p = str(tmp_path / "pr.ftz")
    pruneidx, gram_mat = _write_ftz_pruned(p, keep)
    model = load_bin(p)
    # in-vocab composition: word row + ONLY the surviving grams
    for w, base in VOCAB.items():
        ids = [
            pruneidx[i]
            for i in subword_ids(w, BUCKET, MINN, MAXN)
            if i in pruneidx
        ]
        want = np.concatenate(
            [np.asarray([base], dtype=np.float32), gram_mat[ids]]
        ).mean(axis=0)
        np.testing.assert_allclose(model["vocab"][w], want, atol=1e-5)
    # OOV composer maps through pruneidx and drops pruned grams
    sv = model["oov"]
    assert sv.pruneidx == pruneidx and sv.bucket == BUCKET
    ids_zzz = [
        pruneidx[i]
        for i in subword_ids("zzz", BUCKET, MINN, MAXN)
        if i in pruneidx
    ]
    if ids_zzz:
        np.testing.assert_allclose(
            sv("zzz"), gram_mat[ids_zzz].mean(axis=0), atol=1e-5
        )
    else:
        assert sv("zzz") is None
    # an OOV token none of whose grams survived contributes nothing
    all_pruned = [t for t in ("qqqq", "xyxy", "jjjj")
                  if not any(i in pruneidx
                             for i in subword_ids(t, BUCKET, MINN, MAXN))]
    for t in all_pruned:
        assert sv(t) is None
