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
