"""fastText model-file loaders for the classification /
nearest_neighbors analyzers.

The reference loads fastText models directly
(`core/analysis/classification_stream.cpp` /
`nearest_neighbors_stream.cpp` call fasttext::FastText::loadModel);
this module parses the PUBLIC fastText formats into the embedding-table
form those analyzers already take (`model={"vocab": ..., "labels":
...}` — see analyzers._embedding_table):

  * `.vec` — the text format (`N D` header line, then
    `word v1 .. vD` rows). `__label__*` rows are split out as label
    vectors, everything else is vocabulary.
  * `.bin` — the binary format (magic 793712314): args block,
    dictionary (words + labels with counts/types), then the dense
    input and output matrices. Supervised models map words -> input
    rows and labels -> output rows, which is exactly what the
    classification analyzer's softmax-over-label-vectors needs.
    Quantized (.ftz) models are rejected with a clear error (export
    to .vec instead). Subword (minn/maxn) buckets are parsed past but
    NOT used for OOV lookup — an out-of-vocabulary token simply
    contributes nothing to the sentence vector (documented gap; the
    reference composes subword vectors there).

Everything is implemented from the format as documented in the public
fastText repository — no fastText code is linked or vendored.
"""

from __future__ import annotations

import struct

import numpy as np

FASTTEXT_MAGIC = 793712314
LABEL_PREFIX = "__label__"


def load_vec(path: str) -> dict[str, np.ndarray]:
    """Parse a .vec text file -> {token: float32[dim]} (labels
    included verbatim — use split_labels for the analyzer form)."""
    out: dict[str, np.ndarray] = {}
    dim = None
    with open(path, "r", encoding="utf-8", errors="surrogateescape") as f:
        first = f.readline()
        parts = first.rstrip("\n").split(" ")
        if len(parts) == 2 and parts[0].isdigit() and parts[1].isdigit():
            dim = int(parts[1])  # header "N D"
        else:
            _consume_vec_line(out, parts)
        for line in f:
            parts = line.rstrip("\n").split(" ")
            _consume_vec_line(out, parts)
    if dim is not None:
        for w, v in out.items():
            if v.size != dim:
                raise ValueError(
                    f"vector for {w!r} has {v.size} dims, header says {dim}"
                )
    return out


def _consume_vec_line(out: dict, parts: list[str]) -> None:
    if len(parts) < 2 or (len(parts) == 1 and not parts[0]):
        return
    # fastText tokens never contain ' ' (it writes token + ' ' + floats);
    # trailing empty strings come from a trailing space
    vals = [p for p in parts[1:] if p != ""]
    out[parts[0]] = np.asarray([float(x) for x in vals], dtype=np.float32)


def split_labels(
    table: dict[str, np.ndarray]
) -> dict[str, dict[str, np.ndarray]]:
    """{token: vec} -> {"vocab": {...}, "labels": {...}} splitting on
    the __label__ prefix (label keys keep the prefix stripped)."""
    vocab, labels = {}, {}
    for k, v in table.items():
        if k.startswith(LABEL_PREFIX):
            labels[k[len(LABEL_PREFIX):]] = v
        else:
            vocab[k] = v
    return {"vocab": vocab, "labels": labels}


def load_model(path: str) -> dict[str, dict[str, np.ndarray]]:
    """Load a .vec or .bin file into the analyzers' model form
    ({"vocab": ..., "labels": ...}). Binary is detected by magic, not
    extension."""
    with open(path, "rb") as f:
        head = f.read(4)
    if len(head) == 4 and struct.unpack("<i", head)[0] == FASTTEXT_MAGIC:
        return load_bin(path)
    return split_labels(load_vec(path))


def load_bin(path: str) -> dict[str, dict[str, np.ndarray]]:
    """Parse a (non-quantized) fastText .bin supervised/skipgram model:
    words map to input-matrix rows, labels to output-matrix rows."""
    with open(path, "rb") as f:
        magic, version = struct.unpack("<ii", f.read(8))
        if magic != FASTTEXT_MAGIC:
            raise ValueError("not a fastText .bin file (bad magic)")
        # Args: 12 int32 + 1 double (dim ws epoch minCount neg
        # wordNgrams loss model bucket minn maxn lrUpdateRate, t)
        args = struct.unpack("<12i", f.read(48))
        (dim, _ws, _epoch, _minc, _neg, _wn, _loss, _model, _bucket,
         _minn, _maxn, _lru) = args
        (_t,) = struct.unpack("<d", f.read(8))
        # Dictionary
        size_, nwords, nlabels = struct.unpack("<3i", f.read(12))
        _ntokens, pruneidx_size = struct.unpack("<2q", f.read(16))
        entries: list[tuple[str, int]] = []
        for _ in range(size_):
            chars = bytearray()
            while True:
                c = f.read(1)
                if not c or c == b"\x00":
                    break
                chars.extend(c)
            (_count,) = struct.unpack("<q", f.read(8))
            (etype,) = struct.unpack("<b", f.read(1))
            entries.append((chars.decode("utf-8"), etype))
        if pruneidx_size > 0:
            f.read(8 * pruneidx_size)  # (int32, int32) pairs
        # input matrix
        (quant_in,) = struct.unpack("<b", f.read(1))
        if quant_in:
            raise ValueError(
                "quantized fastText model (.ftz) — export to .vec and "
                "load that instead"
            )
        m, n = struct.unpack("<2q", f.read(16))
        in_mat = np.frombuffer(f.read(4 * m * n), dtype="<f4").reshape(m, n)
        (quant_out,) = struct.unpack("<b", f.read(1))
        if quant_out:
            raise ValueError("quantized output matrix — export to .vec")
        mo, no = struct.unpack("<2q", f.read(16))
        out_mat = np.frombuffer(f.read(4 * mo * no), dtype="<f4").reshape(
            mo, no
        )
    vocab: dict[str, np.ndarray] = {}
    labels: dict[str, np.ndarray] = {}
    wi = 0
    li = 0
    for word, etype in entries:
        if etype == 0:  # word -> input row
            if wi < in_mat.shape[0]:
                vocab[word] = np.array(in_mat[wi], dtype=np.float32)
            wi += 1
        else:  # label -> output row
            key = (
                word[len(LABEL_PREFIX):]
                if word.startswith(LABEL_PREFIX)
                else word
            )
            if li < out_mat.shape[0]:
                labels[key] = np.array(out_mat[li], dtype=np.float32)
            li += 1
    if nwords != wi or nlabels != li:
        raise ValueError(
            f"dictionary mismatch: header ({nwords} words, {nlabels} "
            f"labels) vs entries ({wi}, {li})"
        )
    return {"vocab": vocab, "labels": labels}
