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
  * `.ftz` — the QUANTIZED binary format (same magic; the quant flag
    byte before each matrix selects a product-quantized layout).
    Each quantized matrix stores per-row uint8 codes over `nsubq`
    subquantizers with 256 centroids each (`dsub` dims per
    subquantizer, `lastdsub` for the tail) plus, when `qnorm` is
    set, a separately quantized per-row norm (a 1-d product
    quantizer over the original row norms). Rows are reconstructed
    densely at load (norm * concat of the coded centroids — the
    exact `QuantMatrix::addRowToVector` math), so the analyzers see
    the same embedding-table form as a dense `.bin`. Quantized
    models may also carry a PRUNED dictionary (`pruneidx`): the
    n-gram hash space maps through the pruneidx table onto the
    surviving rows of the input matrix, and grams that were pruned
    away simply don't contribute (fastText `Dictionary::pushHash`
    semantics).

    Subword (minn/maxn > 0, bucket > 0) models are
    fully composed: each in-vocab word vector is the MEAN of the
    word's own input row and its character-n-gram rows (fastText
    getWordVector semantics), and the returned model carries an
    `"oov"` callable (`SubwordVectors`) that builds vectors for
    out-of-vocabulary tokens from their n-gram rows alone — the
    classification / nearest_neighbors analyzers pick it up so OOV
    tokens contribute exactly as in the reference's fastText path.
    N-gram ids use fastText's FNV-1a variant (signed-char cast) over
    byte-level n-grams of "<word>"; 1-grams at the word boundaries
    ("<", ">") are excluded, UTF-8 continuation bytes never start or
    split a gram.

Everything is implemented from the format as documented in the public
fastText repository — no fastText code is linked or vendored.
"""

from __future__ import annotations

import struct

import numpy as np

FASTTEXT_MAGIC = 793712314
LABEL_PREFIX = "__label__"
BOW, EOW = "<", ">"
EOS = "</s>"


def fnv1a_hash(s: str) -> int:
    """fastText's Dictionary::hash — 32-bit FNV-1a over UTF-8 bytes
    with the signed-char cast (`uint32_t(int8_t(c))`): bytes >= 0x80
    sign-extend to 0xFFFFFFxx before the xor, which changes the hash
    for any non-ASCII gram vs the textbook unsigned variant."""
    h = 2166136261
    for b in s.encode("utf-8"):
        x = b - 256 if b > 127 else b
        h = ((h ^ (x & 0xFFFFFFFF)) * 16777619) & 0xFFFFFFFF
    return h


def compute_subwords(token: str, minn: int, maxn: int) -> list[str]:
    """Character n-grams of BOW+token+EOW exactly as fastText's
    Dictionary::computeSubwords walks them: byte-wise over the UTF-8
    encoding, a gram never starts on a continuation byte and always
    swallows trailing continuation bytes (so multi-byte characters
    count as ONE position), and the two boundary 1-grams ("<" and
    ">") are excluded even when minn == 1. The whole "<token>" string
    is itself a gram when its character length is within [minn, maxn]."""
    word = (BOW + token + EOW).encode("utf-8")
    size = len(word)
    grams: list[str] = []
    for i in range(size):
        if (word[i] & 0xC0) == 0x80:
            continue
        gram = bytearray()
        j, n = i, 1
        while j < size and n <= maxn:
            gram.append(word[j])
            j += 1
            while j < size and (word[j] & 0xC0) == 0x80:
                gram.append(word[j])
                j += 1
            if n >= minn and not (n == 1 and (i == 0 or j == size)):
                grams.append(bytes(gram).decode("utf-8"))
            n += 1
    return grams


def subword_ids(token: str, bucket: int, minn: int, maxn: int) -> list[int]:
    """Hash-bucket row ids (0-based within the n-gram block of the
    input matrix) for a token's subword grams."""
    return [
        fnv1a_hash(g) % bucket for g in compute_subwords(token, minn, maxn)
    ]


class SubwordVectors:
    """OOV vector builder over the n-gram block of a .bin input
    matrix: vector(word) = mean of its subword-gram rows (fastText's
    getWordVector for an out-of-vocabulary word). Picklable — rides
    the Spark task broadcast inside analyzer closures the same way
    the embedding table does. Holds ONLY the n-gram block, not the
    word rows. For PRUNED (.ftz `quantize -cutoff`) models the block
    holds just the surviving gram rows and `pruneidx` maps hash-space
    gram ids onto them; pruned-away grams contribute nothing
    (Dictionary::pushHash)."""

    def __init__(
        self,
        gram_mat: np.ndarray,
        minn: int,
        maxn: int,
        bucket: int | None = None,
        pruneidx: dict[int, int] | None = None,
    ):
        self.gram_mat = np.ascontiguousarray(gram_mat, dtype=np.float32)
        self.minn = int(minn)
        self.maxn = int(maxn)
        # Unpruned models: the block IS the full hash space.
        self.bucket = int(bucket) if bucket is not None else gram_mat.shape[0]
        self.pruneidx = pruneidx

    def __call__(self, token: str):
        ids = subword_ids(token, self.bucket, self.minn, self.maxn)
        if self.pruneidx is not None:
            ids = [self.pruneidx[i] for i in ids if i in self.pruneidx]
        if not ids:
            return None
        return self.gram_mat[ids].mean(axis=0)


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


_PQ_KSUB = 256  # fastText ProductQuantizer nbits_ = 8 -> 1 << 8 centroids


def _read_product_quantizer(f) -> dict:
    """ProductQuantizer::save layout: dim, nsubq, dsub, lastdsub
    (int32 each) then `dim * 256` float32 centroids. Subquantizer m's
    centroid c lives at `(m*256 + c) * dsub` — except the LAST
    subquantizer, whose 256 centroids of `lastdsub` dims are packed
    contiguously from `(nsubq-1) * 256 * dsub`."""
    dim, nsubq, dsub, lastdsub = struct.unpack("<4i", f.read(16))
    cents = np.frombuffer(f.read(4 * dim * _PQ_KSUB), dtype="<f4")
    return {"dim": dim, "nsubq": nsubq, "dsub": dsub,
            "lastdsub": lastdsub, "centroids": cents}


def _pq_decode(pq: dict, codes: np.ndarray) -> np.ndarray:
    """Vectorized ProductQuantizer::addcode over all rows: codes is
    (m, nsubq) uint8; returns the dense (m, dim) float32 matrix."""
    m = codes.shape[0]
    nsubq, dsub, lastdsub = pq["nsubq"], pq["dsub"], pq["lastdsub"]
    out = np.empty((m, pq["dim"]), dtype=np.float32)
    cents = pq["centroids"]
    for j in range(nsubq - 1):
        block = cents[j * _PQ_KSUB * dsub : (j + 1) * _PQ_KSUB * dsub]
        out[:, j * dsub : (j + 1) * dsub] = block.reshape(_PQ_KSUB, dsub)[
            codes[:, j]
        ]
    last = cents[(nsubq - 1) * _PQ_KSUB * dsub :]
    out[:, (nsubq - 1) * dsub :] = last.reshape(_PQ_KSUB, lastdsub)[
        codes[:, -1]
    ]
    return out


def _read_quant_matrix(f) -> np.ndarray:
    """QuantMatrix::save layout -> densely reconstructed rows:
    qnorm (int8), m/n (int64), codesize (int32), `codesize` uint8
    codes, the ProductQuantizer, and when qnorm is set the per-row
    norm codes (m uint8) + the 1-d norm quantizer. Row i =
    norm_i * concat_m(centroid(m, code[i, m])) — the exact
    QuantMatrix::addRowToVector reconstruction."""
    (qnorm,) = struct.unpack("<b", f.read(1))
    m, _n = struct.unpack("<2q", f.read(16))
    (codesize,) = struct.unpack("<i", f.read(4))
    codes = np.frombuffer(f.read(codesize), dtype=np.uint8)
    pq = _read_product_quantizer(f)
    mat = _pq_decode(pq, codes.reshape(m, pq["nsubq"]))
    if qnorm:
        norm_codes = np.frombuffer(f.read(m), dtype=np.uint8)
        npq = _read_product_quantizer(f)
        # dim=1 quantizer: centroid c is just centroids[c]
        mat *= npq["centroids"][norm_codes][:, None]
    return mat


def load_bin(path: str) -> dict[str, dict[str, np.ndarray]]:
    """Parse a fastText .bin / .ftz supervised/skipgram model: words
    map to input-matrix rows, labels to output-matrix rows; quantized
    matrices are densely reconstructed at load (see module header)."""
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
        # Pruned (.ftz cutoff) dictionaries carry the gram-id ->
        # surviving-input-row map; pruneidx_size is -1 (or 0) when no
        # grams are mapped — the shape check below then decides whether
        # a full gram block is present.
        pruneidx: dict[int, int] | None = None
        if pruneidx_size > 0:
            pairs = np.frombuffer(
                f.read(8 * pruneidx_size), dtype="<i4"
            ).reshape(pruneidx_size, 2)
            pruneidx = {int(a): int(b) for a, b in pairs}
        # input matrix: dense, or product-quantized (.ftz)
        (quant_in,) = struct.unpack("<b", f.read(1))
        if quant_in:
            in_mat = _read_quant_matrix(f)
        else:
            m, n = struct.unpack("<2q", f.read(16))
            in_mat = np.frombuffer(f.read(4 * m * n), dtype="<f4").reshape(
                m, n
            )
        # The next byte is args->qout: the output matrix is quantized
        # only when the model is quantized AND qout was set.
        (qout,) = struct.unpack("<b", f.read(1))
        if quant_in and qout:
            out_mat = _read_quant_matrix(f)
        else:
            mo, no = struct.unpack("<2q", f.read(16))
            out_mat = np.frombuffer(f.read(4 * mo * no), dtype="<f4").reshape(
                mo, no
            )
    # Subword models: the input matrix is (nwords + bucket) x dim and a
    # word's vector is the mean of its own row plus its n-gram rows
    # (getWordVector). Word-row-only models (bucket == 0 or maxn == 0,
    # e.g. default supervised) keep the plain row mapping. Pruned
    # dictionaries keep only len(pruneidx) gram rows after the words.
    gram_rows = (
        len(pruneidx) if pruneidx is not None else _bucket
    )
    has_subwords = (
        _maxn > 0
        and _bucket > 0
        and gram_rows > 0
        and in_mat.shape[0] == nwords + gram_rows
    )
    gram_mat = in_mat[nwords:] if has_subwords else None
    vocab: dict[str, np.ndarray] = {}
    labels: dict[str, np.ndarray] = {}
    wi = 0
    li = 0
    for word, etype in entries:
        if etype == 0:  # word -> input row
            if wi < in_mat.shape[0]:
                if has_subwords and word != EOS:
                    ids = subword_ids(word, _bucket, _minn, _maxn)
                    if pruneidx is not None:
                        ids = [pruneidx[i] for i in ids if i in pruneidx]
                    rows = np.concatenate(
                        [in_mat[wi : wi + 1], gram_mat[ids]]
                    )
                    vocab[word] = rows.mean(axis=0).astype(np.float32)
                else:
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
    model = {"vocab": vocab, "labels": labels}
    if has_subwords:
        model["oov"] = SubwordVectors(
            gram_mat, _minn, _maxn, bucket=_bucket, pruneidx=pruneidx
        )
    return model
