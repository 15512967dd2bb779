"""Analyzer chains — capability parity with IResearch's analyzer registry.

The reference registers analyzers by name in a plugin registry
(`core/analysis/analyzers.cpp:190`) and composes tokenize -> NFC
normalize -> lowercase -> stopword filter -> Snowball stem inside the
`text` analyzer (`core/analysis/text_token_stream.cpp:356-420,984-1080`).
Here each analyzer is a pure-Python *batch* function (list of docs in,
list of (terms, positions) out) invoked from pandas/Arrow UDFs — one
Python call per Arrow batch, vectorized inside via numpy/pandas, never
per row from Spark's perspective.

Positions follow the reference's semantics: position = running sum of
increments (`core/index/field_data.cpp:1066-1071`); a removed stopword
leaves a position gap (increment accumulates).

Registry names (parity with §2.1 of SURVEY.md):
  whitespace   split on whitespace, no normalization
  simple       lowercase + split on whitespace   (oracle-friendly)
  text_en      unicode word tokenize + NFC + lower [+ stopwords] + Porter2
  segmentation unicode word tokenize + lower (reference's bench default)
  norm         single-token normalizer (NFC + case, no split)
  stem         single-token Porter2 stemmer
  delimiter    split on a delimiter string
  ngram        char n-grams [min_gram, max_gram]
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field
from typing import Callable, Sequence

import numpy as np

from iresearch_spark.analysis.porter2 import MemoStemmer

_WS_RE = re.compile(r"\s+")
# Combining marks (Unicode general category M*), which Python's \w does
# NOT match but the Arrow fast path's \pM does: without them the slow
# path would shred scripts that spell vowels as combining signs
# (Devanagari matras, Arabic harakat, Hebrew points, Thai sara).
# Generated once from unicodedata (Unicode 15) and embedded so import
# costs nothing; the fast/slow differential tests pin the equivalence.
_COMBINING_MARKS = (
    "\u0300-\u036f\u0483-\u0489\u0591-\u05bd\u05bf\u05c1-\u05c2"
    "\u05c4-\u05c5\u05c7\u0610-\u061a\u064b-\u065f\u0670\u06d6-\u06dc"
    "\u06df-\u06e4\u06e7-\u06e8\u06ea-\u06ed\u0711\u0730-\u074a"
    "\u07a6-\u07b0\u07eb-\u07f3\u07fd\u0816-\u0819\u081b-\u0823"
    "\u0825-\u0827\u0829-\u082d\u0859-\u085b\u0898-\u089f"
    "\u08ca-\u08e1\u08e3-\u0903\u093a-\u093c\u093e-\u094f"
    "\u0951-\u0957\u0962-\u0963\u0981-\u0983\u09bc\u09be-\u09c4"
    "\u09c7-\u09c8\u09cb-\u09cd\u09d7\u09e2-\u09e3\u09fe\u0a01-\u0a03"
    "\u0a3c\u0a3e-\u0a42\u0a47-\u0a48\u0a4b-\u0a4d\u0a51\u0a70-\u0a71"
    "\u0a75\u0a81-\u0a83\u0abc\u0abe-\u0ac5\u0ac7-\u0ac9\u0acb-\u0acd"
    "\u0ae2-\u0ae3\u0afa-\u0aff\u0b01-\u0b03\u0b3c\u0b3e-\u0b44"
    "\u0b47-\u0b48\u0b4b-\u0b4d\u0b55-\u0b57\u0b62-\u0b63\u0b82"
    "\u0bbe-\u0bc2\u0bc6-\u0bc8\u0bca-\u0bcd\u0bd7\u0c00-\u0c04\u0c3c"
    "\u0c3e-\u0c44\u0c46-\u0c48\u0c4a-\u0c4d\u0c55-\u0c56"
    "\u0c62-\u0c63\u0c81-\u0c83\u0cbc\u0cbe-\u0cc4\u0cc6-\u0cc8"
    "\u0cca-\u0ccd\u0cd5-\u0cd6\u0ce2-\u0ce3\u0d00-\u0d03"
    "\u0d3b-\u0d3c\u0d3e-\u0d44\u0d46-\u0d48\u0d4a-\u0d4d\u0d57"
    "\u0d62-\u0d63\u0d81-\u0d83\u0dca\u0dcf-\u0dd4\u0dd6\u0dd8-\u0ddf"
    "\u0df2-\u0df3\u0e31\u0e34-\u0e3a\u0e47-\u0e4e\u0eb1\u0eb4-\u0ebc"
    "\u0ec8-\u0ecd\u0f18-\u0f19\u0f35\u0f37\u0f39\u0f3e-\u0f3f"
    "\u0f71-\u0f84\u0f86-\u0f87\u0f8d-\u0f97\u0f99-\u0fbc\u0fc6"
    "\u102b-\u103e\u1056-\u1059\u105e-\u1060\u1062-\u1064"
    "\u1067-\u106d\u1071-\u1074\u1082-\u108d\u108f\u109a-\u109d"
    "\u135d-\u135f\u1712-\u1715\u1732-\u1734\u1752-\u1753"
    "\u1772-\u1773\u17b4-\u17d3\u17dd\u180b-\u180d\u180f\u1885-\u1886"
    "\u18a9\u1920-\u192b\u1930-\u193b\u1a17-\u1a1b\u1a55-\u1a5e"
    "\u1a60-\u1a7c\u1a7f\u1ab0-\u1ace\u1b00-\u1b04\u1b34-\u1b44"
    "\u1b6b-\u1b73\u1b80-\u1b82\u1ba1-\u1bad\u1be6-\u1bf3"
    "\u1c24-\u1c37\u1cd0-\u1cd2\u1cd4-\u1ce8\u1ced\u1cf4\u1cf7-\u1cf9"
    "\u1dc0-\u1dff\u20d0-\u20f0\u2cef-\u2cf1\u2d7f\u2de0-\u2dff"
    "\u302a-\u302f\u3099-\u309a\ua66f-\ua672\ua674-\ua67d"
    "\ua69e-\ua69f\ua6f0-\ua6f1\ua802\ua806\ua80b\ua823-\ua827\ua82c"
    "\ua880-\ua881\ua8b4-\ua8c5\ua8e0-\ua8f1\ua8ff\ua926-\ua92d"
    "\ua947-\ua953\ua980-\ua983\ua9b3-\ua9c0\ua9e5\uaa29-\uaa36\uaa43"
    "\uaa4c-\uaa4d\uaa7b-\uaa7d\uaab0\uaab2-\uaab4\uaab7-\uaab8"
    "\uaabe-\uaabf\uaac1\uaaeb-\uaaef\uaaf5-\uaaf6\uabe3-\uabea"
    "\uabec-\uabed\ufb1e\ufe00-\ufe0f\ufe20-\ufe2f\U000101fd"
    "\U000102e0\U00010376-\U0001037a\U00010a01-\U00010a03"
    "\U00010a05-\U00010a06\U00010a0c-\U00010a0f\U00010a38-\U00010a3a"
    "\U00010a3f\U00010ae5-\U00010ae6\U00010d24-\U00010d27"
    "\U00010eab-\U00010eac\U00010f46-\U00010f50\U00010f82-\U00010f85"
    "\U00011000-\U00011002\U00011038-\U00011046\U00011070"
    "\U00011073-\U00011074\U0001107f-\U00011082\U000110b0-\U000110ba"
    "\U000110c2\U00011100-\U00011102\U00011127-\U00011134"
    "\U00011145-\U00011146\U00011173\U00011180-\U00011182"
    "\U000111b3-\U000111c0\U000111c9-\U000111cc\U000111ce-\U000111cf"
    "\U0001122c-\U00011237\U0001123e\U000112df-\U000112ea"
    "\U00011300-\U00011303\U0001133b-\U0001133c\U0001133e-\U00011344"
    "\U00011347-\U00011348\U0001134b-\U0001134d\U00011357"
    "\U00011362-\U00011363\U00011366-\U0001136c\U00011370-\U00011374"
    "\U00011435-\U00011446\U0001145e\U000114b0-\U000114c3"
    "\U000115af-\U000115b5\U000115b8-\U000115c0\U000115dc-\U000115dd"
    "\U00011630-\U00011640\U000116ab-\U000116b7\U0001171d-\U0001172b"
    "\U0001182c-\U0001183a\U00011930-\U00011935\U00011937-\U00011938"
    "\U0001193b-\U0001193e\U00011940\U00011942-\U00011943"
    "\U000119d1-\U000119d7\U000119da-\U000119e0\U000119e4"
    "\U00011a01-\U00011a0a\U00011a33-\U00011a39\U00011a3b-\U00011a3e"
    "\U00011a47\U00011a51-\U00011a5b\U00011a8a-\U00011a99"
    "\U00011c2f-\U00011c36\U00011c38-\U00011c3f\U00011c92-\U00011ca7"
    "\U00011ca9-\U00011cb6\U00011d31-\U00011d36\U00011d3a"
    "\U00011d3c-\U00011d3d\U00011d3f-\U00011d45\U00011d47"
    "\U00011d8a-\U00011d8e\U00011d90-\U00011d91\U00011d93-\U00011d97"
    "\U00011ef3-\U00011ef6\U00016af0-\U00016af4\U00016b30-\U00016b36"
    "\U00016f4f\U00016f51-\U00016f87\U00016f8f-\U00016f92\U00016fe4"
    "\U00016ff0-\U00016ff1\U0001bc9d-\U0001bc9e\U0001cf00-\U0001cf2d"
    "\U0001cf30-\U0001cf46\U0001d165-\U0001d169\U0001d16d-\U0001d172"
    "\U0001d17b-\U0001d182\U0001d185-\U0001d18b\U0001d1aa-\U0001d1ad"
    "\U0001d242-\U0001d244\U0001da00-\U0001da36\U0001da3b-\U0001da6c"
    "\U0001da75\U0001da84\U0001da9b-\U0001da9f\U0001daa1-\U0001daaf"
    "\U0001e000-\U0001e006\U0001e008-\U0001e018\U0001e01b-\U0001e021"
    "\U0001e023-\U0001e024\U0001e026-\U0001e02a\U0001e130-\U0001e136"
    "\U0001e2ae\U0001e2ec-\U0001e2ef\U0001e8d0-\U0001e8d6"
    "\U0001e944-\U0001e94a\U000e0100-\U000e01ef"
)
# Unicode-ish word tokenizer: runs of word chars (letters/marks/digits,
# underscore removed), keeping inner apostrophes (house's -> one token)
# like ICU word break rules do for English.
_WORD_CHAR = r"(?:[^\W_]|[" + _COMBINING_MARKS + "])"
_WORD_RE = re.compile(_WORD_CHAR + r"+(?:'" + _WORD_CHAR + r"+)*", re.UNICODE)

TokensAndPositions = tuple[list[str], list[int]]


@dataclass(frozen=True)
class FlatTokens:
    """Batch tokenization result with NO per-token Python objects.

    The index-build hot path works on these directly: token identity is
    an int32 code into `uniques`, so the per-segment sort/group runs on
    integer arrays and only #distinct-terms strings ever materialize.
    (The per-token Python strings of the generic path were both the CPU
    cost and — via allocator churn in 32 concurrent workers — the
    kernel-time scaling bottleneck.)
    """

    codes: np.ndarray      # int64 [n_tokens_total] -> index into uniques
    uniques: np.ndarray    # object [n_distinct] token strings
    n_tokens: np.ndarray   # int64 [n_docs] tokens per input text
    positions: np.ndarray  # int64 [n_tokens_total] position within doc
    uniques_arrow: object = None  # pa.Array of the same dictionary (optional)
    # per-token character spans (reference IndexFeatures OFFS) — only
    # set by analyze_flat_spans on span-capable analyzers
    starts: np.ndarray | None = None  # int64 [n_tokens_total]
    lens: np.ndarray | None = None    # int64 [n_tokens_total]


@dataclass(frozen=True)
class Analyzer:
    """A named, frozen tokenization chain."""

    name: str
    _fn: Callable[[Sequence[str]], list[TokensAndPositions]]
    # optional vectorized batch tokenizer (Arrow-native, zero per-token
    # Python); must be byte-identical to _fn — differential-tested
    _flat_fn: Callable[[Sequence[str]], FlatTokens] | None = None
    # optional span-capable tokenizer: per doc (terms, positions,
    # char starts, char lens), token stream identical to _fn —
    # differential-tested. Required for with_offsets index builds.
    _span_fn: Callable | None = None

    def analyze_batch(self, texts: Sequence[str]) -> list[TokensAndPositions]:
        """texts -> per-doc (terms, positions); None/empty -> ([], [])."""
        return self._fn(texts)

    def analyze(self, text: str) -> TokensAndPositions:
        return self.analyze_batch([text])[0]

    def analyze_flat(self, texts) -> FlatTokens:
        """Vectorized batch path (accepts a list or a pyarrow Array);
        falls back to analyze_batch for chains without a fast path."""
        if self._flat_fn is not None:
            return self._flat_fn(texts)
        if not isinstance(texts, (list, tuple)):
            to_pylist = getattr(texts, "to_pylist", None)
            texts = to_pylist() if to_pylist is not None else list(texts)
        return _flat_from_batch(self.analyze_batch(texts))

    @property
    def supports_offsets(self) -> bool:
        return self._span_fn is not None

    def analyze_flat_spans(self, texts) -> FlatTokens:
        """Like analyze_flat but with per-token character spans
        (starts/lens set) — the OFFS posting feature's source. Slower
        than the Arrow fast path (per-doc regex scan), which is the
        documented cost of enabling offsets (the reference similarly
        pays extra to write its offset streams)."""
        if self._span_fn is None:
            raise ValueError(
                f"analyzer {self.name!r} does not support offsets"
            )
        if not isinstance(texts, (list, tuple)):
            to_pylist = getattr(texts, "to_pylist", None)
            texts = to_pylist() if to_pylist is not None else list(texts)
        per_doc = self._span_fn(texts)
        import pandas as pd

        n_tokens = np.fromiter(
            (len(t[0]) for t in per_doc), dtype=np.int64, count=len(per_doc)
        )
        if n_tokens.sum() == 0:
            e = np.empty(0, np.int64)
            return FlatTokens(
                codes=e, uniques=np.empty(0, object), n_tokens=n_tokens,
                positions=e, starts=e, lens=e,
            )
        flat_terms = np.concatenate(
            [np.asarray(t[0], dtype=object) for t in per_doc if t[0]]
        )
        flat_pos = np.concatenate(
            [np.asarray(t[1], dtype=np.int64) for t in per_doc if t[0]]
        )
        flat_starts = np.concatenate(
            [np.asarray(t[2], dtype=np.int64) for t in per_doc if t[0]]
        )
        flat_lens = np.concatenate(
            [np.asarray(t[3], dtype=np.int64) for t in per_doc if t[0]]
        )
        codes, uniques = pd.factorize(flat_terms, sort=False)
        import pyarrow as pa

        uniq = np.asarray(uniques, dtype=object)
        return FlatTokens(
            codes=codes.astype(np.int64),
            uniques=uniq,
            n_tokens=n_tokens,
            positions=flat_pos,
            uniques_arrow=pa.array(uniq, type=pa.string()),
            starts=flat_starts,
            lens=flat_lens,
        )


def _flat_from_batch(per_doc: list[TokensAndPositions]) -> FlatTokens:
    import pandas as pd

    n_tokens = np.fromiter(
        (len(t[0]) for t in per_doc), dtype=np.int64, count=len(per_doc)
    )
    if n_tokens.sum() == 0:
        return FlatTokens(
            codes=np.empty(0, np.int64),
            uniques=np.empty(0, object),
            n_tokens=n_tokens,
            positions=np.empty(0, np.int64),
        )
    flat_terms = np.concatenate(
        [np.asarray(t[0], dtype=object) for t in per_doc if t[0]]
    )
    flat_pos = np.concatenate(
        [np.asarray(t[1], dtype=np.int64) for t in per_doc if t[0]]
    )
    codes, uniques = pd.factorize(flat_terms, sort=False)
    import pyarrow as pa

    uniq = np.asarray(uniques, dtype=object)
    return FlatTokens(
        codes=codes.astype(np.int64),
        uniques=uniq,
        n_tokens=n_tokens,
        positions=flat_pos,
        uniques_arrow=pa.array(uniq, type=pa.string()),
    )


class _LazyUniques:
    """numpy-object view of an Arrow dictionary, materialized only on
    first index access — the Arrow-native build path never touches it,
    so no per-term Python strings are created there."""

    __slots__ = ("_dict", "_np")

    def __init__(self, arrow_dict):
        self._dict = arrow_dict
        self._np = None

    def _arr(self):
        if self._np is None:
            self._np = np.asarray(self._dict.to_pylist(), dtype=object)
        return self._np

    def __getitem__(self, i):
        return self._arr()[i]

    def __len__(self):
        return len(self._dict)


_FLAT_STEMMER = MemoStemmer()  # module-level memo: amortized across batches


def _make_arrow_flat(
    kind: str, stem: bool = False, stemmer: Callable[[str], str] | None = None
) -> Callable[[Sequence[str]], FlatTokens]:
    """Arrow-compute tokenizer: the whole batch flows through Arrow C++
    (lower/split/trim/dictionary-encode); Python only sees int arrays
    plus the distinct-term dictionary. kind: simple|whitespace|
    segmentation. Byte-identical to the corresponding regex chains
    (differential-tested in test_analyzers.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def run(texts: Sequence[str]) -> FlatTokens:
        arr = texts if isinstance(texts, pa.Array) else pa.array(
            texts, type=pa.string()
        )
        n_docs = len(arr)
        if kind != "whitespace":
            arr = pc.utf8_lower(arr)
        if kind in ("simple", "whitespace"):
            lists = pc.utf8_split_whitespace(arr)
        else:  # segmentation/text: unicode word runs, inner apostrophes kept
            # runs of 2+ apostrophes never join words in the regex
            # semantics ([^\W_]+(?:'[^\W_]+)*) — normalize them to a
            # separator, then split on non-(letter|digit|') and _
            arr = pc.replace_substring_regex(arr, pattern="''+", replacement=" ")
            # "text": pyarrow's utf8_normalize ignores `form` (always
            # decomposes), so NFC runs on the token DICTIONARY instead;
            # combining marks (\pM) must therefore stay attached to
            # their token here
            # \pM: combining marks never split a word (ICU UAX#29
            # semantics — matras/harakat are part of the word run)
            word_class = r"(?:[^\pL\pM\pN']|_)+"
            lists = pc.split_pattern_regex(arr, pattern=word_class)
        lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        # null slots (None texts) produce equal offsets => 0 tokens
        counts = np.diff(offsets)
        if lists.null_count:
            valid = ~np.asarray(pc.is_null(lists).to_numpy(zero_copy_only=False))
            counts = np.where(valid, counts, 0)
        flat = pc.list_flatten(lists)
        if kind in ("segmentation", "text"):
            flat = pc.replace_substring_regex(
                flat, pattern=r"^'+|'+$", replacement=""
            )
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        keep = np.asarray(keep, dtype=bool)
        total = int(counts.sum())
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        if not keep.all():
            flat = pc.filter(flat, pa.array(keep))
            doc_idx = doc_idx[keep]
        n_tokens = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(n_tokens)[:-1]))
        positions = (
            np.arange(doc_idx.size, dtype=np.int64) - starts[doc_idx]
        )
        enc = pc.dictionary_encode(flat)
        enc = enc.combine_chunks() if isinstance(enc, pa.ChunkedArray) else enc
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if kind == "text":
            # NFC + optional stem applied to the DICTIONARY, not the
            # tokens: per batch this runs once per distinct term (the
            # stemmer is memoized across batches), then an integer
            # remap folds merged terms together
            import pandas as pd

            _stem_fn = stemmer if stemmer is not None else _FLAT_STEMMER

            def _xform(u):
                u = unicodedata.normalize("NFC", u)
                return _stem_fn(u) if stem else u

            stemmed = np.asarray(
                [_xform(u) for u in enc.dictionary.to_pylist()],
                dtype=object,
            )
            remap, new_uniques = pd.factorize(stemmed, sort=False)
            new_uniques = np.asarray(new_uniques, dtype=object)
            return FlatTokens(
                codes=remap.astype(np.int64)[codes],
                uniques=new_uniques,
                n_tokens=n_tokens,
                positions=positions,
                uniques_arrow=pa.array(new_uniques, type=pa.string()),
            )
        return FlatTokens(
            codes=codes,
            uniques=_LazyUniques(enc.dictionary),
            n_tokens=n_tokens,
            positions=positions,
            uniques_arrow=enc.dictionary,
        )

    return run


def _simple_lower(text: str) -> str:
    """Per-codepoint simple lowercase, matching utf8proc/Arrow
    `utf8_lower` (used by the vectorized fast path): no full case
    expansion (U+0130 'İ' -> 'i', not 'i'+combining dot) and no
    context-sensitive final sigma. str.lower() differs on exactly
    those, which would make fast- and slow-built indexes disagree."""
    if text.isascii():
        return text.lower()
    out = []
    for c in text:
        l = c.lower()
        out.append(l if len(l) == 1 else l[0])
    return "".join(out)


def _strip_accents(token: str) -> str:
    return "".join(
        c for c in unicodedata.normalize("NFD", token)
        if unicodedata.category(c) != "Mn"
    )


def _edge_expand(t: str, mn: int, mx: int | None, po: bool) -> list[str]:
    """Edge (prefix) ngrams of one processed term, reference semantics
    (text_token_stream.cpp:1082-1149): prefixes of codepoint length
    max(min,1)..min(max, len); a term shorter than min emits only the
    original when preserveOriginal; a term longer than max additionally
    emits the original when preserveOriginal. All share the term's
    position (first increment 1, rest 0)."""
    L = len(t)
    mn_eff = max(mn, 1)
    if L < mn_eff:
        return [t] if po else []
    hi = L if mx is None else min(mx, L)
    out = [t[:k] for k in range(mn_eff, hi + 1)]
    if mx is not None and L > mx and po:
        out.append(t)
    return out


def _parse_edge(edge_ngram: dict | None) -> tuple[int, int | None, bool] | None:
    """Normalize an edgeNgram options dict (accepts the reference's
    camelCase preserveOriginal too) to the (min, max, preserve) tuple
    _make_chain consumes."""
    if edge_ngram is None:
        return None
    return (
        int(edge_ngram.get("min", 0)),
        (int(edge_ngram["max"]) if "max" in edge_ngram else None),
        bool(
            edge_ngram.get(
                "preserve_original", edge_ngram.get("preserveOriginal", False)
            )
        ),
    )


def _make_chain(
    tokenize: Callable[[str], list[str]],
    lowercase: bool = True,
    uppercase: bool = False,
    nfc: bool = False,
    accent: bool = False,
    stopwords: frozenset[str] | None = None,
    stemming: bool = False,
    edge_ngram: tuple[int, int | None, bool] | None = None,
    stem_fn: Callable[[str], str] | None = None,
) -> Callable[[Sequence[str]], list[TokensAndPositions]]:
    def run(texts: Sequence[str]) -> list[TokensAndPositions]:
        if stem_fn is not None:
            from iresearch_spark.analysis.snowball import MemoTable

            stemmer = MemoTable(stem_fn)
        else:
            stemmer = MemoStemmer() if stemming else None
        out: list[TokensAndPositions] = []
        for text in texts:
            if not text:
                out.append(([], []))
                continue
            if nfc:
                text = unicodedata.normalize("NFC", text)
            if lowercase:
                text = _simple_lower(text)
            elif uppercase:
                text = text.upper()
            raw = tokenize(text)
            if accent:
                raw = [_strip_accents(t) for t in raw]
            if stopwords is None and stemmer is None and edge_ngram is None:
                terms = [t for t in raw if t]
                out.append((terms, list(range(len(terms)))))
                continue
            terms: list[str] = []
            positions: list[int] = []
            pos = 0
            for t in raw:
                if not t:
                    continue
                if stopwords is not None and t in stopwords:
                    pos += 1  # stopword leaves a position gap
                    continue
                term = stemmer(t) if stemmer is not None else t
                if edge_ngram is None:
                    terms.append(term)
                    positions.append(pos)
                else:
                    # post-stem edge ngrams, all at the word's position
                    for g in _edge_expand(term, *edge_ngram):
                        terms.append(g)
                        positions.append(pos)
                pos += 1
            out.append((terms, positions))
        return out

    return run


def _ws_tokenize(text: str) -> list[str]:
    return _WS_RE.split(text.strip()) if text.strip() else []


def _word_tokenize(text: str) -> list[str]:
    return _WORD_RE.findall(text)


_GRAPHIC_RE = re.compile(r"\S+")


def _graphic_tokenize(text: str) -> list[str]:
    # segmentation word_break_t::GRAPHIC: keep every non-whitespace run
    return _GRAPHIC_RE.findall(text)


def _ngram_fn(
    min_gram: int,
    max_gram: int,
    preserve_original: bool,
    start_marker: str = "",
    end_marker: str = "",
):
    # marker semantics (ngram_token_stream.cpp next(), :~195-250): an
    # ngram starting at offset 0 is emitted with start_marker PREPENDED
    # (replacing the unmarked form); an ngram ending at the input's end
    # gets end_marker APPENDED; an ngram covering the whole input with
    # BOTH markers set is emitted twice (start-marked, then end-marked).
    # All emissions share the ngram's start position.
    def emit(terms, positions, i, s, at_start, at_end):
        if at_start and start_marker:
            terms.append(start_marker + s)
            positions.append(i)
            if at_end and end_marker:
                terms.append(s + end_marker)
                positions.append(i)
        elif at_end and end_marker:
            terms.append(s + end_marker)
            positions.append(i)
        else:
            terms.append(s)
            positions.append(i)

    def run(texts: Sequence[str]) -> list[TokensAndPositions]:
        out = []
        for text in texts:
            if not text:
                out.append(([], []))
                continue
            terms: list[str] = []
            positions: list[int] = []
            n = len(text)
            for g in range(min_gram, max_gram + 1):
                for i in range(0, n - g + 1):
                    emit(terms, positions, i, text[i : i + g], i == 0, i + g == n)
            if preserve_original and (n < min_gram or n > max_gram):
                emit(terms, positions, 0, text, True, True)
            out.append((terms, positions))
        return out

    return run


_REGISTRY: dict[str, Callable[..., Analyzer]] = {}


_NONWS_RE = re.compile(r"\S+")


def _make_span_chain(token_re: "re.Pattern", lowercase: bool):
    """Span-capable tokenizer: per doc (terms, positions, starts, lens).
    `_simple_lower` is length-preserving, so spans found in the lowered
    text index the ORIGINAL text identically. Token streams must equal
    the analyzer's `_fn` output — differential-tested."""

    def run(texts: Sequence[str]):
        out = []
        for text in texts:
            if not text:
                out.append(([], [], [], []))
                continue
            t = _simple_lower(text) if lowercase else text
            terms, positions, starts, lens = [], [], [], []
            pos = 0
            for m in token_re.finditer(t):
                g = m.group()
                if not g:
                    continue
                terms.append(g)
                positions.append(pos)
                starts.append(m.start())
                lens.append(m.end() - m.start())
                pos += 1
            out.append((terms, positions, starts, lens))
        return out

    return run


def _register(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory

    return deco


@_register("whitespace")
def _whitespace(**_opts) -> Analyzer:
    return Analyzer(
        "whitespace",
        _make_chain(_ws_tokenize, lowercase=False),
        _flat_fn=_make_arrow_flat("whitespace"),
        _span_fn=_make_span_chain(_NONWS_RE, lowercase=False),
    )


@_register("simple")
def _simple(edge_ngram: dict | None = None, **_opts) -> Analyzer:
    # edgeNgram composes with any tokenizer in the reference options
    # block (text_token_stream.cpp:423-433); exposing it here keeps the
    # whitespace chain oracle-replayable (SQL substring expansion)
    edge = _parse_edge(edge_ngram)
    return Analyzer(
        "simple",
        _make_chain(_ws_tokenize, lowercase=True, edge_ngram=edge),
        _flat_fn=_make_arrow_flat("simple") if edge is None else None,
        _span_fn=_make_span_chain(_NONWS_RE, lowercase=True)
        if edge is None
        else None,
    )


_CJK_RUN_RE = re.compile(
    "[一-鿿㐀-䶿]+"      # Han (+ ext A)
    "|[぀-ゟ]+"                   # Hiragana
    "|[゠-ヿ]+"                   # Katakana (incl. U+30FC mark)
    "|[฀-๿]+"                   # Thai
)


# Thai signs that BIND to the preceding consonant: above/below vowels
# (U+0E31, U+0E34-0E3A), SARA AM (U+0E33), LAKKHANGYAO (U+0E45), and
# tone/silencer marks (U+0E47-0E4E). A dictionary match may not END
# immediately before one of these — it would strand a combining mark
# at the start of the next token. (MAIYAMOK U+0E46, the standalone
# repetition sign, is deliberately NOT in the set.)
_THAI_BOUND = frozenset("ัำิีึืุู"
                        "ฺๅ็่้๊๋์"
                        "ํ๎")
# preposed vowels (written BEFORE the consonant they follow
# phonetically): a match may not START right after an unmatched one —
# เ/แ/โ/ใ/ไ belong to the syllable that begins at the match.
_THAI_PRE = frozenset("เแโใไ")


def _make_cjk_tokenize(words: frozenset[str]):
    """Word tokenizer with dictionary segmentation for unspaced CJK —
    the reference's ICU dictionary break
    (segmentation_token_stream.cpp; ICU ships zh/ja/th frequency
    dictionaries). Han runs segment by greedy LONGEST MATCH against
    `words` with single-character fallback (unmatched kanji index as
    unigrams — searchable, if less precise than a full lexicon). Thai
    runs use the same greedy longest match with two syllable guards
    (no match ending before a bound sign, none starting after an
    unmatched preposed vowel) and SPAN fallback: an unmatched stretch
    indexes as one token, never per character — a bare combining
    vowel/tone mark is not a token. HIRAGANA runs segment by
    FULL-COVER matching: the run splits (greedy-longest among valid
    covers) only when it is entirely composed of dictionary words —
    `ですが` → `です`+`が` — and otherwise stays ONE token, so the
    kana lexicon can never shred an unknown word; katakana runs stay
    one token per run (a katakana stretch is almost always a single
    loanword — the remaining, much narrower, simplification vs ICU's
    frequency-DP break). Everything non-CJK tokenizes exactly like
    the plain word tokenizer."""
    maxlen = max((len(w) for w in words), default=1)

    def _segment_han(run: str) -> list[str]:
        out: list[str] = []
        i, n = 0, len(run)
        while i < n:
            hit = None
            for L in range(min(maxlen, n - i), 1, -1):
                cand = run[i : i + L]
                if cand in words:
                    hit = cand
                    break
            if hit is not None:
                out.append(hit)
                i += len(hit)
            else:
                out.append(run[i])
                i += 1
        return out

    def _segment_thai(run: str) -> list[str]:
        out: list[str] = []
        i, n = 0, len(run)
        span = 0  # start of the current unmatched stretch
        while i < n:
            hit = None
            if not (i > span and run[i - 1] in _THAI_PRE):
                for L in range(min(maxlen, n - i), 1, -1):
                    cand = run[i : i + L]
                    if cand in words:
                        j = i + L
                        if j < n and run[j] in _THAI_BOUND:
                            continue  # would strand a bound sign
                        hit = cand
                        break
            if hit is not None:
                if span < i:
                    out.append(run[span:i])
                out.append(hit)
                i += len(hit)
                span = i
            else:
                i += 1
        if span < n:
            out.append(run[span:])
        return out

    def _segment_hiragana(run: str) -> list[str]:
        # full-cover-or-whole: ok[i] marks "run[i:] is coverable by
        # dictionary words"; cover[i] remembers the LONGEST word at i
        # that keeps the rest coverable (greedy-longest among valid
        # covers — the deterministic analogue of ICU's frequency-DP
        # kana break). ok[0] false -> the run is one token, untouched.
        n = len(run)
        ok = [False] * (n + 1)
        ok[n] = True
        cover = [0] * (n + 1)
        for i in range(n - 1, -1, -1):
            for L in range(min(maxlen, n - i), 0, -1):
                if ok[i + L] and run[i : i + L] in words:
                    ok[i] = True
                    cover[i] = L
                    break
        if not ok[0]:
            return [run]
        out: list[str] = []
        i = 0
        while i < n:
            out.append(run[i : i + cover[i]])
            i += cover[i]
        return out

    def tok(text: str) -> list[str]:
        out: list[str] = []
        pos = 0
        for m in _CJK_RUN_RE.finditer(text):
            if m.start() > pos:
                out.extend(_word_tokenize(text[pos : m.start()]))
            run = m.group()
            c = run[0]
            if "一" <= c <= "鿿" or "㐀" <= c <= "䶿":
                out.extend(_segment_han(run))
            elif "฀" <= c <= "๿":  # Thai run
                out.extend(_segment_thai(run))
            elif "぀" <= c <= "ゟ":  # hiragana run
                out.extend(_segment_hiragana(run))
            else:  # katakana run: one loanword token
                out.append(run)
            pos = m.end()
        if pos < len(text):
            out.extend(_word_tokenize(text[pos:]))
        return out

    return tok


@_register("segmentation")
def _segmentation(
    case: str = "lower",
    word_break: str = "alpha",
    cjk: bool = False,
    cjk_dict: Sequence[str] | None = None,
    **_opts,
) -> Analyzer:
    # reference: core/analysis/segmentation_token_stream.cpp (UAX#29 word
    # break + case conversion, no stemming) — the index-benchmark default.
    # `case` maps case_convert_t {LOWER, NONE, UPPER} (:43-51; UPPER uses
    # Python str.upper vs the reference's ICU locale toUpper — documented
    # deviation, same as the lower chain). `word_break` maps word_break_t:
    # "alpha" keeps word segments, "graphic" keeps every non-whitespace
    # run (the reference's GRAPHIC mode; ALL — whitespace segments too —
    # has no indexing use and is not exposed).
    # `cjk=True` adds dictionary segmentation for unspaced CJK scripts
    # (the reference gets this from ICU's dictionary break): built-in
    # word list from cjk_words.py, replaced wholesale by `cjk_dict`.
    # Opt-in: it routes through the per-doc chain (no Arrow fast path)
    # and only differs on texts containing CJK runs.
    if case not in ("lower", "none", "upper"):
        raise ValueError("case must be lower|none|upper")
    if word_break not in ("alpha", "graphic"):
        raise ValueError("word_break must be alpha|graphic")
    if cjk:
        if word_break != "alpha":
            raise ValueError("cjk segmentation requires word_break='alpha'")
        from iresearch_spark.analysis.cjk_words import (
            CJK_WORDS,
            KANA_WORDS,
            THAI_WORDS,
        )

        words = (
            frozenset(cjk_dict)
            if cjk_dict is not None
            else CJK_WORDS | THAI_WORDS | KANA_WORDS
        )
        tok = _make_cjk_tokenize(words)
        return Analyzer(
            "segmentation",
            _make_chain(
                tok,
                lowercase=(case == "lower"),
                uppercase=(case == "upper"),
            ),
        )
    tok = _word_tokenize if word_break == "alpha" else _graphic_tokenize
    default = case == "lower" and word_break == "alpha"
    return Analyzer(
        "segmentation",
        _make_chain(tok, lowercase=(case == "lower"), uppercase=(case == "upper")),
        _flat_fn=_make_arrow_flat("segmentation") if default else None,
        _span_fn=(
            _make_span_chain(
                _WORD_RE if word_break == "alpha" else _GRAPHIC_RE,
                lowercase=(case == "lower"),
            )
            if case != "upper"
            else None
        ),
    )


@_register("text_en")
def _text_en(
    stopwords: Sequence[str] | None = None,
    stemming: bool = True,
    accent: bool = False,
    edge_ngram: dict | None = None,
    **_opts,
) -> Analyzer:
    # the fast path covers the north-rule chain (tokenize + NFC +
    # lowercase + stem); stopword gaps and accent folding fall back to
    # the generic per-token chain. KNOWN divergence (fast vs slow, not
    # oracle-relevant): a combining mark with no composed NFC form
    # (e.g. q+U+0303) stays attached to its token in the fast path
    # (\\pM in the word class) but splits the token in the regex chain
    # — composable sequences (é, ï, ...) agree byte-for-byte, which
    # the differential test locks with decomposed fixtures
    # edgeNgram option (reference text_token_stream.cpp:423-433,
    # 1082-1149): {"min": int, "max": int, "preserve_original": bool},
    # applied AFTER the stem step, every ngram at the word's position
    edge = _parse_edge(edge_ngram)
    if stopwords == "default":
        from iresearch_spark.analysis.stopwords import stopwords_for

        stopwords = stopwords_for("en")
    flat = (
        _make_arrow_flat("text", stem=stemming)
        if not stopwords and not accent and edge is None
        else None
    )
    return Analyzer(
        "text_en",
        _make_chain(
            _word_tokenize,
            lowercase=True,
            nfc=True,
            accent=accent,
            stopwords=frozenset(stopwords) if stopwords else None,
            stemming=stemming,
            edge_ngram=edge,
        ),
        _flat_fn=flat,
    )


# multilingual `text` (reference text_token_stream.cpp:509 —
# make_stemmer_ptr(locale.getLanguage()) instantiates the Snowball
# stemmer for ANY locale; per-locale stopword lists ride the same
# options): text_de/text_fr/... aliases plus a generic
# get_analyzer("text", locale="de"). Same chain as text_en (tokenize +
# NFC + lower [+ stopwords] + Snowball stem), same Arrow fast path —
# the stemmer runs over the token DICTIONARY, memoized across batches.
_FLAT_STEMMERS: dict[str, object] = {}


def _locale_flat_stemmer(lang: str):
    memo = _FLAT_STEMMERS.get(lang)
    if memo is None:
        from iresearch_spark.analysis.snowball import MemoTable, get_stemmer

        memo = MemoTable(get_stemmer(lang))
        _FLAT_STEMMERS[lang] = memo
    return memo


# locales whose text chain tokenizes with the DICTIONARY segmenter —
# the reference's text analyzer breaks words with an ICU BreakIterator
# for the locale (text_token_stream.cpp), which is dictionary-based
# for unspaced scripts; the plain regex tokenizer would index whole
# runs for these
_DICT_BREAK_LANGS = frozenset({"zh", "ja", "ko", "th"})


def _make_text_locale(lang: str):
    def factory(
        stopwords: Sequence[str] | None = None,
        stemming: bool = True,
        accent: bool = False,
        edge_ngram: dict | None = None,
        **_opts,
    ) -> Analyzer:
        from iresearch_spark.analysis.snowball import get_stemmer

        stem_fn = get_stemmer(lang) if stemming else None
        if stopwords == "default":
            from iresearch_spark.analysis.stopwords import stopwords_for

            stopwords = stopwords_for(lang)
        if lang in _DICT_BREAK_LANGS:
            from iresearch_spark.analysis.cjk_words import (
                CJK_WORDS,
                KANA_WORDS,
                THAI_WORDS,
            )

            tok = _make_cjk_tokenize(CJK_WORDS | THAI_WORDS | KANA_WORDS)
            edge = _parse_edge(edge_ngram)
            return Analyzer(
                f"text_{lang}",
                _make_chain(
                    tok,
                    lowercase=True,
                    nfc=True,
                    accent=accent,
                    stopwords=frozenset(stopwords) if stopwords else None,
                    stem_fn=stem_fn,
                    edge_ngram=edge,
                ),
            )
        edge = _parse_edge(edge_ngram)
        flat = (
            _make_arrow_flat(
                "text",
                stem=stemming,
                stemmer=_locale_flat_stemmer(lang) if stemming else None,
            )
            if not stopwords and not accent and edge is None
            else None
        )
        return Analyzer(
            f"text_{lang}",
            _make_chain(
                _word_tokenize,
                lowercase=True,
                nfc=True,
                accent=accent,
                stopwords=frozenset(stopwords) if stopwords else None,
                stem_fn=stem_fn,
                edge_ngram=edge,
            ),
            _flat_fn=flat,
        )

    return factory


for _lang in (
    "de", "fr", "es", "pt", "it", "nl", "ru", "sv", "da", "no", "fi",
    "ro", "hu", "tr", "id", "hi", "ar", "cs", "el", "pl", "uk", "he",
):
    _REGISTRY[f"text_{_lang}"] = _make_text_locale(_lang)


def _make_text_unstemmed(lang: str):
    # languages the text chain handles WITHOUT a stemmer — zh/ja/ko/th
    # go through the dictionary segmenter, vi is isolating (no
    # inflectional morphology); registered so `text_zh` etc. resolve
    # like every other language's name. Reference parity
    # (text_token_stream.cpp:507-516): unless the caller explicitly
    # passes stemming=False, the optional-stemmer fallback WARNS and
    # analyzes unstemmed — it never fails.
    base = _make_text_locale(lang)

    def factory(stemming: bool = True, **opts) -> Analyzer:
        if stemming:
            import warnings

            warnings.warn(
                f"no stemmer for locale {lang!r} — text analyzer runs "
                "without stemming (the reference's optional-stemmer "
                "fallback)",
                stacklevel=2,
            )
        return base(stemming=False, **opts)

    return factory


for _lang in ("zh", "ja", "ko", "th", "vi"):
    _REGISTRY[f"text_{_lang}"] = _make_text_unstemmed(_lang)


@_register("text")
def _text_locale_dispatch(locale: str = "en", **opts) -> Analyzer:
    """Locale-driven text analyzer — get_analyzer("text", locale="de").
    `locale` accepts 'de', 'de_DE.UTF-8', 'de-DE' forms (language part
    is taken), mirroring the reference's locale parsing. For a locale
    WITHOUT a stemmer the chain still runs (tokenize + NFC + lower
    [+ stopwords]) with stemming skipped and a warning — the
    reference's behavior exactly (text_token_stream.cpp:507-516: the
    Snowball stemmer is "optional since not available for all
    locales"; absence logs a warning, never fails the analyzer)."""
    lang = locale.split("_")[0].split("-")[0].split(".")[0].lower() or "en"
    name = f"text_{lang}"
    if name in _REGISTRY:
        return _REGISTRY[name](**opts)
    if opts.get("stemming", True):
        import warnings

        warnings.warn(
            f"no stemmer for locale {locale!r} — text analyzer runs "
            "without stemming (the reference's optional-stemmer "
            "fallback)",
            stacklevel=2,
        )
    opts = dict(opts)
    opts["stemming"] = False
    return _make_text_locale(lang)(**opts)


@_register("norm")
def _norm(case: str = "lower", accent: bool = True, **_opts) -> Analyzer:
    def run(texts: Sequence[str]) -> list[TokensAndPositions]:
        out = []
        for text in texts:
            if not text:
                out.append(([], []))
                continue
            t = unicodedata.normalize("NFC", text)
            if case == "lower":
                t = t.lower()
            elif case == "upper":
                t = t.upper()
            if accent:
                t = _strip_accents(t)
            out.append(([t], [0]))
        return out

    return Analyzer("norm", run)


@_register("stem")
def _stem(**_opts) -> Analyzer:
    def run(texts: Sequence[str]) -> list[TokensAndPositions]:
        stemmer = MemoStemmer()
        return [
            (([stemmer(t.lower())], [0]) if t else ([], [])) for t in texts
        ]

    return Analyzer("stem", run)


@_register("delimiter")
def _delimiter(delimiter: str = ",", **_opts) -> Analyzer:
    # CSV-style quote handling (delimited_token_stream.cpp:37-87):
    # delimiters inside double-quoted sections don't split, a term
    # starting with '"' is unquoted with "" as an escaped quote, and
    # mismatched quotes return the term verbatim.
    def tok(text: str) -> list[str]:
        return [_csv_unquote(p) for p in _split_outside_quotes(text, delimiter)]

    return Analyzer("delimiter", _make_chain(tok, lowercase=False))


def _split_outside_quotes(text: str, delim: str) -> list[str]:
    if not delim:
        return [text]
    parts: list[str] = []
    start = i = 0
    quoted = False
    n, dl = len(text), len(delim)
    while i < n:
        c = text[i]
        if quoted:
            if c == '"':
                quoted = False
            i += 1
        elif text.startswith(delim, i):
            # delimiter match takes precedence over '"' (reference :89-92)
            parts.append(text[start:i])
            i += dl
            start = i
        elif c == '"':
            quoted = True
            i += 1
        else:
            i += 1
    parts.append(text[start:])
    return parts


def _csv_unquote(term: str) -> str:
    # eval_term (delimited_token_stream.cpp:37-67)
    if not term or term[0] != '"':
        return term
    buf: list[str] = []
    escaped = False
    start = 1
    n = len(term)
    for i in range(1, n):
        if term[i] == '"':
            if escaped and start == i:
                escaped = False
                continue
            if escaped:
                break
            buf.append(term[start:i])
            escaped = True
            start = i + 1
    return "".join(buf) if (start != 1 and start == n) else term


@_register("ngram")
def _ngram(
    min_gram: int = 2,
    max_gram: int = 3,
    preserve_original: bool = False,
    start_marker: str = "",
    end_marker: str = "",
    **_opts,
) -> Analyzer:
    return Analyzer(
        "ngram",
        _ngram_fn(
            min_gram, max_gram, preserve_original, start_marker, end_marker
        ),
    )


@_register("stopwords")
def _stopwords(stopwords: Sequence[str] = (), **_opts) -> Analyzer:
    # reference token_stopwords_stream.cpp: drop tokens in a set
    return Analyzer(
        "stopwords",
        _make_chain(_ws_tokenize, lowercase=False,
                    stopwords=frozenset(stopwords)),
    )


@_register("multi_delimiter")
def _multi_delimiter(delimiters: Sequence[str] = (",", ";"), **_opts) -> Analyzer:
    # reference multi_delimited_token_stream.cpp
    pattern = re.compile("|".join(re.escape(d) for d in delimiters))

    def tok(text: str) -> list[str]:
        return pattern.split(text)

    return Analyzer("multi_delimiter", _make_chain(tok, lowercase=False))


def _pipeline_compose(text: str, stages) -> TokensAndPositions:
    """Recursive stage composition with the reference's position
    increment algebra (pipeline_token_stream.cpp:331-347): all position
    gaps accumulate — a parent step of gap g (tokens skipped upstream,
    e.g. stopwords) plus a child stream leading gap q0 advance the
    pipeline position by g + q0 + 1; within one parent token the child
    stream's own increments apply unchanged; a parent token whose child
    stream is empty vacates exactly one position (a gap, like a
    stopword). Trailing child gaps cannot carry (the token-stream
    representation ends at the last token — same as the reference's
    increment attribute, which only fires on a following token)."""
    terms, poss = stages[0].analyze(text)
    if len(stages) == 1:
        return terms, poss
    out_t: list[str] = []
    out_p: list[int] = []
    pipe_pos = -1
    p_last = -1
    for t, p in zip(terms, poss):
        cterms, cposs = _pipeline_compose(t, stages[1:])
        if not cterms:
            continue
        pipe_pos = pipe_pos + (p - p_last - 1) + cposs[0] + 1
        out_t.append(cterms[0])
        out_p.append(pipe_pos)
        for j in range(1, len(cterms)):
            pipe_pos += cposs[j] - cposs[j - 1]
            out_t.append(cterms[j])
            out_p.append(pipe_pos)
        p_last = p
    return out_t, out_p


@_register("pipeline")
def _pipeline(analyzers: Sequence = (), **_opts) -> Analyzer:
    """Sequential composition (reference pipeline_token_stream.cpp):
    each upstream token is re-analyzed by the next stage; positions
    follow the reference's accumulated-gap increment algebra (see
    _pipeline_compose)."""
    stages = [
        get_analyzer(a) if isinstance(a, str) else a for a in analyzers
    ]
    if not stages:
        raise ValueError("pipeline needs at least one analyzer")

    def run(texts: Sequence[str]) -> list[TokensAndPositions]:
        out = []
        for text in texts:
            if not text:
                out.append(([], []))
                continue
            out.append(_pipeline_compose(text, stages))
        return out

    return Analyzer("pipeline", run)


@_register("minhash")
def _minhash(num_hashes: int = 4, inner: str = "simple", **_opts) -> Analyzer:
    """MinHash signature tokens (reference minhash_token_stream.cpp):
    tokenizes with `inner`, then emits the `num_hashes` seeded-md5
    minima of the distinct token set as hex terms — near-dup blocking
    keys at index time."""
    import hashlib

    base = get_analyzer(inner)

    def h60(s: str, seed: int) -> int:
        return int(
            hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16
        )

    def run(texts: Sequence[str]) -> list[TokensAndPositions]:
        out = []
        for text in texts:
            toks = set(base.analyze(text)[0]) if text else set()
            if not toks:
                out.append(([], []))
                continue
            sig = [
                format(min(h60(t, i) for t in toks), "015x")
                for i in range(num_hashes)
            ]
            out.append((sig, list(range(num_hashes))))
        return out

    return Analyzer("minhash", run)


# ---- locale tailorings (public CLDR collation rules, no ICU) ----
#
# The reference gets locale tailorings from icu::Collator
# (collation_token_stream.cpp:55-65). Without ICU in the sandbox, the
# highest-frequency tailorings are implemented directly from the
# public CLDR collation rules: new primary letters slotted AFTER an
# existing letter (Swedish å ä ö after z, Turkish ç ğ ı ö ş ü, Czech
# č ř š ž, Spanish ñ), digraph CONTRACTIONS (Czech ch after h, Danish
# aa = å), primary EXPANSIONS (German phonebook ä -> ae), secondary
# EQUIVALENCES (Danish ä = æ, ö = ø, ü = y), and Turkish's dotted/
# dotless case pairing (I <-> ı, İ <-> i). Locales not listed here
# fall back to the root key (plain German standard collation IS the
# root behavior — umlauts differ at the secondary level).
#
# Tailored keys use a scaled primary-weight space (ord * 16, so a
# tailored letter slots into one of 15 gaps after its base letter);
# keys are comparable only within one (locale, strength) collator
# config — exactly ICU's contract.

_SEC_TAILOR = 1  # synthetic secondary weight, below any combining mark

_TAILORING_SPECS: dict[str, dict] = {
    "sv": {"after": {"å": ("z", 1), "ä": ("z", 2), "ö": ("z", 3)},
           "equiv": {"ü": "y"}},
    "no": {"after": {"æ": ("z", 1), "ø": ("z", 2), "å": ("z", 3)}},
    "da": {"after": {"æ": ("z", 1), "ø": ("z", 2), "å": ("z", 3)},
           "equiv": {"ä": "æ", "ö": "ø", "ü": "y"},
           "contract": {"aa": "å"}},
    "tr": {"after": {"ç": ("c", 1), "ğ": ("g", 1), "ı": ("h", 1),
                     "ö": ("o", 1), "ş": ("s", 1), "ü": ("u", 1)},
           "case": {"I": "ı", "İ": "i"}},
    "es": {"after": {"ñ": ("n", 1)}},
    "cs": {"after": {"č": ("c", 1), "ř": ("r", 1), "š": ("s", 1),
                     "ž": ("z", 1)},
           "contract": {"ch": ("h", 1)}},
    "de_phonebook": {"expand": {"ä": "ae", "ö": "oe", "ü": "ue"}},
    # CLDR pl: &A<ą &C<ć &E<ę &L<ł &N<ń &O<ó &S<ś &Z<ź<ż
    "pl": {"after": {"ą": ("a", 1), "ć": ("c", 1), "ę": ("e", 1),
                     "ł": ("l", 1), "ń": ("n", 1), "ó": ("o", 1),
                     "ś": ("s", 1), "ź": ("z", 1), "ż": ("z", 2)}},
    # CLDR ro: &A<ă<â &I<î &S<ș &T<ț; cedilla forms ş/ţ are legacy
    # spellings of the comma-below letters (secondary-equal)
    "ro": {"after": {"ă": ("a", 1), "â": ("a", 2), "î": ("i", 1),
                     "ș": ("s", 1), "ț": ("t", 1)},
           "equiv": {"ş": "ș", "ţ": "ț"}},
    # CLDR hu: digraph contractions cs/dz/dzs/gy/ly/ny/sz/ty/zs as new
    # primaries after their first letter; ö (with ő secondary-after)
    # and ü (ű) are new letters after o/u. Short/long vowel pairs
    # (a/á, e/é, ...) differ at the secondary level, which the NFD
    # combining-mark path already yields.
    "hu": {"after": {"ö": ("o", 1), "ü": ("u", 1)},
           "equiv": {"ő": "ö", "ű": "ü"},
           "contract": {"cs": ("c", 1), "dz": ("d", 1), "dzs": ("d", 2),
                        "gy": ("g", 1), "ly": ("l", 1), "ny": ("n", 1),
                        "sz": ("s", 1), "ty": ("t", 1), "zs": ("z", 1)}},
    # CLDR lt: č/š/ž as new primaries; y is primary-equal to i
    # (sorted as i with a secondary difference)
    "lt": {"after": {"č": ("c", 1), "š": ("s", 1), "ž": ("z", 1)},
           "equiv": {"y": "i"}},
    # CLDR et: š/z/ž re-slot after s; õ/ä/ö/ü are new letters after w
    # (x and y then follow naturally from their root weights)
    "et": {"after": {"š": ("s", 1), "z": ("s", 2), "ž": ("s", 3),
                     "õ": ("w", 1), "ä": ("w", 2), "ö": ("w", 3),
                     "ü": ("w", 4)}},
    # CLDR is: acute vowels are distinct letters after their base;
    # ð after d; þ/æ/ö close the alphabet after z
    "is": {"after": {"á": ("a", 1), "ð": ("d", 1), "é": ("e", 1),
                     "í": ("i", 1), "ó": ("o", 1), "ú": ("u", 1),
                     "ý": ("y", 1), "þ": ("z", 1), "æ": ("z", 2),
                     "ö": ("z", 3)}},
    # CLDR vi: ă/â after a, đ after d, ê after e, ô/ơ after o, ư after
    # u; tone marks stay combining -> secondary level automatically
    "vi": {"after": {"ă": ("a", 1), "â": ("a", 2), "đ": ("d", 1),
                     "ê": ("e", 1), "ô": ("o", 1), "ơ": ("o", 2),
                     "ư": ("u", 1)}},
    # CLDR fr-CA: [backwards 2] — accents compare from the END of the
    # string at the secondary level (côte < coté)
    "fr_ca": {"backwards2": True},
}
_TAILORINGS: dict[str, dict] = {}


def _build_tailoring(spec: dict) -> dict:
    weights: dict[str, tuple] = {}
    for ch, (base, rank) in spec.get("after", {}).items():
        weights[ch] = ((ord(base) * 16 + rank,), None)
    for ch, seq in spec.get("expand", {}).items():
        weights[ch] = (tuple(ord(c) * 16 for c in seq), _SEC_TAILOR)
    for ch, tgt in spec.get("equiv", {}).items():
        pw = weights.get(tgt, ((ord(tgt) * 16,), None))[0]
        weights[ch] = (pw, _SEC_TAILOR)
    contract: dict[str, tuple] = {}
    for seq, tgt in spec.get("contract", {}).items():
        if isinstance(tgt, tuple):
            contract[seq] = ((ord(tgt[0]) * 16 + tgt[1],), None)
        else:
            pw = weights.get(tgt, ((ord(tgt) * 16,), None))[0]
            contract[seq] = (pw, _SEC_TAILOR)
    return {"weights": weights, "contract": contract,
            "case": spec.get("case", {}),
            "backwards2": bool(spec.get("backwards2", False))}


def _tailoring_for(locale: str) -> dict | None:
    loc = locale.replace("-", "_").lower()
    if "phonebk" in loc or "phonebook" in loc:
        key = "de_phonebook"
    else:
        base = loc.split("@")[0].split(".")[0]
        lang = base.split("_")[0]
        region = base.split("_")[1] if "_" in base else ""
        # region-scoped tailorings (fr_CA backward accents) beat the
        # bare-language lookup
        key = f"{lang}_{region}" if f"{lang}_{region}" in _TAILORING_SPECS \
            else lang
    if key not in _TAILORING_SPECS:
        return None
    built = _TAILORINGS.get(key)
    if built is None:
        built = _build_tailoring(_TAILORING_SPECS[key])
        _TAILORINGS[key] = built
    return built


def _tailored_sort_key(text: str, strength: int, t: dict) -> str:
    d = unicodedata.normalize("NFC", text)
    case_map, weights, contract = t["case"], t["weights"], t["contract"]
    # Backward-secondary comparison is positional: unaccented base
    # characters must contribute the UCA common weight (0x20, below
    # any combining mark) so that reversing the level makes the LAST
    # accent difference decide — côte < coté needs the commons.
    sec_common = 0x20 if t["backwards2"] else None
    primary: list[int] = []
    secondary: list[int] = []
    tertiary: list[int] = []
    i, n = 0, len(d)
    while i < n:
        ch = d[i]
        if contract and i + 1 < n:
            # longest match first: Hungarian dzs must beat dz
            hit, clen = None, 0
            for length in (3, 2):
                if i + length <= n:
                    hit = contract.get(d[i : i + length].casefold())
                    if hit is not None:
                        clen = length
                        break
            if hit is not None:
                pw, sm = hit
                primary.extend(pw)
                if sec_common is not None:
                    secondary.append(sec_common)
                if sm is not None:
                    secondary.append(sm)
                tertiary.append(1 if ch != ch.casefold() else 0)
                i += clen
                continue
        if unicodedata.combining(ch):
            secondary.append(ord(ch))
            i += 1
            continue
        mapped = case_map.get(ch, ch)
        case_bit = 1 if ch != ch.casefold() else 0
        cf = mapped.casefold()
        hit = weights.get(cf)
        if hit is not None:
            pw, sm = hit
            primary.extend(pw)
            if sec_common is not None:
                secondary.append(sec_common)
            if sm is not None:
                secondary.append(sm)
            tertiary.append(case_bit)
            i += 1
            continue
        for sub in unicodedata.normalize("NFD", mapped):
            if unicodedata.combining(sub):
                secondary.append(ord(sub))
                continue
            for fc in sub.casefold():
                primary.append(ord(fc) * 16)
            if sec_common is not None:
                secondary.append(sec_common)
            tertiary.append(case_bit)
        i += 1
    if t["backwards2"]:
        # CLDR [backwards 2] (French-Canadian): the LAST accent
        # difference decides the secondary comparison
        secondary.reverse()
    parts = ["".join(f"{p:07x}" for p in primary)]
    if strength >= 2:
        parts.append("".join(f"{s:06x}" for s in secondary))
    if strength >= 3:
        parts.append("".join(f"{t:x}" for t in tertiary))
    return ".".join(parts)


def collation_sort_key(
    text: str, strength: int = 3, locale: str = "root"
) -> str:
    """UCA-style multi-level collation sort key, hex-encoded so the
    term dictionary's plain string order IS the collation order.

    The reference's `collation` analyzer emits the ICU collator sort
    key of the WHOLE input as a single term
    (collation_token_stream.cpp:268-300). This sandbox has no ICU, so
    the key is built from the public Unicode Collation Algorithm's
    level structure via unicodedata (root collation, no locale
    tailorings — see the `collation` factory note):

      primary    casefolded, accent-stripped code points (NFD base
                 characters; casefold expansions like ß -> ss keep
                 their expanded weights)
      secondary  combining marks in occurrence order
      tertiary   case bit per base character

    Levels are fixed-width hex runs joined by '.' (which sorts below
    every hex digit), so string comparison of keys equals
    level-by-level UCA comparison. `strength` 1..3 truncates levels
    like ICU's collator strength (1 = case/accent-insensitive,
    2 = case-insensitive, 3 = full).

    `locale` applies the CLDR tailorings in `_TAILORING_SPECS` when
    the language is covered (sv/no/da/tr/es/cs/pl/ro/hu/lt/et/is/vi +
    de phonebook + fr-CA backward accents); those
    keys use a scaled primary space and are comparable only among
    keys of the SAME (locale, strength) — ICU's own contract. Any
    other locale falls back to the root key."""
    if strength not in (1, 2, 3):
        raise ValueError("strength must be 1, 2 or 3")
    t = _tailoring_for(locale) if locale not in ("root", "") else None
    if t is not None:
        return _tailored_sort_key(text, strength, t)
    d = unicodedata.normalize("NFD", text)
    primary: list[int] = []
    secondary: list[int] = []
    tertiary: list[int] = []
    for ch in d:
        if unicodedata.combining(ch):
            secondary.append(ord(ch))
            continue
        for fc in ch.casefold():
            primary.append(ord(fc))
        tertiary.append(1 if ch != ch.casefold() else 0)
    parts = ["".join(f"{p:06x}" for p in primary)]
    if strength >= 2:
        parts.append("".join(f"{s:06x}" for s in secondary))
    if strength >= 3:
        parts.append("".join(f"{t:x}" for t in tertiary))
    return ".".join(parts)


@_register("collation")
def _collation(
    locale: str = "root", strength: int = 3, **_opts
) -> Analyzer:
    """Locale collation keys as terms (reference
    collation_token_stream.cpp: one ICU sort-key term per input).
    Equality/range queries over the keys then follow collation order —
    e.g. Range over a collation-indexed field sorts accented names
    correctly, and strength<3 keys give case/accent-insensitive
    matching. Without ICU in the environment the key is the UCA
    approximation above; the highest-frequency CLDR locale tailorings
    (Swedish/Norwegian/Danish å-block, Turkish dotted/dotless I and
    extra letters, Spanish ñ, Czech ch digraph, German phonebook
    ä->ae, Polish/Romanian/Hungarian/Lithuanian/Estonian/Icelandic/
    Vietnamese letter orders incl. the Hungarian digraph contractions,
    and French-Canadian [backwards 2] accent comparison) are applied
    directly from the public CLDR rules for those locales — see `_TAILORING_SPECS`; other locales use the root key
    (the remaining, now much narrower, no-ICU gap)."""

    def run(texts: Sequence[str]):
        out = []
        for text in texts:
            if text is None or text == "":
                out.append(([], []))
            else:
                out.append(
                    ([collation_sort_key(text, strength, locale)], [0])
                )
        return out

    return Analyzer("collation", run)


def _embedding_table(model) -> tuple[dict[str, int], np.ndarray]:
    """Normalize an embedding 'model' into (word -> row index, float32
    L2-normalized matrix). Accepts a dict {word: vector}, an iterable
    of (word, vector) pairs, or a Spark DataFrame with (term|word|
    label, vector|embedding) columns — the Spark-native stand-in for
    the reference's fastText model file (classification_stream.cpp /
    nearest_neighbors_stream.cpp load the model memory-resident per
    thread; here the table rides the task broadcast the same way).
    DataFrames are collected driver-side and capped: an analyzer
    model, like fastText's, must fit in executor memory — larger
    vocabularies belong in ops/similarity's distributed ANN."""
    _CAP = 500_000
    rows: list[tuple[str, Sequence[float]]]
    if isinstance(model, dict):
        rows = list(model.items())
    elif hasattr(model, "columns") and hasattr(model, "collect"):
        cols = model.columns
        key = next(c for c in ("term", "word", "label") if c in cols)
        vec = next(c for c in ("vector", "embedding") if c in cols)
        if model.count() > _CAP:
            raise ValueError(
                f"embedding model larger than {_CAP} rows; use "
                "iresearch_spark.ops.similarity for distributed ANN"
            )
        rows = [(r[key], r[vec]) for r in model.select(key, vec).collect()]
    else:
        rows = list(model)
    if len(rows) > _CAP:
        raise ValueError(f"embedding model larger than {_CAP} rows")
    rows.sort(key=lambda kv: kv[0])  # deterministic row order
    words = {w: i for i, (w, _) in enumerate(rows)}
    mat = np.asarray([v for _, v in rows], dtype=np.float32)
    if mat.ndim != 2:
        raise ValueError("embedding vectors must share one dimension")
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return words, mat / norms


@_register("nearest_neighbors")
def _nearest_neighbors(model=None, top_k: int = 1, **_opts) -> Analyzer:
    """Per-token top-k nearest-neighbor terms (reference
    nearest_neighbors_stream.cpp:234-273: for each whitespace token the
    fastText model's getNN(word, top_k) words are emitted, the first
    neighbor of each token carrying increment 1 and the rest 0 — so a
    token's neighbors share one position and positions advance per
    input token). The model here is an embedding TABLE (word ->
    vector) instead of a fastText binary: neighbors are cosine top-k
    over the table, the query word itself excluded (fastText getNN
    semantics), ties broken by word ascending for determinism. OOV
    tokens emit nothing (and, as in the reference, advance no
    position — increments attach only to emitted tokens). Per-word
    results are memoized per worker, and the scan is vectorized
    numpy over the model matrix — no per-token Python beyond the memo
    lookup. Accepts either a bare embedding table or the
    fasttext_io.load_model form ({"vocab": ..., "oov": ...}): with an
    `oov` subword composer present, out-of-vocabulary tokens get an
    n-gram-composed query vector and emit neighbors like any other
    token (fastText getNN on an OOV word), instead of being skipped."""
    if model is None:
        raise ValueError("nearest_neighbors requires model=")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    oov = None
    if (
        isinstance(model, dict)
        and isinstance(model.get("vocab"), dict)
        and set(model) <= {"vocab", "labels", "oov"}
    ):
        oov = model.get("oov")
        model = model["vocab"]
    words, mat = _embedding_table(model)
    vocab = np.array(sorted(words), dtype=object)
    memo: dict[str, tuple[str, ...]] = {}

    def _nn(batch: list[str]) -> None:
        """Fill the memo for all in-vocab words of `batch` in one
        vectorized (len(batch) x vocab) cosine pass."""
        idx = [words[w] for w in batch]
        sims = mat[idx] @ mat.T  # rows are L2-normalized -> cosine
        for r, w in enumerate(batch):
            row = sims[r]
            row[words[w]] = -np.inf  # getNN excludes the query word
            k = min(top_k, len(row) - 1)
            if k <= 0:
                memo[w] = ()
                continue
            neg = -row
            # every index tied with the k-th score participates, so
            # the (score desc, word asc) tie-break is deterministic
            # regardless of argpartition's arbitrary boundary split
            kth = np.partition(neg, k - 1)[k - 1]
            cand = np.nonzero(neg <= kth)[0]
            order = sorted(
                ((float(neg[i]), vocab[i]) for i in cand),
                key=lambda t: (t[0], t[1]),
            )[:k]
            memo[w] = tuple(wd for _, wd in order)

    def _nn_oov(batch: list[str]) -> None:
        """Memo fill for OOV words via subword-composed query vectors
        (one vectorized cosine pass; no self-exclusion — an OOV word
        is not a vocab row)."""
        qs, kept = [], []
        for w in batch:
            v = oov(w)
            if v is None:
                memo[w] = ()
                continue
            n = np.linalg.norm(v)
            qs.append(v / n if n > 0 else v)
            kept.append(w)
        if not qs:
            return
        k = min(top_k, mat.shape[0])
        if k <= 0:
            for w in kept:
                memo[w] = ()
            return
        sims = np.asarray(qs, dtype=np.float32) @ mat.T
        for r, w in enumerate(kept):
            neg = -sims[r]
            kth = np.partition(neg, k - 1)[k - 1]
            cand = np.nonzero(neg <= kth)[0]
            order = sorted(
                ((float(neg[i]), vocab[i]) for i in cand),
                key=lambda t: (t[0], t[1]),
            )[:k]
            memo[w] = tuple(wd for _, wd in order)

    def run(texts: Sequence[str]):
        toks_per_doc = [
            [] if t is None else _ws_tokenize(t.lower()) for t in texts
        ]
        missing = sorted(
            {
                w
                for toks in toks_per_doc
                for w in toks
                if w in words and w not in memo
            }
        )
        for i in range(0, len(missing), 256):  # bound the sims matrix
            _nn(missing[i : i + 256])
        if oov is not None:
            missing_oov = sorted(
                {
                    w
                    for toks in toks_per_doc
                    for w in toks
                    if w not in words and w not in memo
                }
            )
            for i in range(0, len(missing_oov), 256):
                _nn_oov(missing_oov[i : i + 256])
        out = []
        for toks in toks_per_doc:
            terms: list[str] = []
            positions: list[int] = []
            pos = -1
            for w in toks:
                nbrs = memo.get(w, ())
                if not nbrs:
                    continue
                pos += 1
                terms.extend(nbrs)
                positions.extend([pos] * len(nbrs))
            out.append((terms, positions))
        return out

    return Analyzer("nearest_neighbors", run)


@_register("classification")
def _classification(
    model=None, top_k: int = 1, threshold: float = 0.0, **_opts
) -> Analyzer:
    """Whole-input classification: the top-k predicted labels become
    the tokens, all at position 0 (reference
    classification_stream.cpp:255-283: predictLine's top_k predictions
    above `threshold`, first label increment 1 and the rest 0, offsets
    spanning the whole input). The fastText supervised model is
    replaced by two embedding tables: `model={"vocab": ..., "labels":
    ...}` — the input's sentence vector is the mean of its in-vocab
    token vectors (fastText's hidden = average of input vectors) and
    label scores are a softmax over label-vector cosines, so
    `threshold` filters on a probability exactly like the reference's
    option. A model loaded from a subword .bin additionally carries
    `model["oov"]` (fasttext_io.SubwordVectors): out-of-vocabulary
    tokens then contribute their n-gram-composed vector to the mean,
    as fastText's own predict path does; without it OOV tokens
    contribute nothing (the .vec-table behavior). Deterministic: ties
    break label-ascending."""
    if not isinstance(model, dict) or not {"vocab", "labels"} <= set(model):
        raise ValueError(
            'classification requires model={"vocab": <word embeddings>, '
            '"labels": <label embeddings>}'
        )
    oov = model.get("oov")
    oov_memo: dict = {}
    words, mat = _embedding_table(model["vocab"])
    label_keys, label_mat = _embedding_table(model["labels"])
    labels = np.array(sorted(label_keys), dtype=object)
    if top_k < 1:
        raise ValueError("top_k must be >= 1")

    def run(texts: Sequence[str]):
        out = []
        for text in texts:
            toks = [] if text is None else _ws_tokenize(text.lower())
            idx = [words[w] for w in toks if w in words]
            vecs = [mat[idx]] if idx else []
            if oov is not None:
                for w in toks:
                    if w in words:
                        continue
                    if w not in oov_memo:
                        v = oov(w)
                        if v is not None:
                            n = np.linalg.norm(v)
                            v = v / n if n > 0 else v
                        oov_memo[w] = v
                    v = oov_memo[w]
                    if v is not None:
                        vecs.append(v[None, :])
            if not vecs:
                out.append(([], []))
                continue
            sent = np.concatenate(vecs).mean(axis=0)
            n = np.linalg.norm(sent)
            if n > 0:
                sent = sent / n
            scores = label_mat @ sent
            probs = np.exp(scores - scores.max())
            probs = probs / probs.sum()
            order = sorted(
                zip(-probs, labels), key=lambda t: (float(t[0]), t[1])
            )
            picked = [
                (lbl, -negp)
                for negp, lbl in order[:top_k]
                if -negp >= threshold
            ]
            out.append(
                ([lbl for lbl, _ in picked], [0] * len(picked))
            )
        return out

    return Analyzer("classification", run)


def get_analyzer(name: str, **opts) -> Analyzer:
    """Look up an analyzer by name (mirrors `analyzers::get`, the
    reference's registry at `core/analysis/analyzers.cpp:190`)."""
    try:
        factory = _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown analyzer {name!r}; available: {sorted(_REGISTRY)}"
        ) from None
    return factory(**opts)
