"""Per-document language routing for the index-build hot path.

The reference instantiates one analyzer per locale
(core/analysis/text_token_stream.cpp:509 — the Snowball stemmer and
stopword list are chosen by `options.locale`); a multilingual corpus
is indexed by giving each document its language's chain. Spark-side,
the pages table already carries a `lang` column (the north-rule input
shape), so routing happens INSIDE the same mapInArrow pass that builds
segments: each Arrow batch is grouped by language (one pandas
factorize), every group runs its language's vectorized
`analyze_flat`, and the group results are scattered back into original
document order with ONE unified term dictionary — no extra shuffle, no
per-token Python, cost = the same tokenization work plus an
O(vocabulary) dictionary unification per batch.

Scale story: routing is per-partition and stateless, so it holds at
any corpus size; the language chains themselves stem over the token
DICTIONARY (per distinct term, not per token). Skewed language mix
(e.g. 90% English) is harmless — groups are within-batch selections,
not shuffle keys.
"""

from __future__ import annotations

import warnings

import numpy as np

from iresearch_spark.analysis.analyzers import (
    Analyzer,
    FlatTokens,
    get_analyzer,
)


class LangRoutedAnalyzer:
    """Routes each document to its language's analyzer chain.

    Use with `build_index(df, analyzer=routed, lang_col="lang")`: the
    builder ships the lang column through its one shuffle and calls
    `analyze_flat_routed(texts, langs)` per segment. Documents whose
    language has no chain (or a null lang) use `default`.
    """

    name = "lang_routed"
    supports_offsets = False  # span path not implemented for routing

    def __init__(
        self, by_lang: dict[str, Analyzer], default: Analyzer
    ) -> None:
        self.by_lang = dict(by_lang)
        self.default = default

    def chain_for(self, lang: str | None) -> Analyzer:
        if lang is None:
            return self.default
        return self.by_lang.get(lang, self.default)

    def analyze_with_langs(self, texts, langs):
        """Per-doc (terms, positions) reference path — the slow oracle
        the routed fast path is differential-tested against."""
        return [
            self.chain_for(lang).analyze(t if t is not None else "")
            for t, lang in zip(texts, langs)
        ]

    def analyze_flat_routed(self, texts, langs) -> FlatTokens:
        import pandas as pd
        import pyarrow as pa

        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if not isinstance(texts, pa.Array):
            texts = pa.array(
                [t if t is not None else "" for t in texts],
                type=pa.string(),
            )
        langs = np.asarray(langs, dtype=object)
        n = len(texts)
        if langs.shape[0] != n:
            raise ValueError("texts and langs must have equal length")
        lang_codes, lang_uniq = pd.factorize(langs, use_na_sentinel=False)
        n_tokens = np.zeros(n, dtype=np.int64)
        groups: list[tuple[np.ndarray, FlatTokens]] = []
        for gi, lang in enumerate(lang_uniq):
            idx = np.flatnonzero(lang_codes == gi)
            sub = texts.take(pa.array(idx, type=pa.int64()))
            chain = self.chain_for(lang if isinstance(lang, str) else None)
            ft = chain.analyze_flat(sub)
            n_tokens[idx] = ft.n_tokens
            groups.append((idx, ft))
        total = int(n_tokens.sum())
        if total == 0:
            e = np.empty(0, np.int64)
            return FlatTokens(
                codes=e,
                uniques=np.empty(0, object),
                n_tokens=n_tokens,
                positions=e,
                uniques_arrow=pa.array([], type=pa.string()),
            )
        # scatter each group's doc runs back into original doc order
        final_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(n_tokens, out=final_off[1:])
        codes = np.empty(total, dtype=np.int64)
        positions = np.empty(total, dtype=np.int64)
        dicts: list[np.ndarray] = []
        code_base = 0
        for idx, ft in groups:
            g_total = int(ft.n_tokens.sum())
            if g_total:
                g_off = np.zeros(idx.size, dtype=np.int64)
                np.cumsum(ft.n_tokens[:-1], out=g_off[1:])
                tgt = np.repeat(final_off[idx], ft.n_tokens) + (
                    np.arange(g_total) - np.repeat(g_off, ft.n_tokens)
                )
                codes[tgt] = ft.codes + code_base
                positions[tgt] = ft.positions
            dicts.append(np.asarray(ft.uniques, dtype=object))
            code_base += len(ft.uniques)
        concat_uniques = (
            np.concatenate(dicts) if dicts else np.empty(0, object)
        )
        # unify duplicate terms across language dictionaries (a term
        # two stemmers both emit must be ONE posting list)
        uni_codes, uni_terms = pd.factorize(concat_uniques, sort=False)
        codes = uni_codes.astype(np.int64)[codes]
        uniq = np.asarray(uni_terms, dtype=object)
        return FlatTokens(
            codes=codes,
            uniques=uniq,
            n_tokens=n_tokens,
            positions=positions,
            uniques_arrow=pa.array(uniq, type=pa.string()),
        )


def lang_routed_analyzer(
    langs: list[str] | None = None,
    stopwords="default",
    default_locale: str = "en",
) -> LangRoutedAnalyzer:
    """One chain per language (default: the 28 lang-id languages) —
    each `get_analyzer("text", locale=lang)`: stemmed where a stemmer
    exists, dictionary-segmented for zh/ja/ko/th, unstemmed fallback
    otherwise; `stopwords="default"` gives every chain its language's
    built-in stopword set (None disables)."""
    if langs is None:
        from iresearch_spark.ops.textstats import LANG_PROFILES

        langs = sorted(LANG_PROFILES)
    by: dict[str, Analyzer] = {}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # optional-stemmer fallbacks
        for lang in langs:
            by[lang] = get_analyzer("text", locale=lang, stopwords=stopwords)
        default = get_analyzer(
            "text", locale=default_locale, stopwords=stopwords
        )
    return LangRoutedAnalyzer(by, default)
