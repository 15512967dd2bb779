"""Scorers — BM25 and TF-IDF, exactly the reference formulas.

BM25 (verified against `core/search/bm25.cpp:198-234,355-402`):
    idf   = ln(1 + (N - df + 0.5) / (df + 0.5))
    c0    = boost * (k + 1) * idf
    c1    = k * (1 - b) + k * b * dl / avg_dl
    score = c0 * tf / (c1 + tf)            # == c0 - c0*c1/(c1 + tf)
    multi-term score = sum over terms
    defaults k = 1.2, b = 0.75 (bm25.hpp:63-65); b=0 -> BM15, b=1 -> BM11

TF-IDF (`core/search/tfidf.cpp:185-186,274-277`):
    idf   = ln(1 + (N + 1) / (df + 1))
    score = sqrt(tf) * idf [* 1/sqrt(dl) if norms enabled]

Scores are computed as Spark Column expressions (JVM whole-stage
codegen) over the decoded posting rows (freq, dl) — the idf and avg_dl
constants are driver-side floats (the reference's prepare-time stats
blob, bm25.cpp:366-410), so no join against stats tables ever appears in
the scoring plan.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, functions as F


@dataclass(frozen=True)
class BM25:
    k: float = 1.2
    b: float = 0.75

    name: str = "bm25"

    def idf(self, df: int, n_docs: int) -> float:
        return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score_expr(
        self,
        freq: Column,
        dl: Column,
        idf: float,
        avg_dl: float,
        boost: float = 1.0,
    ) -> Column:
        c0 = boost * (self.k + 1.0) * idf
        c1 = F.lit(self.k * (1.0 - self.b)) + F.lit(
            (self.k * self.b) / avg_dl if avg_dl else 0.0
        ) * dl.cast("double")
        tf = freq.cast("double")
        return F.lit(c0) * tf / (c1 + tf)

    def score_py(self, tf: float, dl: float, idf: float, avg_dl: float,
                 boost: float = 1.0) -> float:
        c0 = boost * (self.k + 1.0) * idf
        c1 = self.k * (1.0 - self.b) + (
            (self.k * self.b) / avg_dl if avg_dl else 0.0
        ) * dl
        return c0 * tf / (c1 + tf)

    def upper_bound_expr(
        self, max_freq: Column, min_dl: Column, idf: float, avg_dl: float,
        boost: float = 1.0,
    ) -> Column:
        """Block-max upper bound: score is increasing in tf and decreasing
        in dl, so (block_max_freq, block_min_dl) bounds every posting in
        the block (the reference's WAND entry, wand_writer.hpp:137-300)."""
        return self.score_expr(max_freq, min_dl, idf, avg_dl, boost)

    def upper_bound_py(self, max_freq: int, min_dl: int, idf: float,
                       avg_dl: float, boost: float = 1.0) -> float:
        return self.score_py(float(max_freq), float(min_dl), idf, avg_dl, boost)


@dataclass(frozen=True)
class TFIDF:
    with_norms: bool = False

    name: str = "tfidf"

    def idf(self, df: int, n_docs: int) -> float:
        return math.log(1.0 + (n_docs + 1.0) / (df + 1.0))

    def score_expr(
        self,
        freq: Column,
        dl: Column,
        idf: float,
        avg_dl: float,
        boost: float = 1.0,
    ) -> Column:
        s = F.lit(boost * idf) * F.sqrt(freq.cast("double"))
        if self.with_norms:
            s = s / F.sqrt(dl.cast("double"))
        return s

    def score_py(self, tf, dl, idf, avg_dl, boost=1.0):
        s = boost * idf * math.sqrt(tf)
        if self.with_norms:
            s = s / math.sqrt(dl)
        return s

    def upper_bound_expr(self, max_freq, min_dl, idf, avg_dl, boost=1.0):
        return self.score_expr(max_freq, min_dl, idf, avg_dl, boost)

    def upper_bound_py(self, max_freq, min_dl, idf, avg_dl, boost=1.0):
        return self.score_py(float(max_freq), float(min_dl), idf, avg_dl, boost)


def get_scorer(name: str, **opts):
    """Scorer registry (reference REGISTER_SCORER_JSON, bm25.cpp:195-196)."""
    if name == "bm25":
        return BM25(**opts)
    if name in ("bm15", "bm11"):
        # the b constant IS the variant — an explicit b would silently
        # contradict the name, so reject it; other opts (k) pass through
        if "b" in opts:
            raise ValueError(f"{name} fixes b; pass scorer='bm25' to set b")
        return BM25(b=0.0 if name == "bm15" else 1.0, **opts)
    if name == "bm1":
        # k=0 -> score = c0 (constant per term, bm25.hpp:107-113)
        if "k" in opts:
            raise ValueError("bm1 fixes k=0; pass scorer='bm25' to set k")
        return BM25(k=0.0, **opts)
    if name == "tfidf":
        return TFIDF(**opts)
    raise KeyError(f"unknown scorer {name!r}")
