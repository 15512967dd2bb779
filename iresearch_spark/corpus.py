"""Deterministic synthetic Common-Crawl-style `pages` corpus.

Schema per BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string,
          lang string)

Generation is seeded and PARTITION-INDEPENDENT: every value is a pure
function of (seed, row id) via a splitmix64-style counter hash, so the
same (seed, n) produces byte-identical rows at any parallelism — the
per-row invariant "byte-identical extracted text per url" holds by
construction, and `extract_text(html) == text` for every row.

Token distribution: Zipf-ish over a 30k-word vocabulary that embeds the
reference benchmark's task terms (FIXTURES.md §1), 5-500 tokens/doc,
plus rare multi-byte Unicode tokens to exercise the analyzer.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TASK_TERMS = (
    "ref second demographics state south 12 federal from house's about "
    "september 1929 york projectile cite http which roman short europe "
    "party rapid donald books id year name"
).split()

UNICODE_TAIL = ["café", "naïve", "über", "déjà", "señor", "zürich"]

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return z ^ (z >> np.uint64(31))


def _hash2(seed: int, a: np.ndarray, b: int) -> np.ndarray:
    return _splitmix64(
        a.astype(np.uint64)
        ^ _splitmix64(np.uint64((seed << 16) ^ b) + np.zeros(1, np.uint64))
    )


def build_vocab(size: int = 30000) -> np.ndarray:
    words = list(TASK_TERMS) + list(UNICODE_TAIL)
    k = 0
    while len(words) < size:
        words.append(f"w{k:05d}")
        k += 1
    return np.asarray(words[:size], dtype=object)


def _zipf_cdf(size: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    w = 1.0 / ranks**s
    return np.cumsum(w) / w.sum()


def generate_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    vocab_size: int = 30000,
    max_tokens: int = 500,
    site_skew: bool = False,
) -> DataFrame:
    """`site_skew=True` adds the locality real crawls have and the
    uniform generator lacks: each site (url prefix) draws a TOPIC — a
    40-word vocabulary slice — and ~45% of its tokens come from that
    slice; doc length is site-correlated too. After the url-sorted
    index layout, pages of a site are doc-id-adjacent, so posting
    blocks of a topical term have high tf inside the topic's sites and
    tf~1 elsewhere — the block-max spread block-max WAND prunes on
    (formats_10.cpp:2426-2642 wanderator; a real Common-Crawl index
    gets this spread for free from crawl/site ordering)."""
    vocab = build_vocab(vocab_size)
    cdf = _zipf_cdf(vocab_size)
    n_topics = 200
    slice_w = 40  # topic t owns vocab[t*40:(t+1)*40)
    slice_cdf = _zipf_cdf(slice_w, s=1.2)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            m = ids.size
            if site_skew:
                site = ids % np.uint64(997)
                # site-correlated length: short sites (30-60 tokens)
                # and long sites (120-500), 3:1 mix
                site_long = (_hash2(seed, site, 8) % np.uint64(4)) == 0
                base = np.where(site_long, 120, 30).astype(np.int64)
                span = np.where(
                    site_long, max_tokens - 120, 30
                ).astype(np.int64)
                n_tok = base + (
                    _hash2(seed, ids, 1) % span.astype(np.uint64)
                ).astype(np.int64)
            else:
                n_tok = (
                    5 + (_hash2(seed, ids, 1) % np.uint64(max_tokens - 5))
                ).astype(np.int64)
            total = int(n_tok.sum())
            doc_rep = np.repeat(ids, n_tok)
            tok_idx = np.concatenate(
                [np.arange(k, dtype=np.uint64) for k in n_tok]
            )
            u = (
                _splitmix64(doc_rep * np.uint64(1000003) + tok_idx)
                .astype(np.float64)
                / 2**64
            )
            widx = np.searchsorted(cdf, u, side="left")
            if site_skew:
                # ~45% of tokens draw from the site's topic slice
                tok_h = _splitmix64(
                    doc_rep * np.uint64(777767777) + tok_idx
                )
                topical = (tok_h % np.uint64(100)) < 45
                topic = (
                    _hash2(seed, doc_rep % np.uint64(997), 7)
                    % np.uint64(n_topics)
                ).astype(np.int64)
                u2 = (
                    _splitmix64(tok_h ^ np.uint64(0xABCDEF123))
                    .astype(np.float64)
                    / 2**64
                )
                slice_idx = topic * slice_w + np.searchsorted(
                    slice_cdf, u2, side="left"
                )
                widx = np.where(topical, slice_idx, widx)
            words = vocab[widx]
            bounds = np.concatenate(([0], np.cumsum(n_tok)))
            texts = [
                " ".join(words[bounds[i] : bounds[i + 1]]) for i in range(m)
            ]
            langs = np.where(
                (_hash2(seed, ids, 2) % np.uint64(100)) < 95,
                "en",
                np.where((_hash2(seed, ids, 3) % np.uint64(2)) == 0, "de", "fr"),
            )
            urls = [
                f"https://site{int(i) % 997}.example/p{int(h) % 7}/{int(i)}"
                for i, h in zip(ids, _hash2(seed, ids, 4))
            ]
            titles = [" ".join(t.split()[:5]) for t in texts]
            htmls = [
                (
                    f"<html><head><title>{ti}</title></head>"
                    f"<body><p>{tx}</p></body></html>"
                ).encode("utf-8")
                for ti, tx in zip(titles, texts)
            ]
            ts = pd.Timestamp("2024-01-01", tz="UTC") + pd.to_timedelta(
                ids.astype(np.int64), unit="s"
            )
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": ts,
                    "html": htmls,
                    "text": texts,
                    "lang": langs,
                }
            )

    return spark.range(n).mapInPandas(gen, PAGES_SCHEMA)


def extract_text(html_col):
    """Deterministic extraction: the <p> body of the wrapper. JVM-side
    (regexp) — the golden inverse of generate_pages' html rendering."""
    s = F.decode(html_col, "UTF-8")
    return F.regexp_extract(s, r"<p>(.*)</p>", 1)
