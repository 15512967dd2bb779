"""URL canonicalization + URL-level dedup (ops/urls.py) — the crawl
pipeline's first dedup pass over its url key."""

import pytest
from pyspark.sql import functions as F

from iresearch_spark.ops.urls import canonicalize_url, dedup_by_canonical_url

CASES = [
    # (input, canonical)
    ("HTTP://Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
     "http://example.com/a/b?a=1&b=2"),
    ("http://example.com/a/b?a=1&b=2", "http://example.com/a/b?a=1&b=2"),
    ("https://Example.com:443/", "https://example.com/"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/path/", "https://example.com/path"),
    ("not a url", "not a url"),
    ("  ftp://Host.Net:21/file  ", "ftp://host.net:21/file"),
    ("https://example.com/?fbclid=abc", "https://example.com/"),
    ("https://example.com/x?gclid=1&z=9&y=8", "https://example.com/x?y=8&z=9"),
    ("https://user:p@Host.com/Case/Kept", "https://user:p@host.com/Case/Kept"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com/a?utm_campaign&x=1", "https://example.com/a?x=1"),
]


def test_canonical_forms(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "id long, url string"
    )
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, got[i], want)


def test_dedup_keeps_smallest_key(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "id long, url string"
    )
    kept = sorted(r["id"] for r in dedup_by_canonical_url(df).collect())
    # groups: {0,1}, {2,3,7}, {4}, {5}, {6}, {8}, {9}, {10}, {11} —
    # winner = lexicographically smallest original url
    assert kept == [0, 2, 4, 5, 6, 8, 9, 10, 11]


def test_dedup_keep_by_column(spark):
    df = spark.createDataFrame(
        [(9, "https://A.com/x"), (1, "https://a.com/x/")],
        "id long, url string",
    )
    kept = [r["id"] for r in dedup_by_canonical_url(df, keep_by="id").collect()]
    assert kept == [1]


def test_host_and_registered_domain(spark):
    from pyspark.sql import functions as F

    from iresearch_spark.ops.urls import registered_domain, url_host

    rows = [
        ("https://www.Example.co.uk:443/page", "www.example.co.uk", "example.co.uk"),
        ("http://user:pw@Sub.Blog.example.com:8080/x", "sub.blog.example.com", "example.com"),
        ("https://192.168.0.1/admin", "192.168.0.1", "192.168.0.1"),
        ("http://localhost/dev", "localhost", "localhost"),
        ("not a url", "", ""),
        ("https://a.b.co.jp/", "a.b.co.jp", "b.co.jp"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in rows], "url string")
    got = df.select(
        "url",
        url_host(F.col("url")).alias("h"),
        registered_domain(F.col("url")).alias("d"),
    ).collect()
    for r, (_, eh, ed) in zip(sorted(got, key=lambda r: [u for u, _, _ in rows].index(r["url"])), rows):
        assert r["h"] == eh, r
        assert r["d"] == ed, r


def test_filter_blocked_domains(spark):
    from iresearch_spark.ops.urls import filter_blocked_domains

    df = spark.createDataFrame(
        [
            (0, "https://shop.bad.com/x"),
            (1, "https://bad.com/"),
            (2, "https://good.org/"),
            (3, "https://notbad.com/"),
        ],
        "id long, url string",
    )
    bl = spark.createDataFrame([("BAD.com",)], "domain string")
    kept = sorted(r["id"] for r in filter_blocked_domains(df, bl).collect())
    assert kept == [2, 3]  # subdomain blocked with parent; notbad.com kept
