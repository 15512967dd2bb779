"""URL canonicalization + URL-level dedup — the crawl-pipeline step
before any content dedup (Common-Crawl URL dedup; the reference's
corpus is keyed by url, BASELINE input_hint).

Canonicalization grammar (deterministic, regexp-based so a SQL oracle
can replay it exactly):

  1. trim surrounding whitespace
  2. non-URLs (no `scheme://`) pass through trimmed and otherwise
     untouched
  3. scheme and authority (host[:port]) lowercase; userinfo kept
  4. default ports stripped (http :80, https :443)
  5. fragment dropped
  6. tracking params dropped (utm_*, fbclid, gclid), remaining query
     params sorted byte-wise; empty query -> no '?'
  7. trailing slashes stripped from the path; empty path -> '/'

Everything is JVM expressions (regexp_extract / array ops) — linear,
no shuffle, no UDFs. `dedup_by_canonical_url` adds one canonical-key
window (keep the smallest key) — a single hash shuffle, the same
scale shape as exact dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid)(=|$)"


def _canon_parts(u: Column):
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    auth = F.when(
        (scheme == F.lit("http")) & auth.rlike(":80$"),
        F.regexp_replace(auth, ":80$", ""),
    ).when(
        (scheme == F.lit("https")) & auth.rlike(":443$"),
        F.regexp_replace(auth, ":443$", ""),
    ).otherwise(auth)
    path = F.regexp_replace(
        F.regexp_extract(u, _PATH_RE, 1), "/+$", ""
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.regexp_extract(u, _QUERY_RE, 1), "&", -1),
                lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return scheme, auth, path, query


def canonicalize_url(col: Column) -> Column:
    """Canonical form of a URL column (grammar in the module doc)."""
    u = F.trim(col)
    scheme, auth, path, query = _canon_parts(u)
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return F.when(u.rlike(_SCHEME_RE), rebuilt).otherwise(u)


def dedup_by_canonical_url(
    df: DataFrame, url_col: str = "url", keep_by: str | None = None
) -> DataFrame:
    """Keep ONE row per canonical URL — the winner is the smallest
    (keep_by, url) pair (keep_by defaults to the url itself), so the
    result is deterministic. One hash shuffle on the canonical key."""
    order = [F.col(keep_by or url_col).asc(), F.col(url_col).asc()]
    w = Window.partitionBy(canonicalize_url(F.col(url_col))).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
