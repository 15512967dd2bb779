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


# host/domain extraction + blocklist filtering — the crawl-pipeline
# hygiene step that runs on the URL key before any content work.
# Registered-domain extraction uses a fixed multi-label-TLD list (the
# common public-suffix cases; a full PSL is a data file, not logic —
# callers can pass their own via `multi_tlds`). Everything stays JVM
# regexp expressions, SQL-replayable.
MULTI_LABEL_TLDS: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.nz", "co.za",
)


def url_host(col: Column) -> Column:
    """Lowercased host of a URL (port and userinfo stripped); non-URLs
    yield ''."""
    auth = F.lower(F.regexp_extract(F.trim(col), _AUTH_RE, 1))
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.regexp_replace(no_user, r":[0-9]*$", "")


def registered_domain(
    col: Column, multi_tlds: tuple[str, ...] = MULTI_LABEL_TLDS
) -> Column:
    """eTLD+1 approximation: last two host labels, or last THREE when
    the last two are a known multi-label public suffix (co.uk, com.au,
    ...). IP hosts pass through whole."""
    host = url_host(col)
    is_ip = host.rlike(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$")
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    suffix_alt = "|".join(t.replace(".", r"\.") for t in multi_tlds)
    needs_three = host.rlike(rf"[^.]+\.({suffix_alt})$")
    dom = F.when(is_ip, host).when(
        needs_three & (three != ""), three
    ).otherwise(F.when(two != "", two).otherwise(host))
    return dom


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop every row whose URL's registered domain appears in
    `blocklist` (a one-column DataFrame of domains) — subdomains of a
    blocked domain are blocked with it. Blocklists are small next to a
    crawl: broadcast anti-join, corpus rows never shuffle."""
    dom = registered_domain(F.col(url_col)).alias("_dom")
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("_dom")).distinct()
    )
    return (
        df.withColumn("_dom", dom)
        .join(bl, "_dom", "left_anti")
        .drop("_dom")
    )
