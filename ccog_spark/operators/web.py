"""URL canonicalization + host/domain extraction + URL-level dedup.

Web-scale training pipelines dedup documents by canonical URL before
any content-based pass (CCNet, RefinedWeb, Dolma all do this): the
same page is crawled many times with varying tracking params, hosts
with/without ``www.``, default ports, fragments, and trailing
slashes. Canonicalizing first collapses those re-crawls with a pure
string transform — no content hashing, no shuffle beyond the final
keep-first aggregate on the canonical key.

Everything here is built from JVM-side ``pyspark.sql.functions``
(split / filter / array_sort / substring_index / regexp_replace) —
no Python crossing, whole-stage-codegen friendly, and each rule has
an exact DuckDB twin so the corpus row is hash-checked.

Canonical form (applied in order):
1. trim; drop the ``#fragment``
2. default scheme ``http`` when none present
3. scheme + host lowercased; leading ``www.`` dropped
4. default port dropped (``:80`` for http, ``:443`` for https)
5. tracking params removed (``utm_*`` and ``TRACKING_KEYS``)
6. surviving query params sorted bytewise; empty query dropped
7. trailing ``/`` on a non-root path dropped; empty path → ``/``

At 100 TB this is a map-only expression over the scan (nothing here
shuffles); ``url_dedup`` adds the one unavoidable shuffle — the
groupBy on the canonical key — which is the minimum any URL-level
dedup pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Params that never affect page identity. Keys compared exactly;
# "utm_" is a prefix family. Kept deliberately small and public
# (Google/Facebook/Mailchimp click ids) — callers can extend.
TRACKING_KEYS = ("gclid", "fbclid", "ref", "mc_cid", "mc_eid", "igshid")

# Two-level public suffixes where the registered domain is 3 labels.
# A full public-suffix list is a data file; this covers the common
# ccTLD second-level registries and keeps the rule pure-expression.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "com.br", "co.in", "co.nz", "com.mx", "co.za", "com.cn",
)


# A URL "has a scheme" only when it STARTS with one (RFC 3986 §3.1).
# contains('://') would be fooled by scheme-less crawl URLs embedding
# an absolute URL ('t.co/r?u=https://x') and split at the wrong spot.
_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"


def _with_scheme(u: Column) -> Column:
    return F.when(u.rlike(_SCHEME_RE), u).otherwise(F.concat(F.lit("http://"), u))


def _scheme_host_rest(url: Column) -> tuple[Column, Column, Column]:
    """Shared parse: (scheme, canonical host, rest-after-authority).

    Splits at the FIRST '://' — a '://' later in the string (redirect
    URLs like /r?url=https://other.com are ubiquitous in crawls)
    belongs to the path/query, not the authority. Single source of
    truth for canonicalize_url and url_host so the two can never
    desynchronize."""
    u = _with_scheme(F.substring_index(F.trim(url), "#", 1))
    scheme = F.lower(F.substring_index(u, "://", 1))
    # everything after the FIRST '://' (scheme is the text before it,
    # so the remainder starts at len(scheme) + 4, 1-indexed)
    rest = u.substr(F.length(scheme) + F.lit(4), F.lit(1 << 30))
    hostport = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    host = F.regexp_replace(F.lower(hostport), r"^(www\.)+", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, "(:80)+$", ""))
        .when(scheme == "https", F.regexp_replace(host, "(:443)+$", ""))
        .otherwise(host)
    )
    # path+query = rest minus the hostport prefix
    pq = rest.substr(F.length(hostport) + F.lit(1), F.lit(1 << 30))
    return scheme, host, pq


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (rules above).

    Pure Column expression — composes into any select/filter and
    stays inside whole-stage codegen.
    """
    scheme, host, pq = _scheme_host_rest(url)
    path_raw = F.substring_index(pq, "?", 1)
    # query = everything after the FIRST '?' (a later '?' is part of a
    # query value, not a new query string)
    query_raw = F.when(
        pq.contains("?"),
        pq.substr(F.length(path_raw) + F.lit(2), F.lit(1 << 30)),
    ).otherwise(F.lit(""))

    path = F.regexp_replace(path_raw, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)

    kept = F.filter(
        F.split(query_raw, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~F.substring_index(p, "=", 1).isin(*TRACKING_KEYS),
    )
    q = F.array_join(F.array_sort(kept), "&")

    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def url_host(url: Column) -> Column:
    """Canonical host of a URL (lowercased, ``www.``/default-port
    stripped). Idempotent on already-canonical URLs."""
    _scheme, host, _pq = _scheme_host_rest(url)
    return host


def registered_domain(host: Column) -> Column:
    """eTLD+1 heuristic: last 2 labels, or last 3 when the 2-label
    tail is a known second-level registry (MULTI_SUFFIXES).

    A non-default port survives canonicalization ('example.com:8080')
    — strip any ':port' first so it can't ride inside the last label
    and fragment per-domain quotas."""
    h = F.regexp_replace(host, r":[0-9]+$", "")
    labels = F.split(h, r"\.")
    n = F.size(labels)
    two = F.array_join(F.slice(labels, F.greatest(n - F.lit(1), F.lit(1)), 2), ".")
    three = F.array_join(F.slice(labels, F.greatest(n - F.lit(2), F.lit(1)), 3), ".")
    return (
        F.when(n <= 2, h)
        .when(two.isin(*MULTI_SUFFIXES), three)
        .otherwise(two)
    )


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Keep-first per canonical URL: one row per canonical form with
    the smallest ``id_col`` as keeper and the collapse count.

    One shuffle, keyed by canonical URL (high-cardinality, near-
    uniform — URL keys don't skew the way domain keys do)."""
    canon = canonicalize_url(F.col(url_col)).alias("url")
    return (
        df.select(canon, F.col(id_col))
        .groupBy("url")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count("*").cast("bigint").alias("n_raw"),
        )
    )
