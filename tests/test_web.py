"""operators/web.py: URL canonicalization rules, host/domain
extraction, keep-first URL dedup. Edge cases a corpus row can't
reach (scheme-less URLs, wrong-scheme ports, idempotence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccog_spark.operators import web


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    return [
        r.c
        for r in df.select(
            web.canonicalize_url(F.col("u")).alias("c")
        ).collect()
    ]


def test_canonicalize_rules(spark):
    got = _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
            "http://example.com:80/",
            "http://example.com:8080/x",   # non-default port kept
            "https://example.com:80/x",    # :80 is NOT https default
            "example.com/path",            # scheme-less → http
            "https://example.com/a?gclid=1&fbclid=2&ref=r&z=9",
            "https://example.com",         # empty path → /
            "https://example.com/a//",     # multi trailing slash
            # embedded absolute URL: authority = FIRST '://' segment
            "https://ex.com/redirect?url=https://other.com/x",
            # second '?' belongs to the query VALUE, not a new query
            "https://ex.com/p?a=1?b=2",
            # scheme-less URL EMBEDDING an absolute URL: the '://' is in
            # the query value, not an authority marker — scheme presence
            # is anchored (^scheme://), so http:// is prepended and the
            # host is t.co, never a garbage 't.co/r?u=https' scheme
            "t.co/r?u=https://x.com/p",
        ],
    )
    assert got == [
        "https://example.com/a/b?a=1&b=2",
        "http://example.com/",
        "http://example.com:8080/x",
        "https://example.com:80/x",
        "http://example.com/path",
        "https://example.com/a?z=9",
        "https://example.com/",
        "https://example.com/a",
        "https://ex.com/redirect?url=https://other.com/x",
        "https://ex.com/p?a=1?b=2",
        "http://t.co/r?u=https://x.com/p",
    ]


def test_canonicalize_idempotent(spark):
    raw = [
        "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
        "example.com/path?ref=x",
        "http://sub.www-like.co.uk/p/?q=1",
    ]
    once = _canon(spark, raw)
    twice = _canon(spark, once)
    assert once == twice


def test_url_host_and_registered_domain(spark):
    df = spark.createDataFrame(
        [
            ("https://WWW.News.BBC.co.uk/story",),
            ("http://a.b.example.com:80/x",),
            ("https://example.com/",),
            ("https://localhost/x",),
            # non-default port survives in host but NOT in the
            # registered domain (would fragment per-domain quotas)
            ("https://a.example.com:8080/x",),
            ("https://shop.example.co.uk:8443/x",),
        ],
        ["u"],
    )
    rows = df.select(
        web.url_host(F.col("u")).alias("h"),
        web.registered_domain(web.url_host(F.col("u"))).alias("d"),
    ).collect()
    assert [(r.h, r.d) for r in rows] == [
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("a.b.example.com", "example.com"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("a.example.com:8080", "example.com"),
        ("shop.example.co.uk:8443", "example.co.uk"),
    ]


def test_url_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [
            (1, "https://example.com/a?b=2&a=1"),
            (2, "HTTPS://WWW.example.com/a/?a=1&b=2&utm_x=9"),
            (3, "https://example.com/other"),
        ],
        ["doc_id", "url"],
    )
    out = {
        r.url: (r.keeper, r.n_raw)
        for r in web.url_dedup(df, "url", "doc_id").collect()
    }
    assert out == {
        "https://example.com/a?a=1&b=2": (1, 2),
        "https://example.com/other": (3, 1),
    }


def test_canonicalize_fuzz_idempotent(spark):
    """Property: canonicalization is idempotent and total (no nulls,
    no exceptions) over adversarial URL-ish strings."""
    import random

    rng = random.Random(42)
    frags = [
        "http://", "https://", "HTTPS://", "", "www.", "WWW.", "ex.com",
        "a.b.co.uk", ":80", ":443", ":8080", "/", "//", "/p/q", "?",
        "a=1", "&", "utm_x=2", "ref=r", "#f", "#", "=", "x", "%20",
    ]
    urls = [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 8)))
        for _ in range(300)
    ]
    urls = [u for u in urls if u.strip()]
    once = _canon(spark, urls)
    assert all(c is not None for c in once)
    assert _canon(spark, once) == once
