"""URL canonicalization + dedup (operators/crawl.py).

Per-rule pinning of the normal form (fragment, case, ports, www,
slashes, tracking params, parameter sort); the analytic-oracle
`url_dedup` query covers the end-to-end group arithmetic."""

from __future__ import annotations

import pytest

from ndr_import_spark.operators.crawl import canonicalize_urls, url_dedup


def _canon(spark, url):
    df = spark.createDataFrame([(1, url)], "doc_id long, url string")
    return canonicalize_urls(df).collect()[0]


@pytest.mark.parametrize(
    "url,expected",
    [
        ("http://Example.COM/a", "http://example.com/a"),
        ("HTTPS://example.com:443/a", "https://example.com/a"),
        ("http://example.com:80/a", "http://example.com/a"),
        # non-default port survives
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        # :443 is only default for https
        ("http://example.com:443/a", "http://example.com:443/a"),
        ("http://www.example.com/a", "http://example.com/a"),
        ("http://example.com/a#frag", "http://example.com/a"),
        ("http://example.com//a///b", "http://example.com/a/b"),
        ("http://example.com/a/", "http://example.com/a"),
        ("http://example.com/", "http://example.com/"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/a?utm_source=x&utm_medium=y", "http://example.com/a"),
        ("http://example.com/a?gclid=1&id=5", "http://example.com/a?id=5"),
        ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
        # bare tracking key without '=' also drops; empty fragments ignored
        ("http://example.com/a?ref&z=1", "http://example.com/a?z=1"),
        # 'referrer=' is NOT a tracking param (anchor is ^ref(=|$))
        ("http://example.com/a?referrer=x", "http://example.com/a?referrer=x"),
    ],
)
def test_normal_form_rules(spark, url, expected):
    assert _canon(spark, url)["url_canon"] == expected


@pytest.mark.parametrize(
    "url,expected",
    [
        # scheme-less inputs must NOT collapse to 'http:///'
        ("example.com/a", "http://example.com/a"),
        ("//cdn.example.com/lib.js", "http://cdn.example.com/lib.js"),
        ("Example.COM", "http://example.com/"),
    ],
)
def test_schemeless_urls_keep_their_identity(spark, url, expected):
    assert _canon(spark, url)["url_canon"] == expected


def test_schemeless_urls_do_not_merge(spark):
    df = spark.createDataFrame(
        [(1, "example.com/a"), (2, "other.org/b")],
        "doc_id long, url string",
    )
    assert url_dedup(df).count() == 2


def test_parts_columns(spark):
    row = _canon(spark, "HTTPS://WWW.Site.Test:443//x//y/?b=2&a=1&utm_x=0#f")
    assert row["scheme"] == "https"
    assert row["host"] == "site.test"
    assert row["path"] == "/x/y"
    assert row["query_canon"] == "a=1&b=2"


def test_url_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [
            (7, "http://a.test/x?b=1&a=1"),
            (3, "http://A.test/x/?a=1&b=1#z"),
            (9, "http://a.test/y"),
        ],
        "doc_id long, url string",
    )
    got = {r["url_canon"]: r for r in url_dedup(df).collect()}
    assert got["http://a.test/x?a=1&b=1"]["n_variants"] == 2
    assert got["http://a.test/x?a=1&b=1"]["kept_id"] == 3
    assert got["http://a.test/y"]["n_variants"] == 1


def test_duplicate_ids_canonicalise_independently(spark):
    """ADVICE r6: a URL with query params linked N times must not get its
    params duplicated N times (the old explode/groupBy form did)."""
    df = spark.createDataFrame(
        [("http://ex.com/p?b=2&a=1",)] * 3, ["u"]
    )
    rows = canonicalize_urls(df, id_col="u", url_col="u").collect()
    assert len(rows) == 3
    for r in rows:
        assert r.query_canon == "a=1&b=2"
        assert r.url_canon == "http://ex.com/p?a=1&b=2"


def test_canonicalize_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([("http://ex.com/p?b=2&a=1", 1)], ["u", "x"])
    plan = canonicalize_urls(df, id_col="u", url_col="u")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
