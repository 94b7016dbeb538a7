"""Unit tests for URL canonicalization (`operators/urlnorm.py`) —
table-driven expected values for every normalization rule, the
idempotence property (a canonical URL is its own canonical form), and
the first-wins dedup contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fundus_spark.operators.urlnorm import (
    normalize_url_col,
    normalize_urls,
    url_dedup,
)

CASES = [
    # scheme + host lowercased, path case preserved
    ("HTTPS://Ex.COM/Articles/Item-1", "https://ex.com/Articles/Item-1"),
    # fragment stripped
    ("https://ex.com/a#section-2", "https://ex.com/a"),
    # userinfo stripped
    ("https://user:pw@ex.com/a", "https://ex.com/a"),
    # default ports stripped, non-default kept
    ("http://ex.com:80/a", "http://ex.com/a"),
    ("https://ex.com:443/a", "https://ex.com/a"),
    ("http://ex.com:8080/a", "http://ex.com:8080/a"),
    # https keeps :80 (not its default), http keeps :443
    ("https://ex.com:80/a", "https://ex.com:80/a"),
    ("http://ex.com:443/a", "http://ex.com:443/a"),
    # www fold
    ("https://www.ex.com/a", "https://ex.com/a"),
    # trailing slashes collapsed; bare host -> '/'
    ("https://ex.com/a///", "https://ex.com/a"),
    ("https://ex.com", "https://ex.com/"),
    ("https://ex.com/", "https://ex.com/"),
    # tracking params dropped, survivors sorted, empty query removed
    ("https://ex.com/a?utm_source=f&b=2&a=1", "https://ex.com/a?a=1&b=2"),
    ("https://ex.com/a?fbclid=X&gclid=Y&utm_campaign=z", "https://ex.com/a"),
    ("https://ex.com/a?ref=hn&ref_src=tw&x=1", "https://ex.com/a?x=1"),
    # 'ref' matches whole names only — 'refresh' survives
    ("https://ex.com/a?refresh=1", "https://ex.com/a?refresh=1"),
    # bare tracking name without '=' also dropped
    ("https://ex.com/a?fbclid&b=1", "https://ex.com/a?b=1"),
    # '?' with nothing significant left
    ("https://ex.com/a?", "https://ex.com/a"),
    # everything at once
    (
        "  HTTP://u@WWW.Ex.COM:80/A/B//?utm_medium=rss&b=2&a=1#frag  ",
        "http://ex.com/A/B?a=1&b=2",
    ),
    # non-URL inputs pass through trimmed but untouched
    ("not a url 17", "not a url 17"),
    ("mailto:someone@ex.com", "mailto:someone@ex.com"),
    ("/relative/path?utm_source=f", "/relative/path?utm_source=f"),
]


def _norm_all(spark, raws, **kw):
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    rows = df.select(
        "url", normalize_url_col(F.col("url"), **kw).alias("c")
    ).collect()
    return {r["url"]: r["c"] for r in rows}


def test_normalization_table(spark):
    got = _norm_all(spark, [raw for raw, _ in CASES])
    for raw, want in CASES:
        assert got[raw] == want, raw


def test_normalization_is_idempotent(spark):
    canon = [want for _, want in CASES]
    got = _norm_all(spark, canon)
    for c in canon:
        assert got[c] == c, c


def test_strip_www_off_and_custom_params(spark):
    got = _norm_all(
        spark,
        ["https://www.ex.com/a?sid=1&b=2"],
        strip_www=False,
        drop_params=("sid",),
    )
    assert got["https://www.ex.com/a?sid=1&b=2"] == "https://www.ex.com/a?b=2"


def test_url_dedup_first_wins(spark):
    df = spark.createDataFrame(
        [
            (10, "HTTP://WWW.EX.COM/a?utm_source=f&b=2&a=1"),
            (11, "http://ex.com/a///?a=1&b=2&gclid=G"),
            (12, "http://ex.com:80/a?b=2&a=1#x"),
            (20, "https://ex.com/other"),
            (30, "not a url"),
        ],
        "doc_id long, url string",
    )
    rows = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert rows["http://ex.com/a?a=1&b=2"]["kept_id"] == 10
    assert rows["http://ex.com/a?a=1&b=2"]["n_variants"] == 3
    assert rows["https://ex.com/other"]["n_variants"] == 1
    assert rows["not a url"]["n_variants"] == 1


def test_normalize_urls_is_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "https://ex.com/a")], "doc_id long, url string")
    plan = (
        normalize_urls(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
