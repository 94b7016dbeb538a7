"""URL-listing source tests (reference Sitemap/RSS fetch semantics,
url.py:155-251, over stored payloads instead of the network)."""

from __future__ import annotations

import gzip
import re

from fundus_spark.sources.listing import (
    decompress_auto,
    iter_sitemap_urls,
    listing_dataframe,
    parse_rss_links,
    parse_sitemap,
)

SITEMAP_INDEX = b"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://x.test/sitemap-2024-01.xml</loc></sitemap>
  <sitemap><loc>https://x.test/sitemap-2024-02.xml</loc></sitemap>
  <sitemap><loc>https://x.test/image-sitemap-2023-12.xml</loc></sitemap>
</sitemapindex>"""

SITEMAP_1 = b"""<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://x.test/a%20b</loc></url>
  <url><loc>https://x.test/c</loc></url>
</urlset>"""

SITEMAP_2 = b"""<urlset><url><loc>https://x.test/d</loc></url></urlset>"""

RSS = b"""<rss version="2.0"><channel>
  <title>feed</title><link>https://x.test</link>
  <item><title>one</title><link>https://x.test/one</link></item>
  <item><title>two</title><link>https://x.test/two</link></item>
</channel></rss>"""

PAYLOADS = {
    "https://x.test/sitemap.xml": SITEMAP_INDEX,
    "https://x.test/sitemap-2024-01.xml": gzip.compress(SITEMAP_1),  # gzip magic sniffing
    "https://x.test/sitemap-2024-02.xml": SITEMAP_2,
}


def test_decompress_auto_magic_and_passthrough():
    assert decompress_auto(gzip.compress(b"x")) == b"x"
    assert decompress_auto(b"plain") == b"plain"


def test_parse_sitemap_urlset_vs_index():
    urls, maps = parse_sitemap(SITEMAP_INDEX)
    assert not urls and len(maps) == 3
    urls, maps = parse_sitemap(SITEMAP_1)
    assert maps == [] and urls == ["https://x.test/a%20b", "https://x.test/c"]


def test_recursive_walk_with_filter_sort_and_unquote():
    got = list(
        iter_sitemap_urls(
            "https://x.test/sitemap.xml",
            PAYLOADS.get,
            sitemap_filter=lambda url: bool(re.search(r"image-sitemap", url)),
            sort_predicate=re.compile(r"\d{4}-\d{2}"),
        )
    )
    # sort_predicate orders children DESCENDING (2024-02 first); %20 unquoted
    assert got == ["https://x.test/d", "https://x.test/a b", "https://x.test/c"]


def test_reverse_listing():
    got = list(iter_sitemap_urls("https://x.test/sitemap-2024-02.xml", PAYLOADS.get, reverse=True))
    assert got == ["https://x.test/d"]
    got = list(
        iter_sitemap_urls("https://x.test/sitemap-2024-01.xml", lambda u: gzip.compress(SITEMAP_1), reverse=True)
    )
    assert got == ["https://x.test/c", "https://x.test/a b"]


def test_rss_links():
    assert parse_rss_links(RSS) == ["https://x.test/one", "https://x.test/two"]


def test_listing_dataframe(spark):
    urls = iter_sitemap_urls("https://x.test/sitemap.xml", PAYLOADS.get, sitemap_filter=lambda u: "image" in u)
    df = listing_dataframe(spark, urls, publisher="x.Test")
    rows = df.orderBy("list_rank").collect()
    assert [r["url"] for r in rows] == [
        "https://x.test/a b",
        "https://x.test/c",
        "https://x.test/d",
    ]
    assert rows[0]["publisher"] == "x.Test"
