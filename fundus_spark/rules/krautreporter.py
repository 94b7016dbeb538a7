"""Krautreporter rule spec — semantics per reference
``src/fundus/publishers/de/krautreporter.py`` (single V1).
"""

from __future__ import annotations

import datetime
from typing import Any, Dict, List, Optional

from ..kernel import (
    CSSSelector,
    Extractor,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    assemble_body,
    free_access_from_ld,
    generic_author_parsing,
    generic_date_parsing,
    generic_topic_parsing,
    image_extraction,
)

_BLOAT = "^Redaktion:|^Dieser Artikel ist eine Übersetzung|^Übersetzung:|^Recherche:|^Schlussredaktion:"
_SUMMARY = CSSSelector("p[data-test='article-teaser']")
_SUBHEAD = CSSSelector("div.article-markdown > h2")
_PARAGRAPH = XPath(f"//div[contains(@class, 'article-markdown')] /p[not(re:test(string(), '{_BLOAT}'))]")
_TOPIC = XPath("string(//div[contains(@class, 'article-headers') and contains(@class, 'topic')])")
_IMAGE = XPath(
    "//section[@class='article-headers-shared-teaser-image']//img|"
    "//figure[contains(@class, 'image--default')]//img"
)
_CREDIT = XPath(
    "./ancestor::section[@class='article-headers-shared-teaser-image']"
    "//p[@class='article-headers-shared-teaser-image__credits']"
)


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
        paragraph_selector=_PARAGRAPH,
    )


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.xpath_search("NewsArticle/datePublished", scalar=True))


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(_TOPIC(ctx.doc))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            image_selector=_IMAGE,
            author_selector=_CREDIT,
            relative_urls=True,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


KRAUTREPORTER = PublisherSpec(
    key="de.Krautreporter",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("title", _title),
                Extractor("body", _body),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("topics", _topics, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
