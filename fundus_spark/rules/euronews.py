"""Euronews (shared multi-tenant) rule spec — semantics per reference
``src/fundus/publishers/shared/euronews.py:18-80`` (V1 valid until
2025-11-24, V1_1 after).
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

_V1_SUMMARY = CSSSelector("p.c-article-summary")
_V11_SUMMARY = CSSSelector("h2.c-article-summary")
_SUBHEAD = CSSSelector("div.c-article-content > h2")
_PARAGRAPH = CSSSelector("div.c-article-content > p")

_IMAGE = XPath("//img[contains(@class, 'c-article-media__img') or contains(@class, 'widgetImage__image')]")
_CAPTION = XPath(
    "./ancestor::div[contains(@class, 'c-article-image-video')]"
    "//div[contains(@class, 'c-article-caption__content')]|"
    "./ancestor::figure//span[@class='widget__captionText']"
)
_IMG_AUTHOR = XPath(
    "./ancestor::div[contains(@class, 'c-article-image-video')]"
    "//div[contains(@class, 'c-article-image-copyright')]|"
    "./ancestor::figure//span[@class='widget__captionCredit']"
)


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _body(summary_selector):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            summary_selector=summary_selector,
            subheadline_selector=_SUBHEAD,
            paragraph_selector=_PARAGRAPH,
        )

    return fn


def _authors_v1(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.xpath_search("NewsArticle/author/name"))


def _authors_v11(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("article:author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.meta.get("date.available"))


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("keywords"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            image_selector=_IMAGE,
            caption_selector=_CAPTION,
            author_selector=_IMG_AUTHOR,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


_COMMON = [
    Extractor("title", _title),
    Extractor("publishing_date", _publishing_date),
    Extractor("topics", _topics, default=list),
    Extractor("images", _images, default=list),
    Extractor("free_access", _free_access, default=False),
]

EURONEWS = PublisherSpec(
    key="shared.Euronews",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2025, 11, 24),
            extractors=tuple(
                [Extractor("body", _body(_V1_SUMMARY)), Extractor("authors", _authors_v1, default=list)] + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [Extractor("body", _body(_V11_SUMMARY)), Extractor("authors", _authors_v11, default=list)] + _COMMON
            ),
        ),
    ),
)
