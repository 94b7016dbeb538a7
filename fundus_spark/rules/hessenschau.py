"""Hessenschau rule spec — semantics per reference
``src/fundus/publishers/de/hessenschau.py`` (single V1).
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

_SUMMARY = XPath(
    "//p[(@class='copytext__text text__copytext'"
    " or contains(@class, 'copytext__paragraph'))"
    " and position()=1] /strong"
)
_PARAGRAPH = XPath(
    "//p[(@class='copytext__text text__copytext' or contains(@class, 'copytext__paragraph'))"
    " and not(child::strong and position()=1)] | "
    "//ul[contains(@class, 'copytext__paragraph')]/li"
)
_SUBHEAD = CSSSelector("h2[class*=head]")
_IMAGE = XPath("//figure[not(@class='ar-1-1')]//*[not(self::noscript)]/img")
_CAPTION = XPath("./ancestor::figure//span[@class='pr-3']")
_CREDIT = XPath("./ancestor::figure//span[@class='text-gray-scorpion dark:text-text-dark']")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        paragraph_selector=_PARAGRAPH,
        subheadline_selector=_SUBHEAD,
    )


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.meta.get("article:published_time"))


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("news_keywords"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            image_selector=_IMAGE,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


HESSENSCHAU = PublisherSpec(
    key="de.Hessenschau",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("title", _title),
                Extractor("publishing_date", _publishing_date),
                Extractor("authors", _authors, default=list),
                Extractor("topics", _topics, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
