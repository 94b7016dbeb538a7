"""Spiegel Online rule spec — semantics per reference
``src/fundus/publishers/de/spon.py`` (single V1).
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

_PARAGRAPH = CSSSelector("main .word-wrap > p")
_SUMMARY = CSSSelector("header .leading-loose")
_SUBHEAD = CSSSelector("main .word-wrap > h3")
_LOWER = XPath("//footer")
_IMAGE = XPath("//figure//picture//img")
_CAPTION = XPath("./ancestor::figure/following-sibling::figcaption[1]//p|./ancestor::figure/figcaption[1]//p")
_CREDIT = XPath(
    "./ancestor::figure/following-sibling::figcaption[1]/span|"
    "./ancestor::figure/figcaption[1]/*[(self::span or self::div) and contains(@class,'Credit')]"
)


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
        paragraph_selector=_PARAGRAPH,
    )


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("news_keywords"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            lower_boundary_selector=_LOWER,
            image_selector=_IMAGE,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


SPON = PublisherSpec(
    key="de.SpiegelOnline",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title),
                Extractor("topics", _topics, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
