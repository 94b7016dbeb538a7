"""NDR rule spec — semantics per reference
``src/fundus/publishers/de/ndr.py`` (V1 valid until 2025-06-16,
V1_1 after).
"""

from __future__ import annotations

import datetime
import re
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

_V1_PARAGRAPH = XPath(
    "//div[@class='modulepadding copytext']/p[not(@class='textauthor' or @class='preface')] "
    "| //div[@class='modulepadding copytext']/ul/li"
)
_V1_SUMMARY = CSSSelector(".preface")
_V1_SUBHEAD = CSSSelector("article .modulepadding > h2")
_V1_UPPER = XPath("//div[@id='page']")
_V1_IMAGE = XPath(
    "//div[@id='page']//*[(self::div and not(@class='teaserimage')) or (self::a and @class='zoomimage')]"
    "/div[contains(@class,'image-container')]//picture//img"
)
_CANONICAL = XPath("string(//link[@rel='canonical']/@href)")
_V1_CAPTION = XPath("./ancestor::div[contains(@class,'contentimage')]//span[@class='caption']")
_CREDIT = re.compile(r"(?i)©\s*(ndr)?\s*(foto)?:?\s*(?P<credits>.+)")

_V11_PARAGRAPH = XPath("//article/p[not(@class='textauthor')] | //article/ul/li | //article/blockquote")
_V11_SUBHEAD = XPath("//article/h2")
_V11_SUMMARY = XPath("//header/p[@class='preface']")
_V11_UPPER = XPath("//article")
_V11_IMAGE = XPath("//article//div[contains(@class,'contentimage') or contains(@class, 'herocontainer')]//picture//img")
_V11_CAPTION = XPath("./ancestor::div[contains(@class,'contentimage')]//span[contains(@class, 'caption')]")
_BLOAT_KEYWORDS = ["hh", "regionalmeldungen", "News", "kurzmeldungen", "Nachrichten", "aktuell"]


def _body(summary, paragraph, subhead):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            summary_selector=summary,
            subheadline_selector=subhead,
            paragraph_selector=paragraph,
        )

    return fn


def _topics_v1(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("keywords"))


def _topics_v11(ctx: ParseContext) -> List[str]:
    return [t for t in generic_topic_parsing(ctx.meta.get("keywords")) if t not in _BLOAT_KEYWORDS]


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.xpath_search("(//Article | //NewsArticle) /author"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("title")


def _images_v1(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_V1_PARAGRAPH,
            upper_boundary_selector=_V1_UPPER,
            image_selector=_V1_IMAGE,
            relative_urls=_CANONICAL,
            caption_selector=_V1_CAPTION,
            author_selector=_CREDIT,
        )
    ]


def _images_v11(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_V11_PARAGRAPH,
            upper_boundary_selector=_V11_UPPER,
            relative_urls=_CANONICAL,
            image_selector=_V11_IMAGE,
            caption_selector=_V11_CAPTION,
            author_selector=_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


_COMMON = [
    Extractor("publishing_date", _publishing_date),
    Extractor("authors", _authors, default=list),
    Extractor("title", _title),
    Extractor("free_access", _free_access, default=False),
]

NDR = PublisherSpec(
    key="de.NDR",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2025, 6, 16),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD)),
                    Extractor("topics", _topics_v1, default=list),
                    Extractor("images", _images_v1, default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [
                    Extractor("body", _body(_V11_SUMMARY, _V11_PARAGRAPH, _V11_SUBHEAD)),
                    Extractor("topics", _topics_v11, default=list),
                    Extractor("images", _images_v11, default=list),
                ]
                + _COMMON
            ),
        ),
    ),
)
