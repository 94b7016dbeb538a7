"""Evening Standard rule spec — semantics per reference
``src/fundus/publishers/uk/evening_standard.py`` (V1 valid until
2024-06-30, V1_1 after).
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

_V1_PARAGRAPH = CSSSelector("div.sc-bkSUFG.bdkDcZ")
_V1_SUMMARY = CSSSelector("div.sc-wkolL.dWZJhQ")

_V11_SUMMARY = XPath("//article//div[h1]/div[text()]")
_V11_SUBHEAD = XPath("//article//div[@class]/div[@class]/div/*[(self::h2 or self::h3) and not(@class)]")
_V11_PARAGRAPH = XPath("//article//div[@class]/div[@class]/div[not(@class)]/div/p")

_IMAGE = XPath("//picture[not(ancestor::a)] /img")
_UPPER = CSSSelector("article")
_CAPTION = XPath(
    "./ancestor::div[count(div)=3 and position() <= 2]/div[2] |"
    "./ancestor::div[picture and count(div)=2][1]/div[1]"
)
_CREDIT = XPath(
    "./ancestor::div[count(div)=3 and position() <= 2]/div[3] |"
    "./ancestor::div[picture and count(div)=2][1]/div[2]"
)
_LOWER = CSSSelector("div#piano-reg-wall")


def _body(summary, paragraph, subhead):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            summary_selector=summary,
            subheadline_selector=subhead,
            paragraph_selector=paragraph,
        )

    return fn


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("keywords"))


def _images(paragraph):
    def fn(ctx: ParseContext) -> List[Dict[str, Any]]:
        return [
            img.serialize()
            for img in image_extraction(
                doc=ctx.doc,
                paragraph_selector=paragraph,
                image_selector=_IMAGE,
                upper_boundary_selector=_UPPER,
                caption_selector=_CAPTION,
                author_selector=_CREDIT,
                lower_boundary_selector=_LOWER,
            )
        ]

    return fn


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


_COMMON = [
    Extractor("title", _title),
    Extractor("publishing_date", _publishing_date),
    Extractor("authors", _authors, default=list),
    Extractor("topics", _topics, default=list),
    Extractor("free_access", _free_access, default=False),
]

EVENING_STANDARD = PublisherSpec(
    key="uk.EveningStandard",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2024, 6, 30),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, None)),
                    Extractor("images", _images(_V1_PARAGRAPH), default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [
                    Extractor("body", _body(_V11_SUMMARY, _V11_PARAGRAPH, _V11_SUBHEAD)),
                    Extractor("images", _images(_V11_PARAGRAPH), default=list),
                ]
                + _COMMON
            ),
        ),
    ),
)
