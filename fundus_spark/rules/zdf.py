"""ZDF rule spec — semantics per reference
``src/fundus/publishers/de/zdf.py`` (V1 valid until 2025-08-01,
V1_1 after).
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
    strip_nodes_to_text,
)

_V1_PARAGRAPH = XPath("//div[contains(@class,'r1nj4qn5')]")
_SUMMARY = CSSSelector("p.c1bdz7f4")
_SUBHEAD = CSSSelector("h2.hhhtovw")

_V11_PARAGRAPH = XPath(
    "//main/div[@data-testid='text-module']/div[@class='c10o8fzf']/p[@class='r1nj4qn5 rvqyqzi']|"
    "//figure/blockquote"
)
_V11_TOPIC = XPath("//div[@class='t130q2hl']//a")

_IMAGE = XPath(
    "//picture//img[not(contains(@class, 'error') or contains(@src, 'zdfheute-whatsapp-channel'))"
    " or contains(@alt, 'Autorenfoto')]"
)
_CAPTION = XPath(
    "./ancestor::*[(self::div and @class='c1owvrps c10o8fzf') or self::figure]//*[contains(@class,'c1pbsmr2')]"
)
_CREDIT = XPath(
    "./ancestor::*[(self::div and @class='c1owvrps c10o8fzf') or self::figure]//small[contains(@class, 'tsdggcs')]"
)
_LOWER = XPath("//div[@class='s1am5zo f1uhhdhr']")


def _body(paragraph):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            paragraph_selector=paragraph,
            summary_selector=_SUMMARY,
            subheadline_selector=_SUBHEAD,
        )

    return fn


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _topics_v11(ctx: ParseContext) -> List[str]:
    topic_string = strip_nodes_to_text(_V11_TOPIC(ctx.doc), join_on=",")
    if topic_string is not None:
        return generic_topic_parsing(topic_string, delimiter=",")
    return []


def _images(paragraph):
    def fn(ctx: ParseContext) -> List[Dict[str, Any]]:
        return [
            img.serialize()
            for img in image_extraction(
                doc=ctx.doc,
                paragraph_selector=paragraph,
                image_selector=_IMAGE,
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
    Extractor("authors", _authors, default=list),
    Extractor("publishing_date", _publishing_date),
    Extractor("free_access", _free_access, default=False),
]

ZDF = PublisherSpec(
    key="de.ZDF",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2025, 8, 1),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_PARAGRAPH)),
                    Extractor("images", _images(_V1_PARAGRAPH), default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [
                    Extractor("body", _body(_V11_PARAGRAPH)),
                    Extractor("topics", _topics_v11, default=list),
                    Extractor("images", _images(_V11_PARAGRAPH), default=list),
                ]
                + _COMMON
            ),
        ),
    ),
)
