"""Börsen-Zeitung rule spec — semantics per reference
``src/fundus/publishers/de/boersenzeitung.py`` (V1 until 2024-12-09,
V1_1 until 2025-10-01, V1_2 after; paywall-selector free_access).
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
    generic_author_parsing,
    generic_date_parsing,
    image_extraction,
)

_PARAGRAPH = CSSSelector(".no-tts p")
_SUBHEAD = XPath("//p[contains(@class, 'interline')]")
_V1_SUMMARY = XPath("//storefront-html[@class='excerpt']/div")
_V1_TOPIC = XPath("//a[contains(@href, '/thema')]/span")
_PAYWALL = CSSSelector("storefront-html.paywall-headline > div")
_TITLE_BLOAT = re.compile(r"\|.*")
_UPPER = XPath("//h1|//script")
_IMAGE = XPath("//storefront-image|//figure//img")
_CREDIT = XPath("./ancestor::storefront-section//storefront-html[@class='image-copyright']")

_V12_SUMMARY = XPath("//div[@class='pxp-html excerpt']")
_V12_TOPIC = XPath("//div[contains(@class,'taglist')]//button")


def _body(summary):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            summary_selector=summary,
            subheadline_selector=_SUBHEAD,
            paragraph_selector=_PARAGRAPH,
        )

    return fn


def _title(ctx: ParseContext) -> Optional[str]:
    if fulltitle := ctx.meta.get("og:title"):
        return re.sub(_TITLE_BLOAT, "", fulltitle).strip()
    return None


def _authors_v1(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("twitter:misc:Written by"))


def _authors_v11(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("twitter:data1"))


def _authors_v12(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _publishing_date_v1(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.meta.get("article:published:time"))


def _publishing_date_v11(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.meta.get("article:published_time"))


def _topics(selector):
    def fn(ctx: ParseContext) -> List[str]:
        return [node.text_content().strip() for node in selector(ctx.doc)]

    return fn


def _free_access(ctx: ParseContext) -> bool:
    return not [node.text_content().strip() for node in _PAYWALL(ctx.doc)]


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            upper_boundary_selector=_UPPER,
            image_selector=_IMAGE,
            author_selector=_CREDIT,
        )
    ]


_SHARED = [
    Extractor("title", _title),
    Extractor("free_access", _free_access, default=True),
    Extractor("images", _images, default=list),
]

BOERSEN_ZEITUNG = PublisherSpec(
    key="de.BoersenZeitung",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2024, 12, 9),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_SUMMARY)),
                    Extractor("authors", _authors_v1, default=list),
                    Extractor("publishing_date", _publishing_date_v1),
                    Extractor("topics", _topics(_V1_TOPIC), default=list),
                ]
                + _SHARED
            ),
        ),
        VersionSpec(
            name="V1_1",
            valid_until=datetime.date(2025, 10, 1),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_SUMMARY)),
                    Extractor("authors", _authors_v11, default=list),
                    Extractor("publishing_date", _publishing_date_v11),
                    Extractor("topics", _topics(_V1_TOPIC), default=list),
                ]
                + _SHARED
            ),
        ),
        VersionSpec(
            name="V1_2",
            extractors=tuple(
                [
                    Extractor("body", _body(_V12_SUMMARY)),
                    Extractor("authors", _authors_v12, default=list),
                    Extractor("publishing_date", _publishing_date_v11),
                    Extractor("topics", _topics(_V12_TOPIC), default=list),
                ]
                + _SHARED
            ),
        ),
    ),
)
