"""Freie Presse rule spec — semantics per reference
``src/fundus/publishers/de/freiepresse.py`` (V1 valid until 2024-08-04,
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

_SUMMARY = CSSSelector("#artikel-content > p.bold")
_V1_PARAGRAPH = XPath("//*[@id='artikel-content']//p[not(ancestor::div[@class='pw-layer'] or @class='bold')]")
_SUBHEAD = CSSSelector("#artikel-content h2")
_V1_IMAGE = XPath("((//div[contains(@class,'wrapImg')]//picture)[1])//img | //img[@class='media-image']")
_V1_LOWER = XPath("//div[@class='section-topic']")
_V1_CAPTION = XPath("./ancestor::li[@class='img gallery-item']//span[@class='img-info']")
_CREDIT = re.compile(r"(?i)bild:(?P<credits>.*)")

_V11_PARAGRAPH = CSSSelector("#artikel-content p:not(.bold)")
_V11_IMAGE = XPath("//div[contains(@class, 'detail-img')]//img")
_V11_LOWER = CSSSelector("a.article__copyright")
_V11_CAPTION = XPath(
    "./ancestor::div[contains(@class, 'detail-img')]"
    "//div[contains(@class, 'detail-img__description')]"
    "/div"
    "/text()"
)


def _body(paragraph):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            paragraph_selector=paragraph,
            subheadline_selector=_SUBHEAD,
            summary_selector=_SUMMARY,
        )

    return fn


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _authors(ctx: ParseContext) -> List[str]:
    if not (authors := ctx.ld.xpath_search("NewsArticle/author")):
        return []
    return generic_author_parsing(
        [author for author in authors if not author == "Chemnitzer Verlag und Druck GmbH & Co. KG"]
    )


def _title(ctx: ParseContext) -> Optional[str]:
    if title := ctx.meta.get("og:title"):
        return re.sub(r"\s*\|.*", "", title)
    return None


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.ld.bf_search("keywords"), delimiter="/")


def _images_v1(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_V1_PARAGRAPH,
            image_selector=_V1_IMAGE,
            lower_boundary_selector=_V1_LOWER,
            caption_selector=_V1_CAPTION,
            author_selector=_CREDIT,
            relative_urls=True,
        )
    ]


def _images_v11(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_V11_PARAGRAPH,
            image_selector=_V11_IMAGE,
            lower_boundary_selector=_V11_LOWER,
            caption_selector=_V11_CAPTION,
            author_selector=_CREDIT,
            relative_urls=True,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


_COMMON = [
    Extractor("publishing_date", _publishing_date),
    Extractor("authors", _authors, default=list),
    Extractor("title", _title),
    Extractor("topics", _topics, default=list),
    Extractor("free_access", _free_access, default=False),
]

FREIE_PRESSE = PublisherSpec(
    key="de.FreiePresse",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2024, 8, 4),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_PARAGRAPH)),
                    Extractor("images", _images_v1, default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [
                    Extractor("body", _body(_V11_PARAGRAPH)),
                    Extractor("images", _images_v11, default=list),
                ]
                + _COMMON
            ),
        ),
    ),
)
