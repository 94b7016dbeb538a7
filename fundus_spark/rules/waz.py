"""WAZ rule spec — semantics per reference
``src/fundus/publishers/de/waz.py`` (own V1 until 2024-02-21 and V1_1
until 2025-08-24; V2/V2_1 reuse the shared Funke parser versions).
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
from .funke import FUNKE

_V1_PARAGRAPH = CSSSelector(".article__body > p")
_V1_SUMMARY = CSSSelector(".article__header__intro__text")
_V1_SUBHEAD = CSSSelector(".article__body > h3")
_TOPICS = XPath("//div[@class='not-prose  mb-4 mx-5 font-sans']/ul/li")
_LOWER = XPath("//a[@href='/' and contains(text(), 'Startseite')]")
_CAPTION = XPath("(./ancestor::figure//figcaption//span)[1]")
_CREDIT = XPath("(./ancestor::figure//figcaption//span)[2]")

_V11_PARAGRAPH = XPath(
    "//div[@class='article-body'] /p[position()>1 and not(@rel='author' or re:test(string(), '^>>.*[+]{3}'))]"
)
_V11_SUMMARY = XPath("//div[@class='article-body'] /p[position()=1]")
_V11_SUBHEAD = XPath("//div[@class='article-body'] / h3[not(text()='Auch interessant')]")


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


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _topics(ctx: ParseContext) -> List[str]:
    authors = generic_author_parsing(ctx.meta.get("author"))
    if topics := generic_topic_parsing(ctx.meta.get("keywords")):
        return [topic for topic in topics if topic not in authors]
    return [re.sub(r"\s*:.+", "", node.text_content()).strip() for node in _TOPICS(ctx.doc)]


def _images(paragraph):
    def fn(ctx: ParseContext) -> List[Dict[str, Any]]:
        return [
            img.serialize()
            for img in image_extraction(
                doc=ctx.doc,
                paragraph_selector=paragraph,
                lower_boundary_selector=_LOWER,
                caption_selector=_CAPTION,
                author_selector=_CREDIT,
            )
        ]

    return fn


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


_COMMON = [
    Extractor("title", _title),
    Extractor("authors", _authors, default=list),
    Extractor("publishing_date", _publishing_date),
    Extractor("topics", _topics, default=list),
    Extractor("free_access", _free_access, default=False),
]

# reuse Funke's later versions wholesale (reference WAZ.V2 = Funke.V1_1,
# WAZ.V2_1 = Funke.V1_2)
_FUNKE_BY_NAME = {v.name: v for v in FUNKE.versions}

WAZ = PublisherSpec(
    key="de.WAZ",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2024, 2, 21),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD)),
                    Extractor("images", _images(_V1_PARAGRAPH), default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            valid_until=datetime.date(2025, 8, 24),
            extractors=tuple(
                [
                    Extractor("body", _body(_V11_SUMMARY, _V11_PARAGRAPH, _V11_SUBHEAD)),
                    Extractor("images", _images(_V11_PARAGRAPH), default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V2",
            valid_until=datetime.date(2025, 10, 22),
            extractors=_FUNKE_BY_NAME["V1_1"].extractors,
        ),
        VersionSpec(
            name="V2_1",
            extractors=_FUNKE_BY_NAME["V1_2"].extractors,
        ),
    ),
)
