"""iNews rule spec — semantics per reference
``src/fundus/publishers/uk/i_news.py`` (V1 valid until 2025-01-01,
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
    assemble_body,
    free_access_from_ld,
    generic_author_parsing,
    generic_date_parsing,
    generic_topic_parsing,
    image_extraction,
)

_V1_SUMMARY = CSSSelector("article > h2")
_V11_SUMMARY = CSSSelector("article p.inews__post-excerpt")
_PARAGRAPH = CSSSelector("article div.article-content p")
_IMAGE = CSSSelector("figure:has(> figcaption) img")
_CREDIT = re.compile(r"\((?P<credits>.*?)\)$")
_V1_UPPER = CSSSelector("div.inews__main")
_V11_UPPER = CSSSelector("div.article-wrapper")


def _body(summary):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(ctx.doc, summary_selector=summary, paragraph_selector=_PARAGRAPH)

    return fn


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.bf_search("headline")


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.ld.bf_search("keywords"))


def _images(upper):
    def fn(ctx: ParseContext) -> List[Dict[str, Any]]:
        return [
            img.serialize()
            for img in image_extraction(
                doc=ctx.doc,
                paragraph_selector=_PARAGRAPH,
                upper_boundary_selector=upper,
                image_selector=_IMAGE,
                author_selector=_CREDIT,
            )
        ]

    return fn


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


_COMMON = [
    Extractor("publishing_date", _publishing_date),
    Extractor("authors", _authors, default=list),
    Extractor("title", _title),
    Extractor("topics", _topics, default=list),
    Extractor("free_access", _free_access, default=False),
]

I_NEWS = PublisherSpec(
    key="uk.iNews",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2025, 1, 1),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_SUMMARY)),
                    Extractor("images", _images(_V1_UPPER), default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [
                    Extractor("body", _body(_V11_SUMMARY)),
                    Extractor("images", _images(_V11_UPPER), default=list),
                ]
                + _COMMON
            ),
        ),
    ),
)
