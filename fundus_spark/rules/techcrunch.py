"""TechCrunch rule spec — semantics per reference
``src/fundus/publishers/us/techcrunch.py`` (V1 valid until 2024-05-08,
V1_1 after), re-expressed over the from-scratch kernel.
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

_V1_SUMMARY = CSSSelector("div.article-content > p#speakable-summary")
_V1_PARAGRAPH = CSSSelector("div.article-content > p:not(#speakable-summary), div.article-content > ul > li")
_V1_SUBHEAD = CSSSelector("div.article-content > h2")

_V11_SUMMARY = CSSSelector("div.entry-content > p#speakable-summary")
_V11_PARAGRAPH = CSSSelector("div.entry-content > p:not(#speakable-summary), div.entry-content > ul > li")
_V11_SUBHEAD = CSSSelector("div.entry-content > h2")

_V11_UPPER = XPath(
    "//div[@class='article-hero__first-section']|"
    "//div[@class='is-floating wp-block-techcrunch-social-share']|"
    "//h1[@class='wp-block-post-title']"
)
_V11_CAPTION = XPath("./ancestor::figure//figcaption")
_V11_CREDIT = re.compile(r"(?i)image credits:(?P<credits>.*)")


def _body(summary, paragraph, subhead):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            summary_selector=summary,
            paragraph_selector=paragraph,
            subheadline_selector=subhead,
        )

    return fn


def _title(ctx: ParseContext) -> Optional[str]:
    if headline := ctx.meta.get("og:title"):
        return headline.replace(" | TechCrunch", "")
    return None


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _authors_v1(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("sailthru.author"))


def _topics_v1(ctx: ParseContext) -> List[str]:
    if topics := generic_topic_parsing(ctx.meta.get("keywords")):
        return topics
    return generic_topic_parsing(ctx.meta.get("sailthru.tags"))


def _authors_v11(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("author"))


def _topics_v11(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.ld.bf_search("keywords"))


def _images_v11(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_V11_PARAGRAPH,
            upper_boundary_selector=_V11_UPPER,
            caption_selector=_V11_CAPTION,
            author_selector=_V11_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


_COMMON = [
    Extractor("publishing_date", _publishing_date),
    Extractor("title", _title),
    Extractor("free_access", _free_access, default=False),
]

TECHCRUNCH = PublisherSpec(
    key="us.TechCrunch",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2024, 5, 8),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD)),
                    Extractor("authors", _authors_v1, default=list),
                    Extractor("topics", _topics_v1, default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [
                    Extractor("body", _body(_V11_SUMMARY, _V11_PARAGRAPH, _V11_SUBHEAD)),
                    Extractor("authors", _authors_v11, default=list),
                    Extractor("topics", _topics_v11, default=list),
                    Extractor("images", _images_v11, default=list),
                ]
                + _COMMON
            ),
        ),
    ),
)
