"""Nature rule spec — semantics per reference
``src/fundus/publishers/uk/nature.py`` (V1 valid until 2026-02-01,
V1_1 after; custom paywall-based free_access).
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
    generic_topic_parsing,
    image_extraction,
)

_V1_SUMMARY = CSSSelector("div.c-article-abstract p, p.c-article-abstract")
_V1_PARAGRAPH = XPath(
    "//div[@data-test='access-teaser']//p"
    "["
    "  not(ancestor::*[@data-label='Related' or contains(@class, 'recommended')])"
    "  and not(contains(@class, 'recommended__title'))"
    "  and not(ancestor::figure)"
    "  and not(ancestor::figcaption)"
    "  and not(ancestor::a)"
    "]"
)
_V1_SUBHEAD = XPath("//div[@data-test='access-teaser']//h2[not(ancestor::article[contains(@class, 'recommended')])]")
_V1_LOWER = XPath(
    "(//*[(@class='app-access-wall') or "
    "contains(@class, 'c-related-articles') or "
    "(self::article and contains(@class, 'related'))])[1]"
)
_V1_PAYWALL = XPath("//div[@class='app-access-wall__container']")

_V11_PARAGRAPH = XPath(
    "//div[@data-test='main-content' or contains(@class,'main-content')]//p"
    "["
    "  not(ancestor::*[@data-label='Related' or contains(@class, 'recommended')])"
    "  and not(contains(@class, 'recommended__title'))"
    "  and not(ancestor::figure)"
    "  and not(ancestor::figcaption)"
    "  and not(ancestor::a)"
    "  and not(contains(@class, 'app-access-wall'))"
    "  and text()"
    "] |"
    "//div[@class='c-article-body']/section//p |"
    "//p[@class='article__teaser']"
)
_V11_SUMMARY = XPath("//div[@class='c-article-teaser-text']")
_V11_SUBHEAD = XPath(
    "//div[@data-test='main-content' or contains(@class,'main-content')]"
    "//h2"
    "["
    "not(ancestor::article[contains(@class, 'recommended')])"
    "  and not(contains(@class, 'app-access-wall'))"
    "  and not(@id='access-options')"
    "] |"
    "//div[@class='c-article-body']/section//h2"
)
_V11_LOWER = XPath("(//aside)[2]")
_V11_PAYWALL = XPath("//div[contains(@class, 'buybox')]")

_CAPTION = XPath("./ancestor::figure//figcaption")
_CREDIT = re.compile(r"(?i)\s*(credit|source|illustration|analysis by):?\s+(?P<credits>.*)")
_BLOAT_TOPICS = {"multidisciplinary", "Science", "Humanities and Social Sciences"}


def _body(summary, paragraph, subhead):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            summary_selector=summary,
            subheadline_selector=subhead,
            paragraph_selector=paragraph,
        )

    return fn


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.bf_search("headline")


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.ld.bf_search("keywords"), result_filter=_BLOAT_TOPICS)


def _free_access(paywall):
    def fn(ctx: ParseContext) -> bool:
        return not bool(paywall(ctx.doc))

    return fn


def _images(paragraph, lower):
    def fn(ctx: ParseContext) -> List[Dict[str, Any]]:
        return [
            img.serialize()
            for img in image_extraction(
                doc=ctx.doc,
                paragraph_selector=paragraph,
                relative_urls=True,
                caption_selector=_CAPTION,
                author_selector=_CREDIT,
                lower_boundary_selector=lower,
            )
        ]

    return fn


_NATURE_COMMON = [
    Extractor("publishing_date", _publishing_date),
    Extractor("authors", _authors, default=list),
    Extractor("title", _title),
    Extractor("topics", _topics, default=list),
]

NATURE = PublisherSpec(
    key="uk.Nature",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2026, 2, 1),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD)),
                    Extractor("free_access", _free_access(_V1_PAYWALL), default=False),
                    Extractor("images", _images(_V1_PARAGRAPH, _V1_LOWER), default=list),
                ]
                + _NATURE_COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [
                    Extractor("body", _body(_V11_SUMMARY, _V11_PARAGRAPH, _V11_SUBHEAD)),
                    Extractor("free_access", _free_access(_V11_PAYWALL), default=False),
                    Extractor("images", _images(_V11_PARAGRAPH, _V11_LOWER), default=list),
                ]
                + _NATURE_COMMON
            ),
        ),
    ),
)
