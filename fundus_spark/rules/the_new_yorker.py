"""The New Yorker rule spec — semantics per reference
``src/fundus/publishers/us/the_new_yorker.py`` (single V1; several
unvalidated extras).
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

_SUMMARY = XPath("//div[contains(@class, 'ContentHeaderDek')]")
_PARAGRAPH = CSSSelector("div.body__inner-container > p")

_IMAGE = XPath("//picture//img")
_CAPTION = XPath(
    "./ancestor::*[self::figure or self::header]"
    "//*[(self::span and contains(@class, 'caption__text')) or (self::div and contains(@class, '__caption'))]"
)
_CREDIT = XPath(
    "(./ancestor::*[self::figure or self::header]"
    "//*[(self::span and contains(@class, 'caption__credit')) or (self::div and contains(@class, '__credit'))])[last()]"
)


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(ctx.doc, summary_selector=_SUMMARY, paragraph_selector=_PARAGRAPH)


def _description(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:description")


def _alternative_description(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.xpath_search("NewsArticle/description", scalar=True)


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.xpath_search("NewsArticle/author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.xpath_search("NewsArticle/datePublished", scalar=True))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.xpath_search("NewsArticle/headline", scalar=True)


def _alternative_title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.xpath_search("NewsArticle/alternativeHeadline", scalar=True)


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("keywords"))


def _section(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.xpath_search("NewsArticle/articleSection", scalar=True)


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            image_selector=_IMAGE,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


THE_NEW_YORKER = PublisherSpec(
    key="us.TheNewYorker",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("description", _description, validate=False),
                Extractor("alternative_description", _alternative_description, validate=False),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title),
                Extractor("alternative_title", _alternative_title, validate=False),
                Extractor("topics", _topics, default=list),
                Extractor("section", _section, validate=False),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
