"""Berliner Zeitung rule spec — semantics per reference
``src/fundus/publishers/de/berliner_zeitung.py`` (V1 valid until
2026-04-23, V2 after; V2 rewrites ``<br>`` runs into paragraph tags
via a priority-1 ``@function`` before body assembly).
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
    generic_nodes_to_text,
    generic_topic_parsing,
    image_extraction,
    transform_breaks_to_tag,
)

_V1_PARAGRAPH = CSSSelector("div[id=articleBody] > p")
_V1_SUMMARY = CSSSelector("div[data-testid=article-header] > p")
_V1_SUBHEAD = CSSSelector("div[id=articleBody] > h2")
_V1_IMAGE = XPath("//div[not(contains(@class, 'author') or contains(@class, 'preview'))]/img")
_V1_CREDIT = XPath(
    "./ancestor::div[@class='article_image-container__Yo6Cx']//span[@class='article_image-container-source__rbsO4']"
)
_V1_CAPTION = XPath(
    "./ancestor::div[@class='article_image-container__Yo6Cx']//span[@class='article_image-container-caption__lZ5kc']"
)

_V2_PARAGRAPH = XPath("//article//p[contains(@class, 'leading-7') and text()]")
_V2_SUBHEAD = XPath("//article//h2")
_V2_SUMMARY = XPath("//article//p[contains(@class, 'font-roboto font-normal')]")
_V2_IMAGE = XPath("//div[not(contains(@class, 'w-[48px] h-[48px]') or contains(@class, 'flex-shrink'))]/img")
_V2_TOPIC = XPath("//article//a[contains(@href, '/category/')]")
_V2_CREDIT = XPath(
    "./ancestor::div[@class='relative p-4 bg-blue-100' or @class='my-4']//p[contains(@class, 'text-gray-700')]"
)
_V2_CAPTION = XPath(
    "./ancestor::div[@class='relative p-4 bg-blue-100' or @class='my-4']//p[contains(@class, 'text-gray-800')]"
)


def _body(summary, paragraph, subhead):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            paragraph_selector=paragraph,
            subheadline_selector=subhead,
            summary_selector=summary,
        )

    return fn


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("article:author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _topics_v1(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.ld.bf_search("keywords"))


def _topics_v2(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(generic_nodes_to_text(_V2_TOPIC(ctx.doc), normalize=True))


def _images(paragraph, image, caption, credit):
    def fn(ctx: ParseContext) -> List[Dict[str, Any]]:
        return [
            img.serialize()
            for img in image_extraction(
                doc=ctx.doc,
                paragraph_selector=paragraph,
                image_selector=image,
                caption_selector=caption,
                author_selector=credit,
            )
        ]

    return fn


def _preprocess_v2(ctx: ParseContext) -> None:
    for node in _V2_PARAGRAPH(ctx.doc):
        transform_breaks_to_tag(node, replace=True)


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


BERLINER_ZEITUNG = PublisherSpec(
    key="de.BerlinerZeitung",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2026, 4, 23),
            extractors=(
                Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD)),
                Extractor("title", _title),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("topics", _topics_v1, default=list),
                Extractor("images", _images(_V1_PARAGRAPH, _V1_IMAGE, _V1_CAPTION, _V1_CREDIT), default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
        VersionSpec(
            name="V2",
            extractors=(
                Extractor("_preprocess", _preprocess_v2, kind="function", priority=1),
                Extractor("body", _body(_V2_SUMMARY, _V2_PARAGRAPH, _V2_SUBHEAD)),
                Extractor("title", _title),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("topics", _topics_v2, default=list),
                Extractor("images", _images(_V2_PARAGRAPH, _V2_IMAGE, _V2_CAPTION, _V2_CREDIT), default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
