"""SRF rule spec — semantics per reference
``src/fundus/publishers/ch/srf.py`` (V1 valid until 2024-12-03,
V2 after).
"""

from __future__ import annotations

import datetime
from typing import Any, Dict, List, Optional

from ..kernel import (
    Extractor,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    assemble_body,
    free_access_from_ld,
    generic_author_parsing,
    generic_date_parsing,
    image_extraction,
)

_TITLE = XPath("//span[@class='article-title__text']")
_AUTHOR = XPath("//span[@itemprop='author']")
_V1_PARAGRAPH = XPath(
    "//section[@class='article-content']//span[@class='blockquote__text'] | "
    "//section[@class='article-content']/p | "
    "//section[@class='article-content']/li | "
    "//section[@class='article-content']/ul/li"
)
_V1_SUMMARY = XPath("//header[@class='article-header']/p[@class='article-lead']")
_V1_SUBHEAD = XPath(
    "//section[@class='article-content']/h2 | "
    "//section[@class='article-content']//div[@id='ticker']//li//span[@itemprop='headline']"
)
_V1_CAPTION = XPath("./ancestor::figure//span[@class='media-caption__description']")
_V1_CREDIT = XPath("./ancestor::figure//span[@class='media-caption__source']")
_V1_IMAGE = XPath("//picture[@class='image ']//img")
_V1_LOWER = XPath("(//div[@class='sharing-bar__container'])[2]")

_V2_SUMMARY = XPath("//p[@class='article-lead'] |//ul[@class='article-list' and not(preceding-sibling::*)]/li")
_V2_PARAGRAPH = XPath("//p[@class='article-paragraph'] |//ul[@class='article-list' and preceding-sibling::*]/li")
_V2_SUBHEAD = XPath("//h2[@class='article-heading']|//h3[@class='article-subheading']")


def _body(summary, paragraph, subhead):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            summary_selector=summary,
            subheadline_selector=subhead,
            paragraph_selector=paragraph,
        )

    return fn


def _authors(ctx: ParseContext) -> List[str]:
    if not (author_nodes := _AUTHOR(ctx.doc)):
        return []
    if len(author_nodes) > 1:
        author_list = []
        for node in author_nodes:
            for author in node.text_content().split(";"):
                author_list.append(author)
        return generic_author_parsing(author_list)
    return generic_author_parsing([name for name in author_nodes[0].text_content().split(";")])


def _title(ctx: ParseContext) -> Optional[str]:
    if not (title_node := _TITLE(ctx.doc)):
        return None
    return title_node[0].text_content()


def _publishing_date_v1(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.meta.get("article:published_time"))


def _publishing_date_v2(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.meta.get("datePublished"))


def _images_v1(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_V1_PARAGRAPH,
            caption_selector=_V1_CAPTION,
            author_selector=_V1_CREDIT,
            image_selector=_V1_IMAGE,
            lower_boundary_selector=_V1_LOWER,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


SRF = PublisherSpec(
    key="ch.SRF",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2024, 12, 3),
            extractors=(
                Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD)),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date_v1),
                Extractor("title", _title),
                Extractor("images", _images_v1, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
        VersionSpec(
            name="V2",
            extractors=(
                Extractor("body", _body(_V2_SUMMARY, _V2_PARAGRAPH, _V2_SUBHEAD)),
                Extractor("authors", _authors, default=list),
                Extractor("title", _title),
                Extractor("publishing_date", _publishing_date_v2),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
