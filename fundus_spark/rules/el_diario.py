"""elDiario.es rule spec — semantics per reference
``src/fundus/publishers/es/el_diario.py`` (single V1).
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
    generic_topic_parsing,
    image_extraction,
)

_PARAGRAPH = XPath("//div[@class='c-content']//p[@class='article-text']")
_SUBHEAD = XPath("//div[@class='c-content']//h2[@class='article-text']")
_SUMMARY = XPath(
    "//div[@class='news-header']//ul[@class='footer']//li[not(contains(@class, 'subtitle--hasAnchor'))]/h2[text()]"
)
_UPPER = XPath("//div[@class='row row__content']")
_LOWER = XPath("//div[@class='partner-wrapper']")
_IMAGE = XPath("//picture[@class='news-image']//img")
_CAPTION = XPath("./ancestor::figure//figcaption//span[@class='title']/text()")
_CREDIT = XPath("./ancestor::figure//figcaption//span[@class='title']/span")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        paragraph_selector=_PARAGRAPH,
        subheadline_selector=_SUBHEAD,
        summary_selector=_SUMMARY,
    )


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.bf_search("headline")


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _topics(ctx: ParseContext) -> List[str]:
    return [topic.split("/")[-1] for topic in generic_topic_parsing(ctx.meta.get("keywords"))]


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            upper_boundary_selector=_UPPER,
            lower_boundary_selector=_LOWER,
            image_selector=_IMAGE,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
            relative_urls=True,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


EL_DIARIO = PublisherSpec(
    key="es.ElDiario",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title),
                Extractor("authors", _authors, default=list),
                Extractor("topics", _topics, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
