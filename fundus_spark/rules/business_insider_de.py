"""Business Insider DE rule spec — semantics per reference
``src/fundus/publishers/de/business_insider_de.py`` (single V1).
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

_SUMMARY = CSSSelector("article div.bi-bulletpoints li, article div.bi-bulletpoints > p")
_SUBHEAD = CSSSelector("article > div > h2, article > div > h3")
_PARAGRAPH = XPath(
    """
    //article
    //div[
        contains(@class, 'article-body')
        or contains(@class, 'piano-article')]
    /p[
        not(ancestor::*[@class='bi-bulletpoints']
            or mark[@class='has-inline-color has-cyan-bluish-gray-color']
            or @class='has-text-align-right')]
    """
)
_IMAGE = XPath("//img[not(contains(@class, 'size-thumbnail-square'))]")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
        paragraph_selector=_PARAGRAPH,
    )


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("keywords")) or generic_topic_parsing(ctx.ld.bf_search("keywords"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(doc=ctx.doc, paragraph_selector=_PARAGRAPH, image_selector=_IMAGE)
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


BUSINESS_INSIDER_DE = PublisherSpec(
    key="de.BusinessInsiderDE",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title),
                Extractor("topics", _topics, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
