"""Corriere della Sera rule spec — semantics per reference
``src/fundus/publishers/it/corriere_della_sera.py`` (single V1;
topics from the BreadcrumbList LD with a wildcard path step).
"""

from __future__ import annotations

import datetime
import re
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

_SUMMARY = XPath("//p[contains(@class, 'summary')]")
_PARAGRAPH = XPath("//p[@class='chapter-paragraph' and text()]")
_SUBHEAD = XPath("//h2[contains(@class, 'native-summary-content')]")
_CREDIT = re.compile(r"\(foto (?P<credits>.*)\)\s*$")


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.bf_search("headline")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        paragraph_selector=_PARAGRAPH,
        subheadline_selector=_SUBHEAD,
    )


def _authors(ctx: ParseContext) -> List[str]:
    authors = ctx.ld.xpath_search("//NewsArticle/author")
    if authors:
        return generic_author_parsing(authors)
    return []


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.xpath_search("//NewsArticle/datePublished", scalar=True))


def _topics(ctx: ParseContext) -> List[str]:
    breadcrumb_items = ctx.ld.xpath_search("//BreadcrumbList/itemListElement/*/name")
    if breadcrumb_items:
        return generic_topic_parsing(breadcrumb_items[1:])
    section = ctx.ld.xpath_search("//NewsArticle/articleSection", scalar=True)
    if section:
        return generic_topic_parsing([section])
    return []


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(doc=ctx.doc, paragraph_selector=_PARAGRAPH, author_selector=_CREDIT)
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


CORRIERE_DELLA_SERA = PublisherSpec(
    key="it.CorriereDellaSera",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("title", _title),
                Extractor("body", _body),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("topics", _topics, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
