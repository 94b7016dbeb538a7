"""Correctiv rule spec — semantics per reference
``src/fundus/publishers/de/correctiv.py`` (single V1; image credits
tried against a list of regex patterns in order).
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
    generic_nodes_to_text,
    generic_topic_parsing,
    image_extraction,
)

_SUMMARY = XPath("//p[@class='detail__excerpt']")
_SUBHEAD = XPath("//div[@class='detail__content']/*[self::h3 or self::h2]")
_PARAGRAPH = XPath("//div[@class='detail__content']/p[string-length(text())>1 or span]")
_AUTHOR = XPath("//p[@class='detail__authors']/a")
_IMAGE = XPath("//figure[@id]/img | //figure[@class='figure']/picture/img")
_CREDITS = [
    re.compile(
        r"(?i)(?<=\. )((foto|credit image|bild|image|symbolbild):|©)?\s*(?P<credits>([^.:]|CORRECTIV\.|.com)+?)([.])?$"
    ),
    re.compile(r"\((.+:)?(?P<credits>[^):]+?)\)$"),
    re.compile(r"/(?P<credits>.+)$"),
]


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
        paragraph_selector=_PARAGRAPH,
    )


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(generic_nodes_to_text(_AUTHOR(ctx.doc)))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.xpath_search("//NewsArticle/headline", scalar=True)


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("keywords"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            image_selector=_IMAGE,
            author_selector=_CREDITS,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


CORRECTIV = PublisherSpec(
    key="de.Correctiv",
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
