"""Sportschau rule spec — semantics per reference
``src/fundus/publishers/de/sportschau.py`` (single V1).
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

_SUMMARY = CSSSelector(
    "p[class='textabsatz columns twelve  m-ten  m-offset-one l-eight l-offset-two'] > strong"
)
_PARAGRAPH = CSSSelector("article >p.textabsatz:not(p.textabsatz:nth-of-type(1))")
_SUBHEAD = CSSSelector("article >h2")
_IMAGE = XPath("//article//picture[not(contains(@class,'--list'))]//img")
_LOWER = XPath("//div[contains(@class, 'back-to-top')]")
_ALT = XPath("./@title")
_CREDIT = re.compile(r"\|(?P<credits>.+)")
_CAPTION = XPath("./ancestor::div[contains(@class, 'absatzbild ')]/div[@class='absatzbild__info']")
_SIZE = re.compile(r"/[\dx]+-(?P<width>[0-9]+)/")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
        paragraph_selector=_PARAGRAPH,
    )


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.meta.get("date"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("keywords"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            image_selector=_IMAGE,
            lower_boundary_selector=_LOWER,
            alt_selector=_ALT,
            author_selector=_CREDIT,
            caption_selector=_CAPTION,
            size_pattern=_SIZE,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


SPORTSCHAU = PublisherSpec(
    key="de.SportSchau",
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
