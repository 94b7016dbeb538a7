"""Gamestar rule spec — semantics per reference
``src/fundus/publishers/de/gamestar.py`` (single V1).
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
    image_extraction,
)

_SUMMARY = CSSSelector("p.intro")
_PARAGRAPH = CSSSelector("div.article-content > p:not([class])")
_SUBHEAD = CSSSelector("div.article-content > h2")
_UPPER = XPath("//div[@class='main waypoint']")
_IMAGE = XPath("//picture/img")
_CAPTION = XPath("./ancestor::p[@class='caption ']/span[@class='bu m-t-1']")
_LOWER = XPath("//div[@id='comments']")
_CREDIT = re.compile("(?i)Bildquelle:(?P<credits>.*)")


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        paragraph_selector=_PARAGRAPH,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
    )


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            upper_boundary_selector=_UPPER,
            image_selector=_IMAGE,
            caption_selector=_CAPTION,
            lower_boundary_selector=_LOWER,
            author_selector=_CREDIT,
            relative_urls=True,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


GAMESTAR = PublisherSpec(
    key="de.Gamestar",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("title", _title),
                Extractor("body", _body),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
