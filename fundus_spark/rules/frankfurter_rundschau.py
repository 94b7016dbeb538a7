"""Frankfurter Rundschau rule spec — semantics per reference
``src/fundus/publishers/de/frankfurter_rundschau.py`` (single V1).
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

_PARAGRAPH = XPath(
    "//p[@class='id-StoryElement-paragraph'] | "
    "//p[contains(@class,'id-Article-content-item-paragraph') and text()] |"
    "//div[@class='id-Article-body']//ul/li[not(@class='id-AuthorList-item ')]"
)
_SUMMARY = CSSSelector(
    "p.id-StoryElement-leadText, p[class='id-Article-content-item id-Article-content-item-summary']"
)
_SUBHEAD = CSSSelector("h2.id-StoryElement-crosshead, span.id-Article-content-item-headline-text")
_UPPER = CSSSelector("article")
_CREDIT = re.compile(r"©(?P<credits>.+)")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        paragraph_selector=_PARAGRAPH,
        subheadline_selector=_SUBHEAD,
        summary_selector=_SUMMARY,
    )


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            upper_boundary_selector=_UPPER,
            author_selector=_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


FRANKFURTER_RUNDSCHAU = PublisherSpec(
    key="de.FrankfurterRundschau",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
