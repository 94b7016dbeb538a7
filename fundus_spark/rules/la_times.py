"""LA Times rule spec — semantics per reference
``src/fundus/publishers/us/la_times.py`` (single V1).
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
    image_extraction,
)

_SUBHEAD = CSSSelector(
    "div[data-element*=story-body] h3[class*=story-title], div[data-element*=story-body] h2[class=subhead]"
)
_PARAGRAPH = CSSSelector("div[data-element*=story-body] > p")
_UPPER = XPath("//div[@class='page-lead']|//h1[@class='headline']")
_CAPTION = XPath("./ancestor::figure//div[@class='figure-caption']")
_CREDIT = XPath("./ancestor::figure//div[@class='figure-credit']")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(ctx.doc, paragraph_selector=_PARAGRAPH, subheadline_selector=_SUBHEAD)


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            upper_boundary_selector=_UPPER,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


LA_TIMES = PublisherSpec(
    key="us.LATimes",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("publishing_date", _publishing_date),
                Extractor("authors", _authors, default=list),
                Extractor("title", _title),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
