"""Der Postillon rule spec — semantics per reference
``src/fundus/publishers/de/postillon.py`` (single V1).

Round 2: full golden parity — the former image-position delta was a
missing libxml2 behavior (implied <body>+<p> on >=1000-char whitespace
runs / noscript-in-head nesting), now reproduced in kernel/dom.py.
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
    generic_date_parsing,
    image_extraction,
)

_PARAGRAPH = CSSSelector("div[id=post-body] p")
_POSTSCRIPT = CSSSelector("div[id=post-body] > span")
_IMAGE = XPath("//div[@class='entry-content-wrap flex-col']//img")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(ctx.doc, paragraph_selector=_PARAGRAPH)


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _authors(ctx: ParseContext) -> List[str]:
    postscript = _POSTSCRIPT(ctx.doc)
    if not postscript:
        return []
    author_line = postscript[0].text_content().split(";")[0]
    return [a.strip() for a in author_line.split(",")]


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(doc=ctx.doc, paragraph_selector=_PARAGRAPH, image_selector=_IMAGE)
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


POSTILLON = PublisherSpec(
    key="de.Postillon",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("title", _title),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
