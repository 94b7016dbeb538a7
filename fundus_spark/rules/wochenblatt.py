"""Wochenblatt (Paraguay) rule spec — reference
``src/fundus/publishers/py/wochenblatt.py`` (author parsed from the
article's last line; no topics attribute).
"""

from __future__ import annotations

import re
from typing import List, Optional

from ..kernel import Extractor, ParseContext, PublisherSpec, VersionSpec, XPath, generic_author_parsing
from ._common import date_from_ld, free_access, make_body, make_images

_PARAGRAPH = XPath("//div[@class='entry-content']/p[position() < last() and not(b)]")
_SUBHEAD = XPath("//div[@class='entry-content']/*[(self::p or self::h3) and position() < last() and b]")
_AUTHOR = XPath("//div[@class='entry-content']/p[last()]")


def _authors(ctx: ParseContext) -> List[str]:
    authors = _AUTHOR(ctx.doc)
    if authors:
        author = authors[0].text_content().strip()
        if match := re.match(r"(?i)^wochenblatt\s*/\s*(?P<authors>([\w ]+))", author):
            return generic_author_parsing(match.group("authors"))
    return []


def _title(ctx: ParseContext) -> Optional[str]:
    return re.sub(r"(?i)\s*-\s*wochenblatt", "", ctx.meta.get("og:title") or "")


_IMAGES = make_images(_PARAGRAPH, image_selector=XPath("//div[@class='entry-content']//img"))

WOCHENBLATT = PublisherSpec(
    key="py.Wochenblatt",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", make_body(_PARAGRAPH, subheadline=_SUBHEAD)),
                Extractor("authors", _authors, default=list, priority=1),
                Extractor("publishing_date", date_from_ld()),
                Extractor("title", _title),
                Extractor("images", _IMAGES, default=list),
                Extractor("free_access", free_access, default=False),
            ),
        ),
    ),
)
