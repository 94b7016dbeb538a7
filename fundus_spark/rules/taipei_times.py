"""Taipei Times rule spec — reference
``src/fundus/publishers/tw/taipei_times.py`` (no topics attribute).
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import Extractor, ParseContext, PublisherSpec, VersionSpec, XPath, generic_author_parsing
from ._common import date_from_ld, free_access, make_body, make_images, title_from_ld

_PARAGRAPH = XPath(r"//div[@class='archives']/p[not(re:test(text(), '(?i)^（by.*）\s*$'))]")
_SUMMARY = XPath("//div[@class='archives']/h2")
_AUTHOR = XPath("//div[@class='archives']//div[@class='name']/text()")


def _authors(ctx: ParseContext) -> List[str]:
    author_selection = _AUTHOR(ctx.doc)
    if not author_selection:
        return []
    selection = re.sub(
        r"(?is)(^by|/.*|staff reporter|(,?\s*with\s*)?staff writer.*)", "", author_selection[0].value
    )
    return generic_author_parsing(selection, split_on=[r"\s+and\s+"])


_IMAGES = make_images(
    _PARAGRAPH,
    upper_boundary_selector=XPath("//div[@class='archives']"),
    image_selector=XPath("//div[@class='imgboxa']//img"),
    caption_selector=XPath("./ancestor::div[@class='imgboxa']//h1"),
    author_selector=XPath("./ancestor::div[@class='imgboxa']//p"),
)

TAIPEI_TIMES = PublisherSpec(
    key="tw.TaipeiTimes",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", make_body(_PARAGRAPH, summary=_SUMMARY)),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", date_from_ld()),
                Extractor("title", title_from_ld("headline")),
                Extractor("images", _IMAGES, default=list),
                Extractor("free_access", free_access, default=False),
            ),
        ),
    ),
)
