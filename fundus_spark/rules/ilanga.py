"""Ilanga rule spec — reference ``src/fundus/publishers/za/ilanga.py``
(author pulled from a leading emphasized/short paragraph; masthead
suffix stripped off the LD headline; no topics attribute).
"""

from __future__ import annotations

import re
from typing import List, Optional

from ..kernel import (
    Extractor,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    generic_author_parsing,
    strip_nodes_to_text,
)
from ._common import date_from_ld, free_access, make_body, make_images

_PARAGRAPH = XPath(
    r"(//div[contains(@class,'post_content')]//p["
    r"string() and "
    r"not(position()<4 and strong and not(text())) and "
    # reference concatenates to 'andnot(' — a libxml2 scanner quirk
    # parses that as 'and not('; spelled with the space here
    r"not(position()<4 and string-length(text()) - string-length(translate(text(), ' ', '')) < 3) and "
    r"not(re:test(text(), '^\s*[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z.]{2,}\s*$'))"
    r"])[not(strong and not(text()) and preceding-sibling::*[position()=1 and self::figure])]"
)

_AUTHOR = XPath(
    "(//div[contains(@class,'post_content')]//p["
    "string() and position()<4])[(strong and not(text())) or "
    "string-length(text()) - string-length(translate(text(), ' ', '')) < 3"
    "]"
)

_TITLE_BLOAT = re.compile(r"(?i)\s*-\s*ilanga news")


def _authors(ctx: ParseContext) -> List[str]:
    if authors := generic_author_parsing(strip_nodes_to_text(_AUTHOR(ctx.doc))):
        return authors
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _title(ctx: ParseContext) -> Optional[str]:
    return re.sub(_TITLE_BLOAT, "", ctx.ld.bf_search("headline"))


_IMAGES = make_images(
    _PARAGRAPH,
    upper_boundary_selector=XPath("//div[contains(@class,'post_content')]"),
    lower_boundary_selector=XPath("//div[@class='dtb-related-posts']"),
    caption_selector=XPath("(./ancestor::figure/following-sibling::p[position()=1])[strong and not(text())]"),
)

ILANGA = PublisherSpec(
    key="za.Ilanga",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", make_body(_PARAGRAPH)),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", date_from_ld()),
                Extractor("title", _title),
                Extractor("images", _IMAGES, default=list),
                Extractor("free_access", free_access, default=False),
            ),
        ),
    ),
)
