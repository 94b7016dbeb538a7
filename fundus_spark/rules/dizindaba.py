"""Dizindaba rule spec — reference
``src/fundus/publishers/za/dizindaba.py`` (author parsed from the first
body paragraph's 'INTATHELI:/BY:' prefix; no topics attribute).
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import Extractor, ParseContext, PublisherSpec, VersionSpec, XPath, generic_author_parsing
from ._common import date_from_ld, free_access, make_body, make_images, title_from_ld

_AUTHOR_PATTERN = r"(?i)(intatheli|by):(?P<author>[A-z\s]*)\|"
_COMPILED_AUTHOR = re.compile(_AUTHOR_PATTERN)

_PARAGRAPH = XPath(
    f"//div[@itemprop='articleBody']/p[not(re:test(string(),'{_AUTHOR_PATTERN}')) and text()]"
)
_SUBHEAD = XPath("//div[@itemprop='articleBody']/p[not(position()>1 or text())]/strong")
_FIRST_P_TEXT = XPath("//div[@itemprop='articleBody']/p[1]/text()")


def _authors(ctx: ParseContext) -> List[str]:
    candidates = _FIRST_P_TEXT(ctx.doc)
    if candidates and (match := _COMPILED_AUTHOR.search(candidates[0].value)):
        return generic_author_parsing(match.group("author"))
    return generic_author_parsing(ctx.ld.bf_search("author"))


_IMAGES = make_images(_PARAGRAPH, upper_boundary_selector=XPath("//article"))

DIZINDABA = PublisherSpec(
    key="za.Dizindaba",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", make_body(_PARAGRAPH, subheadline=_SUBHEAD)),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", date_from_ld()),
                Extractor("title", title_from_ld("headline")),
                Extractor("images", _IMAGES, default=list),
                Extractor("free_access", free_access, default=False),
            ),
        ),
    ),
)
