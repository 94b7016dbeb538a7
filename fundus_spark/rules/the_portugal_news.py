"""The Portugal News rule spec — reference
``src/fundus/publishers/pt/the_portugal_news.py`` (authors attribute
deprecated 2025-10-21; no topics attribute).
"""

from __future__ import annotations

import datetime
import re
from typing import List

from ..kernel import Extractor, ParseContext, PublisherSpec, VersionSpec, XPath, generic_author_parsing
from ._common import date_from_ld, free_access, make_body, make_images, title_from_ld

_PARAGRAPH = XPath("//div[@class='article-body']//p[string-length(text())>1]")
_SUBHEAD = XPath("//div[@class='article-body']/p/b[not(u)]")
_SUMMARY = XPath("//div[@class='fs-4 font-semibold mb-3']")
_AUTHOR = XPath("//div[@class='col-lg-10 order-lg-1']/p//text()")


def _authors(ctx: ParseContext) -> List[str]:
    author_objects = _AUTHOR(ctx.doc)
    if author_objects and (author := re.search(r"(?i)by\s*(?P<authors>.*),[\r\sr\n]*in", author_objects[0].value)):
        return generic_author_parsing(author.group("authors"))
    return []


_IMAGES = make_images(_PARAGRAPH, author_selector=re.compile(r"(?i)credits:\s*(?P<credits>.*)"))

THE_PORTUGAL_NEWS = PublisherSpec(
    key="pt.ThePortugalNews",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD)),
                Extractor("publishing_date", date_from_ld()),
                Extractor("title", title_from_ld("headline")),
                Extractor("authors", _authors, default=list, deprecated=datetime.date(2025, 10, 21)),
                Extractor("images", _IMAGES, default=list),
                Extractor("free_access", free_access, default=False),
            ),
        ),
    ),
)
