"""Israel Nachrichten rule spec — reference
``src/fundus/publishers/il/israel_nachrichten.py`` (no topics, no
images attributes).
"""

from __future__ import annotations

from typing import List, Optional

from ..kernel import Extractor, ParseContext, PublisherSpec, VersionSpec, XPath, generic_author_parsing
from ._common import date_from_meta, free_access, make_body

_PARAGRAPH = XPath("//div[@id='main']/div[@class]/p[text()]")
_SUMMARY = XPath("//div[@id='main']/div[@class]/p/strong")
_TITLE = XPath("//div[@id='main']/div[@class]/h1")
_AUTHOR = XPath("//div[@id='main']/div[@class]/p/em")


def _authors(ctx: ParseContext) -> List[str]:
    if authors := _AUTHOR(ctx.doc):
        return generic_author_parsing(authors[0].text_content())
    return []


def _title(ctx: ParseContext) -> Optional[str]:
    nodes = _TITLE(ctx.doc)
    return nodes[0].text_content().strip() if nodes else None


ISRAEL_NACHRICHTEN = PublisherSpec(
    key="il.IsraelNachrichten",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", make_body(_PARAGRAPH, summary=_SUMMARY)),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", date_from_meta("article:published_time")),
                Extractor("title", _title),
                Extractor("free_access", free_access, default=False),
            ),
        ),
    ),
)
