"""Tageblatt rule spec — reference
``src/fundus/publishers/lu/tageblatt.py`` (V1 until 2026-01-06; V1 has
no topics attribute, V2 derives the topic from the og:title prefix).
"""

from __future__ import annotations

import datetime
import re
from typing import List

from ..kernel import (
    CSSSelector,
    Extractor,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    generic_author_parsing,
    generic_topic_parsing,
)
from ._common import date_from_ld, free_access, make_body, make_images, std_extractors, title_from_ld, title_from_meta

_BLOAT_AUTHORS = ["No Author", "Redaktion"]


def _authors(ctx: ParseContext) -> List[str]:
    return [author for author in generic_author_parsing(ctx.ld.bf_search("author")) if author not in _BLOAT_AUTHORS]


_V1_PARAGRAPH = XPath("//div[@class='text-content']/p[@class='text' and normalize-space(text())]")
_V1_SUMMARY = XPath("//p[contains(@class,'teaser__text')]")
_V1_SUBHEAD = XPath("//div[@class='text-content']//h2[contains(@class,'crosshead')]")

_V1_IMAGES = make_images(
    _V1_PARAGRAPH,
    upper_boundary_selector=CSSSelector("h1"),
    author_selector=re.compile(r"(?i)(Foto|Bild):\s*(?P<credits>.*)"),
)

_V2_PARAGRAPH = XPath("//div[@class='StoryShowBaseTextBox']/p")
_V2_SUBHEAD = XPath("//div[@class='StoryShowBaseTextBox']/h3")
_V2_SUMMARY = XPath("//p[@class='intro']")


def _topics_v2(ctx: ParseContext) -> List[str]:
    match = re.match(r"(?P<topic>[A-z]+)\s*\|", ctx.meta.get("og:title", ""))
    if match:
        return generic_topic_parsing(match.group("topic"))
    return []


_V2_IMAGES = make_images(
    _V2_PARAGRAPH,
    upper_boundary_selector=CSSSelector("h1"),
    author_selector=re.compile(r"(?i)(Foto|Bild)([:.])\s*(?P<credits>.*)"),
    relative_urls=True,
)

TAGEBLATT = PublisherSpec(
    key="lu.Tageblatt",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2026, 1, 6),
            extractors=(
                Extractor("body", make_body(_V1_PARAGRAPH, summary=_V1_SUMMARY, subheadline=_V1_SUBHEAD)),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", date_from_ld()),
                Extractor("title", title_from_meta("og:title")),
                Extractor("images", _V1_IMAGES, default=list),
                Extractor("free_access", free_access, default=False),
            ),
        ),
        VersionSpec(
            name="V2",
            extractors=std_extractors(
                body=make_body(_V2_PARAGRAPH, summary=_V2_SUMMARY, subheadline=_V2_SUBHEAD),
                authors=_authors,
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=_topics_v2,
                images=_V2_IMAGES,
            ),
        ),
    ),
)
