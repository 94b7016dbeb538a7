"""Jyllands-Posten rule spec — reference
``src/fundus/publishers/dk/jyllands_posten.py`` (no topics attribute;
title from the first h1 text node).
"""

from __future__ import annotations

import re
from typing import List, Optional

from ..kernel import Extractor, ParseContext, PublisherSpec, VersionSpec, XPath, generic_author_parsing
from ._common import date_from_meta, free_access, make_body, make_images

_PARAGRAPH = XPath(
    "//section/article/div[contains(@class, 'c-article-inline')]"
    "/div[contains(@class, 'c-article-inline')]"
    "/div[contains(@class, 'c-article-inline')]"
    "/div/div/p | "
    "//article/p[contains(@class, '-text') and text()]"
)
_SUMMARY = XPath("//header/p")
_SUBHEAD = XPath(
    "//section/article/div[contains(@class, 'c-article-inline')]"
    "/div[contains(@class, 'c-article-inline')]"
    "/div[contains(@class, 'c-article-inline')]"
    "/div/div/h3 | "
    "//article/h3"
)
_HEADLINE = XPath("//h1/text()")


def _title(ctx: ParseContext) -> Optional[str]:
    headlines = _HEADLINE(ctx.doc)
    if headlines:
        return headlines[0].value.strip()
    return None


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author") or ctx.meta.get("author"), split_on=["/"])


_IMAGES = make_images(
    _PARAGRAPH,
    author_selector=re.compile(r"\s*(Foto|Arkivfoto):\s*(?P<credits>.*)\.?"),
)

JYLLANDS_POSTEN = PublisherSpec(
    key="dk.JyllandsPosten",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD)),
                Extractor("title", _title),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", date_from_meta("article:published_time")),
                Extractor("images", _IMAGES, default=list),
                Extractor("free_access", free_access, default=False),
            ),
        ),
    ),
)
