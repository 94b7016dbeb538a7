"""Les Echos rule spec — semantics per reference
``src/fundus/publishers/fr/les_echos.py`` (single V1).
"""

from __future__ import annotations

import datetime
import re
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
    generic_nodes_to_text,
    image_extraction,
    normalize_whitespace,
)

_SUMMARY = CSSSelector("article header > p")
_SUBHEAD = CSSSelector("article div.post-paywall > h3")
_BLOAT = r"^\s*Pour ne rien rater de l'actualité politique"
_PARAGRAPH = XPath(
    f'//article //div[contains(@class, "post-paywall")] /p[not(re:test(string(), "{_BLOAT}"))]'
)
_TOPIC = CSSSelector("header div.sc-108qdzy-3 div.sc-108qdzy-2 > div")
_CREDIT = re.compile(r"\((?P<credits>.*?)\)$")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        paragraph_selector=_PARAGRAPH,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
    )


def _title(ctx: ParseContext) -> Optional[str]:
    if title := ctx.meta.get("og:title"):
        return normalize_whitespace(title)
    return None


def _topics(ctx: ParseContext) -> List[str]:
    return [normalize_whitespace(text) for text in generic_nodes_to_text(_TOPIC(ctx.doc))]


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.meta.get("article:published_time") or ctx.ld.bf_search("datePublished"))


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(doc=ctx.doc, paragraph_selector=_PARAGRAPH, author_selector=_CREDIT)
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


LES_ECHOS = PublisherSpec(
    key="fr.LesEchos",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("title", _title),
                Extractor("topics", _topics, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("authors", _authors, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
