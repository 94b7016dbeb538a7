"""CNBC rule spec — semantics per reference
``src/fundus/publishers/us/cnbc.py`` (single V1; ``key_points`` is an
unvalidated extra attribute).
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
    generic_author_parsing,
    generic_date_parsing,
    generic_topic_parsing,
)

_SUBHEAD = CSSSelector("div[data-module = 'ArticleBody'] > h2")
_PARAGRAPH = XPath("//div[@data-module='ArticleBody'] / div[@class='group'] / p[text()]")
_KEY_POINTS = CSSSelector("div.RenderKeyPoints-list li")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(ctx.doc, subheadline_selector=_SUBHEAD, paragraph_selector=_PARAGRAPH)


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.xpath_search("NewsArticle/author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.xpath_search("NewsArticle/datePublished", scalar=True))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.xpath_search("NewsArticle/headline", scalar=True)


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("keywords"))


def _key_points(ctx: ParseContext) -> List[str]:
    return [node.text_content() for node in _KEY_POINTS(ctx.doc)]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


CNBC = PublisherSpec(
    key="us.CNBC",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title),
                Extractor("topics", _topics, default=list),
                Extractor("key_points", _key_points, default=list, validate=False),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
