"""Synthetic RICH rule (tool key ``rich``) — NOT a reference
publisher. Exists to oracle-gate three kernel paths end-to-end through
a non-generic rule (VERDICT r2 §Next-round #8): JSON-LD
``datePublished`` via ``xpath_search``, a priority-1 ``<br>`` rewrap
(``transform_breaks_to_tag`` with ``replace=True``, the same utility
the reference's rewrap publishers call, utility.py:315-377), and
srcset-driven image extraction. The matching synthetic documents come
from ``sources/rich_html.py``; the DuckDB oracle is
``_RICH_SQL`` in ``__spark_entry__.py``."""

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
    generic_author_parsing,
    generic_date_parsing,
    image_extraction,
    transform_breaks_to_tag,
)

_PARAGRAPH = XPath("//div[@class='article-body']//p[text()]")
_IMAGE = XPath("//div[@class='article-media']//img")
_BR_TEXT = CSSSelector("div.br-text")


def _preprocess(ctx: ParseContext) -> None:
    for node in _BR_TEXT(ctx.doc):
        transform_breaks_to_tag(node, tag="p", replace=True)


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(ctx.doc, paragraph_selector=_PARAGRAPH)


def _title(ctx: ParseContext) -> Optional[str]:
    title = ctx.ld.xpath_search("//NewsArticle/headline", scalar=True)
    return str(title) if title else None


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.xpath_search("//NewsArticle/author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.xpath_search("//NewsArticle/datePublished", scalar=True))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            image_selector=_IMAGE,
        )
    ]


RICH = PublisherSpec(
    key="rich",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("_preprocess", _preprocess, kind="function", priority=1),
                Extractor("body", _body),
                Extractor("title", _title),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("images", _images, default=list),
            ),
        ),
    ),
)
