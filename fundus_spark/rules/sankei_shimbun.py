"""Sankei Shimbun rule spec — reference
``src/fundus/publishers/jp/sankei_shimbun.py``.
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import (
    CSSSelector,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    generic_author_parsing,
    generic_nodes_to_text,
    generic_topic_parsing,
)
from ._common import date_from_ld, make_body, make_images, std_extractors, title_from_meta

_PARAGRAPH = XPath(
    "//div[contains(@class, 'article-body')] "
    "/p[contains(@class, 'article-text ') and (text() or not(child::a))]"
)
_SUBHEAD = CSSSelector("div.article-body > h2")
_TOPIC = CSSSelector("ul.section-list > li")


def _authors(ctx: ParseContext) -> List[str]:
    return [author for author in generic_author_parsing(ctx.meta.get("author")) if "産経新聞" not in author]


def _topics(ctx: ParseContext) -> List[str]:
    if topic_nodes := _TOPIC(ctx.doc):
        return generic_topic_parsing("・".join(generic_nodes_to_text(topic_nodes)), "・")
    return []


_IMAGES = make_images(
    _PARAGRAPH,
    lower_boundary_selector=CSSSelector("div.article-footer-wrapper"),
    author_selector=re.compile(r"（.*?(?P<credits>[^（、]*?)撮影）"),
)

SANKEI_SHIMBUN = PublisherSpec(
    key="jp.SankeiShimbun",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, subheadline=_SUBHEAD),
                authors=_authors,
                date=date_from_ld(),
                title=title_from_meta("og:title"),
                topics=_topics,
                images=_IMAGES,
            ),
        ),
    ),
)
