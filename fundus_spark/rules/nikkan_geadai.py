"""Nikkan Geadai rule spec — reference
``src/fundus/publishers/jp/nikkan_geadai.py`` (priority-0 ``<br>``
rewrap of the single full-text node into ``p.br-wrap`` children).
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import (
    CSSSelector,
    Extractor,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    generic_topic_parsing,
    transform_breaks_to_tag,
)
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_ld

_PARAGRAPH = XPath("//div[@class='article-wrap'] //p[@class='full-text'] /p[@class='br-wrap' and text()]")
_FULL_TEXT = CSSSelector("div.article-wrap p.full-text")
_TOPIC = XPath("//main //div[contains(@class, 'm-keyword-list')] /ul /li //text()")


def _transform_br_element(ctx: ParseContext) -> None:
    if nodes := _FULL_TEXT(ctx.doc):
        if len(nodes) != 1:
            raise ValueError("Expected exactly one node")
        transform_breaks_to_tag(nodes[0], __class__="br-wrap")


def _topics(ctx: ParseContext) -> List[str]:
    if topics := _TOPIC(ctx.doc):
        return generic_topic_parsing([t.value for t in topics])
    return []


_IMAGES = make_images(
    _PARAGRAPH,
    upper_boundary_selector=CSSSelector("div.article-wrap"),
    author_selector=re.compile(r"（Ｃ）(?P<credits>.*?)\s*$"),
)

NIKKAN_GEADAI = PublisherSpec(
    key="jp.NikkanGeadai",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=_topics,
                images=_IMAGES,
                extra=(Extractor("_transform_br_element", _transform_br_element, kind="function", priority=0),),
            ),
        ),
    ),
)
