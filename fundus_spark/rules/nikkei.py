"""The Nikkei rule spec — reference
``src/fundus/publishers/jp/nikkei.py`` (no authors attribute; topics
from header topic links split on ``・``).
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
    generic_nodes_to_text,
    generic_topic_parsing,
)
from ._common import date_from_ld, free_access, make_body, make_images, title_from_ld

_PARAGRAPH = CSSSelector("section[data-track-article-content] > p")
_SUBHEAD = CSSSelector("section[data-track-article-content] > div > h2")
_TOPIC = XPath("//article //header //div[contains(@class, 'topicLink')]")


def _topics(ctx: ParseContext) -> List[str]:
    if topic_nodes := _TOPIC(ctx.doc):
        return generic_topic_parsing(generic_nodes_to_text(topic_nodes), "・")
    return []


_IMAGES = make_images(
    _PARAGRAPH,
    lower_boundary_selector=CSSSelector("p.title_thchiij"),
    author_selector=re.compile(r"=(?P<credits>[^=]*?)\s*$"),
)

NIKKEI = PublisherSpec(
    key="jp.Nikkei",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", make_body(_PARAGRAPH, subheadline=_SUBHEAD)),
                Extractor("publishing_date", date_from_ld()),
                Extractor("title", title_from_ld("headline")),
                Extractor("topics", _topics, default=list),
                Extractor("images", _IMAGES, default=list),
                Extractor("free_access", free_access, default=False),
            ),
        ),
    ),
)
