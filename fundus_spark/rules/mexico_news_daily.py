"""Mexico News Daily rule spec — reference
``src/fundus/publishers/mx/mexico_news_daily.py``.
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import ParseContext, PublisherSpec, VersionSpec, XPath, generic_topic_parsing
from ._common import authors_from_meta, date_from_ld, make_body, make_images, std_extractors, title_from_ld

_PARAGRAPH = XPath("//div[@class='tdb-block-inner td-fix-index']/p[text()] ")

_BLOAT_TOPICS = {"editors_pick"}


def _topics(ctx: ParseContext) -> List[str]:
    return [t for t in generic_topic_parsing(ctx.ld.bf_search("keywords")) if t not in _BLOAT_TOPICS]


_IMAGES = make_images(
    _PARAGRAPH,
    upper_boundary_selector=XPath("//h1"),
    author_selector=re.compile(r"\((?P<credits>.*?)\)\s*$"),
)

MEXICO_NEWS_DAILY = PublisherSpec(
    key="mx.MexicoNewsDaily",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH),
                authors=authors_from_meta("author"),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=_topics,
                images=_IMAGES,
            ),
        ),
    ),
)
