"""The Japan News rule spec — reference
``src/fundus/publishers/jp/the_japan_news.py``.
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import ParseContext, PublisherSpec, VersionSpec, XPath, generic_topic_parsing
from ._common import authors_from_ld, date_from_meta, make_body, make_images, std_extractors, title_from_meta

_SUBHEAD = XPath("//div[@id='p-article-block']/h2")
_PARAGRAPH = XPath("//div[@id='p-article-block']//p[not(@class)]")


def _topics(ctx: ParseContext) -> List[str]:
    return [re.sub(r"\([0-9]+\)", "", topic).strip() for topic in generic_topic_parsing(ctx.ld.bf_search("keywords"))]


_IMAGES = make_images(
    _PARAGRAPH,
    caption_selector=XPath("./ancestor::figure/figcaption/text()"),
    author_selector=XPath("./ancestor::figure/figcaption/span"),
)

THE_JAPAN_NEWS = PublisherSpec(
    key="jp.TheJapanNews",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_meta("article:published_time"),
                title=title_from_meta("og:title"),
                topics=_topics,
                images=_IMAGES,
            ),
        ),
    ),
)
