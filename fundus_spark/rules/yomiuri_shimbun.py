"""Yomiuri Shimbun rule spec — reference
``src/fundus/publishers/jp/yomiuri_shimbun.py``.
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import ParseContext, PublisherSpec, VersionSpec, XPath
from ._common import authors_from_ld, date_from_meta, make_body, make_images, std_extractors, title_from_meta

_PARAGRAPH = XPath("//div[@class='p-main-contents ']/p")
_TOPIC = XPath("//div[contains(@class,'p-related-tags')]/ul/li/a")


def _topics(ctx: ParseContext) -> List[str]:
    return [node.text_content() for node in _TOPIC(ctx.doc)]


_IMAGES = make_images(
    _PARAGRAPH,
    image_selector=XPath("//div[@class='p-main-contents ']//img"),
    upper_boundary_selector=XPath("//article"),
    relative_urls=True,
    author_selector=re.compile(r"(?P<credits>＝.*)"),
)

YOMIURI_SHIMBUN = PublisherSpec(
    key="jp.YomiuriShimbun",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH),
                authors=authors_from_ld(),
                date=date_from_meta("article:published_time"),
                title=title_from_meta("og:title"),
                topics=_topics,
                images=_IMAGES,
            ),
        ),
    ),
)
