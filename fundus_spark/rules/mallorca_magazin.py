"""Mallorca Magazin rule spec — reference
``src/fundus/publishers/es/mallorca_magazin.py``.
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import ParseContext, PublisherSpec, VersionSpec, XPath
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_meta

_PARAGRAPH = XPath("//div[@id='post-text']//p")
_SUBHEAD = XPath("//div[@id='post-text']//*[(self::h4 or self::h2) and not(@class)]")
_SUMMARY = XPath("//h2[@class='post-subtitle']")
_TOPIC = XPath("//div[@class='post-tags']//li")


def _topics(ctx: ParseContext) -> List[str]:
    return [node.text_content().strip() for node in _TOPIC(ctx.doc)]


_IMAGES = make_images(
    _PARAGRAPH,
    image_selector=XPath("//figure//img|//div[@id='post-text']//p/img"),
    caption_selector=XPath(
        "./ancestor::div[@class='col-sm-12']//p[@class='img-description'] | ./ancestor::figure//figcaption"
    ),
    author_selector=re.compile(r"\|(?P<credits>.+)"),
)

MALLORCA_MAGAZIN = PublisherSpec(
    key="es.MallorcaMagazin",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_meta("og:title"),
                topics=_topics,
                images=_IMAGES,
            ),
        ),
    ),
)
