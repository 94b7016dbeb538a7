"""LRT rule spec — reference ``src/fundus/publishers/lt/lrt.py``."""

from __future__ import annotations

import re

from ..kernel import CSSSelector, PublisherSpec, VersionSpec, XPath
from ._common import (
    authors_from_meta,
    date_from_ld,
    make_body,
    make_images,
    std_extractors,
    title_from_meta,
    topics_from_ld,
)

_PARAGRAPH = XPath(
    "//div[@class='article-content js-text-selection']/p[not((strong and not(text())) or @class='text-lead')]"
)
_SUMMARY = CSSSelector("p.text-lead")
_SUBHEAD = XPath(
    "//div[@class='article-content js-text-selection']/p[strong and not(@class='text-lead') and not(text())]"
)

_IMAGES = make_images(
    _PARAGRAPH,
    upper_boundary_selector=CSSSelector("article"),
    image_selector=CSSSelector("div.media-block img"),
    caption_selector=XPath("./ancestor::div[contains(@class, 'media-block')]//div[contains(@class, 'description')]"),
    author_selector=re.compile(r"/\s*(?P<credits>.*).$"),
    relative_urls=True,
)

LRT = PublisherSpec(
    key="lt.LRT",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
                authors=authors_from_meta("lrt_authors"),
                date=date_from_ld(),
                title=title_from_meta("og:title"),
                topics=topics_from_ld("keywords"),
                images=_IMAGES,
            ),
        ),
    ),
)
