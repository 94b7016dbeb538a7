"""Politico EU rule spec — reference
``src/fundus/publishers/be/politico_eu.py`` (topics are a raw
comma-split of the keywords meta, no strip/dedup).
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import CSSSelector, ParseContext, PublisherSpec, VersionSpec, XPath
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_ld

_PARAGRAPH = CSSSelector(".article__content p, .sidebar-grid_content p")
_SUBHEAD = CSSSelector(".article__content h3, .sidebar-grid__content h3")
_SUMMARY = CSSSelector("p.hero__excerpt")


def _topics(ctx: ParseContext) -> List[str]:
    keywords_string = ctx.meta.get("keywords")
    if keywords_string is None:
        return []
    return keywords_string.split(",")


_IMAGES = make_images(
    _PARAGRAPH,
    upper_boundary_selector=CSSSelector("article"),
    image_selector=CSSSelector("figure img"),
    caption_selector=XPath("./ancestor::figure//div[contains(@class, 'figcaption__inner')]"),
    author_selector=re.compile(r"\|(?P<credits>.*)$"),
)

POLITICO_EU = PublisherSpec(
    key="be.PoliticoEu",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=_topics,
                images=_IMAGES,
            ),
        ),
    ),
)
