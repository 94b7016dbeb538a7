"""National Post rule spec — reference
``src/fundus/publishers/ca/national_post.py`` (V1 own layout valid
until ~2025-04-15, V1_1 = shared PostMedia parser).
"""

from __future__ import annotations

import datetime
import re

from ..kernel import CSSSelector, PublisherSpec, VersionSpec, XPath
from ._common import (
    authors_from_ld,
    date_from_ld,
    make_body,
    make_images,
    std_extractors,
    title_from_meta,
    topics_from_ld,
)
from .postmedia import postmedia_extractors

_V1_SUMMARY = CSSSelector("article p.article-subtitle")
_V1_SUBHEAD = XPath(
    "//section[@class='article-content__content-group article-content__content-group--story']/p/strong | "
    "//section[@class='article-content__content-group article-content__content-group--story']/h3"
)
_V1_PARAGRAPH = XPath(
    "//section[@class='article-content__content-group article-content__content-group--story']/p[text()]"
)

_V1_BLOAT = {
    "Curated",
    "News",
    "Newsroom daily",
    "story",
    "Canada",
    "World",
    "nationalpost.com",
    "politics",
}
_V1_TOPIC_FILTER = re.compile(
    r"([0-9a-f]{8}-([0-9a-f]{4}-){3}[0-9a-f]{12}|NLP Entity Tokens|NLP Category|NP Comment|Category):?\s*"
)

_V1_IMAGES = make_images(
    _V1_PARAGRAPH,
    upper_boundary_selector=XPath("//div[@class='article-header__detail']/figure"),
    lower_boundary_selector=CSSSelector("section.article-delimiter"),
)

NATIONAL_POST = PublisherSpec(
    key="ca.NationalPost",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2025, 4, 15),
            extractors=std_extractors(
                body=make_body(_V1_PARAGRAPH, summary=_V1_SUMMARY, subheadline=_V1_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_meta("og:title"),
                topics=topics_from_ld(substitution_pattern=_V1_TOPIC_FILTER, result_filter=set(_V1_BLOAT)),
                images=_V1_IMAGES,
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=postmedia_extractors(extra_bloat=frozenset({"nationalpost.com"})),
        ),
    ),
)
