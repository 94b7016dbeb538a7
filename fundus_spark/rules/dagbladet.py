"""Dagbladet rule spec — reference
``src/fundus/publishers/no/dagbladet.py`` (V1 until 2025-09-01 with
byline nodes; V1_1 authors from ``article:author`` meta).
"""

from __future__ import annotations

import datetime
import re
from typing import List

from ..kernel import CSSSelector, ParseContext, PublisherSpec, VersionSpec, XPath, generic_nodes_to_text
from ._common import (
    authors_from_meta,
    date_from_meta,
    make_body,
    make_images,
    std_extractors,
    title_from_meta,
    topics_from_meta,
)

_SUMMARY = XPath(
    "//main/article/div[@class='article-top expand']//header/h3 | "
    "//main/article/div[contains(@class, 'articleHeader')]/h2 | "
    "(//main/article/div[contains(@class, 'bodytext')]/*)[1][self::div and contains(@class,'factbox')]//p"
)
_SUBHEAD = CSSSelector("#main > article > div.body-copy > h2, #main > article > div[class~='bodytext'] > h3")
_PARAGRAPH = CSSSelector("#main > article > div.body-copy > p, #main > article > div[class~='bodytext'] > p")
_AUTHOR = CSSSelector("div[itemtype='http://schema.org/Person'] address.name > a")


def _authors_v1(ctx: ParseContext) -> List[str]:
    return generic_nodes_to_text(_AUTHOR(ctx.doc), normalize=True)


_IMAGES = make_images(
    _PARAGRAPH,
    author_selector=re.compile(r"Foto:(?P<credits>.*)"),
    image_selector=XPath(
        "//figure[contains(@class, 'image')]//img | "
        "//article//figure//div[contains(@class,'img')]//img[not(contains(@class, 'lazyload'))]"
    ),
    caption_selector=XPath(
        "./ancestor::*[self::figure or (self::div and contains(@class,'articleHeader'))]//figcaption"
    ),
)


def _extractors(authors_fn):
    return std_extractors(
        body=make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
        authors=authors_fn,
        date=date_from_meta("article:published_time"),
        title=title_from_meta("og:title"),
        topics=topics_from_meta("article:tag"),
        images=_IMAGES,
    )


DAGBLADET = PublisherSpec(
    key="no.Dagbladet",
    versions=(
        VersionSpec(name="V1", valid_until=datetime.date(2025, 9, 1), extractors=_extractors(_authors_v1)),
        VersionSpec(name="V1_1", extractors=_extractors(authors_from_meta("article:author"))),
    ),
)
