"""Expressen rule spec — reference
``src/fundus/publishers/se/expressen.py`` (topics keep only the last
path segment of each LD keyword).
"""

from __future__ import annotations

from typing import List

from ..kernel import CSSSelector, ParseContext, PublisherSpec, VersionSpec, XPath, generic_topic_parsing
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_ld

_PARAGRAPH = CSSSelector("div.article__body-text p")
_SUMMARY = CSSSelector("div.article__preamble")
_SUBHEAD = CSSSelector("div.article__body-text h2")


def _topics(ctx: ParseContext) -> List[str]:
    return [topic.split("/")[-1] for topic in generic_topic_parsing(ctx.ld.bf_search("keywords"))]


_IMAGES = make_images(
    _PARAGRAPH,
    image_selector=XPath("//figure//img"),
    caption_selector=XPath("./ancestor::figure//figcaption//div[@class='rich-image__description']"),
    author_selector=XPath("./ancestor::figure//figcaption//div[@class='rich-image__credit']"),
    upper_boundary_selector=CSSSelector("div.article__body-text"),
)

EXPRESSEN = PublisherSpec(
    key="se.Expressen",
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
