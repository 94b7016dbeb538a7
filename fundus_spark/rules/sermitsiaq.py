"""Sermitsiaq rule spec — reference
``src/fundus/publishers/gl/sermitsiaq.py``.
"""

from __future__ import annotations

from typing import List

from ..kernel import ParseContext, PublisherSpec, VersionSpec, XPath, generic_author_parsing, generic_topic_parsing
from ._common import date_from_ld, make_body, make_images, std_extractors, title_from_ld

_PARAGRAPH = XPath(
    "//div[contains(@class, 'bodytext')]//p[not(@class='offer-description' or re:test(text(), '^/.*/$'))]"
)
_SUMMARY = XPath("//h2[@class='subtitle '] ")
_SUBHEAD = XPath("//div[contains(@class, 'bodytext')]//h3[not(@class='offer-name')]")


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"), split_on=["og"])


def _topics(ctx: ParseContext) -> List[str]:
    return [tag.title() for tag in generic_topic_parsing(ctx.meta.get("article:tag"))]


_IMAGES = make_images(
    _PARAGRAPH,
    image_selector=XPath("//figure//img[not(@itemprop='image')]"),
    caption_selector=XPath(
        "./ancestor::*[self::figure or (self::div and contains(@class,'articleHeader'))]"
        "//figcaption[@itemprop='caption']"
    ),
    author_selector=XPath(
        "./ancestor::*[self::figure or (self::div and contains(@class,'articleHeader'))]"
        "//figcaption[@itemprop='author']"
    ),
)

SERMITSIAQ = PublisherSpec(
    key="gl.Sermitsiaq",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
                authors=_authors,
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=_topics,
                images=_IMAGES,
            ),
        ),
    ),
)
