"""Rzeczpospolita rule spec — reference
``src/fundus/publishers/pl/rzeczpospolita.py`` (V1 until 2026-03-24).
"""

from __future__ import annotations

import datetime
from typing import List

from ..kernel import ParseContext, PublisherSpec, VersionSpec, XPath, generic_topic_parsing, strip_nodes_to_text
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_ld

_TOPIC = XPath("//div[@data-mrf-section='Article / Tags']/a")


def _topics(ctx: ParseContext) -> List[str]:
    topic_string = strip_nodes_to_text(_TOPIC(ctx.doc), join_on=",")
    if topic_string is not None:
        return generic_topic_parsing(topic_string, delimiter=",")
    return []


_V1_PARAGRAPH = XPath(
    "//div[contains(@class,'article--content')]//div[contains(@class,'body articleBody')]"
    "//p[contains(@class, 'article--paragraph')]"
)
_V1_SUMMARY = XPath("//div[@class='blog--subtitle ']")
_SUBHEAD = XPath("//div[contains(@class,'article--content')]//div[contains(@class,'body articleBody')]//h2")

_V1_IMAGES = make_images(
    _V1_PARAGRAPH,
    image_selector=XPath("//div[@class='blog--image']//img"),
    upper_boundary_selector=XPath("//div[@class='row']//h1"),
    caption_selector=XPath("./ancestor::div[@class='blog--image']//p[@class='article--media--lead']"),
    author_selector=XPath("./ancestor::div[@class='blog--image']//p[@class='image--author']"),
)

_V11_SUMMARY = XPath("//div[@class='article--lead ']")
_V11_PARAGRAPH = XPath(
    "//div[contains(@class,'article--content')]//div[contains(@class,'body articleBody')]"
    "//p[contains(@class, 'article--paragraph')] |"
    "//div[contains(@class, 'articleBodyBlock')]//li"
)

_V11_IMAGES = make_images(
    _V11_PARAGRAPH,
    image_selector=XPath("//div[contains(@class,'--image')]//img"),
    upper_boundary_selector=XPath("//h1"),
    caption_selector=XPath("./ancestor::div[contains(@class,'--image')]//p[@class='article--media--lead']"),
    author_selector=XPath("./ancestor::div[contains(@class,'--image')]//p[@class='image--author']"),
)

RZECZPOSPOLITA = PublisherSpec(
    key="pl.Rzeczpospolita",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2026, 3, 24),
            extractors=std_extractors(
                body=make_body(_V1_PARAGRAPH, summary=_V1_SUMMARY, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=_topics,
                images=_V1_IMAGES,
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=std_extractors(
                body=make_body(_V11_PARAGRAPH, summary=_V11_SUMMARY, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=_topics,
                images=_V11_IMAGES,
            ),
        ),
    ),
)
