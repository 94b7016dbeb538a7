"""Nieuwsblad rule spec — reference
``src/fundus/publishers/be/nieuwsblad.py``.
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import ParseContext, PublisherSpec, VersionSpec, XPath, generic_topic_parsing, strip_nodes_to_text
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_ld

_SUMMARY = XPath("//*[@data-testid='article-intro']")
_PARAGRAPH = XPath("//*[@data-testid='article-body']/p[text()]")
_SUBHEAD = XPath("//*[@data-testid='article-body']/p/span[@class='bold'] | //*[@data-testid='article-body']/h3")
_TOPIC = XPath("//ul[contains(@class, 'taglist')]/li|//div[contains(@class, 'tag-list')]/a")


def _topics(ctx: ParseContext) -> List[str]:
    topic_string = strip_nodes_to_text(_TOPIC(ctx.doc), join_on=",")
    if topic_string is not None:
        return generic_topic_parsing(topic_string, delimiter=",")
    return []


_IMAGES = make_images(
    _PARAGRAPH,
    image_selector=XPath("//figure[not(contains(@class, 'teaser'))]//img"),
    caption_selector=XPath("./ancestor::figure//*[(self::div and contains(@class, 'caption')) or self::figcaption]"),
    author_selector=re.compile(r"\s*—?\s*©\s*(?P<credits>.*)"),
    lower_boundary_selector=XPath("//div[@class='widget partnerbox_1']"),
)

NIEUWSBLAD = PublisherSpec(
    key="be.Nieuwsblad",
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
