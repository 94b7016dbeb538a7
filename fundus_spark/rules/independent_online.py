"""Independent Online (IOL) shared rule spec — reference
``src/fundus/publishers/za/independent_online.py`` (one parser behind
Durban Local, Isolezwe, and Isolezwe LesiXhosa).
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import (
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    generic_topic_parsing,
    strip_nodes_to_text,
)
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_ld

_PARAGRAPH = XPath("//div[@class='article_content__Ag4R_']//div[@class='text_text__oJhZK']/p ")
_TOPICS = XPath("//div[@class='tags_tags__zi1sf']/a")


def _topics(ctx: ParseContext) -> List[str]:
    topic_string = strip_nodes_to_text(_TOPICS(ctx.doc), join_on=",")
    if topic_string is not None:
        return generic_topic_parsing(topic_string, delimiter=",")
    return generic_topic_parsing(ctx.meta.get("keywords", []))


_IMAGES = make_images(
    _PARAGRAPH,
    upper_boundary_selector=XPath("//h1"),
    lower_boundary_selector=XPath("//aside[@class='article_sidebar__qgf5d']"),
    image_selector=XPath("//div[contains(@class, 'image')]//img"),
    caption_selector=XPath("./ancestor::div[@class='image_image-widget__LYZT4']//p"),
    author_selector=re.compile(r"(?i)image:(?P<credits>.+)"),
)

_EXTRACTORS = std_extractors(
    body=make_body(_PARAGRAPH),
    authors=authors_from_ld(),
    date=date_from_ld(),
    title=title_from_ld("headline"),
    topics=_topics,
    images=_IMAGES,
)

DURBAN_LOCAL = PublisherSpec(key="za.DurbanLocal", versions=(VersionSpec(name="V1", extractors=_EXTRACTORS),))
ISOLEZWE = PublisherSpec(key="za.Isolezwe", versions=(VersionSpec(name="V1", extractors=_EXTRACTORS),))
ISOLEZWE_LESIXHOSA = PublisherSpec(
    key="za.IsolezweLesiXhosa", versions=(VersionSpec(name="V1", extractors=_EXTRACTORS),)
)
