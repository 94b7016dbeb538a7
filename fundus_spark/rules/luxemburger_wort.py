"""Luxemburger Wort rule spec — reference
``src/fundus/publishers/lu/luxemburger_wort.py`` (V1 until 2026-05-05).
"""

from __future__ import annotations

import datetime
import re
from typing import List

from ..kernel import CSSSelector, ParseContext, PublisherSpec, VersionSpec, XPath, generic_nodes_to_text, generic_topic_parsing
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_meta

_V1_PARAGRAPH = XPath("//p[contains(@class, 'articleParagraph')]")
_V1_SUMMARY = XPath("//h2[contains(@class, 'articleParagraph')]")
_V1_SUBHEAD = XPath("//h4[contains(@class, 'articleSubheading')]")
_V1_TOPIC = XPath("//div[contains(@class, 'tag-list')]//a")


def _topics_v1(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(generic_nodes_to_text(_V1_TOPIC(ctx.doc)))


_V1_IMAGES = make_images(
    _V1_PARAGRAPH,
    image_selector=XPath("//figure[not(contains(@class, 'Teaser'))]//img"),
    upper_boundary_selector=CSSSelector("h1"),
    caption_selector=XPath("./ancestor::figure//div[contains(@class, 'ImageCaption')]"),
    author_selector=re.compile(r"(?i)Foto:\s*(?P<credits>.*)"),
)

_V2_SUMMARY = XPath("//article//h2[contains(@class, 'paragraph')]")
_V2_PARAGRAPH = XPath(
    "//article//section/p[text() or em] | "
    "//article//section/div[contains(@class,'interview_interview')]/p | "
    "//article//section/ul/li | "
    "//article//section/ol/li"
)
_V2_SUBHEAD = XPath("//article//section/*[self::h4 or self::h5]")
_V2_TOPIC = XPath("//div[contains(@class, 'tag-list')]//a")
_V2_BLOAT = {"Mosaik", "Sport", "Panorama", "Luxemburg", "Norden", "Osten", "Westen", "Süden"}


def _topics_v2(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(
        generic_nodes_to_text(_V2_TOPIC(ctx.doc), normalize=True),
        result_filter=_V2_BLOAT,
    )


_V2_IMAGES = make_images(
    _V2_PARAGRAPH,
    lower_boundary_selector=XPath("//div[starts-with(@class,'trustbox_trustbox')]"),
    image_selector=XPath("//figure//img[not(contains(@class, 'teaser'))]"),
    caption_selector=XPath(
        "./ancestor::figure//span[contains(@class, 'caption') and not(contains(@class,'gallery_counter'))]"
    ),
    author_selector=re.compile(r"(?i)Foto:\s*(?P<credits>.*)$"),
)

LUXEMBURGER_WORT = PublisherSpec(
    key="lu.LuxemburgerWort",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2026, 5, 5),
            extractors=std_extractors(
                body=make_body(_V1_PARAGRAPH, summary=_V1_SUMMARY, subheadline=_V1_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_meta("og:title"),
                topics=_topics_v1,
                images=_V1_IMAGES,
            ),
        ),
        VersionSpec(
            name="V2",
            extractors=std_extractors(
                body=make_body(_V2_PARAGRAPH, summary=_V2_SUMMARY, subheadline=_V2_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_meta("og:title"),
                topics=_topics_v2,
                images=_V2_IMAGES,
            ),
        ),
    ),
)
