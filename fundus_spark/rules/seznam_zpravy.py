"""Seznam Zprávy rule spec — reference
``src/fundus/publishers/cz/seznam_zpravy.py`` (V1 until ~2025-08-01,
V1_1 until 2025-11-24, V1_2 current; only selectors change).
"""

from __future__ import annotations

import datetime
import re
from typing import List

from ..kernel import (
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    apply_substitution_pattern_over_list,
    generic_author_parsing,
    generic_topic_parsing,
)
from ._common import date_from_ld, make_body, make_images, std_extractors, title_from_ld

_AUTHOR_SUB = re.compile(r"Seznam Zprávy")
_BLOAT_TOPICS = ["BLUE", "RED"]

_V1_PARAGRAPH = XPath("//div[contains(@class,'mol-rich-content--for-article')]/div[contains(@class,'speakable')]/p")
_SUMMARY = XPath("//div/p[contains(@class, 'speakable') and @*[contains(., 'ogm-article-perex')]]")
_V1_SUBHEAD = XPath("//div[contains(@class,'mol-rich-content--for-article')]/h2")

_V11_PARAGRAPH = XPath("//div[@class='h_f7 h_bZ h_bZ']/div/p/span[@class='atm-text-decorator' and text()]")
_V11_SUBHEAD = XPath(
    "//div[@class='h_f7 h_bZ h_bZ']/div/p/span[@class='atm-text-decorator']/span | "
    "//div[@class='h_f7 h_bZ h_bZ']/h2"
)

_V12_PARAGRAPH = XPath(
    "//article[@aria-labelledby='accessibility-article'] //div[contains(@class, 'speakable')] //p"
)
_V12_SUBHEAD = XPath("//article[@aria-labelledby='accessibility-article'] //h2[contains(@class, 'speakable')]")


def _authors(ctx: ParseContext) -> List[str]:
    return apply_substitution_pattern_over_list(
        generic_author_parsing(ctx.ld.bf_search("author")), pattern=_AUTHOR_SUB, replacement=""
    )


def _topics(ctx: ParseContext) -> List[str]:
    return [t for t in generic_topic_parsing(ctx.ld.bf_search("keywords")) if t not in _BLOAT_TOPICS]


def _images(paragraph):
    return make_images(
        paragraph,
        image_selector=XPath("//figure//img[not(ancestor::div[contains(@class, 'mol-post-card__body')])]"),
        author_selector=XPath("./ancestor::figure//span[@*[contains(., 'atm-media-item-image-caption')]]"),
        relative_urls=True,
    )


def _version(name, valid_until, paragraph, subhead):
    return VersionSpec(
        name=name,
        valid_until=valid_until or datetime.date.max,
        extractors=std_extractors(
            body=make_body(paragraph, summary=_SUMMARY, subheadline=subhead),
            authors=_authors,
            date=date_from_ld(),
            title=title_from_ld("headline"),
            topics=_topics,
            images=_images(paragraph),
        ),
    )


SEZNAM_ZPRAVY = PublisherSpec(
    key="cz.SeznamZpravy",
    versions=(
        _version("V1", datetime.date(2025, 8, 1), _V1_PARAGRAPH, _V1_SUBHEAD),
        _version("V1_1", datetime.date(2025, 11, 24), _V11_PARAGRAPH, _V11_SUBHEAD),
        _version("V1_2", None, _V12_PARAGRAPH, _V12_SUBHEAD),
    ),
)
