"""Aftonbladet rule spec — reference
``src/fundus/publishers/se/aftonbladet.py`` (V1 until 2026-07-09).
"""

from __future__ import annotations

import datetime
import re

from ..kernel import PublisherSpec, VersionSpec, XPath
from ._common import (
    authors_from_ld,
    date_from_meta,
    make_body,
    make_images,
    std_extractors,
    title_from_meta,
    topics_from_ld,
)

_V1_SUMMARY = XPath("//p[contains(@data-test-tag,'lead-text')]")
_V1_PARAGRAPH = XPath("//p[starts-with(@class,'hyperion-css-') and not(contains(@data-test-tag,'lead-text'))]")
_V1_SUBHEAD = XPath("//h2[@data-test-tag='paragraph-header']")

_V1_IMAGES = make_images(
    _V1_PARAGRAPH,
    image_selector=XPath("//figure//img"),
    caption_selector=XPath("./ancestor::figure//figcaption/span[@class='image-caption']"),
    author_selector=XPath("./ancestor::figure//figcaption/span[contains(@class,'image-byline')]"),
)

_V11_SUMMARY = XPath("(//header)[2]/p")
_V11_PARAGRAPH = XPath("(//section[@class='article-body'])[1]/p | (//section[@class='article-body'])[1]/ul/li")
_V11_SUBHEAD = XPath("(//section[@class='article-body'])[1]/h2")

_V11_IMAGES = make_images(
    _V11_PARAGRAPH,
    image_selector=XPath("//figure[contains(@class, 'layout-component')]//img"),
    caption_selector=XPath("./ancestor::figure//figcaption/node()[not(self::span[contains(@class,'showMore')])]"),
    author_selector=re.compile(r"(?i)foto:\s*(?P<credits>.*)\s*$"),
)


def _extractors(summary, paragraph, subhead, images):
    return std_extractors(
        body=make_body(paragraph, summary=summary, subheadline=subhead),
        authors=authors_from_ld(),
        date=date_from_meta("article:published_time"),
        title=title_from_meta("og:title"),
        topics=topics_from_ld("keywords"),
        images=images,
    )


AFTONBLADET = PublisherSpec(
    key="se.Aftonbladet",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2026, 7, 9),
            extractors=_extractors(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD, _V1_IMAGES),
        ),
        VersionSpec(
            name="V1_1",
            extractors=_extractors(_V11_SUMMARY, _V11_PARAGRAPH, _V11_SUBHEAD, _V11_IMAGES),
        ),
    ),
)
