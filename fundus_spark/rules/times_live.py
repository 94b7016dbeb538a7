"""Times Live rule spec — reference
``src/fundus/publishers/za/times_live.py`` (V1 until 2025-09-30, V1_1
after with an article/p body and figure-based image credits).
"""

from __future__ import annotations

import datetime

from ..kernel import PublisherSpec, VersionSpec, XPath
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_ld, topics_from_meta

_V1_PARAGRAPH = XPath("//div[@class='wrap']//div[@class='text']/p[span or text()]")
_SUMMARY = XPath("//h3[contains(@class, 'article-title-tertiary')] ")
_SUBHEAD = XPath("//div[@class='wrap']//div[@class='text']/h3")

_V11_PARAGRAPH = XPath("//article/p[not(string()='TimesLIVE')]")

_BLOAT_TOPICS = {
    "reuters",
    "timeslive",
    "Breaking news",
    "general",
    "politics",
    "sport",
    "entertainment",
    "lifestyle",
    "weird",
    "world",
    "africa",
    "news",
    "extra",
    "Sunday times",
    "times",
    "the times",
    "business times",
    "tshisa live",
}

_V1_IMAGES = make_images(
    _V1_PARAGRAPH,
    lower_boundary_selector=XPath("//div[@class='wrap']//hr"),
    upper_boundary_selector=XPath("//h1"),
    image_selector=XPath("//div[contains(@class, 'image-container')]//img"),
    caption_selector=XPath("./ancestor::div[contains(@class, 'image-container')]//span[@class='description']"),
    author_selector=XPath("./ancestor::div[contains(@class, 'image-container')]//span[@class='name']"),
    relative_urls=True,
)

_V11_IMAGES = make_images(
    _V11_PARAGRAPH,
    lower_boundary_selector=XPath("//div[@class='wrap']//hr"),
    upper_boundary_selector=XPath("//h1"),
    caption_selector=XPath("./ancestor::figure//span[contains(@class, 'caption')]"),
    author_selector=XPath("./ancestor::figure//span[contains(@class, 'credit')]"),
    relative_urls=True,
)

TIMES_LIVE = PublisherSpec(
    key="za.TimesLive",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2025, 9, 30),
            extractors=std_extractors(
                body=make_body(_V1_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=topics_from_meta("keywords", result_filter=_BLOAT_TOPICS),
                images=_V1_IMAGES,
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=std_extractors(
                body=make_body(_V11_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=topics_from_meta("keywords", result_filter=_BLOAT_TOPICS),
                images=_V11_IMAGES,
            ),
        ),
    ),
)
