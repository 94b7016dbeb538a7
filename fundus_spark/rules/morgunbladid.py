"""Morgunblaðið rule spec — reference
``src/fundus/publishers/isl/morgunbladid.py`` (no topics attribute).
"""

from __future__ import annotations

from ..kernel import Extractor, PublisherSpec, VersionSpec, XPath
from ._common import authors_from_ld, date_from_ld, free_access, make_body, make_images, title_from_ld

_SUMMARY = XPath("//div[@class='main-layout']//div[@class='is-merking']/p")
_PARAGRAPH = XPath("//div[@class='main-layout' or @data-element-type='body-facts']/p[not(a and not(text()))]")
_SUBHEAD = XPath("//div[@class='main-layout' or @class='et_pb_text_inner']/h3")

_IMAGES = make_images(
    _PARAGRAPH,
    image_selector=XPath("//div[@class='image']//img"),
    caption_selector=XPath("./ancestor::div[contains(@class, 'newsitem-image')]//span[@class='caption']"),
    author_selector=XPath("./ancestor::div[contains(@class, 'newsitem-image')]//span[@class='credit']"),
)

MORGUNBLADID = PublisherSpec(
    key="isl.Morgunbladid",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", make_body(_PARAGRAPH, subheadline=_SUBHEAD)),
                Extractor("authors", authors_from_ld(), default=list),
                Extractor("publishing_date", date_from_ld()),
                Extractor("title", title_from_ld("headline")),
                Extractor("images", _IMAGES, default=list),
                Extractor("free_access", free_access, default=False),
            ),
        ),
    ),
)
