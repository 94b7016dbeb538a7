"""Dainik Bhaskar rule spec — reference
``src/fundus/publishers/ind/bhaskar.py``.
"""

from __future__ import annotations

import re

from ..kernel import PublisherSpec, VersionSpec, XPath
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_ld, topics_from_ld

_PARAGRAPH = XPath("//article //p | //article //*[@style='border-bottom:none'] //li")

_TOPIC_BLOAT = re.compile(r"news", flags=re.IGNORECASE)

_IMAGES = make_images(
    _PARAGRAPH,
    image_selector=XPath("//article//picture//img"),
    upper_boundary_selector=XPath("//article"),
    caption_selector=XPath("(./ancestor::div[@class='f3e032cb']/following-sibling::*[1])/span[text()]"),
)

BHASKAR = PublisherSpec(
    key="ind.Bhaskar",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=topics_from_ld("keywords", result_filter=_TOPIC_BLOAT),
                images=_IMAGES,
            ),
        ),
    ),
)
