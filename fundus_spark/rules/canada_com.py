"""Canada.com rule spec — reference ``src/fundus/publishers/ca/canada_com.py``
(PostMedia tenant with its own body selectors and image credits regex).
"""

from __future__ import annotations

import re

from ..kernel import PublisherSpec, VersionSpec, XPath
from ._common import make_images
from .postmedia import PM_IMAGE_CAPTION, postmedia_extractors

_PARAGRAPH = XPath("//section[contains(@class, 'article-content')]//p[text() or span[text()]]")
_SUBHEAD = XPath("//section[contains(@class, 'article-content')]//*[(self::h3 or self::h2) and not(@class)]")

_IMAGES = make_images(
    _PARAGRAPH,
    caption_selector=PM_IMAGE_CAPTION,
    author_selector=re.compile(r"\. (?P<credits>.*?[^.])$"),
)

CANADA_COM = PublisherSpec(
    key="ca.CanadaCom",
    versions=(
        VersionSpec(
            name="V1",
            extractors=postmedia_extractors(
                paragraph=_PARAGRAPH,
                subheadline=_SUBHEAD,
                extra_bloat=frozenset({"o.canada.com", "General", "Canadians"}),
                images=_IMAGES,
            ),
        ),
    ),
)
