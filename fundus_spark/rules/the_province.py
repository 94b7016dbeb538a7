"""The Province rule spec — reference
``src/fundus/publishers/ca/the_province.py`` (PostMedia tenant).
"""

from __future__ import annotations

from ..kernel import PublisherSpec, VersionSpec, XPath
from ._common import make_images
from .postmedia import PM_IMAGE_CAPTION, PM_IMAGE_CREDIT, postmedia_extractors

_PARAGRAPH = XPath("//section[contains(@class, 'article-content')]//p[text() or span[text()]]")
_SUBHEAD = XPath(
    "//section[contains(@class, 'article-content')]//*["
    "((self::h4 or self::h3 or self::h2) and not(@class))"
    " or (self::p[(strong or b) and not(text())])"
    "]"
)

_IMAGES = make_images(
    _PARAGRAPH,
    caption_selector=PM_IMAGE_CAPTION,
    author_selector=PM_IMAGE_CREDIT,
)

THE_PROVINCE = PublisherSpec(
    key="ca.TheProvince",
    versions=(
        VersionSpec(
            name="V1",
            extractors=postmedia_extractors(
                paragraph=_PARAGRAPH,
                subheadline=_SUBHEAD,
                extra_bloat=frozenset({"theprovince.com", "regwall", "Anonymous", "General"}),
                images=_IMAGES,
            ),
        ),
    ),
)
