"""Malay Mail rule spec — reference
``src/fundus/publishers/my/malay_mail.py``.
"""

from __future__ import annotations

import re

from ..kernel import PublisherSpec, VersionSpec, XPath
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_meta, topics_from_meta

_PARAGRAPH = XPath("//div[@class='article-body']/p[text() or not(b)]")
_SUBHEAD = XPath("//div[@class='article-body']/p[not(text()) and b]")

_IMAGES = make_images(
    _PARAGRAPH,
    image_selector=XPath("//div[contains(@class, 'image')]//img"),
    caption_selector=XPath("(./ancestor::div[contains(@class, 'image')])[1]//div[@class='image-caption']"),
    author_selector=re.compile(r"\s*—\s*(?P<credits>.*)$"),
)

MALAY_MAIL = PublisherSpec(
    key="my.MalayMail",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_meta("og:title"),
                topics=topics_from_meta("keywords"),
                images=_IMAGES,
            ),
        ),
    ),
)
