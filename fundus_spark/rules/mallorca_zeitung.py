"""Mallorca Zeitung rule spec — reference
``src/fundus/publishers/es/mallorca_zeitung.py``.
"""

from __future__ import annotations

import re

from ..kernel import PublisherSpec, VersionSpec, XPath
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_meta, topics_from_ld

_PARAGRAPH = XPath("//div[@data-aida-text]//p[contains(@class,'ft-text')]")
_SUBHEAD = XPath("//div[@data-aida-text]//h2[not(@itemprop)]")
_SUMMARY = XPath("//header//h2")

_IMAGES = make_images(
    _PARAGRAPH,
    upper_boundary_selector=_SUMMARY,
    caption_selector=XPath("./ancestor::figure//figcaption"),
    author_selector=re.compile(r"[/|](?P<credits>.+)"),
)

MALLORCA_ZEITUNG = PublisherSpec(
    key="es.MallorcaZeitung",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_meta("og:title"),
                topics=topics_from_ld("keywords"),
                images=_IMAGES,
            ),
        ),
    ),
)
