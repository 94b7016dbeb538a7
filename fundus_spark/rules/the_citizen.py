"""The Citizen rule spec — reference
``src/fundus/publishers/za/the_citizen.py`` (priority-1 ``<br>``
rewrap of paragraphs that embed breaks).
"""

from __future__ import annotations

import re

from ..kernel import Extractor, ParseContext, PublisherSpec, VersionSpec, XPath, transform_breaks_to_tag
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_ld, topics_from_ld

_MALFORMED = XPath("//div[@class='single-content']//p[br]")
_PARAGRAPH = XPath("//div[@class='single-content']//p[string-length(text())>2]")
_SUMMARY = XPath("//div[@class='single-excerpt']/h2")
_SUBHEAD = XPath("//div[@class='single-content']/h2 | //div[@class='single-content']/h3")


def _preprocess(ctx: ParseContext) -> None:
    for node in _MALFORMED(ctx.doc):
        transform_breaks_to_tag(node, replace=True)


_IMAGES = make_images(
    _PARAGRAPH,
    image_selector=XPath("//div[contains(@class, 'featured-image')]/img | //figure/img"),
    caption_selector=XPath(
        "./ancestor::div[contains(@class, 'featured-image')]//div[contains(@class, 'image-caption')]//p |"
        "./ancestor::figure//figcaption"
    ),
    author_selector=re.compile(r"(?i)(image courtesy( of)?\s*|image|picture|photo):?(?P<credits>.+)"),
)

THE_CITIZEN = PublisherSpec(
    key="za.TheCitizen",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=topics_from_ld("keywords"),
                images=_IMAGES,
                extra=(Extractor("_preprocess", _preprocess, kind="function", priority=1),),
            ),
        ),
    ),
)
