"""Eyethu News rule spec — reference
``src/fundus/publishers/za/eyethu_news.py`` (priority-1 ``<br>``
rewrap of malformed paragraphs).
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import (
    Extractor,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    generic_author_parsing,
    generic_nodes_to_text,
    transform_breaks_to_tag,
)
from ._common import date_from_ld, make_body, make_images, std_extractors, title_from_ld, topics_from_ld

_MALFORMED = XPath("//div[contains(@class, 'entry-content')]/p[br]")
_PARAGRAPH = XPath("//div[contains(@class, 'entry-content')]/p[text() and not(a)] | //blockquote")
_SUMMARY = XPath("//h2[@class='entry-sub-title']")
_SUBHEAD = XPath("//div[contains(@class, 'entry-content')]/p[not(text() or a)]/strong[not(a)]")
_AUTHOR = XPath("//header//span[@class='meta-author']")


def _break_malformed_paragraphs(ctx: ParseContext) -> None:
    for node in _MALFORMED(ctx.doc):
        transform_breaks_to_tag(node, replace=True)


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(
        generic_nodes_to_text(_AUTHOR(ctx.doc)),
        result_filter=re.compile(r"(?i)content "),
    )


_IMAGES = make_images(
    _PARAGRAPH,
    image_selector=XPath("//article//img[@alt]"),
    upper_boundary_selector=XPath("//h1"),
    author_selector=re.compile(r"(ISITHOMBE:|PHOTO:|IMAGE:)(?P<credits>.+)", flags=re.IGNORECASE),
)

EYETHU_NEWS = PublisherSpec(
    key="za.EyethuNews",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
                authors=_authors,
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=topics_from_ld("keywords"),
                images=_IMAGES,
                extra=(Extractor("_break_malformed_paragraphs", _break_malformed_paragraphs, kind="function", priority=1),),
            ),
        ),
    ),
)
