"""Media Indonesia rule spec — reference
``src/fundus/publishers/id/media_indonesia.py``.
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import (
    CSSSelector,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    apply_substitution_pattern_over_list,
    generic_author_parsing,
    generic_nodes_to_text,
)
from ._common import date_from_ld, make_body, make_images, std_extractors, title_from_ld, topics_from_meta

_PARAGRAPH = XPath("//div[@class='article']/p[(text() or span) and not(@class)]")
_SUBHEAD = XPath("//div[@class='article']/*[(self::p and (not(text() or @class) and strong)) or self::h2]")
_AUTHOR = CSSSelector("div.info > div.author-2")


def _authors(ctx: ParseContext) -> List[str]:
    return apply_substitution_pattern_over_list(
        generic_author_parsing(generic_nodes_to_text(_AUTHOR(ctx.doc))),
        pattern=re.compile(r"^Media Indonesia$"),
        replacement="",
    )


_IMAGES = make_images(
    _PARAGRAPH,
    upper_boundary_selector=XPath("//h1"),
    author_selector=re.compile(r"\((?P<credits>[^(]+)\)$"),
)

MEDIA_INDONESIA = PublisherSpec(
    key="id.MediaIndonesia",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, subheadline=_SUBHEAD),
                authors=_authors,
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=topics_from_meta("keywords"),
                images=_IMAGES,
            ),
        ),
    ),
)
