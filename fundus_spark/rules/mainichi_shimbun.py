"""Mainichi Shimbun rule spec — reference
``src/fundus/publishers/jp/mainichi_shimbun.py``.
"""

from __future__ import annotations

import re
from typing import Optional

from ..kernel import CSSSelector, ParseContext, PublisherSpec, VersionSpec, XPath, normalize_whitespace
from ._common import (
    authors_from_meta,
    date_from_ld,
    make_body,
    make_images,
    std_extractors,
    topics_from_meta,
)

_PARAGRAPH = CSSSelector("#articledetail-body > p")
_SUBHEAD = CSSSelector("#articledetail-body > h2")


def _title(ctx: ParseContext) -> Optional[str]:
    if (title := ctx.meta.get("title")) is not None:
        return normalize_whitespace(title)
    return None


_IMAGES = make_images(
    _PARAGRAPH,
    image_selector=XPath("//figure//img[not(ancestor::a[contains(@class,'articledetail-image-scale')])]"),
    upper_boundary_selector=CSSSelector("#main"),
    author_selector=re.compile(r"(、|＝(?=.*?撮影$))(?P<credits>[^、]*?)(撮影)?\s*$"),
    relative_urls=True,
)

MAINICHI_SHIMBUN = PublisherSpec(
    key="jp.MainichiShimbun",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, subheadline=_SUBHEAD),
                authors=authors_from_meta("cXenseParse:author"),
                date=date_from_ld(),
                title=_title,
                topics=topics_from_meta("keywords", delimiter=[",", "・"], result_filter={"速報"}),
                images=_IMAGES,
            ),
        ),
    ),
)
