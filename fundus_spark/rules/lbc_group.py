"""LBC Group rule spec — reference
``src/fundus/publishers/lb/lbc_group.py`` (the body attribute itself
performs the ``<br>`` rewrap before extraction; no authors/topics).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from ..kernel import Extractor, ParseContext, PublisherSpec, VersionSpec, XPath, assemble_body, transform_breaks_to_tag
from ._common import date_from_ld, free_access, make_images, title_from_meta

_BOILERPLATE = r"^Reuters$|^AFP$"

_CONTENT_CONTAINER = XPath("//div[@class='LongDesc']//div[br]")
_PARAGRAPH = XPath(
    f"//p[@class='br-wrap' and not(re:test(normalize-space(string(.)), '{_BOILERPLATE}')) and text()]"
)


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    if nodes := _CONTENT_CONTAINER(ctx.doc):
        transform_breaks_to_tag(nodes[0], __class__="br-wrap")
        return assemble_body(ctx.doc, paragraph_selector=_PARAGRAPH)
    return None


_IMAGES = make_images(
    _PARAGRAPH,
    image_selector=XPath("//div[@itemprop='image' or @class='DimgContainer']//img"),
    upper_boundary_selector=XPath("//h1"),
    lower_boundary_selector=XPath("//div[@class='article_details_end_of_scroll']"),
)

LBC_GROUP = PublisherSpec(
    key="lb.LBCGroup",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("title", title_from_meta("og:title")),
                Extractor("publishing_date", date_from_ld()),
                Extractor("images", _IMAGES, default=list),
                Extractor("free_access", free_access, default=False),
            ),
        ),
    ),
)
