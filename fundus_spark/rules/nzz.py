"""NZZ rule spec — semantics per reference
``src/fundus/publishers/ch/nzz.py`` (single V1).
"""

from __future__ import annotations

import datetime
import re
from typing import Any, Dict, List, Optional

from ..kernel import (
    CSSSelector,
    Extractor,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    apply_substitution_pattern_over_list,
    assemble_body,
    free_access_from_ld,
    generic_author_parsing,
    generic_date_parsing,
    image_extraction,
)

_SUMMARY = CSSSelector("div.headline p.headline__lead")
_SUBHEAD = CSSSelector("div.article h2.subtitle, div.article h5.articlecomponent")
_PARAGRAPH = CSSSelector(
    "div.article section[data-nzz-tid='article'] p.articlecomponent:not(.footnote), "
    "div.article div.articlecomponent:not(.content-table) li"
)
_AUTHOR_SUB = re.compile(r"\(.+\)$")
_CAPTION = XPath("./ancestor::figure//h2")
_CREDIT = XPath("./ancestor::figure//div[@class='image-description__author']")
_UPPER = XPath("//section[@data-nzz-tid]")
_LOWER = XPath("//div[@class='sharebox']")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
        paragraph_selector=_PARAGRAPH,
    )


def _authors(ctx: ParseContext) -> List[str]:
    return apply_substitution_pattern_over_list(
        generic_author_parsing(ctx.ld.bf_search("author")), _AUTHOR_SUB, ""
    )


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.meta.get("date"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("title")


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
            upper_boundary_selector=_UPPER,
            lower_boundary_selector=_LOWER,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


NZZ = PublisherSpec(
    key="ch.NZZ",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
