"""der Freitag rule spec — semantics per reference
``src/fundus/publishers/de/der_freitag.py`` (single V1).
"""

from __future__ import annotations

import datetime
from typing import Any, Dict, List, Optional

from ..kernel import (
    CSSSelector,
    Extractor,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    assemble_body,
    free_access_from_ld,
    generic_author_parsing,
    generic_date_parsing,
    image_extraction,
)

_SUMMARY = CSSSelector("header > p.bc-article-intro__text")
_PARAGRAPH = CSSSelector("div.bo-article-text > p")
_SUBHEAD = CSSSelector("div.bo-article-text > h2")
_UPPER = CSSSelector("header.bc-article-intro")
_LOWER = CSSSelector("span.freitag-article-end")
_IMAGE = CSSSelector("figure img,div[role='figure'] img")
_CAPTION = XPath("./ancestor::figure//figcaption//span[@class='bo-image__caption__desc']")
_CREDIT = XPath("./ancestor::figure//figcaption//span[@class='bo-image__caption__credit']")


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
        paragraph_selector=_PARAGRAPH,
    )


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _topics(ctx: ParseContext) -> List[str]:
    return ctx.ld.bf_search("keywords")


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            upper_boundary_selector=_UPPER,
            lower_boundary_selector=_LOWER,
            image_selector=_IMAGE,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


DER_FREITAG = PublisherSpec(
    key="de.DerFreitag",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("title", _title),
                Extractor("body", _body),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("topics", _topics, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
