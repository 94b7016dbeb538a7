"""Tages-Anzeiger rule spec — semantics per reference
``src/fundus/publishers/ch/tages_anzeiger.py`` (V1 valid until
2026-05-04, V1_1 after).
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

_V1_SUMMARY = CSSSelector("p.ContentHead_lead____SsS")
_V1_SUBHEAD = CSSSelector("article > h2")
_V1_PARAGRAPH = CSSSelector(
    "article > p"
    ":not(.ContentHead_lead____SsS)"
    ":not(.Feedback_root__fr_Mi)"
    ":not(.ArticleContainer_agencies__g6Lpj)"
)
_CAPTION = XPath("./ancestor::figure//figcaption/div[1]")
_CREDIT = XPath("./ancestor::figure//figcaption/div[2]")
_V1_LOWER = CSSSelector("div.EndOfArticleSectionList_root__LJO7G")

_V11_PARAGRAPH = XPath(
    "//article//div[contains(@class, 'ArticleElementsList')]//p[contains(@class, 'articleParagraph')]"
)
_V11_SUMMARY = XPath(
    "//article//p[contains(@class, 'lead')] | "
    "//article//div[contains(@class, 'SummaryList')]//*[self::strong or self::li]"
)
_V11_SUBHEAD = XPath("//article//h2[contains(@class, 'crosshead')]")


def _body(summary, paragraph, subhead):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            summary_selector=summary,
            subheadline_selector=subhead,
            paragraph_selector=paragraph,
        )

    return fn


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _images(paragraph, lower=None):
    def fn(ctx: ParseContext) -> List[Dict[str, Any]]:
        kwargs: Dict[str, Any] = dict(
            doc=ctx.doc,
            paragraph_selector=paragraph,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
        )
        if lower is not None:
            kwargs["lower_boundary_selector"] = lower
        return [img.serialize() for img in image_extraction(**kwargs)]

    return fn


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


_COMMON = [
    Extractor("authors", _authors, default=list),
    Extractor("publishing_date", _publishing_date),
    Extractor("title", _title),
    Extractor("free_access", _free_access, default=False),
]

TAGES_ANZEIGER = PublisherSpec(
    key="ch.TagesAnzeiger",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2026, 5, 4),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD)),
                    Extractor("images", _images(_V1_PARAGRAPH, _V1_LOWER), default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [
                    Extractor("body", _body(_V11_SUMMARY, _V11_PARAGRAPH, _V11_SUBHEAD)),
                    Extractor("images", _images(_V11_PARAGRAPH), default=list),
                ]
                + _COMMON
            ),
        ),
    ),
)
