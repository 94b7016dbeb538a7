"""BR rule spec — semantics per reference
``src/fundus/publishers/de/br.py`` (V1 until 2024-08-26, V1_1 until
2026-03-29; images credit via EXSLT re:match over @title).
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
    generic_topic_parsing,
    image_extraction,
)

_V1_SUMMARY = XPath(
    "//div[starts-with(@class, 'ArticleHeader_section')]"
    "//p[starts-with(@class, 'ArticleModuleTeaser_teaserText') or starts-with(@class, 'ArticleItemTeaserText_text')]"
)
_V1_PARAGRAPH = XPath("(//div[starts-with(@class, 'ArticleModuleText_content')])[1]//p")
_V1_SUBHEAD = XPath(
    "//section[starts-with(@class, 'ArticleModuleText_wrapper')]"
    "//div[starts-with(@class, 'ArticleModuleText_content')]//h2"
)
_IMAGE = XPath("//figure[not(parent::aside)]//img")
_CREDIT = XPath(r"re:match(./@title, '(?<=\|\sBild:\s).*$')")

_V11_BLOAT = "Das ist die Europäische Perspektive bei BR24."
_V11_SUMMARY = XPath("//header //p[@class='body3 ArticleItemTeaserText_text__H_RS_']")
_V11_SUBHEAD = XPath("//section[@id='articlebody'] //h2[text()]")
_V11_PARAGRAPH = XPath(
    f"//section[@id='articlebody'] //section[@class='ArticleModuleText_wrapper__AyX6M'] "
    f"//p[text() and not(re:test(string(), '{_V11_BLOAT}'))] |"
    "//section[@id='articlebody'] //section[@class='ArticleModuleText_wrapper__AyX6M'] //li |"
    "//section[@class='ShortnewsDetail_content__79bZq'] //p[1]"
)
_V11_DATE = CSSSelector("p.ShortnewsDetail_source__2ep85.heading4")

_V12_PARAGRAPH = XPath("//article//p[@class='body3'] |(//section[@id='articlebody']//section)[1]//p")
_V12_SUMMARY = XPath("//header//p[contains(@class,'ArticleItemTeaserText')]")
_V12_SUBHEAD = XPath("(//section[@id='articlebody']//section)[1]//h2")
_V12_IMAGE = XPath("//figure[not(parent::aside) and contains(@class, 'mediaImage')]//img")


def _body(summary, paragraph, subhead):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            summary_selector=summary,
            subheadline_selector=subhead,
            paragraph_selector=paragraph,
        )

    return fn


def _title(ctx: ParseContext) -> Optional[str]:
    return title if isinstance(title := ctx.ld.bf_search("headline"), str) else None


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _publishing_date_v1(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _publishing_date_v11(ctx: ParseContext) -> Optional[datetime.datetime]:
    if date_nodes := _V11_DATE(ctx.doc):
        if (content := date_nodes[0].text) is None:
            return None
        date_string = content.split(",")[-1]
        tz_aware_date = date_string.replace("Uhr", "+02:00")
        return generic_date_parsing(tz_aware_date)
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.ld.bf_search("keywords"))


def _images(paragraph, image=_IMAGE):
    def fn(ctx: ParseContext) -> List[Dict[str, Any]]:
        return [
            img.serialize()
            for img in image_extraction(
                doc=ctx.doc,
                paragraph_selector=paragraph,
                image_selector=image,
                author_selector=_CREDIT,
            )
        ]

    return fn


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


_COMMON = [
    Extractor("title", _title),
    Extractor("authors", _authors, default=list),
    Extractor("topics", _topics, default=list),
    Extractor("free_access", _free_access, default=False),
]

BR = PublisherSpec(
    key="de.BR",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2024, 8, 26),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD)),
                    Extractor("publishing_date", _publishing_date_v1),
                    Extractor("images", _images(_V1_PARAGRAPH), default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            valid_until=datetime.date(2026, 3, 29),
            extractors=tuple(
                [
                    Extractor("body", _body(_V11_SUMMARY, _V11_PARAGRAPH, _V11_SUBHEAD)),
                    Extractor("publishing_date", _publishing_date_v11),
                    Extractor("images", _images(_V11_PARAGRAPH), default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_2",
            extractors=tuple(
                [
                    Extractor("body", _body(_V12_SUMMARY, _V12_PARAGRAPH, _V12_SUBHEAD)),
                    Extractor("publishing_date", _publishing_date_v11),
                    Extractor("images", _images(_V12_PARAGRAPH, _V12_IMAGE), default=list),
                ]
                + _COMMON
            ),
        ),
    ),
)
