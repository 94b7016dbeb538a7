"""ABC (Spain) rule spec — semantics per reference
``src/fundus/publishers/es/abc.py`` (V1 valid until 2026-02-17,
V1_1 after).
"""

from __future__ import annotations

import datetime
from typing import Any, Dict, List, Optional

from ..kernel import (
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

_V1_PARAGRAPH = XPath("//div[@class='voc-d ']//p[@class='voc-p']")
_V1_SUBHEAD = XPath("//div[@class='voc-d ']//h3[@class='voc-d-c__s-title']")
_V1_SUMMARY = XPath("//div[@class='voc-info-container']/h2[text()]")
_V1_TOPICS = XPath("//div[@class='voc-wrapper']//ul[@class='voc-topics__list']/li[position() > 1]")
_V1_IMAGE = XPath("//figure//img[@class='voc-img']")
_V1_CAPTION = XPath(
    "./ancestor::div[contains(@class, 'voc-img-container')]//figcaption/span[contains(@class,'text')]"
)
_V1_CREDIT = XPath(
    "./ancestor::div[contains(@class, 'voc-img-container')]//figcaption/span[contains(@class,'author')]"
)

_V11_SUMMARY = XPath("//div[@class='v-a-inf-c ']/h2[text()]")
_V11_SUBHEAD = XPath("//div[@class='v-c-cmp v-n-mrg']//h3[@class='v-cmp-suh']")
_V11_PARAGRAPH = XPath("//main//article//p[@class='v-d-p' or @class='v-a-t']")
_V11_TOPICS = XPath("//div[@class='v-d-n']//ul[@class='v-tpc__u']/li[position() > 1]")
_V11_IMAGE = XPath("//figure/div/img[@class='v-a-img']")
_V11_CREDIT = XPath("./ancestor::div[contains(@class, 'v-a-img-c')]//figcaption/span[contains(@class,'v-fc__p')]")
_V11_CAPTION = XPath("./ancestor::div[contains(@class, 'v-a-img-c')]//figcaption/span[contains(@class,'v-fc__t')]")

_UPPER = XPath("//article")


def _body(summary, paragraph, subhead):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            paragraph_selector=paragraph,
            subheadline_selector=subhead,
            summary_selector=summary,
        )

    return fn


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("title")


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _topics(selector):
    def fn(ctx: ParseContext) -> List[str]:
        return [node.text_content().strip() for node in selector(ctx.doc)]

    return fn


def _images(paragraph, image, caption, credit):
    def fn(ctx: ParseContext) -> List[Dict[str, Any]]:
        return [
            img.serialize()
            for img in image_extraction(
                doc=ctx.doc,
                paragraph_selector=paragraph,
                image_selector=image,
                upper_boundary_selector=_UPPER,
                caption_selector=caption,
                author_selector=credit,
            )
        ]

    return fn


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


_COMMON = [
    Extractor("publishing_date", _publishing_date),
    Extractor("title", _title),
    Extractor("authors", _authors, default=list),
    Extractor("free_access", _free_access, default=False),
]

ABC_ES = PublisherSpec(
    key="es.ABC",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2026, 2, 17),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD)),
                    Extractor("topics", _topics(_V1_TOPICS), default=list),
                    Extractor("images", _images(_V1_PARAGRAPH, _V1_IMAGE, _V1_CAPTION, _V1_CREDIT), default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [
                    Extractor("body", _body(_V11_SUMMARY, _V11_PARAGRAPH, _V11_SUBHEAD)),
                    Extractor("topics", _topics(_V11_TOPICS), default=list),
                    Extractor("images", _images(_V11_PARAGRAPH, _V11_IMAGE, _V11_CAPTION, _V11_CREDIT), default=list),
                ]
                + _COMMON
            ),
        ),
    ),
)
