"""The Nation rule spec — semantics per reference
``src/fundus/publishers/us/the_nation.py`` (V1 valid until 2023-07-22,
V2 after).

V1's step ordering matters: the malformed-HTML fixup runs at priority
1, the ``images`` attribute at priority 2 (BEFORE asides are dropped),
and the aside removal at priority 3 — body assembly then sees the
cleaned DOM. V2 drops the aside-removal function entirely.
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
    assemble_body,
    free_access_from_ld,
    generic_author_parsing,
    generic_date_parsing,
    generic_topic_parsing,
    image_extraction,
    parse_html,
)

_V1_SUMMARY = CSSSelector(".article-header-content > h2")
_V1_PARAGRAPH = CSSSelector(".article-body-inner > p")
_ASIDE = CSSSelector("aside")
_HTML_FIX = re.compile(r'name="sft_double_opt_sail"\s*value="yes"\s/>\s*</form>')
_UPPER = XPath("//h1[contains(@class,'title')]")
_V1_IMAGE = CSSSelector(".image img")
_V1_CAPTION = XPath("(./ancestor::aside[contains(@class, 'image')])[1]//p[@class='caption']/text()")
_V1_CREDIT = XPath(
    "(./ancestor::aside[contains(@class, 'image')])[1]//p[@class='caption']/span[@class='credits']"
)

_V2_SUMMARY = XPath(
    "//div[@class='article-header-content'] /h2 | //article//div[contains(@class, 'article-title')] /p"
)
_V2_PARAGRAPH = XPath("(//article | //div[@class='article-body-inner']) / p")
_V2_CAPTION = XPath("./ancestor::figure//figcaption/text()|./ancestor::figure//figcaption/p")


def _fix_malformed_html(ctx: ParseContext) -> None:
    if XPath("//div[contains(@id, 'cta-block')]")(ctx.doc):
        fixed_html = re.sub(_HTML_FIX, 'name="sft_double_opt_sail"value="yes"/></div></form>', ctx.html)
        ctx.doc = parse_html(fixed_html)


def _remove_aside(ctx: ParseContext) -> None:
    for aside in _ASIDE(ctx.doc):
        if (parent := aside.getparent()) is not None:
            parent.remove(aside)


def _body(summary, paragraph):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(ctx.doc, summary_selector=summary, paragraph_selector=paragraph)

    return fn


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("sailthru.author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _topics_v1(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("keywords"))


def _topics_v2(ctx: ParseContext) -> List[str]:
    if topics := generic_topic_parsing(ctx.meta.get("keywords")):
        return topics
    return generic_topic_parsing(ctx.meta.get("sailthru.tags"))


def _images_v1(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_V1_PARAGRAPH,
            upper_boundary_selector=_UPPER,
            image_selector=_V1_IMAGE,
            caption_selector=_V1_CAPTION,
            author_selector=_V1_CREDIT,
        )
    ]


def _images_v2(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_V2_PARAGRAPH,
            upper_boundary_selector=_UPPER,
            caption_selector=_V2_CAPTION,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


THE_NATION = PublisherSpec(
    key="us.TheNation",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2023, 7, 22),
            extractors=(
                Extractor("_fix_malformed_html", _fix_malformed_html, kind="function", priority=1),
                Extractor("images", _images_v1, default=list, priority=2),
                Extractor("_remove_aside", _remove_aside, kind="function", priority=3),
                Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH)),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title),
                Extractor("topics", _topics_v1, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
        VersionSpec(
            name="V2",
            extractors=(
                Extractor("_fix_malformed_html", _fix_malformed_html, kind="function", priority=1),
                Extractor("body", _body(_V2_SUMMARY, _V2_PARAGRAPH)),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title),
                Extractor("topics", _topics_v2, default=list),
                Extractor("images", _images_v2, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
