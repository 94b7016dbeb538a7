"""TechRadar rule spec — semantics per reference
``src/fundus/publishers/uk/techradar.py`` (single V1; bloat
paragraphs filtered by re:test).
"""

from __future__ import annotations

import datetime
import re
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
    generic_nodes_to_text,
    generic_topic_parsing,
    image_extraction,
)

_SUMMARY = XPath("//article//header//*[contains(@class, 'strapline')]")
_SUBHEAD = XPath(
    "//article//div[contains(concat(' ', normalize-space(@class), ' '), ' text-copy ')]"
    "//*[self::h2 or self::h3][normalize-space()]"
)
_BLOAT = (
    r"^When you purchase through links|"
    r"^Follow TechRadar on Google News|"
    r"^Get daily insight|"
    r"^You might also like|"
    r"^What about you? Share your"
)
_PARAGRAPH = XPath(
    "//article//div[contains(concat(' ', normalize-space(@class), ' '), ' text-copy ')]"
    "//*[self::p or self::li]"
    "[normalize-space() and not(contains(@class, 'vanilla-image-block')) "
    "and not(self::li[contains(@class, 'list-none')]) "
    f"and not(re:test(normalize-space(string()), '{_BLOAT}'))"
    "and not(contains(@class,'newsletter-form__strapline'))"
    "and not(ancestor::*[contains(@class,'person')])]"
)
_TOPICS = XPath("//div[@class='tc23-post-relevant-terms__terms']/a")
_UPPER = XPath("//article")
_IMAGE = XPath("//article//figure//img")
_CAPTION = XPath("./ancestor::figure//figcaption")
_CREDIT = re.compile(r"(?i)\(?image credit[s]?: (?P<credits>.*?)[/)]?$")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
        paragraph_selector=_PARAGRAPH,
    )


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author") or ctx.meta.get("mrf:authors"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.bf_search("headline")


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(generic_nodes_to_text(_TOPICS(ctx.doc))) or generic_topic_parsing(
        ctx.meta.get("article:tag")
    )


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            upper_boundary_selector=_UPPER,
            image_selector=_IMAGE,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


TECHRADAR = PublisherSpec(
    key="uk.TechRadar",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("publishing_date", _publishing_date),
                Extractor("authors", _authors, default=list),
                Extractor("title", _title),
                Extractor("topics", _topics, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
