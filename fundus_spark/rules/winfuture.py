"""WinFuture rule spec — semantics per reference
``src/fundus/publishers/de/winfuture.py`` (single V1; the body is
re-segmented by serializing the doc, rewriting ``<br><br>`` runs into
paragraph tags with the reference's regex cascade, and re-parsing).
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
    generic_topic_parsing,
    image_extraction,
    parse_html,
    serialize_html,
)

_PARAGRAPH = XPath("//div[@id='news_content']/p")
_SUMMARY = XPath("//div[@id='news_content']//div[@class='teaser_text']")
_SUBHEAD = XPath("//div[@id='news_content']/h2")
_IMAGE = XPath("//div[@class='primary_content']//img[@class='teaser_img' or @class='photo']")
_UPPER = XPath("//div[@class='primary_content']")
_LOWER = XPath("//div[@class='mb20 more_links']")
_CAPTION = XPath("./ancestor::span[contains(@class,'hmedia')]//a")
_CREDIT = XPath("./ancestor::div[@class='teaser_img_container']//div[@class='teaser_img_source']")


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    html_as_string = serialize_html(ctx.doc)
    # regex cascade verbatim from the reference (winfuture.py:31-43)
    html_as_string = re.sub(r"(<br>){2}\n<h2", "<h2", html_as_string)
    html_as_string = re.sub(r"(<br>){2}\n<(div|script)", "</p>\n<div", html_as_string)
    html_as_string = re.sub(r"(<br>){2}", "</p>\n<p>", html_as_string)
    html_as_string = re.sub(r"(</h2>)", "</h2>\n<p>", html_as_string)
    html_as_string = re.sub(r"(?<![\W>])\n(?=<h2>)", "</p>\n", html_as_string)
    html_as_string = re.sub(r"(?<=<br>)\n(?!([<\W]))", "\n<p>", html_as_string)
    html_as_string = re.sub(r"(?<=(ipt|div)>)\n(?![\W<])", "\n<p>", html_as_string)
    html_as_string = re.sub(r"(?<![\W>])\n(?=<[a-z0-9=_'\"]*>)", "</p>\n", html_as_string)
    doc = parse_html(html_as_string)
    return assemble_body(
        doc,
        paragraph_selector=_PARAGRAPH,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
    )


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.meta.get("article:published_time"))


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("article:tag"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            image_selector=_IMAGE,
            upper_boundary_selector=_UPPER,
            lower_boundary_selector=_LOWER,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


WINFUTURE = PublisherSpec(
    key="de.WinFuture",
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
