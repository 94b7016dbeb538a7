"""MBN rule spec — reference ``src/fundus/publishers/kr/mbn.py``
(in-body DOM surgery: ad-block removal + ``<br>`` rewrap of the single
articleBody node; post-filtered image credits; no topics attribute).
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Any, Dict, List, Optional

from ..kernel import (
    Extractor,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    assemble_body,
    generic_author_parsing,
    generic_date_parsing,
    generic_nodes_to_text,
    image_extraction,
    transform_breaks_to_tag,
)
from ._common import free_access

_PARAGRAPH_BLOAT = r"^\[.*\]$"

_PARAGRAPH = XPath(
    f"//div[@itemprop='articleBody']//p[(normalize-space() or @class='br-wrap') and "
    f"not(re:test(string(), '{_PARAGRAPH_BLOAT}') or @class='summary_line') and text()]"
)
_SUBHEAD = XPath(
    "//div[@itemprop='articleBody']//p[@class='br-wrap' and not(text())]"
    "//*[self::b or (self::span and contains(@style, 'bold'))]"
)
_SUMMARY = XPath("//div[contains(@class,'midtitle_text')]| //p[@class='summary_line']")
_FULL_TEXT = XPath("//div[@itemprop='articleBody']")
_ARTICLE_AUTHOR = XPath("//li[@class='author']")

_HAS_PARAGRAPHS = XPath(".//p[normalize-space()]")
_AD_WRAP = XPath(".//div[contains(@class,'ad_wrap')]")
_IS_ARTICLE_BODY = XPath("./self::div[@class='article_body']")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    nodes = _FULL_TEXT(ctx.doc)
    if nodes and len(nodes) == 1:
        element = nodes[0]
        if _HAS_PARAGRAPHS(element):
            for ad in _AD_WRAP(element):
                parent = ad.getparent()
                if parent is not None:
                    parent.remove(ad)
        if _IS_ARTICLE_BODY(element):
            # economy section layout: transform <br> tags to paragraphs
            transform_breaks_to_tag(element)
        else:
            transform_breaks_to_tag(element, __class__="summary_line")
    return assemble_body(
        ctx.doc,
        paragraph_selector=_PARAGRAPH,
        subheadline_selector=_SUBHEAD,
        summary_selector=_SUMMARY,
    )


def _authors(ctx: ParseContext) -> List[str]:
    if not (author_string := generic_author_parsing(ctx.ld.xpath_search("NewsArticle//author", scalar=False))):
        authors = generic_author_parsing(generic_nodes_to_text(_ARTICLE_AUTHOR(ctx.doc)))
        return [re.sub(r"\s*기자\s*", "", author) for author in authors]
    return generic_author_parsing(author_string)


def _date(ctx: ParseContext) -> Optional[datetime]:
    return generic_date_parsing(
        ctx.ld.xpath_search("NewsArticle//datePublished", scalar=True) or ctx.meta.get("article:published_time")
    )


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.xpath_search("NewsArticle//headline", scalar=True) or ctx.meta.get("og:title")


_IMG_CREDIT = re.compile(
    r"(?P<credits>\[사진(?:\s*출처)?\s*=\s*([^\]]+)\]|<\s*([^>]+?)\s*기자\s*>|사진\s*=\s*([^.\]\r\n<>]+)|\.[^.]+$)"
)
_IMG_AUTHOR_BLOAT = re.compile(r"\s*([.\[\]<>()]|사진(\s*출처)?\s*=|기자\s*=|사진\s*I?)\s*")


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    images = image_extraction(
        doc=ctx.doc,
        paragraph_selector=_PARAGRAPH,
        upper_boundary_selector=XPath("//div[@itemprop='articleBody']"),
        lower_boundary_selector=XPath("//div[@id='refTotal']"),
        image_selector=XPath("//div[@itemprop='articleBody']//div[@class='thumb_area img' or @class='image']//img"),
        caption_selector=XPath(
            "./ancestor::div[@class='thumb_area img' or @class='image']"
            "//*[(self::span and @class='thum_figure_txt') or (self::p and @class='caption')]"
        ),
        alt_selector=XPath("./@alt"),
        author_selector=_IMG_CREDIT,
    )
    # reference-faithful quirk (kr/mbn.py:118-126): the list resets per
    # AUTHOR (not per image), so only the last cleaned author survives,
    # and an image with no credits inherits the previous image's list
    authors: List[str] = []
    for img in images:
        for author in img.authors:
            authors = []
            author = _IMG_AUTHOR_BLOAT.sub("", author).strip()
            if author:
                authors.append(author)
        img.authors = authors
    return [img.serialize() for img in images]


MBN = PublisherSpec(
    key="kr.MBN",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _date),
                Extractor("title", _title),
                Extractor("images", _images, default=list),
                Extractor("free_access", free_access, default=False),
            ),
        ),
    ),
)
