"""The West Australian rule spec — reference
``src/fundus/publishers/au/west_australian.py`` (priority-1 function
injects the ``window.PAGE_DATA`` script JSON into the LD mapping; the
body is assembled from its publication content blocks, not the DOM).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from ..kernel import CSSSelector, Extractor, ParseContext, PublisherSpec, VersionSpec, XPath
from ..kernel.jsonld import parse_json_text
from ._common import authors_from_ld, date_from_ld, make_images, std_extractors, title_from_ld, topics_from_ld

_PAGE_DATA = XPath("string(//script[re:test(text(), 'window.PAGE_DATA')])")


def _parse_page_content(ctx: ParseContext) -> None:
    if not (parsed_json := parse_json_text(_PAGE_DATA(ctx.doc))):
        raise ValueError("Couldn't parse page data")
    ctx.ld.add(parsed_json, "windows.PAGE_DATA")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    content_blocks = ctx.ld.xpath_search("//publication/content/blocks")
    paragraphs: List[str] = []
    for block in content_blocks:
        if block.get("kind") == "text" and (text := block.get("text")):
            paragraphs.append(text)
    return {"summary": [], "sections": [{"headline": [], "paragraphs": paragraphs}]}


_IMAGES_PARAGRAPH = CSSSelector("div#ArticleContent > p")

from ._common import make_images  # noqa: E402

_IMAGES = make_images(
    _IMAGES_PARAGRAPH,
    upper_boundary_selector=CSSSelector("article"),
    lower_boundary_selector=CSSSelector("div#footer"),
    caption_selector=XPath("./ancestor::figure //span[contains(@class, 'CaptionText')] /span[1]"),
    author_selector=XPath("./ancestor::figure //span[contains(@class, 'CaptionText')] /span[last()]"),
)

WEST_AUSTRALIAN = PublisherSpec(
    key="au.WestAustralian",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=_body,
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=topics_from_ld("keywords"),
                images=_IMAGES,
                extra=(Extractor("_parse_page_content", _parse_page_content, kind="function", priority=1),),
            ),
        ),
    ),
)
