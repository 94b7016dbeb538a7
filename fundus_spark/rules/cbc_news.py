"""CBC News rule spec — reference
``src/fundus/publishers/ca/cbc_news.py`` (priority-1 function injects
the ``initialStateDom`` script JSON into the LD mapping; topics are
assembled from its tags + concepts).
"""

from __future__ import annotations

import re
from typing import List

from ..kernel import CSSSelector, Extractor, ParseContext, PublisherSpec, VersionSpec, XPath
from ..kernel.jsonld import parse_json_text
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_ld

_SUMMARY = CSSSelector("h2.deck")
_SUBHEAD = CSSSelector("div.story > h2")
_PARAGRAPH = CSSSelector("div.story > p")

_CBC_LD_SELECTOR = XPath("//script[@id='initialStateDom']")


def _parse_initial_state_dom(ctx: ParseContext) -> None:
    for node in _CBC_LD_SELECTOR(ctx.doc):
        obj = parse_json_text(node.text_content())
        if isinstance(obj, dict):
            ctx.ld.add(obj, "initialStateDom")
        elif isinstance(obj, list):
            for item in obj:
                if isinstance(item, dict):
                    ctx.ld.add(item, "initialStateDom")


def _topics(ctx: ParseContext) -> List[str]:
    if not (topic_dict := ctx.ld.bf_search("keywords")):
        return []
    topic_list = [topic for location in topic_dict.get("tags") if (topic := location.get("name")) is not None]
    for subject in topic_dict.get("concepts"):
        if (path := subject.get("path")) is not None:
            topic_list.append(re.sub(r".*/", "", path))
    return topic_list


_IMAGES = make_images(
    _PARAGRAPH,
    upper_boundary_selector=XPath("//div[@data-cy='storyWrapper']"),
    caption_selector=XPath(
        "./ancestor::figure//figcaption | ./ancestor::span[contains(@class,'mediaEmbed')]/span"
    ),
    author_selector=re.compile(r"\((?P<credits>.*?)\)$"),
)

CBC_NEWS = PublisherSpec(
    key="ca.CBCNews",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=_topics,
                images=_IMAGES,
                extra=(Extractor("_parse_initial_state_dom", _parse_initial_state_dom, kind="function", priority=1),),
            ),
        ),
    ),
)
