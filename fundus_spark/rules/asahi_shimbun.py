"""Asahi Shimbun rule spec — reference
``src/fundus/publishers/jp/asahi_shimbun.py``.
"""

from __future__ import annotations

import re

from ..kernel import CSSSelector, PublisherSpec, VersionSpec
from ._common import (
    authors_from_ld,
    date_from_meta,
    make_body,
    make_images,
    std_extractors,
    title_from_meta,
    topics_from_meta,
)

_SUMMARY = CSSSelector("div.nfyQp > div.bv2Sj > p")
_PARAGRAPH = CSSSelector("div.nfyQp > p")
_SUBHEAD = CSSSelector("div.nfyQp > h2")

_TOPIC_BLOAT = re.compile(r"朝日新聞デジタル|朝日新聞|ニュース|新聞|その他・話題")

_IMAGES = make_images(
    _PARAGRAPH,
    author_selector=re.compile(r"、(?P<credits>[^、]*?)撮影"),
    relative_urls=True,
)

ASAHI_SHIMBUN = PublisherSpec(
    key="jp.AsahiShimbun",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_meta("article:published_time"),
                title=title_from_meta("TITLE"),
                topics=topics_from_meta("keywords", result_filter=_TOPIC_BLOAT),
                images=_IMAGES,
            ),
        ),
    ),
)
