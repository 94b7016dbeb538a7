"""Verdens Gang rule spec — reference
``src/fundus/publishers/no/verdensgang.py`` (free_access from the
absence of the paywall login link).
"""

from __future__ import annotations

import re

from ..kernel import CSSSelector, Extractor, ParseContext, PublisherSpec, VersionSpec, XPath
from ._common import (
    authors_from_meta,
    date_from_meta,
    make_body,
    make_images,
    title_from_meta,
    topics_from_meta,
)

_BLOAT = "Les også:|Vil du lese mer"

_SUMMARY = CSSSelector("header.article-intro p")
_SUBHEAD = CSSSelector("section.article-body > h2")
_PARAGRAPH = XPath(f"//section[contains(@class,'article-body')] /p[not(re:test(string(), '{_BLOAT}'))]")
_PAYWALL = CSSSelector("#paywall-login-link")


def _free_access(ctx: ParseContext) -> bool:
    return not _PAYWALL(ctx.doc)


_IMAGES = make_images(_PARAGRAPH, author_selector=re.compile(r"Foto:(?P<credits>.*)"))

VERDENS_GANG = PublisherSpec(
    key="no.VerdensGang",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD)),
                Extractor("title", title_from_meta("og:title")),
                Extractor("publishing_date", date_from_meta("article:published_time")),
                Extractor("authors", authors_from_meta("article:author"), default=list),
                Extractor("topics", topics_from_meta("article:tag"), default=list),
                Extractor("free_access", _free_access, default=False),
                Extractor("images", _IMAGES, default=list),
            ),
        ),
    ),
)
