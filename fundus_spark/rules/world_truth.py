"""World Truth rule spec — semantics per reference
``src/fundus/publishers/us/world_truth.py`` (single V1).
"""

from __future__ import annotations

import datetime
from typing import Any, Dict, Optional

from ..kernel import (
    CSSSelector,
    Extractor,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    assemble_body,
    free_access_from_ld,
    generic_date_parsing,
)

_PARAGRAPH = CSSSelector(".td-post-content > p")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(ctx.doc, paragraph_selector=_PARAGRAPH)


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.meta.get("article:published_time"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


WORLD_TRUTH = PublisherSpec(
    key="us.WorldTruth",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
