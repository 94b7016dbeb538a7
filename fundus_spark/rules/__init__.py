"""Publisher rule registry.

The registry is a plain dict ``publisher_key -> PublisherSpec`` —
picklable, broadcastable to executors (compiled selectors are
pure-Python objects). Equivalent role to the reference's
``PublisherCollection`` / ``parser_mapping``
(``src/fundus/scraping/scraper.py:35``), minus the metaclass machinery.
"""

from __future__ import annotations

from typing import Dict, Optional

from ..kernel import PublisherSpec
from .ap_news import AP_NEWS
from .berliner_zeitung import BERLINER_ZEITUNG
from .business_insider import BUSINESS_INSIDER
from .cnbc import CNBC
from .dw import DW
from .euronews import EURONEWS
from .fox_news import FOX_NEWS
from .generic import GENERIC
from .golem import GOLEM
from .la_times import LA_TIMES
from .mdr import MDR
from .the_new_yorker import THE_NEW_YORKER
from .reuters import REUTERS
from .rolling_stone import ROLLING_STONE
from .techcrunch import TECHCRUNCH
from .the_bbc import THE_BBC
from .the_guardian import THE_GUARDIAN
from .the_intercept import THE_INTERCEPT
from .voice_of_america import VOICE_OF_AMERICA
from .wired import WIRED

REGISTRY: Dict[str, PublisherSpec] = {
    spec.key: spec
    for spec in (
        AP_NEWS,
        BERLINER_ZEITUNG,
        BUSINESS_INSIDER,
        CNBC,
        DW,
        EURONEWS,
        FOX_NEWS,
        GOLEM,
        LA_TIMES,
        MDR,
        THE_NEW_YORKER,
        REUTERS,
        ROLLING_STONE,
        TECHCRUNCH,
        THE_BBC,
        THE_GUARDIAN,
        THE_INTERCEPT,
        VOICE_OF_AMERICA,
        WIRED,
        GENERIC,
    )
}

# Euronews is a shared multi-tenant parser in the reference
# (src/fundus/publishers/shared/euronews.py) — alias the per-country
# publisher keys used by the golden corpus onto the same spec.
for _alias in ("uk.EuronewsEN", "de.EuronewsDE", "fr.EuronewsFR"):
    REGISTRY[_alias] = PublisherSpec(key=_alias, versions=EURONEWS.versions)


def resolve(publisher_key: Optional[str]) -> PublisherSpec:
    if publisher_key and publisher_key in REGISTRY:
        return REGISTRY[publisher_key]
    return GENERIC


__all__ = ["REGISTRY", "resolve", "AP_NEWS", "EURONEWS", "GENERIC", "GOLEM", "MDR", "REUTERS"]
