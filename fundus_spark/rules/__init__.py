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
from .euronews import EURONEWS
from .generic import GENERIC
from .golem import GOLEM
from .mdr import MDR
from .reuters import REUTERS

REGISTRY: Dict[str, PublisherSpec] = {
    spec.key: spec
    for spec in (AP_NEWS, EURONEWS, GOLEM, MDR, REUTERS, GENERIC)
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
