"""Per-turn extraction equality vs the reference's own golden parser
corpus (north_rule correctness gate).

Every attribute of every publisher×version golden JSON must match the
kernel's extraction byte-for-byte (values compared after the same
serialization the goldens use).
"""

from __future__ import annotations

import pytest

from fundus_spark.kernel import run_extraction
from fundus_spark.rules import REGISTRY

from .golden import GoldenCase, iter_golden_cases, normalize_extraction

CASES = list(iter_golden_cases())


def _case_id(case: GoldenCase) -> str:
    return f"{case.publisher_key}:{case.version}"


@pytest.mark.parametrize("case", CASES, ids=_case_id)
def test_golden_extraction_equality(case: GoldenCase) -> None:
    spec = REGISTRY[case.publisher_key]
    extraction = normalize_extraction(run_extraction(spec, case.html, case.crawl_date, error_handling="raise"))
    for key, expected in case.expected.items():
        assert key in extraction, f"missing attribute {key!r}"
        assert extraction[key] == expected, f"attribute {key!r} diverges from golden"


def test_corpus_is_nontrivial() -> None:
    assert len(CASES) >= 10
    versions = {(c.publisher_key, c.version) for c in CASES}
    assert len(versions) >= 10


def test_version_dispatch_by_date() -> None:
    import datetime

    spec = REGISTRY["us.APNews"]
    assert spec.version_for(datetime.datetime(2023, 4, 28)).name == "V1"
    assert spec.version_for(datetime.datetime(2024, 9, 3)).name == "V1_1"
    assert spec.version_for(None).name == "V1_1"
