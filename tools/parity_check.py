"""Dev loop: run one publisher's reference goldens through the kernel
and print per-attribute parity diffs.

Usage: python tools/parity_check.py <publisher_key> <cc_dir> <prefix>
e.g.:  python tools/parity_check.py us.TechCrunch us TechCrunch
"""

from __future__ import annotations

import datetime
import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fundus_spark.kernel import run_extraction  # noqa: E402
from fundus_spark.rules import REGISTRY  # noqa: E402

REF = Path("/root/reference/tests/resources/parser/test_data")


def main(publisher_key: str, cc: str, prefix: str) -> int:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from golden import normalize_extraction

    country = REF / cc
    expected_by_version = json.loads((country / f"{prefix}.json").read_text())
    meta = json.loads((country / "meta.info").read_text())
    spec = REGISTRY[publisher_key]
    failures = 0
    for snapshot in sorted(country.glob(f"{prefix}_*.html.gz")):
        info = meta[snapshot.name]
        crawl_date = datetime.datetime.fromisoformat(info["crawl_date"])
        version = spec.version_for(crawl_date).name
        if version not in expected_by_version:
            print(f"-- {snapshot.name}: no golden for version {version}, skipped")
            continue
        html = gzip.decompress(snapshot.read_bytes()).decode("utf-8")
        try:
            got = normalize_extraction(run_extraction(spec, html, crawl_date, error_handling="raise"))
        except Exception as err:  # noqa: BLE001
            print(f"XX {snapshot.name} [{version}]: extraction raised {type(err).__name__}: {err}")
            failures += 1
            continue
        for key, want in expected_by_version[version].items():
            have = got.get(key, "<MISSING>")
            if have == want:
                print(f"ok {snapshot.name} [{version}] {key}")
            else:
                failures += 1
                print(f"XX {snapshot.name} [{version}] {key}")
                print(f"   want: {json.dumps(want, ensure_ascii=False)[:600]}")
                print(f"   have: {json.dumps(have, ensure_ascii=False, default=str)[:600]}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2], sys.argv[3]) else 0)
