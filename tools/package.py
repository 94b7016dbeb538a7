"""Build the ``--py-files`` artifact: zip the ``fundus_spark`` package
(sources only — rules, kernel, operators, plans, streaming) so a
cluster submit ships the exact code the local tests ran.

    python tools/package.py            # -> dist/fundus_spark.zip
"""

from __future__ import annotations

import pathlib
import zipfile


def build(dest: str = "dist/fundus_spark.zip") -> str:
    root = pathlib.Path(__file__).resolve().parent.parent
    out = root / dest
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((root / "fundus_spark").rglob("*.py")):
            if "__pycache__" in p.parts:
                continue
            z.write(p, p.relative_to(root))
    return str(out)


if __name__ == "__main__":
    print(build())
