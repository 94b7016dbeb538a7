"""Statically extract per-publisher language sets from the reference
registry (``/root/reference/src/fundus/publishers/<cc>/__init__.py``).

Reference semantics (``publishers/base_objects.py:228-229,331-334``):
``Publisher.languages`` is the union of ``source.languages`` over all
sources, where a source without an explicit ``languages={...}`` kwarg
inherits the group's ``default_language``. The reference cannot be
imported here (lxml absent), so this walks the AST instead; it feeds
the LANGUAGE_OVERRIDES table in ``fundus_spark/rules/search.py`` and
the parity test that keeps that table honest.

Usage: python tools/ref_languages.py  -> JSON {"cc.Name": ["de", ...]}
"""

from __future__ import annotations

import ast
import json
from pathlib import Path
from typing import Dict, Set

REF_PUBLISHERS = Path("/root/reference/src/fundus/publishers")

URL_SOURCE_NAMES = {"RSSFeed", "Sitemap", "NewsMap"}


def _call_name(call: ast.Call) -> str:
    fn = call.func
    if isinstance(fn, ast.Name):
        return fn.id
    if isinstance(fn, ast.Attribute):
        return fn.attr
    return ""


def _literal_str_set(node: ast.AST) -> Set[str]:
    got = ast.literal_eval(node)
    if isinstance(got, (set, list, tuple, frozenset)):
        return {str(x) for x in got}
    raise ValueError(f"not a set literal: {ast.dump(node)}")


def _source_languages(call: ast.Call, default: str) -> Set[str]:
    for kw in call.keywords:
        if kw.arg == "languages":
            return _literal_str_set(kw.value)
    return {default} if default else set()


def group_languages(init_py: Path) -> Dict[str, Set[str]]:
    """Publisher name -> language set for one country group module."""
    tree = ast.parse(init_py.read_text())
    out: Dict[str, Set[str]] = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.ClassDef):
            continue
        default = ""
        for stmt in node.body:
            if (
                isinstance(stmt, ast.Assign)
                and len(stmt.targets) == 1
                and isinstance(stmt.targets[0], ast.Name)
                and stmt.targets[0].id == "default_language"
            ):
                default = ast.literal_eval(stmt.value)
        for stmt in node.body:
            if not (
                isinstance(stmt, ast.Assign)
                and len(stmt.targets) == 1
                and isinstance(stmt.targets[0], ast.Name)
                and isinstance(stmt.value, ast.Call)
                and _call_name(stmt.value) == "Publisher"
            ):
                continue
            name = stmt.targets[0].id
            langs: Set[str] = set()
            for kw in stmt.value.keywords:
                if kw.arg != "sources" or not isinstance(kw.value, (ast.List, ast.Tuple)):
                    continue
                for src in kw.value.elts:
                    if isinstance(src, ast.Call) and _call_name(src) in URL_SOURCE_NAMES:
                        langs |= _source_languages(src, default)
            if langs:
                out[name] = langs
    return out


def all_publisher_languages() -> Dict[str, Set[str]]:
    """'cc.Name' -> language set over the whole reference registry."""
    result: Dict[str, Set[str]] = {}
    for init_py in sorted(REF_PUBLISHERS.glob("*/__init__.py")):
        cc = init_py.parent.name
        for name, langs in group_languages(init_py).items():
            result[f"{cc}.{name}"] = langs
    return result


if __name__ == "__main__":
    print(json.dumps({k: sorted(v) for k, v in sorted(all_publisher_languages().items())}, indent=1))
