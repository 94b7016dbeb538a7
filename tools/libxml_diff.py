"""Dev tool: diff our DOM's node stream against REAL libxml2 (the
reference's parser), driven via ctypes over the system libxml2.so —
no lxml needed. Finds the exact divergent node behind golden
image-position deltas.

Usage: python tools/libxml_diff.py <html.gz path> [window]
"""

from __future__ import annotations

import ctypes
import difflib
import gzip
import sys
from ctypes import POINTER, Structure, c_char_p, c_int, c_void_p
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# default = system 2.9.14; pass LIBXML_SO=/root/miniconda/lib/libxml2.so.2.13.9
# to diff against the lxml-5.x-era parser instead (both exist on this box;
# see the il Giornale forensics in rules/il_giornale.py for why both matter)
import os

lib = ctypes.CDLL(os.environ.get("LIBXML_SO", "libxml2.so.2"))


class xmlNode(Structure):
    pass


xmlNode._fields_ = [
    ("_private", c_void_p),
    ("type", c_int),
    ("name", c_char_p),
    ("children", POINTER(xmlNode)),
    ("last", POINTER(xmlNode)),
    ("parent", POINTER(xmlNode)),
    ("next", POINTER(xmlNode)),
    ("prev", POINTER(xmlNode)),
    ("doc", c_void_p),
]

lib.htmlReadMemory.restype = c_void_p
lib.htmlReadMemory.argtypes = [c_char_p, c_int, c_char_p, c_char_p, c_int]
lib.xmlDocGetRootElement.restype = POINTER(xmlNode)
lib.xmlDocGetRootElement.argtypes = [c_void_p]

# HTML_PARSE_RECOVER | NOERROR | NOWARNING | NONET (lxml's defaults)
_OPTS = 1 | 32 | 64 | 2048


def libxml_nodes(data: bytes):
    doc = lib.htmlReadMemory(data, len(data), b"", None, _OPTS)
    root = lib.xmlDocGetRootElement(doc)
    out = []

    def walk(n, parent):
        while n:
            t = n.contents.type
            if t in (1, 5, 7, 8):  # element/entity/pi/comment — lxml iter() node kinds
                nm = n.contents.name.decode() if t == 1 and n.contents.name else "#comment"
                out.append((nm, parent))
                if n.contents.children:
                    walk(n.contents.children, nm)
            n = n.contents.next

    out.append(("html", None))
    if root and root.contents.children:
        walk(root.contents.children, "html")
    return out


def our_nodes(text: str):
    from fundus_spark.kernel import parse_html
    from fundus_spark.kernel.dom import Comment

    doc = parse_html(text)
    out = []
    for n in doc.iter():
        parent = n.getparent()
        out.append(
            (
                "#comment" if isinstance(n, Comment) else n.tag,
                None if parent is None else parent.tag,
            )
        )
    return out


def main(path: str, window: int = 6) -> int:
    raw = gzip.decompress(Path(path).read_bytes()) if path.endswith(".gz") else Path(path).read_bytes()
    ln = [t for t, _ in libxml_nodes(raw)]
    on = [t for t, _ in our_nodes(raw.decode("utf-8", errors="replace"))]
    print(f"libxml2: {len(ln)} nodes   ours: {len(on)} nodes")
    sm = difflib.SequenceMatcher(None, on, ln, autojunk=False)
    n_diff = 0
    for op, a1, a2, b1, b2 in sm.get_opcodes():
        if op != "equal":
            n_diff += 1
            print(f"{op}: ours[{a1}:{a2}]={on[a1:a2][:window]}  libxml[{b1}:{b2}]={ln[b1:b2][:window]}")
    if not n_diff:
        print("node streams identical")
    return 0 if not n_diff else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 6))
