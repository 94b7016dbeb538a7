"""Property-based equivalence tests for the distributed dedup/assembly
operators: random inputs, compared against tiny pure-Python reference
implementations (union-find, cumsum, set algebra). The fixed-corpus
DuckDB oracles pin these ops on realistic data; these pin them on the
adversarial shapes (self-loop-free chains, singleton groups, empty
inputs) random generation finds.

Few examples per test — every example is a Spark roundtrip.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SPARK_SETTINGS = settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

edges_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda p: p[0] != p[1]),
    max_size=20,
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@SPARK_SETTINGS
@given(edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    from fundus_spark.operators import connected_components

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(0, 1)], "a long, b long"
    )
    if not edges:
        pairs = pairs.limit(0)
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    want = _union_find_components(edges)
    assert got == want


@SPARK_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(1, 50)), min_size=1, max_size=12
    ),
    st.integers(10, 60),
)
def test_pack_by_budget_matches_cumsum(spark, rows, budget):
    from fundus_spark.operators import pack_by_budget

    data = [(i, f"g{g}", n) for i, (g, n) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, source string, n_tokens long")
    got = {r.doc_id: (r.pack_offset, r.pack_bin) for r in pack_by_budget(df, budget=budget).collect()}
    want = {}
    for grp in {g for _, g, _ in data}:
        offset = 0
        for i, g, n in data:  # data is already doc_id-ordered
            if g != grp:
                continue
            want[i] = (offset, offset // budget)
            offset += n
    assert got == want


@SPARK_SETTINGS
@given(
    st.lists(st.lists(st.sampled_from("abcdef"), min_size=1, max_size=10), min_size=1, max_size=6),
    st.lists(st.lists(st.sampled_from("abcdef"), min_size=1, max_size=10), min_size=1, max_size=3),
    st.integers(1, 3),
)
def test_contamination_matches_set_algebra(spark, corpus_tokens, bench_tokens, k):
    from fundus_spark.operators import contamination_flags

    def grams(toks):
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    corpus = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(corpus_tokens)], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100 + i, " ".join(t)) for i, t in enumerate(bench_tokens)], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_shared_grams for r in contamination_flags(corpus, bench, k=k).collect()}
    bench_grams = set().union(*[grams(t) for t in bench_tokens])
    want = {}
    for i, t in enumerate(corpus_tokens):
        shared = len(grams(t) & bench_grams)
        if shared:
            want[i] = shared
    assert got == want


def _reference_winnow(text, k, window):
    """Brute-force MOSS winnowing with positions: every window of
    ``window`` consecutive k-gram hashes selects its minimum, ties to
    the FIRST occurrence; returns the distinct (fp, pos) set (1-based
    positions into the normalized text)."""
    import hashlib
    import re

    t = re.sub(r"\s+", " ", text).strip()
    if len(t) < k:
        return set()
    hashes = [
        int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(len(t) - k + 1)
    ]
    n_windows = max(len(hashes) - window + 1, 1)
    out = set()
    for j in range(n_windows):
        sl = hashes[j : j + window]
        mn = min(sl)
        out.add((mn, j + sl.index(mn) + 1))
    return out


@SPARK_SETTINGS
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=40),
        min_size=1,
        max_size=4,
    )
)
def test_winnowing_positions_match_bruteforce(spark, texts):
    """The round-6 relational winnowing (codegen hash + sliding
    min(struct) + lag run-collapse) must equal brute-force winnowing on
    arbitrary strings — in particular the run-collapse step, which
    relies on selections of one (fp, pos) being contiguous. The tiny
    'ab c' alphabet forces heavy hash ties and repeated grams."""
    from fundus_spark.operators import winnowing_fingerprints

    k, window = 3, 4
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.doc_id, r.fp, r.pos)
        for r in winnowing_fingerprints(df, k=k, window=window, max_chars=64, emit_positions=True).collect()
    }
    want = {
        (i, fp, pos)
        for i, t in enumerate(texts)
        for (fp, pos) in _reference_winnow(t[:9999], k, window)
    }
    # reference normalizes the raw text; operator clips AFTER
    # normalizing to 64 chars — inputs are <= 40 chars so no clip
    assert got == want


# ---------------------------------------------------------------------------
# round 7: mojibake round-trip and classifier-fit parity on random inputs
# ---------------------------------------------------------------------------

# valid unicode scalar values only (no surrogates), across ASCII,
# Latin-1, BMP and astral planes so 1/2/3/4-byte UTF-8 all appear
_uni_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.characters(min_codepoint=0xA0, max_codepoint=0xFF),
        st.characters(min_codepoint=0x100, max_codepoint=0x2FFF),
        st.characters(min_codepoint=0x1F300, max_codepoint=0x1F64F),
    ),
    max_size=24,
)


@SPARK_SETTINGS
@given(st.lists(_uni_text, min_size=1, max_size=8))
def test_fix_mojibake_inverts_corruption_for_any_unicode(spark, texts):
    """For ANY valid-unicode string, repairing its Latin-1-viewed
    corruption returns the original: non-ASCII strings trip the gate
    (their UTF-8 bytes are structurally valid by construction), pure
    ASCII is a fixed point of both directions."""
    from pyspark.sql import functions as F

    from fundus_spark.operators import fix_mojibake, make_mojibake

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).withColumn("text", make_mojibake(F.col("text")))
    got = {r.doc_id: r.fixed_text for r in fix_mojibake(df).collect()}
    assert got == dict(enumerate(texts))


_word = st.text(alphabet="abcdexyz", min_size=1, max_size=5)


@SPARK_SETTINGS
@given(
    st.lists(st.tuples(st.lists(_word, max_size=6), st.booleans()), min_size=1, max_size=10),
    st.integers(2, 4),
)
def test_classifier_fit_matches_reference_on_random_corpora(spark, docs, n_iter):
    """Random corpora (including empty docs and degenerate all-one-
    class labels): the distributed fit must equal the pure-Python
    reference bit for bit — the adversarial-shape twin of the
    fixed-corpus parity test."""
    from tests.test_classifier import _py_fit

    from fundus_spark.operators import quality_classifier_fit

    rows = [(i, " ".join(ws), int(y)) for i, (ws, y) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    model = quality_classifier_fit(df, n_features=8, n_iter=n_iter, lr=0.0625, salt="p")
    got = {r.j: r.w_q for r in model.collect()}
    want = _py_fit(rows, 8, n_iter, 0.0625, "p", "binary")
    assert got == {j: w for j, w in enumerate(want)}


# ---------------------------------------------------------------------------
# URL canonicalization properties (round 7)
# ---------------------------------------------------------------------------

_url_host = st.lists(
    st.text(alphabet="abCdE19-", min_size=1, max_size=4), min_size=1, max_size=3
).map(lambda ls: ".".join(ls))
_url_path = st.lists(
    st.text(alphabet="AbC2/._~-", max_size=5), max_size=3
).map(lambda ls: ("/" + "/".join(ls)) if ls else "")
_url_query = st.lists(
    st.sampled_from(
        ["a=1", "b=2", "utm_source=x", "fbclid=Y", "ref=hn", "refresh=1", "z", ""]
    ),
    max_size=4,
).map(lambda ps: ("?" + "&".join(ps)) if ps else "")
_url_strategy = st.builds(
    lambda scheme, user, host, port, path, query, frag: (
        f"{scheme}://{user}{host}{port}{path}{query}{frag}"
    ),
    st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    st.sampled_from(["", "u@", "u:p@"]),
    _url_host,
    st.sampled_from(["", ":80", ":443", ":8080"]),
    _url_path,
    _url_query,
    st.sampled_from(["", "#f", "#sec-2"]),
)


@SPARK_SETTINGS
@given(st.lists(_url_strategy, min_size=1, max_size=8))
def test_normalize_url_is_idempotent(spark, urls):
    """normalize(normalize(u)) == normalize(u) for arbitrary messy URLs
    — the fixed-point property that makes the canonical form a safe
    dedup key (re-canonicalizing stored keys is a no-op)."""
    from pyspark.sql import functions as F

    from fundus_spark.operators.urlnorm import normalize_url_col

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        normalize_url_col(F.col("url")).alias("c1"),
    ).select("c1", normalize_url_col(F.col("c1")).alias("c2"))
    for r in out.collect():
        assert r["c1"] == r["c2"], (r["c1"], r["c2"])


def _py_suffixes(host: str):
    parts = host.split(".") if host else []
    return [".".join(parts[i:]) for i in range(len(parts)) if ".".join(parts[i:])]


@SPARK_SETTINGS
@given(st.lists(_url_host, min_size=1, max_size=8))
def test_host_suffixes_matches_python_reference(spark, hosts):
    from pyspark.sql import functions as F

    from fundus_spark.operators.urlnorm import host_suffixes_col

    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    got = {
        r["h"]: list(r["s"])
        for r in df.select("h", host_suffixes_col(F.col("h")).alias("s")).collect()
    }
    for h in hosts:
        assert got[h] == _py_suffixes(h), h


@SPARK_SETTINGS
@given(
    st.lists(_url_strategy, min_size=1, max_size=8),
    st.lists(_url_host, max_size=4),
)
def test_host_filter_matches_python_reference(spark, urls, blocklist):
    """Literal-regime host_filter vs a pure-Python longest-suffix-match
    reference over arbitrary hosts/blocklists (label boundaries,
    never substring containment)."""
    from pyspark.sql import functions as F

    from fundus_spark.operators.urlnorm import host_col, host_filter

    df = spark.createDataFrame(list(enumerate(urls)), "doc_id long, url string")
    hosts = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", host_col(F.col("url")).alias("h")).collect()
    }
    entries = {b.lower().strip(".") for b in blocklist if b.strip(".")}

    def ref_match(host):
        cands = [s for s in _py_suffixes(host) if s in entries]
        return max(cands, key=len) if cands else None

    got = {
        r["doc_id"]: r["matched_domain"]
        for r in host_filter(df, sorted(entries) or ["x.invalid"], mode="annotate").collect()
    }
    for i in got:
        assert got[i] == ref_match(hosts[i]), (hosts[i], got[i])
