"""URL canonicalization + canonical-URL dedup — the normalization pass
web-scale pipelines run before URL-keyed dedup (RFC 3986 §6 syntax
normalization plus the tracking-parameter strip every CommonCrawl-scale
curation stack applies; cf. RefinedWeb's URL dedup, Penedo et al. 2023).

The reference dedups raw URLs exactly as strings (its crawler's
``only_unique`` in-process set, ``src/fundus/scraping/crawler.py:447-450``
and the ``URLFilter`` surface, ``scraping/filter.py``); at corpus scale
the same article arrives as ``http://www.ex.com/a?utm_source=feed``,
``https://ex.com/a/`` and ``https://EX.com:443/a#frag`` — raw-string
dedup misses all three. This operator folds the equivalence class to
one canonical key; dedup/join machinery downstream is unchanged.

Normalization steps (each a documented, reversible-decision rule):
1. trim; non-``scheme://`` inputs pass through UNTOUCHED (honest: we
   never guess at relative refs or mailto:).
2. scheme and host lowercased (RFC 3986 §6.2.2.1); path/query case
   preserved (significant per §6.2.3).
3. fragment stripped (§3.5 — never sent to the server).
4. userinfo stripped (credential hygiene: never a dedup key).
5. default port stripped (``:80`` http / ``:443`` https, §6.2.3).
6. leading ``www.`` stripped (optional, default on — the standard
   crawl-pipeline host fold).
7. trailing slashes collapsed off the path; empty path -> ``/``.
8. query: tracking params dropped (``utm_*`` and friends, see
   :data:`TRACKING_PARAMS`), empties dropped, survivors SORTED (param
   order is almost never significant; sorting makes the key stable),
   empty query removed.

Everything is JVM column algebra — regexp/split/filter/array_sort/
array_join over one row, zero shuffles, no UDF — and every step is
replayed verbatim by the driver's DuckDB oracle (``url_dedup`` extra).

Scale shape: normalization is a narrow projection (free at 100 TB);
:func:`url_dedup` is ONE map-side-combinable ``min(struct)`` agg on
the canonical key — the same first-wins shape as ``exact_dedup``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters that never identify content — analytics/campaign
#: tags (Google Analytics utm_*, click ids from FB/Google/MS, Mailchimp
#: mc_*, Instagram igshid, and bare referrer tags). Matched against the
#: full param name (the part before ``=``).
TRACKING_PARAMS: tuple[str, ...] = (
    "utm_[A-Za-z0-9_]*",
    "fbclid",
    "gclid",
    "msclkid",
    "mc_cid",
    "mc_eid",
    "igshid",
    "ref",
    "ref_src",
)


def _tracking_regex(drop_params: Sequence[str]) -> str:
    """Anchored alternation matching a ``name=value`` (or bare ``name``)
    query param whose name is a tracking tag."""
    return r"^(?:" + "|".join(drop_params) + r")(?:=|$)"


def normalize_url_col(
    url: Column,
    *,
    strip_www: bool = True,
    drop_params: Sequence[str] = TRACKING_PARAMS,
) -> Column:
    """Canonical form of ``url`` as a Column (see module docstring for
    the rule list). Inputs without a ``scheme://`` prefix are returned
    trimmed but otherwise untouched."""
    s = F.trim(url)
    scheme = F.lower(F.regexp_extract(s, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    # everything after ``scheme://``, fragment gone first (rule 3)
    rest = F.regexp_replace(
        F.regexp_replace(s, r"#.*", ""), r"^[A-Za-z][A-Za-z0-9+.\-]*://", ""
    )
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    path_q = F.regexp_replace(rest, r"^[^/?]*", "")
    # rules 2/4: lowercase host:port, userinfo dropped
    hostport = F.lower(F.regexp_extract(authority, r"([^@]*)$", 1))
    # rule 5: default ports
    hostport = F.when(
        (scheme == "http"), F.regexp_replace(hostport, r":80$", "")
    ).otherwise(
        F.when(
            (scheme == "https"), F.regexp_replace(hostport, r":443$", "")
        ).otherwise(hostport)
    )
    if strip_www:
        hostport = F.regexp_replace(hostport, r"^www\.", "")
    # rule 7: path with trailing slashes collapsed, '' -> '/'
    path = F.regexp_replace(F.regexp_replace(path_q, r"\?.*", ""), r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # rule 8: query params filtered + sorted
    query = F.regexp_extract(path_q, r"\?(.*)$", 1)
    pat = _tracking_regex(drop_params)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(pat),
        )
    )
    joined = F.array_join(params, "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(joined == "", F.lit("")).otherwise(F.concat(F.lit("?"), joined)),
    )
    return F.when(scheme == "", s).otherwise(canonical)


def normalize_urls(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
    *,
    strip_www: bool = True,
    drop_params: Sequence[str] = TRACKING_PARAMS,
) -> DataFrame:
    """``df`` plus a canonical-URL column — a narrow zero-shuffle
    projection whatever the corpus size."""
    return df.withColumn(
        out_col,
        normalize_url_col(
            F.col(url_col), strip_www=strip_www, drop_params=drop_params
        ),
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    *,
    strip_www: bool = True,
    drop_params: Sequence[str] = TRACKING_PARAMS,
) -> DataFrame:
    """First-wins dedup on the CANONICAL url: one row per equivalence
    class ``(canonical_url, kept_id, n_variants)`` with the smallest id
    kept — deterministic, and the same ONE map-side-combinable
    ``min``/``count`` agg shape as ``exact_dedup`` (no window over a
    possibly-hot raw-URL key)."""
    normed = normalize_urls(
        df, url_col, "canonical_url", strip_www=strip_www, drop_params=drop_params
    )
    return normed.groupBy("canonical_url").agg(
        F.min(F.col(id_col)).alias("kept_id"),
        F.count(F.lit(1)).alias("n_variants"),
    )
