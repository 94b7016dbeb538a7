"""Pure-SQL XXH64 (seed 42 — Spark's ``xxhash64`` on UTF8 strings),
generated for DuckDB: HUGEINT modular arithmetic + recursive CTEs over
byte positions. Exists so the production-hash minhash twin
(``minhash_xxhash``) can be oracle-gated exactly instead of rows-only.

Scope: ASCII inputs (byte i == code point of char i). The corpus
shingles and salts are ASCII by construction; a non-ASCII input would
need a UTF8-byte table instead of ``unicode(substr(...))``.
"""

from __future__ import annotations

M = 18446744073709551616  # 2^64
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
SEED = 42


def _rot(x: str, r: int) -> str:
    return f"((({x}) * {1 << r}) % {M} + (({x}) // {1 << (64 - r)}))"


def _mask(x: str) -> str:
    return f"(({x}) % {M})"


def _mulmod(a: str, c: int) -> str:
    """(a * c) mod 2^64 without overflowing signed INT128: split a into
    32-bit halves so every intermediate stays under 2^97."""
    hi = f"(((({a}) // {1 << 32}) * {c}) % {1 << 32}) * {1 << 32}"
    lo = f"(({a}) % {1 << 32}) * {c}"
    return f"((({hi}) + ({lo})) % {M})"


def _rnd(acc: str, lane: str) -> str:
    inner = _mask(f"({acc}) + {_mulmod(lane, P2)}")
    return _mulmod(_rot(inner, 31), P1)


def _byte(col: str, i: str) -> str:
    return f"CAST(unicode(substr({col}, {i}, 1)) AS HUGEINT)"


def _lane8(col: str, start: str) -> str:
    return " + ".join(f"{_byte(col, f'({start}) + {j}')} * {1 << (8 * j)}" for j in range(8))


def _lane4(col: str, start: str) -> str:
    return " + ".join(f"{_byte(col, f'({start}) + {j}')} * {1 << (8 * j)}" for j in range(4))


def xxh64_hash_cte(strings_rel: str) -> str:
    """Returns CTE definitions (to splice after a WITH RECURSIVE) that
    compute ``xh(s, h)``: the unsigned XXH64(seed 42) of every distinct
    string ``s`` in ``{strings_rel}(s)``. Caller's WITH must already be
    RECURSIVE."""
    v1_0 = (SEED + P1 + P2) % M
    v2_0 = (SEED + P2) % M
    v3_0 = SEED
    v4_0 = (SEED - P1) % M
    h_short = (SEED + P5) % M

    # DuckDB HUGEINT xor is the two-arg xor() function
    x8 = "xor(h, " + _rnd("0", "lane") + ")"
    step8 = _mask(_mulmod(_rot(x8, 27), P1) + f" + {P4}")
    x4 = "xor(h, " + _mulmod("lane", P1) + ")"
    step4 = _mask(_mulmod(_rot(x4, 23), P2) + f" + {P3}")
    xb = "xor(h, " + _mulmod("lane", P5) + ")"
    stepb = _mulmod(_rot(xb, 11), P1)

    merge_h = _mask(f"{_rot('v1', 1)} + {_rot('v2', 7)} + {_rot('v3', 12)} + {_rot('v4', 18)}")
    for v in ("v1", "v2", "v3", "v4"):
        merge_h = _mask(_mulmod("xor((" + merge_h + "), (" + _rnd("0", v) + "))", P1) + f" + {P4}")

    avalanche = "h"
    avalanche = f"xor({avalanche}, ({avalanche}) // {1 << 33})"
    avalanche = _mulmod(avalanche, P2)
    avalanche = f"xor({avalanche}, ({avalanche}) // {1 << 29})"
    avalanche = _mulmod(avalanche, P3)
    avalanche = f"xor({avalanche}, ({avalanche}) // {1 << 32})"

    step4_inline = step4.replace("lane", "(" + _lane4("s", "p + 1") + ")")
    return f"""
xs AS (SELECT s, octet_length(encode(s)) AS n FROM {strings_rel}),
blk(s, n, p, v1, v2, v3, v4) AS (
    SELECT s, n, 0,
           CAST({v1_0} AS HUGEINT), CAST({v2_0} AS HUGEINT),
           CAST({v3_0} AS HUGEINT), CAST({v4_0} AS HUGEINT)
    FROM xs WHERE n >= 32
    UNION ALL
    SELECT s, n, p + 32,
           {_rnd('v1', 'l1')}, {_rnd('v2', 'l2')}, {_rnd('v3', 'l3')}, {_rnd('v4', 'l4')}
    FROM (
        SELECT s, n, p, v1, v2, v3, v4,
               {_lane8('s', 'p + 1')} AS l1,
               {_lane8('s', 'p + 9')} AS l2,
               {_lane8('s', 'p + 17')} AS l3,
               {_lane8('s', 'p + 25')} AS l4
        FROM blk WHERE n - p >= 32
    ) t
),
hdr AS (
    SELECT s, n, p, {merge_h} AS h
    FROM blk WHERE n - p < 32
    UNION ALL
    SELECT s, n, 0, CAST({h_short} AS HUGEINT) FROM xs WHERE n < 32
),
hlen AS (SELECT s, n, p, (h + n) % {M} AS h FROM hdr),
loop8(s, n, p, h) AS (
    SELECT s, n, p, h FROM hlen
    UNION ALL
    SELECT s, n, p + 8, {step8}
    FROM (SELECT s, n, p, h, {_lane8('s', 'p + 1')} AS lane FROM loop8 WHERE n - p >= 8) t
),
c4 AS (
    SELECT s, n,
           CASE WHEN n - p >= 4 THEN p + 4 ELSE p END AS p,
           CASE WHEN n - p >= 4 THEN {step4_inline} ELSE h END AS h
    FROM loop8 WHERE n - p < 8
),
loopb(s, n, p, h) AS (
    SELECT s, n, p, h FROM c4
    UNION ALL
    SELECT s, n, p + 1, {stepb}
    FROM (SELECT s, n, p, h, {_byte('s', 'p + 1')} AS lane FROM loopb WHERE n - p >= 1) t
),
xh AS (SELECT s, {avalanche} AS h FROM loopb WHERE n - p < 1)
"""
