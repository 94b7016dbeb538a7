"""Self-test for the pure-SQL XXH64 generator
(fundus_spark/xxh64_sql.py) against Spark-produced ground truth."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fundus_spark.xxh64_sql import xxh64_hash_cte

if __name__ == "__main__":
    import duckdb

    tests = ["", "a", "ab", "abc", "abcd", "abcdefgh", "hello world",
             "p0:the quick brown fox", "x" * 31, "y" * 32, "z" * 40,
             "p3:one two three four five six"]
    expected = [-7444071767201028348, -8582455328737087284, 2710560539726725091,
                1423657621850124518, -6810745876291105281, 2470326616177429180,
                7620854247404556961, -7314368921177993259, -1716462135722163746,
                5202031258905353636, 3704736774823768419, -3691402147082881538]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    for s in tests:
        con.execute("INSERT INTO t VALUES (?)", [s])
    sql = f"WITH RECURSIVE {xxh64_hash_cte('t')} SELECT s, h FROM xh"
    got = {s: h for s, h in con.execute(sql).fetchall()}
    ok = True
    for s, e in zip(tests, expected):
        signed = got[s] - (1 << 64) if got[s] >= (1 << 63) else got[s]
        status = "OK" if signed == e else f"MISMATCH got {signed} want {e}"
        if signed != e:
            ok = False
        print(repr(s[:14]), status)
    raise SystemExit(0 if ok else 1)
