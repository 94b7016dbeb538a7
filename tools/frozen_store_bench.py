"""One-off measurement: bucketed frozen-store probe vs plain parquet
in the BACKFILL regime (batch too large to broadcast, sort-merge
probe joins). The structural claim — the bucketed side joins with
zero frozen-side Exchange — is pinned by tests/test_frozen_store.py;
this records the wall/CPU effect at a bench-scale corpus for
BASELINE.md.

Usage: python tools/frozen_store_bench.py [frozen_factor] [batch_factor]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fundus_spark.operators.dedup import incremental_assign  # noqa: E402
from fundus_spark.plans import build_session, read_frozen_state, write_frozen_state  # noqa: E402
from tools.scale_corpus import materialize_scaled_corpus  # noqa: E402


def _cpu_seconds() -> float:
    # driver process + children (the local-mode JVM runs in-process
    # workers; python workers are children) — wall is noisy on this
    # shared host, CPU is the comparable number
    self_u = resource.getrusage(resource.RUSAGE_SELF)
    kids = resource.getrusage(resource.RUSAGE_CHILDREN)
    return self_u.ru_utime + self_u.ru_stime + kids.ru_utime + kids.ru_stime


def main() -> None:
    frozen_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    batch_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="frozen-store-bench", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    for k in ("spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.autoBroadcastJoinThreshold"):
        spark.conf.set(k, "-1")

    tmp_root = os.environ.get("TMPDIR", "/tmp")
    frozen_dir = os.path.join(tmp_root, f"fundus_spark_scale_x{frozen_factor}_frozen")
    batch_dir = os.path.join(tmp_root, f"fundus_spark_scale_x{batch_factor}_frozen")
    materialize_scaled_corpus(spark, sf_dir, frozen_dir, frozen_factor, tables=("documents",))
    materialize_scaled_corpus(spark, sf_dir, batch_dir, batch_factor, tables=("documents",))
    frozen = spark.read.parquet(os.path.join(frozen_dir, "documents.parquet"))
    # shift batch ids above the frozen id space (monotone-id contract)
    batch = spark.read.parquet(os.path.join(batch_dir, "documents.parquet")).selectExpr(
        "doc_id + 1000000000000 as doc_id", "source", "text"
    )
    n_frozen, n_batch = frozen.count(), batch.count()

    tmp = tempfile.mkdtemp(prefix="frozen_store_bench_")
    store = os.path.join(tmp, "store")
    t0 = time.monotonic()
    write_frozen_state(frozen, store, num_buckets=32)
    freeze_s = time.monotonic() - t0
    _, bands_bucketed, _ = read_frozen_state(spark, store)
    plain_path = os.path.join(tmp, "plain_bands")
    bands_bucketed.write.mode("overwrite").parquet(plain_path)
    bands_plain = spark.read.parquet(plain_path)

    def probe(frozen_bands):
        out = incremental_assign(batch, frozen, frozen_bands=frozen_bands)
        return out.count()

    results = {"bucketed": [], "plain": []}
    rows = {}
    for _ in range(3):  # interleave reps so host drift hits both arms
        for name, rel in (("bucketed", bands_bucketed), ("plain", bands_plain)):
            w0, c0 = time.monotonic(), _cpu_seconds()
            rows[name] = probe(rel)
            results[name].append({"wall": time.monotonic() - w0, "cpu": _cpu_seconds() - c0})
    assert rows["bucketed"] == rows["plain"]

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    summary = {
        "n_frozen": n_frozen,
        "n_batch": n_batch,
        "freeze_write_s": round(freeze_s, 2),
        "probe_rows": rows["bucketed"],
        "bucketed_wall_s": round(med([r["wall"] for r in results["bucketed"]]), 2),
        "plain_wall_s": round(med([r["wall"] for r in results["plain"]]), 2),
        "bucketed_cpu_s": round(med([r["cpu"] for r in results["bucketed"]]), 2),
        "plain_cpu_s": round(med([r["cpu"] for r in results["plain"]]), 2),
        "reps": results,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
