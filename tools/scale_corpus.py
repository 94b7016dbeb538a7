"""Materialize a factor-N scale-up of an sf directory for the
scale-stress bench (round-5 verdict #2: every published number is
sf0.1 — measure the 100 TB design claims under 10x data).

The scale-up must preserve the WORKLOAD SHAPE, not just the row count,
so naive replication is wrong in two ways this module avoids:

* identical replicated text/embeddings would make every row an exact
  near-duplicate of its 9 copies — the dedup/similarity queries' OUTPUT
  would then grow quadratically BY CONSTRUCTION (C(10,2) pairs per
  original row), drowning the signal the stress run exists to measure
  (does the PLAN grow linearly?). Replicas are therefore decorrelated:
  document words get a per-replica suffix (changes every shingle), and
  embeddings are cyclically rolled by the replica index (preserves
  norm/distribution, kills cross-replica cosine alignment);
* colliding keys would multiply join fan-outs superlinearly — every
  fact-table key is shifted by ``replica * 2^33`` instead (dimension
  tables nation/region stay 1x, like real dims).

The result: a factor-N corpus on which every headline query should
cost ~N x its base time if its plan is linear — super-linear growth
localizes a scale defect. A ``_MANIFEST.json`` caches the
materialization (same source + factor -> skip).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

KEY_SHIFT = 1 << 33

SHIFT_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": [],
    "region": [],
}


def _src_fingerprint(src_dir: str) -> dict:
    """Cheap content fingerprint of the source fixture: per-table total
    byte size and max mtime_ns over the parquet files. Keying the
    manifest on (path, factor) alone silently reused a stale scaled
    corpus after the sf fixture was regenerated — growth ratios then
    compared new base timings against old stressed data."""
    fp = {}
    for table in SHIFT_COLS:
        src = Path(src_dir) / f"{table}.parquet"
        if not src.exists():
            continue
        files = sorted(src.rglob("*")) if src.is_dir() else [src]
        stats = [f.stat() for f in files if f.is_file()]
        fp[table] = {
            "bytes": sum(s.st_size for s in stats),
            "mtime_ns": max((s.st_mtime_ns for s in stats), default=0),
        }
    return fp


def materialize_scaled_corpus(
    spark, src_dir: str, dst_dir: str, factor: int, tables=None
) -> dict:
    """Build ``dst_dir`` as a factor-N decorrelated replica of
    ``src_dir``; returns per-table row counts. Cached via manifest
    keyed on (source path, factor, table subset, source content
    fingerprint). ``tables`` restricts the replica to a subset — the
    30x dedup/curate stress only needs documents + embeddings, and
    skipping lineitem/events keeps a second-decade corpus cheap."""
    from pyspark.sql import functions as F

    manifest_path = Path(dst_dir) / "_MANIFEST.json"
    subset = dict(SHIFT_COLS) if tables is None else {t: SHIFT_COLS[t] for t in tables}
    want = {
        "src": src_dir,
        "factor": factor,
        "tables": sorted(subset),
        "src_fp": _src_fingerprint(src_dir),
    }
    if manifest_path.exists():
        have = json.loads(manifest_path.read_text())
        if {k: have.get(k) for k in want} == want:
            return have["rows"]

    os.makedirs(dst_dir, exist_ok=True)
    rows = {}
    for table, keys in subset.items():
        src = f"{src_dir}/{table}.parquet"
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        if not keys:  # dimension table: stays 1x
            out = df
        else:
            rep = spark.range(factor).select(F.col("id").alias("_replica"))
            out = df.crossJoin(rep)
            for key in keys:
                out = out.withColumn(key, F.col(key) + F.col("_replica") * F.lit(KEY_SHIFT))
            if table == "documents":
                # decorrelate text across replicas: suffix every word
                # with the replica tag so every k-gram shingle differs
                # (replica 0 keeps the original bytes)
                out = out.withColumn(
                    "text",
                    F.when(F.col("_replica") == 0, F.col("text")).otherwise(
                        F.array_join(
                            F.transform(
                                F.split(F.col("text"), " "),
                                lambda w: F.concat(w, F.lit("~"), F.col("_replica").cast("string")),
                            ),
                            " ",
                        )
                    ),
                )
            if table == "embeddings":
                # decorrelate vectors: cyclic roll by replica index —
                # same norm and value distribution, no cross-replica
                # cosine alignment
                n = F.size(F.col("embedding"))
                r = (F.col("_replica") % n).cast("int")
                out = out.withColumn(
                    "embedding",
                    F.when(F.col("_replica") == 0, F.col("embedding")).otherwise(
                        F.concat(
                            F.slice(F.col("embedding"), r + 1, n - r),
                            F.slice(F.col("embedding"), 1, r),
                        )
                    ),
                )
            out = out.drop("_replica")
        dst = f"{dst_dir}/{table}.parquet"
        # well-partitioned output: scan parallelism at the stress level
        parts = max(4, min(64, (df.count() * (1 if not keys else factor)) // 50_000 + 1))
        out.repartition(int(parts)).write.mode("overwrite").parquet(dst)
        rows[table] = spark.read.parquet(dst).count()

    manifest_path.write_text(json.dumps({**want, "rows": rows}))
    return rows


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from fundus_spark.plans import build_session

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"fundus_spark_scale_x{factor}"
    )
    spark = build_session(app_name="scale-corpus", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    print(json.dumps(materialize_scaled_corpus(spark, src, dst, factor)))
    spark.stop()
