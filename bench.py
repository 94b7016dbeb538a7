"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus the north_rule scaling-efficiency
measurement (same extraction job at N and 4N local cores).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "scaling": {"cores_lo": .., "cores_hi": .., "turns_per_sec_lo": ..,
               "turns_per_sec_hi": .., "efficiency": ..}}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "extract_documents",
    "assemble_conversations",
    "minhash_signatures",
    "ngram_jaccard",
    "simhash",
    "cosine_topk",
    "pricing_summary",
    "revenue_by_nation",
    "grouped_topk",
    "quality_score",
    "language_id",
    "fingerprint",
]


def _run_headline(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings = {}
    for name in HEADLINE:
        started = time.time()
        n = qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - started, 3)
    return timings


REPLICAS = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICAS", "64"))


def _materialize_scaled_transcripts(sf_dir: str, replicas: int, path: str) -> int:
    """Build the scaled transcript corpus once (distinct conv_ids per
    replica: a bigger corpus, not the same bytes re-counted) and write
    it as a well-partitioned parquet table — the scaling measurement
    then times the pure scan->extract stage, the shape the job has over
    a bucketed Iceberg table at 100 TB."""
    from pyspark.sql import functions as F

    from fundus_spark.plans import build_session
    from fundus_spark.sources.doc_html import documents_as_transcripts

    spark = build_session(app_name="bench-materialize", cores=CPUS)
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        base = documents_as_transcripts(docs).drop("doc_id")
        transcripts = (
            base.crossJoin(spark.range(replicas).select(F.col("id").alias("_replica")))
            .withColumn("conv_id", F.concat_ws("-", "conv_id", "_replica"))
            .drop("_replica")
            .repartition(CPUS * 8, F.col("conv_id"), F.col("turn_idx"))
        )
        transcripts.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path).count()
    finally:
        spark.stop()


def _extraction_throughput(cores: int, transcripts_path: str, n_turns: int) -> float:
    """Turns/sec of the scan->mapInPandas extraction stage at a given
    parallelism (fresh session per level so executor pools are
    isolated; no shuffle in the timed plan)."""
    from fundus_spark.plans import build_session, extract_articles

    spark = build_session(app_name=f"bench-scaling-{cores}", cores=cores, shuffle_partitions=max(cores, 8))
    try:
        transcripts = spark.read.parquet(transcripts_path)
        # warm-up: spin up every Python worker + import the kernel once
        extract_articles(transcripts.sample(0.05, seed=1)).count()
        best = 0.0
        for _ in range(2):  # best-of-2 damps JVM/GC noise
            started = time.time()
            n_out = extract_articles(transcripts).count()
            elapsed = time.time() - started
            assert n_out == n_turns
            best = max(best, n_turns / elapsed)
        return best
    finally:
        spark.stop()


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    from fundus_spark.plans import build_session

    cores_hi = CPUS
    cores_lo = max(CPUS // 4, 1)
    scaled_path = os.path.join(os.environ.get("TMPDIR", "/tmp"), "fundus_spark_bench_transcripts")
    n_turns = _materialize_scaled_transcripts(SF_DIR, REPLICAS, scaled_path)
    tps_hi = _extraction_throughput(cores_hi, scaled_path, n_turns)
    tps_lo = _extraction_throughput(cores_lo, scaled_path, n_turns)
    efficiency = (tps_hi / tps_lo) / (cores_hi / cores_lo)

    spark = build_session(app_name="bench", cores=CPUS)
    timings = _run_headline(spark, SF_DIR)
    spark.stop()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall time (extraction pipeline + dedup/similarity/text ops)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
                "scaling": {
                    "cores_lo": cores_lo,
                    "cores_hi": cores_hi,
                    "turns_per_sec_lo": round(tps_lo, 2),
                    "turns_per_sec_hi": round(tps_hi, 2),
                    "efficiency": round(efficiency, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
