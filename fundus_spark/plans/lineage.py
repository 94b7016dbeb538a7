"""Per-partition lineage/metrics and the checkpoint/resume manifest.

North_rule requirements:
* every stage writes per-partition lineage rows (partition id,
  input/output turn counts, parse-failure counts, bytes processed) to a
  metrics table;
* the job is resumable from per-partition checkpoints — a re-submit
  skips committed partitions.

Implementation notes for this sandbox: the metrics/manifest tables are
parquet directories written via the same DataFrame API an Iceberg
catalog would take (``saveAsTable``/``writeTo(...).append()`` on a real
deployment — swap ``_append`` only). Commit protocol: data for bucket K
is written under ``<output>/bucket=K/`` first; the manifest row for K
is appended only after that write completes, so a crash between the
two leaves a re-runnable (idempotent, overwritten on retry) bucket.
"""

from __future__ import annotations

import datetime
from typing import List, Optional, Set

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("bucket", IntegerType()),
        StructField("input_turns", LongType()),
        StructField("output_turns", LongType()),
        StructField("parse_failures", LongType()),
        StructField("bytes_processed", LongType()),
        StructField("committed_at", TimestampType()),
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("bucket", IntegerType()),
        StructField("partition_id", IntegerType()),
        StructField("input_turns", LongType()),
        StructField("output_turns", LongType()),
        StructField("parse_failures", LongType()),
        StructField("bytes_processed", LongType()),
        StructField("committed_at", TimestampType()),
    ]
)


def partition_metrics(extracted: DataFrame, run_id: str, bucket: int) -> DataFrame:
    """Aggregate per-partition lineage from the extraction output's
    lineage columns — one columnar agg, no recompute of the stage."""
    return bucketed_partition_metrics(extracted.withColumn("bucket", F.lit(bucket).cast("int")), run_id)


def bucketed_partition_metrics(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-(bucket, partition) lineage for EVERY bucket present, in one
    aggregation — the job's commit phase calls this once over a single
    partition-pruned read of the written output, so the metrics phase
    costs one Spark job regardless of bucket count (a 4096-bucket run
    must not pay 4096 sequential driver round-trips)."""
    return (
        extracted.groupBy("bucket", "_partition_id")
        .agg(
            F.count(F.lit(1)).alias("input_turns"),
            F.sum(F.col("parse_ok").cast("long")).alias("output_turns"),
            F.sum((~F.col("parse_ok")).cast("long")).alias("parse_failures"),
            F.sum("_bytes").alias("bytes_processed"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.col("bucket").cast("int").alias("bucket"),
            F.col("_partition_id").alias("partition_id"),
            "input_turns",
            "output_turns",
            "parse_failures",
            "bytes_processed",
            F.lit(datetime.datetime.now(datetime.timezone.utc)).alias("committed_at"),
        )
    )


def committed_buckets(spark: SparkSession, manifest_path: str, run_id: str) -> Set[int]:
    try:
        manifest = spark.read.parquet(manifest_path)
    except Exception:  # noqa: BLE001 — no manifest yet
        return set()
    rows = manifest.where(F.col("run_id") == run_id).select("bucket").distinct().collect()
    return {r["bucket"] for r in rows}


def append_rows(spark: SparkSession, df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)
