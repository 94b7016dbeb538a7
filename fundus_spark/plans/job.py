"""End-to-end extraction job: scan -> bucketed extraction -> write ->
lineage -> manifest commit, resumable per bucket.

Scale design (SURVEY.md §3.2 lifecycle):
* The input is split into ``n_buckets`` by a uniform hash of
  ``(conv_id, turn_idx)``. Each bucket is one unit of commit/resume —
  at 100 TB you'd run 256-4096 buckets so a re-submit after a failure
  repeats at most 1/n of the work. Filtering on the hash is a
  scan-side predicate: no shuffle is needed to form a bucket.
* Within a bucket, extraction repartitions uniformly and runs the
  Arrow-batched kernel; output lands under ``bucket=K`` (directory
  partition — maps 1:1 onto an Iceberg partition commit).
* The manifest append is the commit point; crash-in-the-middle leaves
  a bucket directory that the retry simply overwrites.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract_stage import extract_articles
from .lineage import append_rows, committed_buckets, partition_metrics


@dataclass
class JobResult:
    run_id: str
    buckets_total: int
    buckets_run: List[int] = field(default_factory=list)
    buckets_skipped: List[int] = field(default_factory=list)
    input_turns: int = 0
    output_turns: int = 0
    parse_failures: int = 0
    wall_seconds: float = 0.0


def run_extraction_job(
    spark: SparkSession,
    transcripts: DataFrame,
    output_path: str,
    metrics_path: str,
    manifest_path: str,
    run_id: Optional[str] = None,
    n_buckets: int = 8,
    salt_partitions: Optional[int] = None,
) -> JobResult:
    run_id = run_id or uuid.uuid4().hex[:12]
    started = time.time()
    result = JobResult(run_id=run_id, buckets_total=n_buckets)

    done = committed_buckets(spark, manifest_path, run_id)
    bucket_col = F.pmod(F.xxhash64(F.col("conv_id"), F.col("turn_idx")), F.lit(n_buckets)).cast("int")

    for bucket in range(n_buckets):
        if bucket in done:
            result.buckets_skipped.append(bucket)
            continue
        bucket_df = transcripts.where(bucket_col == bucket)
        extracted = extract_articles(bucket_df, salt_partitions=salt_partitions)
        # write data first; manifest append below is the commit point
        (
            extracted.write.mode("overwrite")
            .parquet(f"{output_path}/bucket={bucket}")
        )
        written = spark.read.parquet(f"{output_path}/bucket={bucket}")
        metrics = partition_metrics(written, run_id, bucket)
        append_rows(spark, metrics, metrics_path)
        manifest_row = metrics.groupBy().agg(
            F.first(F.lit(run_id)).alias("run_id"),
            F.first(F.lit(bucket).cast("int")).alias("bucket"),
            F.sum("input_turns").alias("input_turns"),
            F.sum("output_turns").alias("output_turns"),
            F.sum("parse_failures").alias("parse_failures"),
            F.sum("bytes_processed").alias("bytes_processed"),
            F.max("committed_at").alias("committed_at"),
        )
        append_rows(spark, manifest_row, manifest_path)
        result.buckets_run.append(bucket)

    totals = (
        spark.read.parquet(manifest_path)
        .where(F.col("run_id") == run_id)
        .agg(
            F.sum("input_turns").alias("i"),
            F.sum("output_turns").alias("o"),
            F.sum("parse_failures").alias("f"),
        )
        .collect()[0]
    )
    result.input_turns = totals["i"] or 0
    result.output_turns = totals["o"] or 0
    result.parse_failures = totals["f"] or 0
    result.wall_seconds = time.time() - started
    return result
