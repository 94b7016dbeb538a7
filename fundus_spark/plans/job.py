"""End-to-end extraction job: scan -> bucketed extraction -> write ->
lineage -> manifest commit, resumable per bucket.

Scale design (SURVEY.md §3.2 lifecycle):
* The input is split into ``n_buckets`` by a uniform hash of
  ``(conv_id, turn_idx)``. Each bucket is one unit of commit/resume —
  at 100 TB you'd run 256-4096 buckets so a re-submit after a failure
  repeats at most 1/n of the work.
* **Single-pass write**: all not-yet-committed buckets are extracted in
  ONE scan and written ``partitionBy("bucket")`` with dynamic partition
  overwrite (only the buckets in this batch are replaced). A hash
  predicate cannot prune parquet files, so a per-bucket loop would cost
  ``n_buckets`` full-table scans — 4096 buckets over 100 TB would read
  ~400 PB. One pass reads the table once regardless of bucket count.
* Commit protocol: the partitioned data write lands first; the
  per-bucket manifest append is the commit point. A crash between the
  two leaves uncommitted ``bucket=K`` directories that the retry's
  dynamic-overwrite rewrite replaces idempotently. A resume submit
  re-extracts only the uncommitted buckets — still one scan.
* Per-bucket metrics are read back from the written ``bucket=K``
  directories (directory-partition pruned — this maps 1:1 onto an
  Iceberg partition scan) so lineage never recomputes the stage.
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
    result.buckets_skipped = sorted(b for b in range(n_buckets) if b in done)
    remaining = [b for b in range(n_buckets) if b not in done]

    if remaining:
        # xxhash64 is type-sensitive (int32 vs int64 hash differently);
        # pin the key types so the bucket recomputed on the stage output
        # (turn_idx: int32 per EXTRACTION_SCHEMA) matches the input side
        # whatever width the source table used.
        bucket_col = F.pmod(
            F.xxhash64(F.col("conv_id").cast("string"), F.col("turn_idx").cast("long")), F.lit(n_buckets)
        ).cast("int")
        pending = transcripts
        if done:  # resume: one scan over just the uncommitted buckets
            pending = pending.where(bucket_col.isin(remaining))
        # bucket is a pure function of (conv_id, turn_idx), which the
        # stage carries through — recompute it post-extraction rather
        # than widening the Arrow schema (no shuffle either way).
        extracted = extract_articles(pending, salt_partitions=salt_partitions).withColumn("bucket", bucket_col)
        # ONE data write for every pending bucket; dynamic overwrite
        # replaces exactly the bucket=K partitions present in the batch.
        (
            extracted.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(output_path)
        )
        # commit loop: per-bucket manifest append is the commit point;
        # each read-back prunes to the single bucket=K directory.
        for bucket in remaining:
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
