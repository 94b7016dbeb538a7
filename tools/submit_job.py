"""spark-submit entry point for the resumable bucketed extraction job —
the north-rule deployment shape (``spark-submit --py-files`` on a
multi-executor cluster):

    python tools/package.py
    spark-submit --master <cluster> --py-files dist/fundus_spark.zip \
        tools/submit_job.py \
        --input  /lake/transcripts \
        --output /lake/articles \
        --metrics /lake/articles_metrics \
        --manifest /lake/articles_manifest \
        --n-buckets 1024 --run-id nightly-2024-06-01

Re-submitting with the same ``--run-id`` resumes: committed buckets are
skipped (one scan over only the uncommitted ones), metrics partitions
of a crashed attempt are replaced, and the manifest append is atomic.
Prints the JobResult as one JSON line on stdout.

At 10^12 turns: size ``--n-buckets`` so one bucket is a few TB
(256-4096), and let the cluster manager set executor counts — the job
itself carries no parallelism assumptions (scan splits drive the map
stage; AQE handles the rest).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="transcripts table path (parquet/Iceberg)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument(
        "--salt-partitions",
        type=int,
        default=None,
        help="optional salted repartition width for skew defense (north_rule)",
    )
    ap.add_argument(
        "--local",
        type=int,
        default=None,
        metavar="N",
        help="run on local[N] instead of the cluster master (smoke testing)",
    )
    args = ap.parse_args()

    if args.local:
        from fundus_spark.plans import build_session

        spark = build_session(app_name="fundus-spark-extract", cores=args.local)
    else:
        from fundus_spark.plans.session import cluster_session

        spark = cluster_session(app_name="fundus-spark-extract")

    from fundus_spark.plans import run_extraction_job

    transcripts = spark.read.parquet(args.input)
    result = run_extraction_job(
        spark,
        transcripts,
        output_path=args.output,
        metrics_path=args.metrics,
        manifest_path=args.manifest,
        run_id=args.run_id,
        n_buckets=args.n_buckets,
        salt_partitions=args.salt_partitions,
    )
    print(
        json.dumps(
            {
                "run_id": result.run_id,
                "buckets_total": result.buckets_total,
                "buckets_run": result.buckets_run,
                "buckets_skipped": result.buckets_skipped,
                "input_turns": result.input_turns,
                "output_turns": result.output_turns,
                "parse_failures": result.parse_failures,
                "wall_seconds": round(result.wall_seconds, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
