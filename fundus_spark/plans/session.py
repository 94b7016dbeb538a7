"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]``; the same config block is what we'd
ship via ``spark-submit --py-files`` to a real cluster (AQE on, skew
join on, Arrow batches bounded so huge HTML payloads can't blow up
Python workers — SURVEY.md §7.3).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession

# HTML payloads can reach hundreds of KB; bound the Arrow batch so a
# batch stays O(100MB) even at the 99.9th percentile of document size.
ARROW_MAX_RECORDS_PER_BATCH = 512


#: The exact config block a cluster submit ships — shared by
#: build_session (local) and tools/submit_job.py (spark-submit), so
#: "tested locally" and "deployed" mean the same tuning.
CLUSTER_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": str(ARROW_MAX_RECORDS_PER_BATCH),
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.session.timeZone": "UTC",
}


def cluster_session(app_name: str = "fundus-spark") -> SparkSession:
    """Session for a ``spark-submit`` deployment: master/executors come
    from the cluster manager via the submit command; only the
    engine-semantics conf (AQE, skew join, Arrow batching, timezone) is
    set here — identical to the local factory's block."""
    builder = SparkSession.builder.appName(app_name)
    for key, value in CLUSTER_CONF.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def build_session(
    app_name: str = "fundus-spark",
    cores: Optional[int] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[dict] = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 32)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for key, value in CLUSTER_CONF.items():
        builder = builder.config(key, value)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
