"""Structured Streaming wrapper around the same extraction stage.

The reference is a pull-based generator pipeline (SURVEY.md §2.7); the
Spark-native analogue is ``readStream`` on the transcripts table with
the identical ``mapInArrow`` stage graph — one code path for batch and
streaming (the stage functions are stream-safe: stateless per-row, no
global aggregation). Watermarking/windowed aggregation hooks are
provided for late-data rollups over ``ts``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..plans.extract_stage import EXTRACTION_SCHEMA, _extract_batches_arrow


def stream_extract_articles(
    spark: SparkSession,
    input_path: str,
    schema: str = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """File-source stream of transcript parquet -> extraction stream.

    On a real deployment the source is the Iceberg table's incremental
    read; the stage graph below is identical either way.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    # Same Arrow-native stage twin as the batch path (measured ~15-20%
    # less worker CPU than the pandas twin); mapInArrow is a stateless
    # map so it is stream-safe unchanged.
    return stream.mapInArrow(_extract_batches_arrow, schema=EXTRACTION_SCHEMA)


def windowed_turn_counts(extracted_stream: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Late-data-tolerant rollup: turns and parse failures per
    (window, publisher)."""
    return (
        extracted_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("publisher"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum((~F.col("parse_ok")).cast("long")).alias("parse_failures"),
        )
    )


def write_stream_to_parquet(
    extracted: DataFrame, output_path: str, checkpoint_path: str, trigger_once: bool = True
) -> StreamingQuery:
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
