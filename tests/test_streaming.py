"""Structured Streaming path: same extraction stage via readStream with
availableNow trigger, results identical to the batch stage.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fundus_spark.sources.transcripts import build_transcripts
from fundus_spark.streaming import stream_extract_articles, write_stream_to_parquet


def test_stream_matches_batch(spark, tmp_path):
    rows = build_transcripts(n_bulk_turns=30, include_golden=False)
    input_path = str(tmp_path / "in")
    spark.createDataFrame(rows).select(
        "conv_id", F.col("turn_idx").cast("int").alias("turn_idx"), "role", "text", "tool", "ts"
    ).write.parquet(input_path)

    extracted_stream = stream_extract_articles(spark, input_path)
    assert extracted_stream.isStreaming

    out_path = str(tmp_path / "out")
    query = write_stream_to_parquet(extracted_stream, out_path, str(tmp_path / "ckpt"))
    query.awaitTermination(120)

    from fundus_spark.plans import extract_articles

    batch = extract_articles(spark.read.parquet(input_path))
    stream_result = spark.read.parquet(out_path)
    assert stream_result.count() == batch.count()
    b = {(r["conv_id"], r["turn_idx"]): r["plaintext"] for r in batch.collect()}
    s = {(r["conv_id"], r["turn_idx"]): r["plaintext"] for r in stream_result.collect()}
    assert b == s
