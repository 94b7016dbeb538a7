"""Ordered per-conversation reassembly (north_rule window stage).

Two deliverables:
* ``ordered_turns`` — the extraction output with a stable per-turn
  ordering column (``row_number`` over ``(conv_id) ORDER BY turn_idx``)
  — the per-turn text-equality gate checks under this ordering.
* ``assemble_conversations`` — one row per conversation with the
  ordered concatenation of per-turn plaintexts. Skew-safe: a hot
  conv_id with millions of turns never passes through a single
  ``collect_list``; turns first aggregate into bounded salted chunks
  ``(conv_id, turn_idx DIV chunk)``, then chunks (thousands of times
  fewer rows) merge per conversation. Both levels are map-side
  combinable aggregations, not windows, so no single-partition
  bottleneck survives at 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CHUNK = 1024


def ordered_turns(extracted: DataFrame) -> DataFrame:
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return extracted.withColumn("turn_rank", F.row_number().over(w))


def assemble_conversations(extracted: DataFrame, chunk: int = DEFAULT_CHUNK, join_on: str = "\n\n") -> DataFrame:
    """conv_id -> ordered plaintext document + turn stats."""
    chunked = (
        extracted.where(F.col("plaintext").isNotNull())
        .withColumn("_chunk", (F.col("turn_idx") / F.lit(chunk)).cast("long"))
        .groupBy("conv_id", "_chunk")
        .agg(
            F.array_sort(F.collect_list(F.struct(F.col("turn_idx"), F.col("plaintext")))).alias("_turns"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    merged = (
        chunked.groupBy("conv_id")
        .agg(
            F.array_sort(F.collect_list(F.struct(F.col("_chunk"), F.col("_turns")))).alias("_chunks"),
            F.sum("_n").alias("n_turns"),
        )
        .select(
            "conv_id",
            "n_turns",
            F.array_join(
                F.flatten(F.transform("_chunks", lambda c: F.transform(c["_turns"], lambda t: t["plaintext"]))),
                join_on,
            ).alias("document"),
        )
    )
    return merged
