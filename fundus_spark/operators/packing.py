"""Sequence packing: assign documents to fixed-token-budget chunks of a
concatenated per-shard stream (GPT-style concat-and-chunk packing for
training). Each document gets the offset of its first token in the
shard's stream and the chunk id containing that offset.

Scale shape: one windowed cumulative sum per shard key — the window is
the sequential constraint inherent to ordered packing, so the shard key
(``part_col``) must bound partition size (source x day, bucket id, …);
with bounded shards the plan is one shuffle on the shard key and the
per-shard work is a single sorted pass. Never pack over an
unpartitioned global window at scale — that serializes the corpus
through one task (Spark will warn; the operator requires a key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_by_budget(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    part_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Adds ``pack_offset`` (the document's start offset in its shard's
    concatenated token stream, deterministic under ``order_col``) and
    ``pack_bin`` (``floor(pack_offset / budget)`` — the fixed-size chunk
    the document starts in). Documents may straddle chunk boundaries,
    exactly as concat-and-chunk training pipelines slice them."""
    w = Window.partitionBy(part_col).orderBy(F.asc(order_col))
    cum_before = F.coalesce(
        F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    ).cast("long")
    return df.withColumn("pack_offset", cum_before).withColumn(
        "pack_bin", F.floor(F.col("pack_offset") / F.lit(budget)).cast("long")
    )
