"""The extraction stage: batched kernel execution inside ``mapInPandas``.

Design (SURVEY.md §2.4, §7):
* **No per-row Python dispatch** — Spark hands the stage Arrow record
  batches; the kernel parses each document once per row within the
  batch (the ``Precomputed`` analogue lives and dies inside the batch).
* **Rules by module import, not closure capture** — the publisher
  registry is resolved on the executor via ``fundus_spark.rules``
  import, so the task closure stays tiny and selector compilation
  happens once per Python worker process (reference caches compiled
  selectors as class attributes; ours are module-level constants).
* **Lineage columns, not side channels** — every output row carries
  ``_partition_id`` and ``_bytes`` so per-partition lineage/metrics
  aggregate from the output itself with one cheap columnar agg, and a
  failed parse degrades to a row with ``parse_ok=false`` (error kept)
  rather than a lost record.
* ``publishing_date`` is emitted twice: the exact reference
  serialization string (golden parity) and a UTC timestamp for
  relational use.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Iterable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EXTRACTION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
        StructField("publisher", StringType()),
        StructField("parser_version", StringType()),
        StructField("title", StringType()),
        StructField("body_json", StringType()),
        StructField("plaintext", StringType()),
        StructField("authors", ArrayType(StringType())),
        StructField("publishing_date", StringType()),
        StructField("publishing_date_ts", TimestampType()),
        StructField("topics", ArrayType(StringType())),
        StructField("free_access", BooleanType()),
        StructField("images_json", StringType()),
        StructField("parse_ok", BooleanType()),
        StructField("error", StringType()),
        StructField("_partition_id", IntegerType()),
        StructField("_bytes", LongType()),
    ]
)


def _extract_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # executor-side imports: one registry / selector compile per worker
    from pyspark import TaskContext

    from ..kernel import run_extraction
    from ..kernel.body import body_to_plaintext
    from ..rules import resolve

    ctx = TaskContext.get()
    partition_id = ctx.partitionId() if ctx is not None else -1

    for batch in batches:
        out: Dict[str, list] = {name: [] for name in EXTRACTION_SCHEMA.fieldNames()}
        for row in batch.itertuples(index=False):
            html: str = row.text or ""
            spec = resolve(row.tool)
            title = body_json = plaintext = images_json = error = None
            authors: list = []
            topics: list = []
            publishing_date = None
            publishing_date_ts = None
            free_access: Optional[bool] = None
            version_name = None
            ok = True
            try:
                ts = row.ts.to_pydatetime() if row.ts is not None and not pd.isnull(row.ts) else None
                version_name = spec.version_for(ts).name
                extraction = run_extraction(spec, html, ts, error_handling="raise")
                title = extraction.get("title")
                if (body := extraction.get("body")) is not None:
                    body_json = json.dumps(body, ensure_ascii=False, sort_keys=False)
                    plaintext = body_to_plaintext(body)
                authors = extraction.get("authors") or []
                topics = extraction.get("topics") or []
                if (dt := extraction.get("publishing_date")) is not None:
                    publishing_date = str(dt)
                    publishing_date_ts = dt
                free_access = extraction.get("free_access")
                if (images := extraction.get("images")) is not None:
                    images_json = json.dumps(images, ensure_ascii=False)
            except Exception as err:  # noqa: BLE001 — failure degrades to a flagged row
                ok = False
                error = f"{type(err).__name__}: {err}"

            out["conv_id"].append(row.conv_id)
            out["turn_idx"].append(row.turn_idx)
            out["role"].append(row.role)
            out["tool"].append(row.tool)
            out["ts"].append(row.ts)
            out["publisher"].append(spec.key)
            out["parser_version"].append(version_name)
            out["title"].append(title)
            out["body_json"].append(body_json)
            out["plaintext"].append(plaintext)
            out["authors"].append(authors)
            out["publishing_date"].append(publishing_date)
            out["publishing_date_ts"].append(publishing_date_ts)
            out["topics"].append(topics)
            out["free_access"].append(free_access)
            out["images_json"].append(images_json)
            out["parse_ok"].append(ok)
            out["error"].append(error)
            out["_partition_id"].append(partition_id)
            out["_bytes"].append(len(html.encode("utf-8", errors="ignore")))
        yield pd.DataFrame(out)


def extract_articles(transcripts: DataFrame, salt_partitions: Optional[int] = None) -> DataFrame:
    """transcripts (conv_id, turn_idx, role, text, tool, ts) ->
    extraction DataFrame.

    Skew handling: extraction is per-turn embarrassingly parallel, so
    when ``salt_partitions`` is set we hash-repartition on
    (conv_id, turn_idx) — a perfectly uniform key even when one conv_id
    owns most turns (the north_rule's salted repartition; the turn
    index IS the salt). When the input's own partitioning is already
    uniform (e.g. a bucketed table scan), pass None: the stage is then
    a pure narrow map over the scan — no shuffle at all, which is the
    plan you want at 100 TB.
    """
    if salt_partitions:
        transcripts = transcripts.repartition(salt_partitions, F.col("conv_id"), F.col("turn_idx"))
    return transcripts.mapInPandas(_extract_batches, schema=EXTRACTION_SCHEMA)
