"""Continuous corpus curation: a Structured Streaming source of new
documents flows through :func:`plans.curate.curate_increment` against a
GROWING frozen corpus — the production loop a training-data pipeline
actually runs (crawl lands documents continuously; every micro-batch is
curated incrementally; survivors append to the corpus and become part
of the frozen side for the next batch).

Why ``foreachBatch`` and not a pure streaming DAG: the increment's
near-dup probe joins each batch against the WHOLE corpus-so-far — a
stream-batch join whose batch side must be re-read per trigger (the
corpus grew). ``foreachBatch`` is Spark's sanctioned shape for exactly
this: the micro-batch is a plain DataFrame, the corpus is re-read from
the lake each trigger, and the append is transactional per batch
(exactly-once under checkpointing on a transactional sink; on plain
parquet, re-delivery of a failed batch re-appends — idempotence can be
restored by dedup-on-read over doc_id, noted below).

Scale notes: every stage inside the batch function keeps its
documented 100 TB shape (banded probes, broadcast benchmark shingles,
narrow gates); the frozen side's band keys are recomputed from the
corpus read here — a production deployment passes ``frozen_bands``
from a persisted band-key table (see ``operators.dedup.band_relation``)
so each trigger probes without rereading corpus text.
"""

from __future__ import annotations

from typing import Optional

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

from ..plans.curate import curate_increment

CORPUS_SCHEMA = "doc_id long, source string, text string"


def _read_corpus(spark: SparkSession, corpus_path: str) -> Optional[DataFrame]:
    """None iff the corpus does not exist yet (first trigger). The
    catch is NARROW — PATH_NOT_FOUND only, checked by error condition —
    so any other analysis failure on an EXISTING corpus propagates
    instead of silently curating against an empty frozen side (which
    would re-append every batch doc)."""
    try:
        return spark.read.schema(CORPUS_SCHEMA).parquet(corpus_path)
    except AnalysisException as exc:
        condition = None
        for attr in ("getCondition", "getErrorClass"):
            getter = getattr(exc, attr, None)
            if getter is not None:
                try:
                    condition = getter()
                    break
                except Exception:  # noqa: BLE001 — fall through to message check
                    pass
        if condition == "PATH_NOT_FOUND" or (condition is None and "PATH_NOT_FOUND" in str(exc)):
            return None
        raise


def curate_batch_into_corpus(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    benchmark: Optional[DataFrame] = None,
    **curate_kwargs,
) -> int:
    """Curate one batch of new documents against the corpus at
    ``corpus_path`` and append the survivors. Returns rows appended.
    Usable directly for scheduled (non-streaming) increments too."""
    frozen = _read_corpus(spark, corpus_path)
    if frozen is None:
        frozen = spark.createDataFrame([], CORPUS_SCHEMA)
    curated = curate_increment(batch, frozen, benchmark=benchmark, **curate_kwargs)
    # materialize the curated increment ONCE: count + write would
    # otherwise each execute the post-checkpoint stages
    # (contamination join, split, pack window) — twice per trigger
    out = curated.select("doc_id", "source", "text").localCheckpoint(eager=True)
    n = out.count()
    if n:
        out.write.mode("append").parquet(corpus_path)
    return n


def continuous_curation(
    spark: SparkSession,
    input_path: str,
    corpus_path: str,
    checkpoint_path: str,
    benchmark: Optional[DataFrame] = None,
    max_files_per_trigger: int = 1,
    **curate_kwargs,
):
    """readStream over a document drop directory -> per-micro-batch
    incremental curation -> append-only corpus. Returns the started
    ``StreamingQuery`` (caller awaits/stops it).

    Within-batch AND batch-vs-corpus dedup both happen inside
    ``curate_increment``; across RESTARTS the checkpoint prevents
    re-processing a committed trigger. A crash BETWEEN the corpus
    append and the checkpoint commit re-runs the trigger, and the
    re-run appends nothing: the first attempt's survivors are already
    in the corpus, so the exact-fingerprint stage drops every batch
    doc — the corpus converges to the same content either way."""
    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )

    def _process(batch: DataFrame, batch_id: int) -> None:
        curate_batch_into_corpus(
            batch.sparkSession, batch, corpus_path, benchmark=benchmark, **curate_kwargs
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
