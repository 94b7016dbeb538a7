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
the lake each trigger, and the append is transactional-equivalent per
batch even on plain parquet: each trigger's survivors are written to a
staged path and atomically RENAMED to ``corpus/batch-<stream>-<id>``, and
a re-delivered trigger (crash between corpus commit and checkpoint
commit) excludes its OWN batch directory from the frozen side,
recomputes deterministically, and replaces the directory — so no
duplicate doc_ids can land and no dedup-on-read is needed. The corpus
is therefore a directory of per-batch subdirectories (plus any flat
files from direct non-streaming appends); read it with
:func:`read_corpus`, not a plain ``spark.read.parquet`` (which skips
nested directories).

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


def _corpus_parts(
    spark: SparkSession, corpus_path: str, exclude_batch: Optional[str] = None
) -> Optional[list]:
    """Top-level corpus members as explicit paths: per-batch ``batch-N``
    directories (streaming commits) plus any flat parquet files (direct
    non-streaming appends). None iff the corpus directory does not
    exist yet. Listing explicitly — instead of a recursive read — lets
    a re-delivered trigger exclude its OWN ``batch-<exclude_batch>``
    directory from the frozen side, which is what makes the re-run
    idempotent (reading the crashed attempt's own survivors would make
    the recompute drop every batch doc and commit an empty batch)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(corpus_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return None
    parts = []
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        if name.startswith(("_", ".")):
            continue  # _staging, _SUCCESS, hidden markers
        if exclude_batch is not None and name == f"batch-{exclude_batch}":
            continue  # exclude_batch is the full "<stream>-<id>" tag
        parts.append(status.getPath().toString())
    return parts


def read_corpus(spark: SparkSession, corpus_path: str) -> Optional[DataFrame]:
    """Public corpus reader: the corpus is a directory of per-batch
    subdirectories plus possible flat files, which a plain
    ``spark.read.parquet(corpus_path)`` would silently skip. Returns
    None iff the corpus does not exist or is empty."""
    parts = _corpus_parts(spark, corpus_path)
    if not parts:
        return None
    return spark.read.schema(CORPUS_SCHEMA).parquet(*parts)


def _read_corpus(
    spark: SparkSession, corpus_path: str, exclude_batch: Optional[str] = None
) -> Optional[DataFrame]:
    """None iff the corpus does not exist yet (first trigger). The
    catch is NARROW — PATH_NOT_FOUND only, checked by error condition —
    so any other analysis failure on an EXISTING corpus propagates
    instead of silently curating against an empty frozen side (which
    would re-append every batch doc)."""
    try:
        parts = _corpus_parts(spark, corpus_path, exclude_batch)
        if parts is None or not parts:
            return None
        return spark.read.schema(CORPUS_SCHEMA).parquet(*parts)
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


def _stream_id(spark: SparkSession, checkpoint_path: str) -> str:
    """Stable per-checkpoint stream identity: a random marker persisted
    INSIDE the checkpoint directory. A restart of the same checkpoint
    reads the same id (so a re-delivered trigger replaces its own
    batch directory); a fresh checkpoint mints a new id (so its batch
    ids can never clobber a previous stream's committed directories in
    a shared corpus)."""
    import uuid

    jvm = spark._jvm
    marker = jvm.org.apache.hadoop.fs.Path(f"{checkpoint_path}/_curation_stream_id")
    fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(marker):
        stream = fs.open(marker)
        try:
            data = bytearray()
            b = stream.read()
            while b >= 0 and len(data) < 64:
                data.append(b)
                b = stream.read()
            sid = bytes(data).decode("ascii")
        finally:
            stream.close()
        # an EMPTY marker is a crash artifact (died between create and
        # write under the old create-then-write protocol, or a torn
        # copy): adopting it would put this checkpoint in the ""
        # namespace — shared with every other torn checkpoint, which
        # re-enables the cross-stream batch-directory clobber the
        # namespace exists to prevent. Treat as absent and re-mint.
        if sid:
            return sid
    # mint via the same write-temp-then-atomic-rename idiom as the
    # batch-directory commit: the marker either exists complete or not
    # at all, never empty/torn.
    sid = uuid.uuid4().hex[:12]
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{checkpoint_path}/_curation_stream_id.tmp-{uuid.uuid4().hex[:8]}"
    )
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(sid.encode("ascii")))
    finally:
        out.close()
    if fs.exists(marker):
        fs.delete(marker, False)
    if not fs.rename(tmp, marker):
        raise IOError(f"stream-id marker commit failed at {marker}")
    return sid


def _store_lsh(curate_kwargs: dict) -> dict:
    """The LSH parameters curate_increment will use, in the streaming
    store's vocabulary — the store pins them so a probe/append with
    different banding fails loudly instead of mixing key spaces."""
    return {
        "n_perm": curate_kwargs.get("lsh_perm", 8),
        "bands": curate_kwargs.get("lsh_bands", 4),
        "k": curate_kwargs.get("shingle_k", 4),
        "hash_mode": curate_kwargs.get("hash_mode", "md5"),
    }


def curate_batch_into_corpus(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    benchmark: Optional[DataFrame] = None,
    batch_id: Optional[int] = None,
    stream_id: Optional[str] = None,
    frozen_store_path: Optional[str] = None,
    **curate_kwargs,
) -> int:
    """Curate one batch of new documents against the corpus at
    ``corpus_path`` and commit the survivors. Returns rows committed.
    Usable directly for scheduled (non-streaming) increments too.

    With ``batch_id`` (the streaming path) the commit is
    transactional-equivalent on plain parquet: survivors are written to
    ``corpus/_staging/batch-<tag>`` and atomically renamed to
    ``corpus/batch-<tag>``, and the frozen side EXCLUDES the batch's
    own directory — so a re-delivered trigger (crash after the rename
    but before the stream checkpoint commit) deterministically
    recomputes the same survivors against the same frozen side and
    replaces its own directory instead of appending duplicates.

    ``<tag>`` is ``<stream_id>-<batch_id>``: replace-on-redelivery is
    only safe while batch ids are unique per corpus, and Spark batch
    ids restart from 0 with every FRESH checkpoint — without the
    namespace, a pipeline restarted on a new checkpoint path against
    the same corpus would silently REPLACE (delete) the old stream's
    committed batch 0 (review finding). :func:`continuous_curation`
    derives a stable ``stream_id`` from a marker persisted inside the
    checkpoint directory, so redelivery within one checkpoint matches
    its own directory and a fresh checkpoint can never clobber a
    previous stream's commits. Direct callers may pass their own
    namespace or accept the "direct" default.

    Without ``batch_id`` (direct calls) the survivors append as flat
    files; re-running the SAME batch twice then appends nothing
    because the first run's survivors are in the frozen side and the
    exact-fingerprint stage drops them.

    ``frozen_store_path`` (streaming path only) switches the frozen
    fp/band probes to the append-only bucketed streaming store
    (:func:`plans.frozen_store.stream_frozen_relations`): each
    committed batch's relations are appended after the corpus commit,
    so steady-state triggers never recompute minhashes over corpus
    text and never shuffle the frozen side; corpus parts the store has
    not absorbed yet (a crash landed the corpus commit but not the
    store append, or pre-existing flat files) are computed on the fly
    for this trigger and re-appended at this trigger's commit —
    self-healing with no correctness window. Corpus text is still the
    verify-stage source, read only for band-candidate docs."""
    tag = None if batch_id is None else f"{stream_id or 'direct'}-{batch_id}"
    frozen = _read_corpus(spark, corpus_path, exclude_batch=tag)
    if frozen is None:
        frozen = spark.createDataFrame([], CORPUS_SCHEMA)
    store_missing: list = []
    part_docs: dict = {}
    if frozen_store_path is not None and batch_id is not None:
        from ..plans.frozen_store import stream_frozen_relations

        lsh = _store_lsh(curate_kwargs)
        parts = _corpus_parts(spark, corpus_path, exclude_batch=tag) or []
        part_docs = {
            p.rstrip("/").rsplit("/", 1)[-1]: spark.read.schema(CORPUS_SCHEMA).parquet(p)
            for p in parts
        }
        fps, bnds, store_missing = stream_frozen_relations(
            spark, frozen_store_path, part_docs, **lsh
        )
        if fps is not None:
            curate_kwargs = {**curate_kwargs, "frozen_fps": fps, "frozen_bands": bnds}
    curated = curate_increment(batch, frozen, benchmark=benchmark, **curate_kwargs)
    # materialize the curated increment ONCE: count + write would
    # otherwise each execute the post-checkpoint stages
    # (contamination join, split, pack window) — twice per trigger
    out = curated.select("doc_id", "source", "text").localCheckpoint(eager=True)
    n = out.count()
    if batch_id is None:
        if n:
            out.write.mode("append").parquet(corpus_path)
        return n
    jvm = spark._jvm
    fs_path = jvm.org.apache.hadoop.fs.Path(corpus_path)
    fs = fs_path.getFileSystem(spark._jsc.hadoopConfiguration())
    final = jvm.org.apache.hadoop.fs.Path(f"{corpus_path}/batch-{tag}")
    if n:
        staged = f"{corpus_path}/_staging/batch-{tag}"
        out.coalesce(max(1, min(out.rdd.getNumPartitions(), 32))).write.mode(
            "overwrite"
        ).parquet(staged)
        # the rename is the commit point: atomic on HDFS/local FS. A
        # pre-existing final dir can only be a crashed or re-delivered
        # prior attempt of THIS batch (it was excluded from the frozen
        # side above), so replacing it is the idempotent outcome.
        if fs.exists(final):
            fs.delete(final, True)
        if not fs.rename(jvm.org.apache.hadoop.fs.Path(staged), final):
            raise IOError(f"atomic commit rename failed for batch {tag}")
    elif fs.exists(final):
        # recompute says this batch contributes nothing — clear the
        # partial/stale directory a crashed attempt may have left
        fs.delete(final, True)
    if frozen_store_path is not None:
        # absorb AFTER the corpus commit: this batch's survivors plus
        # any part the probe had to compute on the fly (self-heal). A
        # crash before this append leaves the corpus part un-absorbed,
        # which the next trigger detects and heals; a re-delivered
        # append writes byte-identical rows (deterministic recompute),
        # which the duplicate-insensitive probes ignore.
        from ..plans.frozen_store import append_frozen_parts

        to_absorb = {name: part_docs[name] for name in store_missing}
        if n:
            to_absorb[f"batch-{tag}"] = out
        if to_absorb:
            append_frozen_parts(
                spark, frozen_store_path, to_absorb, **_store_lsh(curate_kwargs)
            )
    return n


def continuous_curation(
    spark: SparkSession,
    input_path: str,
    corpus_path: str,
    checkpoint_path: str,
    benchmark: Optional[DataFrame] = None,
    max_files_per_trigger: int = 1,
    trigger: Optional[dict] = None,
    frozen_store_path: Optional[str] = None,
    **curate_kwargs,
):
    """readStream over a document drop directory -> per-micro-batch
    incremental curation -> append-only corpus. Returns the started
    ``StreamingQuery`` (caller awaits/stops it).

    Within-batch AND batch-vs-corpus dedup both happen inside
    ``curate_increment``; across RESTARTS the checkpoint prevents
    re-processing a committed trigger. A crash BETWEEN the corpus
    commit and the checkpoint commit re-runs the trigger, which
    excludes its own ``batch-<id>`` directory from the frozen side and
    atomically replaces it — exactly-once corpus content without
    dedup-on-read (see :func:`curate_batch_into_corpus`).

    ``frozen_store_path`` activates the append-only bucketed fp/band
    store for the frozen-side probes (see
    :func:`curate_batch_into_corpus`): steady-state triggers stop
    recomputing corpus minhashes and the probe joins stop shuffling
    the frozen side — the difference between O(batch) and O(corpus)
    work per trigger once the corpus dwarfs the batches.

    ``trigger`` is passed verbatim to ``DataStreamWriter.trigger``:
    the default ``{"availableNow": True}`` drains currently-available
    files and terminates (the test/backfill shape); a long-running
    deployment passes ``{"processingTime": "30 seconds"}`` for a
    genuinely continuous loop."""
    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    stream_id = _stream_id(spark, checkpoint_path)

    def _process(batch: DataFrame, batch_id: int) -> None:
        curate_batch_into_corpus(
            batch.sparkSession,
            batch,
            corpus_path,
            benchmark=benchmark,
            batch_id=batch_id,
            stream_id=stream_id,
            frozen_store_path=frozen_store_path,
            **curate_kwargs,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**(trigger if trigger is not None else {"availableNow": True}))
        .start()
    )
