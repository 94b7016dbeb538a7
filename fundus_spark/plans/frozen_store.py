"""Bucketed on-disk store for the frozen-corpus dedup state.

The append-only curation contract (``plans/curate.py:curate_increment``,
``operators/dedup.py:incremental_assign``) probes two frozen-side
relations on EVERY append:

* the exact-dedup fingerprints — ``(fp, keep_id, n_dups)``, one row per
  distinct frozen text, anti-joined on ``fp``;
* the LSH band relation — ``(doc_id, band, key)``, one row per frozen
  doc per band, equi-joined on ``(band, key)``.

At the 100 TB shape these are billions of rows, while a daily batch is
tiny: the probe joins run as broadcast-hash joins of the NEW side and
the frozen side is only scanned. But the moment a batch is too large to
broadcast — a bulk backfill, a re-crawl merge — the joins degrade to
sort-merge and BOTH sides shuffle, i.e. the entire frozen corpus state
moves over the network once per append. Storage-level bucketing removes
exactly that cost class: the frozen relations are written once as
bucketed tables hashed on their join keys, so every later probe's
sort-merge join reads the frozen buckets in place (zero frozen-side
Exchange, ``SelectedBucketsCount`` visible in the scan) and only the
new batch shuffles — the shuffled volume is O(batch), never O(corpus).

This is Spark's equivalent of the reference crawler's persistent
URL-dedup state (``crawler.py:447-450`` keeps seen-URL identity across
runs); here the persisted identity is the full text + near-dup
fingerprint state, stored in the layout the probe join wants.

Bucketed writes need a table catalog (``bucketBy`` is metadata, not
file layout alone), so the store records a small manifest next to the
data and :func:`register_frozen_state` re-issues the ``CREATE TABLE …
CLUSTERED BY … INTO n BUCKETS`` DDL in any later session — the
in-memory catalog is per-session, the parquet buckets on disk are not.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import band_relation, exact_dedup

_MANIFEST = "_FROZEN_STATE.json"


def _ddl(df: DataFrame) -> str:
    # StructType.toDDL is JVM-side only in some pyspark lines; both
    # store tables are flat simple types, so simpleString is valid DDL
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)


def _table_prefix(path: str) -> str:
    # catalog identifiers are per-session; derive a stable one from the
    # store path so re-registration is idempotent across sessions
    return "frozen_" + hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:10]


def _write_bucketed(
    df: DataFrame, table: str, path: str, bucket_cols: Tuple[str, ...], num_buckets: int
) -> None:
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
    )
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    writer.saveAsTable(table)


def write_frozen_state(
    frozen_docs: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 8,
    bands: int = 4,
    k: int = 4,
    hash_mode: str = "md5",
    num_buckets: int = 64,
) -> dict:
    """Materialize the frozen corpus's dedup state at ``store_path`` as
    two bucketed parquet tables (fingerprints hashed on ``fp``, band
    relation hashed on ``(band, key)``) plus a manifest. One-time cost
    per freeze; every later append probes these without shuffling them.

    ``num_buckets`` sizes the per-bucket file count — pick so a bucket
    is a few hundred MB at the target corpus size (100 TB of text →
    ~1 GB of band rows per bucket at 4096 buckets; the default 64 fits
    test/bench scale). Returns the manifest dict.
    """
    spark = frozen_docs.sparkSession
    prefix = _table_prefix(store_path)
    fps = exact_dedup(frozen_docs, text_col=text_col, id_col=id_col)
    bnd = band_relation(
        frozen_docs, text_col=text_col, id_col=id_col, n_perm=n_perm, bands=bands, k=k, hash_mode=hash_mode
    )
    tables = {
        "fps": {
            "table": f"{prefix}_fps",
            "path": os.path.join(store_path, "fps"),
            "bucket_cols": ["fp"],
            "ddl_schema": _ddl(fps),
        },
        "bands": {
            "table": f"{prefix}_bands",
            "path": os.path.join(store_path, "bands"),
            "bucket_cols": ["band", "key"],
            "ddl_schema": _ddl(bnd),
        },
    }
    _write_bucketed(fps, tables["fps"]["table"], tables["fps"]["path"], ("fp",), num_buckets)
    _write_bucketed(bnd, tables["bands"]["table"], tables["bands"]["path"], ("band", "key"), num_buckets)
    manifest = {
        "num_buckets": num_buckets,
        "lsh": {"n_perm": n_perm, "bands": bands, "k": k, "hash_mode": hash_mode},
        "tables": tables,
    }
    os.makedirs(store_path, exist_ok=True)
    tmp = os.path.join(store_path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(store_path, _MANIFEST))
    return manifest


def register_frozen_state(spark: SparkSession, store_path: str) -> dict:
    """Re-register the store's bucketed tables in THIS session's catalog
    (idempotent). The parquet buckets persist on disk; only the catalog
    entry carrying the bucketing spec is session-scoped, so a fresh
    session (a new day's append job) calls this before probing."""
    with open(os.path.join(store_path, _MANIFEST)) as f:
        manifest = json.load(f)
    for spec in manifest["tables"].values():
        if spark.catalog.tableExists(spec["table"]):
            continue
        cols = ", ".join(spec["bucket_cols"])
        ddl = spec.get("ddl_schema")
        if not ddl:
            raise ValueError(f"manifest for {spec['table']} lacks a DDL schema")
        abspath = os.path.abspath(spec["path"])
        spark.sql(
            f"CREATE TABLE {spec['table']} ({ddl}) USING PARQUET "
            f"CLUSTERED BY ({cols}) SORTED BY ({cols}) INTO {manifest['num_buckets']} BUCKETS "
            f"LOCATION '{abspath}'"
        )
    return manifest


def read_frozen_state(
    spark: SparkSession, store_path: str
) -> Tuple[DataFrame, DataFrame, dict]:
    """``(frozen_fps, frozen_bands, manifest)`` ready to pass to
    :func:`plans.curate.curate_increment` / ``incremental_assign``.
    Both are catalog-backed bucketed scans: metadata-cheap to count
    (the broadcast guard's requirement) and exchange-free on the
    frozen side of the probe joins."""
    manifest = register_frozen_state(spark, store_path)
    fps = spark.table(manifest["tables"]["fps"]["table"])
    bnd = spark.table(manifest["tables"]["bands"]["table"])
    return fps, bnd, manifest


# ---------------------------------------------------------------------------
# Streaming variant: an APPEND-ONLY bucketed store whose rows are keyed
# by the corpus part (per-batch directory / flat file) they derive
# from. The continuous-curation loop appends each committed batch's
# fp/band rows after the corpus commit, and probes read only rows whose
# part is actually present in the corpus listing — so
#
# * a re-delivered trigger excludes its own part (same contract as the
#   corpus read) and its re-append writes byte-identical rows
#   (recompute is deterministic), making duplicates harmless to the
#   duplicate-insensitive probes (anti-join / distinct candidates);
# * a crash AFTER the stream checkpoint commit but before the store
#   append leaves a corpus part with no store rows — the next trigger
#   detects it (corpus listing vs store manifest) and computes that
#   part's relations on the fly, then the commit path re-appends it:
#   self-healing, no correctness window;
# * stale store rows for a part whose corpus directory was deleted
#   (an attempt that recomputed to zero rows) are excluded by the
#   presence filter automatically.
# ---------------------------------------------------------------------------

_STREAM_PARTS = "_STREAM_PARTS.json"


def _stream_manifest_path(store_path: str) -> str:
    return os.path.join(store_path, _STREAM_PARTS)


def _stream_parts(store_path: str) -> dict:
    path = _stream_manifest_path(store_path)
    if not os.path.exists(path):
        return {"num_buckets": None, "lsh": None, "parts": [], "generation": 0}
    with open(path) as f:
        manifest = json.load(f)
    manifest.setdefault("generation", 0)
    return manifest


def _commit_stream_parts(store_path: str, manifest: dict) -> None:
    os.makedirs(store_path, exist_ok=True)
    tmp = _stream_manifest_path(store_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, _stream_manifest_path(store_path))


def _stream_tables(store_path: str, generation: int = 0) -> dict:
    # compaction bumps the generation: tables/dirs are suffixed so a
    # compacted store swaps in atomically at the manifest commit and a
    # crashed compaction leaves only orphan next-gen directories
    suffix = "" if generation == 0 else f"_g{generation}"
    prefix = _table_prefix(store_path) + "_stream"
    return {
        "fps": {
            "table": f"{prefix}_fps{suffix}",
            "path": os.path.join(store_path, f"stream_fps{suffix}"),
            "bucket_cols": ("fp",),
            "ddl": "fp string, part string",
        },
        "bands": {
            "table": f"{prefix}_bands{suffix}",
            "path": os.path.join(store_path, f"stream_bands{suffix}"),
            "bucket_cols": ("band", "key"),
            "ddl": "doc_id bigint, band int, key string, part string",
        },
    }


def _register_stream_tables(
    spark: SparkSession, store_path: str, num_buckets: int, generation: int = 0
) -> dict:
    tables = _stream_tables(store_path, generation)
    for spec in tables.values():
        if spark.catalog.tableExists(spec["table"]):
            continue
        if not os.path.exists(spec["path"]):
            continue  # nothing written yet; saveAsTable will create it
        cols = ", ".join(spec["bucket_cols"])
        spark.sql(
            f"CREATE TABLE {spec['table']} ({spec['ddl']}) USING PARQUET "
            f"CLUSTERED BY ({cols}) SORTED BY ({cols}) INTO {num_buckets} BUCKETS "
            f"LOCATION '{os.path.abspath(spec['path'])}'"
        )
    return tables


def _part_relations(
    docs: DataFrame, part: Column, lsh: dict
) -> Tuple[DataFrame, DataFrame]:
    fps = exact_dedup(docs).select("fp").withColumn("part", part)
    bnd = band_relation(
        docs, n_perm=lsh["n_perm"], bands=lsh["bands"], k=lsh["k"], hash_mode=lsh["hash_mode"]
    ).withColumn("part", part)
    return fps, bnd


def append_frozen_parts(
    spark: SparkSession,
    store_path: str,
    part_docs: dict,
    n_perm: int = 8,
    bands: int = 4,
    k: int = 4,
    hash_mode: str = "md5",
    num_buckets: int = 64,
) -> None:
    """Append the fp/band relations of the given corpus parts
    (``{part_name: docs DataFrame}``) to the streaming store. First
    call creates the bucketed tables; later calls append with the same
    bucket spec. LSH parameters are pinned by the first append — a
    mismatch raises rather than silently mixing incompatible band
    keys."""
    manifest = _stream_parts(store_path)
    lsh = {"n_perm": n_perm, "bands": bands, "k": k, "hash_mode": hash_mode}
    if manifest["lsh"] is not None and manifest["lsh"] != lsh:
        raise ValueError(
            f"streaming store at {store_path} was created with lsh={manifest['lsh']}, "
            f"append requested lsh={lsh}"
        )
    if manifest["num_buckets"] is not None:
        num_buckets = manifest["num_buckets"]
    tables = _register_stream_tables(spark, store_path, num_buckets, manifest["generation"])
    for name, docs in part_docs.items():
        fps, bnd = _part_relations(docs, F.lit(name), lsh)
        for df, spec in ((fps, tables["fps"]), (bnd, tables["bands"])):
            (
                df.write.mode("append")
                .format("parquet")
                .bucketBy(num_buckets, *spec["bucket_cols"])
                .sortBy(*spec["bucket_cols"])
                .option("path", spec["path"])
                .saveAsTable(spec["table"])
            )
    manifest["lsh"] = lsh
    manifest["num_buckets"] = num_buckets
    manifest["parts"] = sorted(set(manifest["parts"]) | set(part_docs))
    _commit_stream_parts(store_path, manifest)


def stream_frozen_relations(
    spark: SparkSession,
    store_path: str,
    corpus_parts: dict,
    n_perm: int = 8,
    bands: int = 4,
    k: int = 4,
    hash_mode: str = "md5",
) -> Tuple[Optional[DataFrame], Optional[DataFrame], list]:
    """Assemble ``(frozen_fps, frozen_bands, missing_parts)`` for the
    corpus parts in ``corpus_parts`` (``{part_name: docs DataFrame}``,
    already excluding the probing batch's own part). Parts present in
    the store read from the bucketed tables (filtered to exactly the
    live part set — stale rows of deleted parts drop out here); parts
    the store has not absorbed yet are computed from their text on the
    fly and unioned in (the self-heal path; callers re-append them at
    commit time). Returns ``(None, None, [])`` when there are no parts
    at all. When nothing is missing, the returned relations are pure
    bucketed scans — the probe joins run with zero frozen-side
    shuffle in the sort-merge regime."""
    if not corpus_parts:
        return None, None, []
    manifest = _stream_parts(store_path)
    lsh = {"n_perm": n_perm, "bands": bands, "k": k, "hash_mode": hash_mode}
    if manifest["lsh"] is not None and manifest["lsh"] != lsh:
        raise ValueError(
            f"streaming store at {store_path} was created with lsh={manifest['lsh']}, "
            f"probe requested lsh={lsh}"
        )
    stored = set(manifest["parts"]) & set(corpus_parts)
    missing = sorted(set(corpus_parts) - stored)
    fps = bnd = None
    if stored:
        tables = _register_stream_tables(
            spark, store_path, manifest["num_buckets"] or 64, manifest["generation"]
        )
        live = sorted(stored)
        fps = spark.table(tables["fps"]["table"]).where(F.col("part").isin(live))
        bnd = spark.table(tables["bands"]["table"]).where(F.col("part").isin(live))
    for name in missing:
        mfps, mbnd = _part_relations(corpus_parts[name], F.lit(name), lsh)
        fps = mfps if fps is None else fps.unionByName(mfps)
        bnd = mbnd if bnd is None else bnd.unionByName(mbnd)
    return fps, bnd, missing


def compact_stream_store(
    spark: SparkSession, store_path: str, live_parts: Optional[list] = None
) -> dict:
    """Offline maintenance for the streaming store: rewrite both tables
    keeping only rows of ``live_parts`` (default: the manifest's own
    part list) and dropping exact-duplicate rows left by re-delivered
    appends. Run while the stream is stopped.

    The rewrite lands in generation-suffixed tables/directories; the
    manifest commit (atomic rename) is the swap point — the stream's
    next trigger reads the new generation, probes are never exposed to
    a half-written rewrite, and a crash mid-compaction leaves only
    orphan next-generation directories (re-running cleans them by
    overwriting). Old-generation directories are deleted after the
    commit. Returns the new manifest."""
    import shutil

    manifest = _stream_parts(store_path)
    if manifest["num_buckets"] is None:
        raise ValueError(f"no streaming store at {store_path}")
    live = sorted(set(manifest["parts"] if live_parts is None else live_parts))
    old_gen, new_gen = manifest["generation"], manifest["generation"] + 1
    old_tables = _register_stream_tables(spark, store_path, manifest["num_buckets"], old_gen)
    new_tables = _stream_tables(store_path, new_gen)
    for key in ("fps", "bands"):
        src, dst = old_tables[key], new_tables[key]
        rows = (
            spark.table(src["table"]).where(F.col("part").isin(live)).dropDuplicates()
        )
        spark.sql(f"DROP TABLE IF EXISTS {dst['table']}")
        (
            rows.write.mode("overwrite")
            .format("parquet")
            .bucketBy(manifest["num_buckets"], *dst["bucket_cols"])
            .sortBy(*dst["bucket_cols"])
            .option("path", dst["path"])
            .saveAsTable(dst["table"])
        )
    manifest["generation"] = new_gen
    manifest["parts"] = live
    _commit_stream_parts(store_path, manifest)  # the swap point
    for key in ("fps", "bands"):
        spark.sql(f"DROP TABLE IF EXISTS {old_tables[key]['table']}")
        shutil.rmtree(old_tables[key]["path"], ignore_errors=True)
    return manifest
