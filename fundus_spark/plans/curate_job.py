"""Resumable curation job: the curation chain with STAGE-level durable
checkpoints — each stage boundary is written to the lake and committed
in a manifest, so a re-submit resumes from the last completed stage.

Why stage-level (vs the extraction job's bucket-level) resume: the
extraction stage is embarrassingly parallel, so a hash bucket is a
natural unit of commit/resume. Curation is NOT — exact dedup, the LSH
pair graph, connected components, and decontamination are corpus-global
(a pair can span any two buckets), so the honest unit of durability is
the stage: ``gated`` (quality filter), ``deduped`` (exact dedup),
``survivors`` (near-dup components + survivor selection, which subsumes
the pair graph), and ``final`` (decontaminate + split + pack). At
10^12 docs each boundary is a table a re-submit can read back instead
of recomputing hours of upstream work — the production realization of
what ``curate_corpus(materialize_stages=True)`` does in-session with
``localCheckpoint``.

Commit protocol mirrors ``run_extraction_job``: the stage's parquet
write lands first, the manifest append is the commit point. A crash
between the two leaves a stage directory that the retry overwrites
idempotently; a stage is only ever read back when its manifest row
exists. Outputs are plain parquet here; on Iceberg each stage is a
table and the manifest is the catalog's snapshot log (same contract).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import (
    dedup_survivors,
    exact_dedup,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    pack_by_budget,
    repetition_score,
    split_assign,
)
from ..operators.dedup import shingle_relation
from .curate import decontaminate

STAGES = ("gated", "deduped", "survivors", "final")


@dataclass
class CurateJobResult:
    workdir: str
    stages_run: List[str] = field(default_factory=list)
    stages_resumed: List[str] = field(default_factory=list)
    rows_out: int = 0
    frozen_store: Optional[str] = None


def _manifest_path(workdir: str) -> str:
    return os.path.join(workdir, "_curate_manifest.json")


def _committed_stages(workdir: str) -> set:
    path = _manifest_path(workdir)
    if not os.path.exists(path):
        return set()
    with open(path) as fh:
        return {json.loads(line)["stage"] for line in fh if line.strip()}


def _commit_stage(workdir: str, stage: str) -> None:
    with open(_manifest_path(workdir), "a") as fh:
        fh.write(json.dumps({"stage": stage}) + "\n")


def run_curate_job(
    spark: SparkSession,
    docs: DataFrame,
    workdir: str,
    benchmark: Optional[DataFrame] = None,
    min_chars: int = 20,
    max_dup_gram_frac: float = 0.9,
    jaccard_threshold: float = 0.8,
    contamination_k: int = 8,
    split_weights: Sequence[Tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    split_salt: str = "split",
    pack_budget: int = 4096,
    shard_col: str = "source",
    lsh_perm: int = 8,
    lsh_bands: int = 4,
    shingle_k: int = 4,
    hash_mode: str = "md5",
    freeze_state: bool = False,
    freeze_buckets: int = 64,
    broadcast_max_rows: int = 10_000_000,
) -> CurateJobResult:
    """Runs the curation chain with each stage written to
    ``{workdir}/{stage}`` and committed to the job manifest; committed
    stages are read back, not recomputed. Deterministic inputs +
    parameters mean a resumed run produces the identical corpus.

    ``freeze_state=True`` adds a final committed stage that writes the
    curated corpus's dedup state (exact fingerprints + LSH band
    relation, same lsh/shingle/hash parameters as this run) to
    ``{workdir}/frozen_state`` as bucketed tables via
    :mod:`plans.frozen_store` — the handoff that turns this full run
    into the frozen side of every later :func:`plans.curate.curate_increment`
    append without recomputing or re-shuffling corpus state."""
    os.makedirs(workdir, exist_ok=True)
    done = _committed_stages(workdir)
    result = CurateJobResult(workdir=workdir)

    def _stage(name: str, build) -> DataFrame:
        path = os.path.join(workdir, name)
        if name in done:
            result.stages_resumed.append(name)
            return spark.read.parquet(path)
        out = build()
        out.write.mode("overwrite").parquet(path)
        _commit_stage(workdir, name)
        result.stages_run.append(name)
        return spark.read.parquet(path)

    def _build_gated() -> DataFrame:
        base = docs.where(F.length(F.trim(F.col("text"))) >= min_chars)
        rep = repetition_score(base, n=2).where(F.col("dup_gram_frac") <= max_dup_gram_frac)
        return base.join(rep.select("doc_id"), "doc_id")

    gated = _stage("gated", _build_gated)

    def _build_deduped() -> DataFrame:
        keep = exact_dedup(gated).select(F.col("keep_id").alias("doc_id"))
        return gated.join(keep, "doc_id", "left_semi")

    deduped = _stage("deduped", _build_deduped)

    def _build_survivors() -> DataFrame:
        shingles = shingle_relation(deduped, k=shingle_k).distinct()
        cands = lsh_candidate_pairs(
            deduped, n_perm=lsh_perm, bands=lsh_bands, k=shingle_k,
            shingles=shingles, hash_mode=hash_mode,
        )
        pairs = ngram_jaccard_pairs(
            deduped, k=shingle_k, threshold=jaccard_threshold,
            candidates=cands, shingles=shingles,
        )
        return dedup_survivors(deduped, pairs)

    survivors = _stage("survivors", _build_survivors)

    def _build_final() -> DataFrame:
        clean = survivors
        if benchmark is not None:
            clean = decontaminate(
                clean, benchmark, contamination_k=contamination_k,
                broadcast_max_rows=broadcast_max_rows,
            )
        assigned = split_assign(clean, weights=split_weights, salt=split_salt)
        toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
        return pack_by_budget(
            assigned.withColumn("n_tokens", toks.cast("long")),
            budget=pack_budget, token_col="n_tokens", part_col=shard_col, order_col="doc_id",
        )

    final = _stage("final", _build_final)
    result.rows_out = final.count()

    if freeze_state:
        from .frozen_store import write_frozen_state

        store = os.path.join(workdir, "frozen_state")
        if "frozen" in done:
            result.stages_resumed.append("frozen")
        else:
            write_frozen_state(
                final,
                store,
                n_perm=lsh_perm,
                bands=lsh_bands,
                k=shingle_k,
                hash_mode=hash_mode,
                num_buckets=freeze_buckets,
            )
            _commit_stage(workdir, "frozen")
            result.stages_run.append("frozen")
        result.frozen_store = store
    return result
