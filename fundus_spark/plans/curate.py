"""End-to-end corpus curation: the full training-data assembly chain
composed from the shipped operators, as one declarative plan.

    raw documents
      -> quality gate        (Gopher repetition + length filters)
      -> exact dedup         (first-wins on normalized-text hash)
      -> near-dup dedup      (LSH candidates -> Jaccard verify ->
                              connected components -> survivors)
      -> decontamination     (drop docs colliding with the eval set's
                              n-grams; benchmark side broadcast)
      -> split assignment    (deterministic train/val/test buckets)
      -> sequence packing    (per-shard concat-and-chunk offsets)

Every stage is the scale-correct shape documented on its operator:
the quality gate and split are narrow zero-shuffle maps, exact dedup
is one map-side-combinable aggregation, the near-dup chain is banded
(never all-pairs) with a broadcast label join, decontamination
broadcasts the benchmark shingles, and packing shuffles once on the
shard key. No stage collects to the driver.

The reference has no curation surface (it emits articles one by one;
`crawler.py` dedups by exact URL only) — this is the 100 TB
generalization the training pipeline needs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import (
    contamination_flags,
    dedup_survivors,
    exact_dedup,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    pack_by_budget,
    repetition_score,
    split_assign,
)
from ..operators.dedup import shingle_relation


# shared plan predicate (moved to operators.adaptive in round 8 so the
# Bloom/sketch operators can use it without importing plans); the name
# here is kept for existing callers/tests
from ..operators.adaptive import is_cheap_rescan as _is_cheap_rescan  # noqa: E402


def _check_ccnet_drop_tiers(ccnet_drop_tiers: Sequence[str], n_buckets: int) -> None:
    """Fail fast on a drop-tier label the chosen ``n_buckets`` can never
    produce (round-7 advice: with ``n_buckets != 3`` the labels are
    ``b<k>``, so the default ``("tail",)`` silently matched nothing and
    the CCNet stage became a quiet no-op)."""
    producible = (
        {"head", "middle", "tail"}
        if n_buckets == 3
        else {f"b{k}" for k in range(1, n_buckets + 1)}
    )
    bad = [t for t in ccnet_drop_tiers if t not in producible]
    if bad:
        raise ValueError(
            f"ccnet_drop_tiers {bad} can never match a tier produced with "
            f"ccnet_n_buckets={n_buckets} (producible: {sorted(producible)})"
        )


def decontaminate(
    survivors: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    contamination_k: int = 8,
    broadcast_max_rows: int = 10_000_000,
) -> DataFrame:
    """Anti-join out benchmark-contaminated docs, with the same
    broadcast guard + shuffle fallback every other potentially
    unbounded broadcast in the chain carries.

    The flagged-id set is usually tiny, but the exact scenario
    decontamination exists for — benchmark text mirrored across
    millions of crawled pages — makes it unbounded at 100 TB, so it is
    broadcast only under ``broadcast_max_rows``; above that the
    left_anti join runs as a plain shuffle join (same result, one
    extra exchange). The flagged relation is eagerly checkpointed
    first so the guard count and the join read one materialization,
    not two evaluations of the contamination pipeline.
    """
    flagged = contamination_flags(
        survivors, benchmark, text_col=text_col, id_col=id_col, k=contamination_k
    )
    ids = flagged.select(F.col("doc_id").alias(id_col)).localCheckpoint(eager=True)
    side = F.broadcast(ids) if ids.count() <= broadcast_max_rows else ids
    return survivors.join(side, id_col, "left_anti")


def curate_corpus(
    docs: DataFrame,
    benchmark: Optional[DataFrame] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
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
    materialize_stages: bool = True,
    hash_mode: str = "md5",
    lsh_bucket_cap: Optional[int] = 1024,
    broadcast_max_rows: int = 10_000_000,
    line_dedup_min_occ: Optional[int] = None,
    quality_model: Optional[DataFrame] = None,
    quality_threshold: float = 0.5,
    quality_salt: str = "qcls",
    quality_feature_mode: str = "binary",
    repair_mojibake: bool = False,
    ccnet_target: Optional[DataFrame] = None,
    ccnet_drop_tiers: Sequence[str] = ("tail",),
    ccnet_n_buckets: int = 3,
    ccnet_sample_mod: Optional[int] = None,
) -> DataFrame:
    """Returns the training-ready corpus: quality-gated, exact- and
    near-dup-deduplicated, decontaminated against ``benchmark`` (if
    given), with ``split`` and ``pack_offset``/``pack_bin`` columns.
    Deterministic end to end — every stage is reproducible from
    (input, parameters) alone, so reruns and incremental jobs agree.
    ``hash_mode="xxhash64"`` swaps the LSH shingle hash for the ~3-4x
    cheaper native hash at 100 TB (md5 default keeps the DuckDB oracle
    exact — same twin-mode contract as the minhash operators).
    ``lsh_bucket_cap`` bounds the band join's per-bucket quadratic
    term against near-identical template floods (star pairs above the
    cap — see :func:`operators.dedup.lsh_candidate_pairs`); the
    upstream exact-dedup and trivial-doc gates collapse exact floods,
    and since round 6 the cap is ALSO on by default (1024) as the
    belt-and-braces for near-identical-but-not-exact floods — pass
    ``None`` to opt out and get the exact uncapped band join.

    Incremental contract: the quality gate, exact dedup, split, and
    packing decisions are pure per-row functions of (row, parameters),
    so they never flip when the corpus grows. Near-dup survivorship is
    corpus-dependent by nature; with monotonically increasing doc ids
    it is stable as long as new documents do not MERGE previously
    separate clusters — a new doc joining one existing cluster can
    never displace its survivor (the canonical doc is the cluster
    minimum, and the new id is larger). The one exception: a new
    document that bridges two previously separate clusters merges
    them, and the merged cluster keeps only the smaller of the two old
    minima — demoting at most one prior survivor per merge. An
    append-only incremental run that must never demote survivors
    should freeze prior cluster labels and assign new docs to them
    (union-find against the frozen labels) instead of re-clustering.

    ``line_dedup_min_occ`` (round 7, default off) prepends the
    MassiveText/RefinedWeb boilerplate-line removal: lines recurring
    corpus-wide >= that many times are stripped from every document
    BEFORE the quality gate and dedup stages, so template chrome
    neither inflates near-dup similarity nor survives into packed
    training text. Default ``None`` keeps the chain byte-identical to
    prior releases (and to the driver oracle).

    ``ccnet_target`` (round 7, default off) adds CCNet perplexity
    tiering (Wenzek et al. 2020) after exact dedup: an add-one bigram
    LM trains on the passed clean corpus, every surviving doc is
    scored under it, and docs in ``ccnet_drop_tiers`` (default: the
    tail third) are dropped before the near-dup machinery. Pass
    ``ccnet_sample_mod`` at scale for the sampled-cutoff regime (no
    corpus-wide sort). Default ``None`` keeps the chain byte-identical
    to prior releases.

    ``quality_model`` (round 7, default off) adds the TRAINED quality
    filter (GPT-3/LLaMA classifier family) between the heuristic gate
    and dedup: pass a fitted model from
    :func:`operators.quality_classifier_fit` (or a quantized weight
    sequence) and docs the model scores below ``quality_threshold``
    are dropped before any shingling — the cheapest place to shed
    low-quality mass, since every downstream stage shrinks with it.
    Use the same ``quality_salt``/``quality_feature_mode`` the model
    was fitted with. Default ``None`` keeps the chain byte-identical
    to prior releases.

    ``repair_mojibake`` (round 7, default off) prepends
    :func:`operators.fix_mojibake` before EVERYTHING — including the
    line-dedup stage — so a mis-decoded copy of a clean page repairs
    to the same bytes and actually deduplicates (corrupted and clean
    twins otherwise share no shingles). A zero-shuffle projection;
    default ``False`` keeps the chain byte-identical."""
    if repair_mojibake:
        # a pure per-row projection — unlike line_dedup there is no
        # corpus-wide aggregation, so no join-back is needed (review
        # finding: the first cut joined the full corpus to itself just
        # to re-attach untouched columns)
        from ..operators.textclean import fix_mojibake_col

        docs = docs.withColumn(text_col, fix_mojibake_col(F.col(text_col)))
    if line_dedup_min_occ is not None:
        from ..operators import line_dedup

        cleaned = line_dedup(
            docs, min_occurrences=line_dedup_min_occ,
            text_col=text_col, id_col=id_col,
            broadcast_max_rows=broadcast_max_rows,
        ).select(F.col("doc_id").alias(id_col), F.col("kept_text"))
        docs = docs.drop(text_col).join(cleaned, id_col).withColumnRenamed(
            "kept_text", text_col
        )
    gated = docs.where(F.length(F.trim(F.col(text_col))) >= min_chars)
    rep = repetition_score(gated, text_col=text_col, id_col=id_col, n=2).where(
        F.col("dup_gram_frac") <= max_dup_gram_frac
    )
    # repetition_score / contamination_flags emit their id as "doc_id";
    # alias back so a caller's id_col keeps working end to end
    gated = gated.join(rep.select(F.col("doc_id").alias(id_col)), id_col)

    if quality_model is not None:
        from ..operators import quality_classifier_score

        kept = quality_classifier_score(
            gated, quality_model, text_col=text_col, id_col=id_col,
            salt=quality_salt, threshold=quality_threshold,
            feature_mode=quality_feature_mode,
        ).where(F.col("predicted")).select(F.col("doc_id").alias(id_col))
        gated = gated.join(kept, id_col, "left_semi")

    keep_ids = exact_dedup(gated, text_col=text_col, id_col=id_col).select(
        F.col("keep_id").alias(id_col)
    )
    deduped = gated.join(keep_ids, id_col, "left_semi")
    if materialize_stages:
        # the deduped relation feeds four branches (LSH shingles,
        # Jaccard sizes, survivor join, contamination shingles);
        # materializing the stage boundary runs the quality gate +
        # exact dedup once instead of per branch — exactly what a
        # production pipeline does by writing each stage to the lake
        # (swap localCheckpoint for a table write + re-read there)
        deduped = deduped.localCheckpoint(eager=True)

    if ccnet_target is not None:
        # CCNet perplexity tiering (Wenzek et al. 2020; default: drop
        # the tail third) — placed AFTER exact dedup, matching the
        # paper's dedup-then-LM order AND shrinking both the join-heavy
        # LM scoring and the LSH machinery downstream. Docs without a
        # single bigram (<2 tokens) cannot be scored and are dropped
        # with the tail. Tiers are corpus-distribution-dependent by
        # nature (like near-dup survivorship, unlike the pure per-row
        # gates), so this stage lives only in the full-rerun chain;
        # ``ccnet_sample_mod`` switches to the paper's sampled-cutoff
        # regime (no corpus-wide sort) at scale.
        from ..operators.textstats import ccnet_perplexity_buckets

        _check_ccnet_drop_tiers(ccnet_drop_tiers, ccnet_n_buckets)
        tiers = ccnet_perplexity_buckets(
            deduped, ccnet_target, text_col=text_col, id_col=id_col,
            n_buckets=ccnet_n_buckets, cutoff_sample_mod=ccnet_sample_mod,
        )
        kept_tiers = tiers.where(~F.col("tier").isin(*ccnet_drop_tiers)).select(
            F.col("doc_id").alias(id_col)
        )
        deduped = deduped.join(kept_tiers, id_col, "left_semi")
        if materialize_stages:
            deduped = deduped.localCheckpoint(eager=True)

    # the distinct shingle relation feeds BOTH the banding and the
    # verify phase; compute it once (Catalyst does not reuse the
    # explode+distinct exchange across the two consumers)
    shingles = shingle_relation(deduped, text_col=text_col, id_col=id_col, k=shingle_k).distinct()
    if materialize_stages:
        shingles = shingles.localCheckpoint(eager=True)
    cands = lsh_candidate_pairs(
        deduped, text_col=text_col, id_col=id_col, n_perm=lsh_perm, bands=lsh_bands,
        k=shingle_k, shingles=shingles, hash_mode=hash_mode, bucket_cap=lsh_bucket_cap,
    )
    pairs = ngram_jaccard_pairs(
        deduped, text_col=text_col, id_col=id_col, k=shingle_k,
        threshold=jaccard_threshold, candidates=cands, shingles=shingles,
    )
    survivors = dedup_survivors(deduped, pairs, id_col=id_col)
    if materialize_stages:
        survivors = survivors.localCheckpoint(eager=True)

    if benchmark is not None:
        survivors = decontaminate(
            survivors, benchmark, text_col=text_col, id_col=id_col,
            contamination_k=contamination_k, broadcast_max_rows=broadcast_max_rows,
        )

    assigned = split_assign(survivors, weights=split_weights, salt=split_salt, id_col=id_col)
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    with_tokens = assigned.withColumn("n_tokens", toks.cast("long"))
    return pack_by_budget(
        with_tokens, budget=pack_budget, token_col="n_tokens", part_col=shard_col, order_col=id_col
    )


def curate_increment(
    new_docs: DataFrame,
    frozen_docs: DataFrame,
    benchmark: Optional[DataFrame] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
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
    frozen_fps: Optional[DataFrame] = None,
    frozen_bands: Optional[DataFrame] = None,
    materialize_stages: bool = True,
    broadcast_max_rows: int = 10_000_000,
    lsh_bucket_cap: Optional[int] = 1024,
    quality_model: Optional[DataFrame] = None,
    quality_threshold: float = 0.5,
    quality_salt: str = "qcls",
    quality_feature_mode: str = "binary",
    ccnet_target: Optional[DataFrame] = None,
    ccnet_cutoffs: Optional[DataFrame] = None,
    ccnet_drop_tiers: Sequence[str] = ("tail",),
    ccnet_n_buckets: int = 3,
) -> DataFrame:
    """The daily-increment twin of :func:`curate_corpus`: curate a NEW
    batch against a FROZEN, already-curated corpus without touching it.
    A 100 TB pipeline runs this shape on every append instead of
    re-clustering the world — the frozen partition is immutable, so
    prior survivorship, splits, and packed bins never change (the
    guarantee the full-rerun chain cannot give; see the incremental
    contract on :func:`curate_corpus`).

    Stages (each the scale-correct shape of its full-run counterpart):

    1. quality gate (length + Gopher repetition, plus the trained
       classifier when ``quality_model`` is passed — SAME model and
       salt as the full runs, so the pure per-row keep decision agrees
       with any past or future run) — narrow, new batch only;
    2. exact dedup — first-wins WITHIN the batch, then drop batch docs
       whose normalized-text fingerprint already exists in the frozen
       corpus (pass ``frozen_fps`` = the stored ``exact_dedup`` fp
       relation to skip rereading frozen text);
    3. near-dup: :func:`operators.dedup.incremental_assign` — banded
       probe of the frozen corpus (pass ``frozen_bands`` = the stored
       :func:`band_relation`), exact verify, freeze-respecting cluster
       adoption; only batch docs that survive stay;

    Pass BOTH frozen relations from :mod:`plans.frozen_store` at scale:
    the store writes them as bucketed tables hashed on their join keys
    (``fp`` / ``(band, key)``), so when a batch is too large to
    broadcast and the probe joins fall back to sort-merge, the frozen
    side reads its buckets in place — the shuffled volume stays
    O(batch) instead of O(corpus) (pinned by
    ``tests/test_frozen_store.py``'s differential Exchange counts).
    4. decontamination vs ``benchmark`` (broadcast shingles);
    5. split assignment with the SAME salt as the full runs — the pure
       (salt, id) decision agrees with any past or future run;
    6. per-shard sequence packing of the increment. Pack offsets/bins
       are namespaced to THIS increment (an appending consumer offsets
       them by its stored per-shard high-water mark — bins are a
       physical layout, not a semantic identity, so per-increment
       numbering is the append-friendly contract).

    Returns the curated increment with ``cluster_id``, ``split``,
    ``n_tokens``, ``pack_offset``, ``pack_bin``.
    """
    from ..operators import incremental_assign

    gated = new_docs.where(F.length(F.trim(F.col(text_col))) >= min_chars)
    rep = repetition_score(gated, text_col=text_col, id_col=id_col, n=2).where(
        F.col("dup_gram_frac") <= max_dup_gram_frac
    )
    gated = gated.join(rep.select(F.col("doc_id").alias(id_col)), id_col)

    if quality_model is not None:
        from ..operators import quality_classifier_score

        kept = quality_classifier_score(
            gated, quality_model, text_col=text_col, id_col=id_col,
            salt=quality_salt, threshold=quality_threshold,
            feature_mode=quality_feature_mode,
        ).where(F.col("predicted")).select(F.col("doc_id").alias(id_col))
        gated = gated.join(kept, id_col, "left_semi")

    if ccnet_target is not None or ccnet_cutoffs is not None:
        # CCNet tiering on the APPEND path is only append-safe with
        # FROZEN cutoffs: tier boundaries computed from the batch would
        # shift with every batch, violating the increment's pure
        # per-row contract. Require both artifacts (the persisted
        # target corpus/model input and the ccnet_cutoffs relation) and
        # the decision is a pure function of (row, target, cutoffs) —
        # identical today or replayed next year.
        if ccnet_target is None or ccnet_cutoffs is None:
            raise ValueError(
                "increment-path CCNet tiering needs BOTH ccnet_target and "
                "ccnet_cutoffs (a persisted operators.ccnet_cutoffs relation); "
                "batch-derived cutoffs would shift across appends"
            )
        from ..operators.textstats import ccnet_perplexity_buckets

        _check_ccnet_drop_tiers(ccnet_drop_tiers, ccnet_n_buckets)
        tiers = ccnet_perplexity_buckets(
            gated, ccnet_target, text_col=text_col, id_col=id_col,
            n_buckets=ccnet_n_buckets, cutoffs=ccnet_cutoffs,
        )
        kept_tiers = tiers.where(~F.col("tier").isin(*ccnet_drop_tiers)).select(
            F.col("doc_id").alias(id_col)
        )
        gated = gated.join(kept_tiers, id_col, "left_semi")

    keep_ids = exact_dedup(gated, text_col=text_col, id_col=id_col).select(
        F.col("keep_id").alias(id_col)
    )
    deduped = gated.join(keep_ids, id_col, "left_semi")
    if frozen_fps is None:
        # materialize the default-constructed relation ONCE: the guard
        # count below plus the left_anti join would otherwise each run
        # the frozen-corpus exact-dedup job (review finding — the
        # dominant frozen-side cost doubled per streaming trigger)
        frozen_fps = (
            exact_dedup(frozen_docs, text_col=text_col, id_col=id_col)
            .select("fp")
            .localCheckpoint(eager=True)
        )
    elif not _is_cheap_rescan(frozen_fps):
        # a CALLER-supplied frozen_fps gets the same protection (round-6
        # review finding: the guard count + the left_anti join evaluated
        # an unpersisted caller lineage twice) — but only when re-scan is
        # actually expensive: the documented 100 TB contract is a stored
        # parquet fp relation, whose count is metadata-only and which an
        # eager checkpoint would pointlessly copy in full.
        frozen_fps = frozen_fps.localCheckpoint(eager=True)
    # The frozen fingerprint relation is one md5 row PER FROZEN DOC —
    # at the 100 TB append-only shape that is billions of rows, so a
    # forced broadcast would OOM the driver. Broadcast only under the
    # same cap dedup_survivors uses; above it, the left_anti join runs
    # as a plain shuffle join (same result, one extra exchange). At
    # scale callers pass a persisted frozen_fps, so the guard count is
    # a cheap parquet-side count, not a recompute of frozen dedup.
    fps_rel = frozen_fps.select(F.col("fp").alias("_fp"))
    if frozen_fps.count() <= broadcast_max_rows:
        fps_rel = F.broadcast(fps_rel)
    normalized = F.md5(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    deduped = deduped.withColumn("_fp", normalized).join(
        fps_rel, "_fp", "left_anti"
    ).drop("_fp")
    if materialize_stages:
        deduped = deduped.localCheckpoint(eager=True)

    assigned_clusters = incremental_assign(
        deduped,
        frozen_docs,
        text_col=text_col,
        id_col=id_col,
        n_perm=lsh_perm,
        bands=lsh_bands,
        k=shingle_k,
        threshold=jaccard_threshold,
        hash_mode=hash_mode,
        frozen_bands=frozen_bands,
        broadcast_max_rows=broadcast_max_rows,
        bucket_cap=lsh_bucket_cap,
    )
    survivors = deduped.join(
        assigned_clusters.where(F.col("survives")).select(
            F.col("doc_id").alias(id_col), "cluster_id"
        ),
        id_col,
    )
    if materialize_stages:
        survivors = survivors.localCheckpoint(eager=True)

    if benchmark is not None:
        survivors = decontaminate(
            survivors, benchmark, text_col=text_col, id_col=id_col,
            contamination_k=contamination_k, broadcast_max_rows=broadcast_max_rows,
        )

    assigned = split_assign(survivors, weights=split_weights, salt=split_salt, id_col=id_col)
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    with_tokens = assigned.withColumn("n_tokens", toks.cast("long"))
    return pack_by_budget(
        with_tokens, budget=pack_budget, token_col="n_tokens", part_col=shard_col, order_col=id_col
    )
