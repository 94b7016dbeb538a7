"""Adversarial skew stress for the dedup chain (round-5 verdict #8).

The documented 10^12-doc hazard is the corpus-hot band bucket: a viral
template near-duplicated en masse plus a flood of near-empty docs puts
most of the corpus into a handful of (band, key) buckets, and the band
self-join's quadratic term concentrates in ONE task. These tests build
that corpus deliberately and measure the band-bucket distribution —
the direct driver of per-task pair counts in the band join — showing
each documented mitigation actually bounds it:

* the curate chain's upstream gates (min-length + exact dedup) collapse
  exact floods BEFORE any banding, so the viral family contributes one
  representative and near-empty docs never reach the join;
* ``bucket_cap`` bounds the residual near-identical-but-not-exact
  flood to cap^2/2 pairs per bucket while still finding enough
  in-family pairs for connected components to absorb the family.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _adversarial_corpus(spark, n_viral=400, n_empty=300, n_normal=60):
    """~30% near-empty docs, one viral template family (exact copies),
    a near-identical (non-exact) variant flood, and normal docs."""
    template = " ".join(f"viral{j} spam{j} chain{j}" for j in range(12))
    rows = []
    # viral EXACT flood: same bytes, distinct ids
    for i in range(n_viral):
        rows.append((i, "viral", template))
    # near-identical variant flood (one token perturbed per doc — NOT
    # exact dups, so exact dedup cannot collapse them)
    for i in range(n_viral, n_viral + 80):
        rows.append((i, "variant", template.replace("spam3", f"spam{i}x")))
    # near-empty flood
    for i in range(n_viral + 80, n_viral + 80 + n_empty):
        rows.append((i, "empty", "ok"))
    # normal distinct docs
    base = n_viral + 80 + n_empty
    for i in range(base, base + n_normal):
        rows.append((i, "normal", " ".join(f"tok{i}_{j} word{i}_{j}" for j in range(15))))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _bucket_histogram(banded):
    sizes = banded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("n"))
    rows = sorted(r.n for r in sizes.collect())
    mid = rows[len(rows) // 2]
    return rows[-1], mid, sum(n * (n - 1) // 2 for n in rows)


def test_curate_gates_collapse_skew_before_banding(spark):
    """Through the curate chain's own upstream gates the adversarial
    corpus never reaches the band join in skewed form: the min-length
    gate drops every near-empty doc and exact dedup collapses the
    viral exact flood to ONE representative — the band-bucket
    max/median ratio on what remains is bounded by the (small) variant
    family, not by corpus size."""
    from fundus_spark.operators.dedup import band_relation, exact_dedup

    docs = _adversarial_corpus(spark)
    # the same two gates curate_corpus/curate_increment apply upstream
    gated = docs.where(F.length(F.trim(F.col("text"))) >= 20)
    keep = exact_dedup(gated).select(F.col("keep_id").alias("doc_id"))
    deduped = gated.join(keep, "doc_id", "left_semi")

    n = deduped.count()
    # 400 exact virals -> 1; 300 near-empties -> 0; variants+normals kept
    assert n == 1 + 80 + 60

    max_b, med_b, total_pairs = _bucket_histogram(band_relation(deduped))
    # the hot bucket is now the 81-member variant family (+1 viral
    # representative), not the 480-member raw flood
    assert max_b <= 82, max_b
    # bounded quadratic term: worst bucket contributes <= C(82,2) pairs
    assert total_pairs <= 4 * (82 * 81 // 2) + n * 4, total_pairs


def test_bucket_cap_bounds_residual_variant_flood(spark):
    """A near-identical (non-exact) flood survives exact dedup by
    construction — bucket_cap is the defense: an over-cap bucket
    switches from all-pairs (C(480,2) ~ 115k pairs here; ~10^10 at a
    10^5-copy flood) to a STAR on the bucket minimum (n-1 = 479 pairs,
    linear), and the family is STILL fully absorbed into one cluster
    because every member is connected to the representative."""
    from fundus_spark.operators.dedup import dedup_survivors, lsh_candidate_pairs, ngram_jaccard_pairs

    docs = _adversarial_corpus(spark).where(F.col("source").isin("viral", "variant", "normal"))
    n_flood = 400 + 80

    capped = lsh_candidate_pairs(docs, bucket_cap=16)
    n_capped = capped.count()
    # star pairs: <= n-1 per over-cap bucket family (distinct across
    # bands), plus nothing from the all-distinct normals
    assert 0 < n_capped <= 4 * n_flood, n_capped
    assert n_capped < 480 * 479 // 2  # nowhere near the quadratic term

    # the star candidates still collapse the flood: verify + connected
    # components keep exactly the min-id representative, and EVERY
    # flood member (including beyond-cap ones) is absorbed
    verified = ngram_jaccard_pairs(docs, threshold=0.5, candidates=capped)
    survivors = dedup_survivors(docs, verified)
    flood_survivor_ids = {
        r.doc_id for r in survivors.where(F.col("source").isin("viral", "variant")).collect()
    }
    assert flood_survivor_ids == {0}
    # no normal doc was harmed by the mitigation
    assert survivors.where(F.col("source") == "normal").count() == 60


def test_uncapped_bucket_math_documents_the_hazard(spark):
    """Regression-documentation: WITHOUT mitigation the raw corpus
    concentrates ~480 docs in one band bucket — a C(480,2) = 114,960
    pair task per band. The test verifies the histogram (cheap) rather
    than materializing the pairs, pinning the arithmetic the cap and
    the gates are defending against."""
    from fundus_spark.operators.dedup import band_relation

    docs = _adversarial_corpus(spark).where(F.col("source").isin("viral", "variant", "normal"))
    max_b, med_b, total_pairs = _bucket_histogram(band_relation(docs))
    # the viral exact flood shares every band key; variants share most
    assert max_b >= 400, max_b
    assert med_b <= 4, med_b  # normals: one doc per bucket
    assert max_b / med_b >= 100  # the skew ratio the mitigations remove
    assert total_pairs >= 4 * (400 * 399 // 2)


def test_curate_chain_exposes_bucket_cap(spark):
    """The production knob reaches the chain: curate_corpus with
    lsh_bucket_cap still collapses a non-exact variant flood to its
    min-id survivor (star pairs), and the uncapped result agrees on
    this corpus (the cap only changes WHICH pairs propose, not the
    final clusters here)."""
    from fundus_spark.plans import curate_corpus

    docs = _adversarial_corpus(spark, n_viral=0, n_empty=0, n_normal=20)
    # with n_viral=0 the 80-member variant flood takes ids 0..79 and
    # the 20 normals take ids 80..99
    capped = curate_corpus(docs, jaccard_threshold=0.5, lsh_bucket_cap=8)
    ids = sorted(r.doc_id for r in capped.collect())
    assert ids[0] == 0 and len([i for i in ids if i < 80]) == 1
    assert len(ids) == 1 + 20


def test_bucket_cap_is_default_on_above_1024(spark):
    """Round-6 contract: the cap defaults ON at 1024 (round-5 verdict —
    the user who hits a template flood at 100 TB is exactly the one who
    didn't set it). A 3000-member non-exact variant flood — big enough
    that every band's flood bucket exceeds the default cap (the
    one-token perturbation scatters a fraction of docs out of each
    band bucket, so n must be well above 1024 / that retention) — with
    NO cap argument passed anywhere, must propose star-dominated
    candidates (a small multiple of n), never the C(3000,2) ~ 4.5M
    quadratic term — and the family must still fully absorb into its
    min-id survivor."""
    from fundus_spark.operators.dedup import dedup_survivors, lsh_candidate_pairs, ngram_jaccard_pairs

    template = " ".join(f"viral{j} spam{j} chain{j}" for j in range(12))
    n = 3000
    rows = [(i, template.replace("spam3", f"spam{i}x")) for i in range(n)]
    rows += [(n + i, " ".join(f"tok{n+i}_{j} word{n+i}_{j}" for j in range(15))) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    candidates = lsh_candidate_pairs(docs)  # defaults only — no bucket_cap kwarg
    n_cand = candidates.count()
    # stars from each over-cap bucket plus all-pairs from sub-cap
    # stragglers: well under one C(1024,2) bucket, let alone C(n,2)
    assert 0 < n_cand <= 8 * n, n_cand
    assert n_cand < n * (n - 1) // 2 // 50  # nowhere near quadratic

    verified = ngram_jaccard_pairs(docs, threshold=0.5, candidates=candidates)
    survivors = dedup_survivors(docs, verified)
    flood_ids = sorted(r.doc_id for r in survivors.where(F.col("doc_id") < n).collect())
    # the representative wins; the only other flood survivors are
    # plain LSH-recall misses — docs whose perturbed token flipped
    # their band key in all 4 bands, which the UNCAPPED join would
    # miss identically (no candidate bucket shared). Expected rate
    # ~(1-(1-4/33)^2)^4 < 0.5%; the cap adds zero absorption loss
    # (pinned exactly by test_bucket_cap_bounds_residual_variant_flood).
    assert flood_ids[0] == 0
    assert len(flood_ids) <= 1 + n // 100, flood_ids[:20]
    assert survivors.where(F.col("doc_id") >= n).count() == 20
