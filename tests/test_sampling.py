"""Deterministic sampling / split assignment (`operators/sampling.py`):
the properties that matter at 100 TB — decisions depend only on
(salt, id), so they are reproducible, stable under corpus growth, and
coordinated across independent jobs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fundus_spark.operators import deterministic_sample, split_assign, stratified_sample


def _docs(spark, n, src="s"):
    return spark.createDataFrame([(i, src) for i in range(n)], "doc_id long, source string")


def test_sample_is_deterministic_and_growth_stable(spark):
    small = {r.doc_id for r in deterministic_sample(_docs(spark, 200), 0.3, salt="x").collect()}
    big = {r.doc_id for r in deterministic_sample(_docs(spark, 400), 0.3, salt="x").collect()}
    assert small == {d for d in big if d < 200}  # growing the corpus never flips a prior decision
    again = {r.doc_id for r in deterministic_sample(_docs(spark, 200), 0.3, salt="x").collect()}
    assert small == again
    assert 0.15 < len(small) / 200 < 0.45  # roughly the requested rate


def test_salt_changes_the_sample(spark):
    a = {r.doc_id for r in deterministic_sample(_docs(spark, 300), 0.5, salt="a").collect()}
    b = {r.doc_id for r in deterministic_sample(_docs(spark, 300), 0.5, salt="b").collect()}
    assert a != b


def test_stratified_rates_apply_per_stratum(spark):
    rows = [(i, "keep_all" if i % 2 == 0 else "drop_all") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(df, {"keep_all": 1.0, "drop_all": 0.0}, default_rate=0.5)
    got = {(r.doc_id, r.source) for r in out.collect()}
    assert all(s == "keep_all" for _, s in got)
    assert len(got) == 200


def test_split_partitions_every_row_exactly_once_and_consistently(spark):
    out = split_assign(_docs(spark, 1000), (("train", 0.8), ("val", 0.1), ("test", 0.1)), salt="s")
    rows = {r.doc_id: r.split for r in out.collect()}
    assert len(rows) == 1000
    frac_train = sum(1 for v in rows.values() if v == "train") / 1000
    assert 0.7 < frac_train < 0.9
    # an independent job over a subset agrees on every shared id
    sub = split_assign(_docs(spark, 100), (("train", 0.8), ("val", 0.1), ("test", 0.1)), salt="s")
    assert all(rows[r.doc_id] == r.split for r in sub.collect())


def test_pack_by_budget_offsets_and_bins(spark):
    from fundus_spark.operators import pack_by_budget

    rows = [(1, "s", 60), (2, "s", 60), (3, "s", 60), (4, "t", 250)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = {r.doc_id: (r.pack_offset, r.pack_bin) for r in pack_by_budget(df, budget=100).collect()}
    # shard s stream: offsets 0,60,120 -> bins 0,0,1; shard t independent
    assert got == {1: (0, 0), 2: (60, 0), 3: (120, 1), 4: (0, 0)}


def test_repetition_score_known_values(spark):
    from fundus_spark.operators import repetition_score

    df = spark.createDataFrame(
        [(1, "ab ab ab ab"), (2, "one two three four")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.dup_gram_frac, r.top_gram_frac) for r in repetition_score(df, n=2).collect()}
    # doc 1: grams = ['ab ab'] x3 -> dup = 2/3, top = 3/3
    assert got[1] == (round(2 / 3, 4), 1.0)
    # doc 2: grams 'one two'(7), 'two three'(9), 'three four'(10), all
    # unique -> dup 0, top = 10/26
    assert got[2] == (0.0, round(10 / 26, 4))


def test_xxhash64_mode_same_properties_different_universe(spark):
    a = {r.doc_id for r in deterministic_sample(_docs(spark, 300), 0.5, salt="x", mode="xxhash64").collect()}
    b = {r.doc_id for r in deterministic_sample(_docs(spark, 600), 0.5, salt="x", mode="xxhash64").collect()}
    assert a == {d for d in b if d < 300}  # growth-stable in production mode too
    md5 = {r.doc_id for r in deterministic_sample(_docs(spark, 300), 0.5, salt="x").collect()}
    assert a != md5  # distinct (equally valid) sample universes
    assert 0.3 < len(a) / 300 < 0.7


def test_pii_scrub_redacts_and_counts(spark):
    from fundus_spark.operators import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex.org and b@x.co, server 192.168.0.1, call +4915112345678 now"),
            (2, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert got[1].clean_text == "mail <EMAIL> and <EMAIL>, server <IP>, call <PHONE> now"
    assert (got[1].n_emails, got[1].n_ips, got[1].n_phones) == (2, 1, 1)
    assert got[2].clean_text == "no pii here at all"
    assert (got[2].n_emails, got[2].n_ips, got[2].n_phones) == (0, 0, 0)


def test_bigram_logprob_known_values(spark):
    import math

    from fundus_spark.operators import bigram_logprob_score

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")], "doc_id long, text string"
    )
    got = {r.doc_id: r.avg_logprob for r in bigram_logprob_score(df).collect()}
    # vocab = {a,b,c,solo} -> V=4, C(a)=3; C(a,b)=2, C(a,c)=1
    assert got[1] == got[2] == round(math.log(3 / 7), 4)   # (2+1)/(3+4)
    assert got[3] == round(math.log(2 / 7), 4)             # (1+1)/(3+4)
    assert 4 not in got  # <2 tokens: no bigrams to score


def test_tfidf_topk_known_ordering(spark):
    import math

    from fundus_spark.operators import tfidf_topk

    df = spark.createDataFrame(
        [(1, "apple apple banana shared"), (2, "cherry shared"), (3, "shared shared")],
        "doc_id long, text string",
    )
    rows = {(r.doc_id, r.rank): (r.term, r.tfidf) for r in tfidf_topk(df, k=2).collect()}
    # 'shared' appears in all 3 docs -> idf = ln(1) = 0
    assert rows[(1, 1)] == ("apple", round(2 * math.log(3), 6))
    assert rows[(1, 2)] == ("banana", round(math.log(3), 6))
    assert rows[(2, 1)] == ("cherry", round(math.log(3), 6))
    assert rows[(2, 2)] == ("shared", 0.0)
    assert rows[(3, 1)] == ("shared", 0.0)


def test_repetition_score_handles_empty_and_null_text(spark):
    from fundus_spark.operators import repetition_score

    df = spark.createDataFrame([(1, ""), (2, "   "), (3, None), (4, "a b")], "doc_id long, text string")
    got = {r.doc_id: (r.dup_gram_frac, r.top_gram_frac) for r in repetition_score(df, n=2).collect()}
    assert got[1] == (0.0, 0.0) and got[2] == (0.0, 0.0)
    assert 3 not in got  # null text contributes no grams, hence no row
    assert got[4] == (0.0, 1.0)


def test_pii_counts_reconcile_with_placeholders_on_overlap(spark):
    # a 9-digit run inside an email local part must be consumed by the
    # email pass and NOT double-counted as a phone
    from fundus_spark.operators import pii_scrub

    df = spark.createDataFrame(
        [(1, "write to u+123456789@x.co today")], "doc_id long, text string"
    )
    r = pii_scrub(df).collect()[0]
    assert r.clean_text == "write to <EMAIL> today"
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 0, 0)


def test_char_entropy_known_values(spark):
    import math

    from fundus_spark.operators import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.entropy_bits for r in char_entropy(df).collect()}
    assert got[1] == 0.0          # single symbol -> zero entropy
    assert got[2] == 1.0          # two equiprobable symbols -> 1 bit
    assert got[3] == round(math.log2(4), 4)  # four equiprobable -> 2 bits
    assert got[4] == 0.0          # empty text -> defined as 0
    assert 5 not in got           # null text -> no row (oracle parity)


def test_large_row_operators_are_linear_not_quadratic(spark):
    """One 40k-token document through the gram/shingle family. With the
    token/string arrays lambda-BOUND these run in seconds; if a refactor
    lets Catalyst inline the split per position again (O(tokens^2)),
    they take minutes — the bound is generous but catches that class."""
    import time

    from fundus_spark.operators import minhash_signatures, repetition_score, winnowing_fingerprints

    big = " ".join("tok%d" % (i % 997) for i in range(40000))
    df = spark.createDataFrame([(1, big)], "doc_id long, text string")
    t0 = time.time()
    assert repetition_score(df).count() == 1
    assert winnowing_fingerprints(df).count() > 0
    assert minhash_signatures(df).count() == 1
    assert time.time() - t0 < 120, "gram/shingle operators regressed to quadratic per-row cost"


def test_quantize_embeddings_error_bound_and_determinism(spark):
    """int8 scalar quantization: per-component dequantization error is
    bounded by scale/2 = max|x|/254, codes stay in [-127, 127], and the
    round-half-up rule is engine-deterministic (same input -> same
    codes on re-run)."""
    import math

    from fundus_spark.operators import quantize_embeddings

    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [100.0, -3.5, 0.0, 2.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector: eps guard, no div0
        (4, [-0.001, 0.0005, 0.0002, -0.0007]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    for vid, vec in rows:
        r = got[vid]
        assert all(-127 <= c <= 127 for c in r.codes), (vid, r.codes)
        maxabs = max(abs(v) for v in vec)
        if maxabs:
            assert math.isclose(r.scale, maxabs / 127.0, rel_tol=1e-12)
            for v, c in zip(vec, r.codes):
                assert abs(c * r.scale - v) <= r.scale / 2 + 1e-12, (vid, v, c)
        else:
            assert all(c == 0 for c in r.codes)
    again = {r.vec_id: list(r.codes) for r in quantize_embeddings(df).collect()}
    assert again == {vid: list(got[vid].codes) for vid, _ in rows}


def test_quantized_topk_matches_full_precision_on_separated_data(spark):
    """On well-separated vectors the compressed index returns the same
    neighbors as full precision (quantization noise ~0.4% cannot flip
    well-separated ranks)."""
    from fundus_spark.operators import cosine_topk, quantized_topk

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.95, 0.05]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where(F.col("vec_id").isin(0, 3))
    full = {(r.query_id, r.rank): r.cand_id for r in cosine_topk(df, q, k=2).collect()}
    quant = {(r.query_id, r.rank): r.cand_id for r in quantized_topk(df, q, k=2).collect()}
    assert full == quant and (0, 1) in full


def test_dsir_weights_rank_target_like_docs_higher(spark):
    from fundus_spark.operators import dsir_log_weights, dsir_select

    target = spark.createDataFrame(
        [(1000 + i, "medical patient clinical trial dosage outcome") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "medical patient clinical trial dosage outcome report"),
         (2, "football match score goal referee stadium crowd"),
         (3, "clinical dosage outcome patient medical study"),
         (4, "recipe butter flour sugar oven bake cake")],
        "doc_id long, text string",
    )
    w = {r.doc_id: r.log_weight for r in dsir_log_weights(raw, target).collect()}
    assert set(w) == {1, 2, 3, 4}
    # target-domain docs must outscore off-domain docs
    assert min(w[1], w[3]) > max(w[2], w[4])

    # determinism + k bound + ordering
    a = dsir_select(raw, target, k=2).collect()
    b = dsir_select(raw, target, k=2).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert len(a) == 2 and a[0].score >= a[1].score
    # with weights this separated the top-2 are the on-domain docs
    assert {r.doc_id for r in a} == {1, 3}


def test_dsir_gumbel_salt_perturbs_selection_not_weights(spark):
    from fundus_spark.operators import dsir_log_weights, dsir_select

    # near-uniform weights: selection is then driven by the Gumbel draw
    raw = spark.createDataFrame(
        [(i, "common words shared by every document here") for i in range(20)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "common words shared by every document here")], "doc_id long, text string"
    )
    w1 = {r.doc_id: r.log_weight for r in dsir_log_weights(raw, target).collect()}
    s_a = {r.doc_id for r in dsir_select(raw, target, k=5, salt="a").collect()}
    s_b = {r.doc_id for r in dsir_select(raw, target, k=5, salt="b").collect()}
    assert len(set(w1.values())) == 1  # identical text -> identical weight
    assert len(s_a) == len(s_b) == 5
    assert s_a != s_b  # different salt -> different resample universe


def test_domain_mix_hits_target_token_proportions(spark):
    from fundus_spark.operators import domain_mix

    # web: 4000 docs x 10 tokens = 40k tokens; books: 400 x 10 = 4k;
    # code: 1000 x 10 = 10k (dropped — not in the mixture)
    rows = (
        [(i, "web", " ".join("w%d" % j for j in range(10))) for i in range(4000)]
        + [(10_000 + i, "books", " ".join("b%d" % j for j in range(10))) for i in range(400)]
        + [(20_000 + i, "code", " ".join("c%d" % j for j in range(10))) for i in range(1000)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = domain_mix(df, {"web": 0.5, "books": 0.5}, total_tokens=16_000)
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # web target 8k tokens / 40k available -> rate 0.2 -> ~800 docs
    assert abs(got["web"] - 800) < 80
    # books target 8k / 4k available -> rate 2.0 -> exactly 2 epochs each
    assert got["books"] == 800
    assert "code" not in got
    ep = {r["source"]: r["m"] for r in out.groupBy("source").agg(F.max("epoch").alias("m")).collect()}
    assert ep["web"] == 0 and ep["books"] == 1
    # deterministic
    a = sorted((r.doc_id, r.epoch) for r in out.collect())
    b = sorted(
        (r.doc_id, r.epoch)
        for r in domain_mix(df, {"web": 0.5, "books": 0.5}, total_tokens=16_000).collect()
    )
    assert a == b


def test_domain_mix_fractional_epoch_is_partial(spark):
    from fundus_spark.operators import domain_mix

    rows = [(i, "d", " ".join("t%d" % j for j in range(10))) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # rate = 25000 / 10000 = 2.5: epochs 0,1 full; epoch 2 for ~half
    out = domain_mix(df, {"d": 1.0}, total_tokens=25_000)
    per_epoch = {r.epoch: r.n for r in out.groupBy("epoch").agg(F.count("*").alias("n")).collect()}
    assert per_epoch[0] == 1000 and per_epoch[1] == 1000
    assert 400 < per_epoch[2] < 600
    # the fractional epoch keeps a proper subset chosen per (salt, epoch, id)
    tok = out.agg(F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).alias("t")).collect()[0].t
    assert abs(tok - 25_000) < 1_000


def test_domain_mix_domains_are_independent(spark):
    """Growing one domain re-rates ONLY that domain: every other
    domain's (doc_id, epoch) decisions are untouched — the per-domain
    analogue of the hash-bucket growth-stability contract, and the
    property that lets a 100 TB mixture be rebuilt incrementally when
    a single domain's corpus is refreshed."""
    from fundus_spark.operators import domain_mix

    base = [(i, "a", " ".join("a%d" % j for j in range(10))) for i in range(300)] + [
        (1000 + i, "b", " ".join("b%d" % j for j in range(10))) for i in range(300)
    ]
    grown = base + [(2000 + i, "b", " ".join("x%d" % j for j in range(10))) for i in range(300)]
    props = {"a": 0.5, "b": 0.5}
    df1 = spark.createDataFrame(base, "doc_id long, source string, text string")
    df2 = spark.createDataFrame(grown, "doc_id long, source string, text string")
    mix1 = {(r.doc_id, r.epoch) for r in domain_mix(df1, props, 4000).collect() if r.source == "a"}
    mix2 = {(r.doc_id, r.epoch) for r in domain_mix(df2, props, 4000).collect() if r.source == "a"}
    assert mix1 == mix2 and mix1


def test_domain_mix_fail_fasts_on_absurd_replication_rate(spark):
    """Round-7: an unvalidated rate = p * total_tokens / domain_tokens
    used to silently explode floor(rate)+1 rows per input row — one
    mis-set proportion away from a million-element sequence() per row.
    Now it fail-fasts at plan-build time, before any row replicates."""
    import pytest as _pytest

    from fundus_spark.operators import domain_mix

    rows = [(i, "tiny", "only three words") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # 9 tokens available, 0.5 * 10_000 = 5_000 targeted -> rate ~556
    with _pytest.raises(ValueError, match="max_epochs"):
        domain_mix(df, {"tiny": 0.5}, total_tokens=10_000)
    # explicit opt-in raises the bound and the job runs
    out = domain_mix(df, {"tiny": 0.5}, total_tokens=10_000, max_epochs=600)
    assert out.count() > 3 * 500


def test_domain_mix_default_bound_allows_normal_mixtures(spark):
    from fundus_spark.operators import domain_mix

    rows = [(i, "d", " ".join("t%d" % j for j in range(10))) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # rate 3.0 — a realistic upsample, well under the default bound of 16
    out = domain_mix(df, {"d": 1.0}, total_tokens=3_000)
    assert out.groupBy().agg(F.max("epoch").alias("m")).collect()[0].m == 2


def _unit(vals):
    import math

    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def test_semantic_dedup_prunes_planted_neardups_within_cell(spark):
    """Three planted groups of near-identical vectors plus isolated
    vectors: each group keeps exactly its min id; isolated vectors all
    survive; pruned_by names the smallest similar smaller-id
    neighbor."""
    import math

    from fundus_spark.operators import semantic_dedup

    dim = 16
    rows = []
    for g in range(3):
        base = [math.sin(7 * g + j) for j in range(dim)]
        for m in range(4):
            jit = [b + (1e-4 * ((g + m + j) % 3)) for j, b in enumerate(base)]
            rows.append((100 * g + m, _unit(jit)))
    for i in range(5):
        lone = [math.cos(100 + 13 * i + j) * ((-1) ** (i + j)) for j in range(dim)]
        rows.append((1000 + i, _unit(lone)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in semantic_dedup(df, threshold=0.95, n_centroids=8, dim=dim).collect()}
    assert len(out) == len(rows)  # every vector reported
    for g in range(3):
        ids = [100 * g + m for m in range(4)]
        kept = [i for i in ids if out[i].kept]
        # min id survives; the rest are pruned by it (same cell: the
        # vectors are near-identical so they share an argmax centroid)
        assert kept == [ids[0]]
        for i in ids[1:]:
            assert out[i].pruned_by == ids[0]
    for i in range(5):
        assert out[1000 + i].kept and out[1000 + i].pruned_by is None


def test_semantic_dedup_cell_cap_biases_toward_keeping(spark):
    """Members beyond cell_cap are never compared — a flood can cost
    recall (kept near-dups) but can never prune a vector that a full
    run would keep."""
    import math

    from fundus_spark.operators import semantic_dedup

    dim = 8
    base = _unit([math.sin(j + 1) for j in range(dim)])
    rows = [(i, [b + 1e-5 * ((i + j) % 2) for j, b in enumerate(base)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = {r.vec_id: r.kept for r in semantic_dedup(df, threshold=0.9, n_centroids=4, dim=dim).collect()}
    capped = {r.vec_id: r.kept for r in semantic_dedup(df, threshold=0.9, n_centroids=4, dim=dim, cell_cap=10).collect()}
    assert sum(full.values()) == 1  # one survivor in the flood
    # cap: ids beyond the first 10 are uncompared -> kept
    assert sum(capped.values()) == 1 + 30
    for vid, kept in full.items():
        if kept:
            assert capped[vid]  # never prunes what the full run keeps


def test_semantic_dedup_plan_joins_on_cell_never_cartesian(spark):
    from fundus_spark.operators import semantic_dedup

    df = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(32)],
        "vec_id long, embedding array<double>",
    )
    plan = semantic_dedup(df, threshold=0.9, n_centroids=4, dim=8)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_temperature_proportions(spark):
    """mT5-style temperature flattening: alpha=1 reproduces natural
    shares, alpha=0 is uniform, alpha in between up-weights the small
    domain; and the dict feeds domain_mix directly."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from fundus_spark.operators import domain_mix, temperature_proportions

    rows = [(i, "big" if i < 9 else "small", "w " * 10) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    nat = temperature_proportions(df, alpha=1.0)
    assert math.isclose(nat["big"], 0.9) and math.isclose(nat["small"], 0.1)
    uni = temperature_proportions(df, alpha=0.0)
    assert math.isclose(uni["big"], 0.5) and math.isclose(uni["small"], 0.5)
    mid = temperature_proportions(df, alpha=0.3)
    assert 0.1 < mid["small"] < 0.5 and math.isclose(sum(mid.values()), 1.0)
    # precomputed token column agrees with the whitespace default
    df2 = df.withColumn("n_tok", F.size(F.split(F.trim("text"), r"\s+")))
    assert temperature_proportions(df2, alpha=0.3, token_col="n_tok") == mid

    mixed = domain_mix(df, mid, total_tokens=200)
    assert mixed.where("source = 'small'").count() >= 1
    with pytest.raises(ValueError):
        temperature_proportions(df, alpha=-0.1)
