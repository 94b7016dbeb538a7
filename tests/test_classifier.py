"""quality_classifier_fit / quality_classifier_score
(operators/classifier.py) vs an independent in-test reimplementation
of the same fixed-point full-batch gradient descent — exact model
parity in both feature modes, convergence on a planted word signal,
determinism across parallelism, and the join-free scoring contract."""

from __future__ import annotations

import hashlib
import math

import pytest

W_SCALE, X_SCALE = 10_000, 10_000


def _bucket(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _features(docs, n_features, salt, mode):
    """(doc_id -> {j: x_q}) with the bias feature, mirroring
    classifier_features' integer arithmetic."""
    out = {}
    for doc_id, text, _y in docs:
        toks = text.strip().split()
        if mode == "binary":
            f = {_bucket(salt + t) % n_features: X_SCALE for t in toks}
        else:
            cnts: dict = {}
            for t in toks:
                j = _bucket(salt + t) % n_features
                cnts[j] = cnts.get(j, 0) + 1
            n_tok = sum(cnts.values())
            f = {j: (c * X_SCALE) // n_tok for j, c in cnts.items()}
            f = {j: x for j, x in f.items() if x > 0}
        f[n_features] = X_SCALE
        out[doc_id] = f
    return out


def _py_fit(docs, n_features, n_iter, lr, salt, mode):
    """Same algorithm, same arithmetic: integer dot, EXACT integer
    gradient numerators (no per-doc quantization), one deterministic
    float chain per feature per step, requantized weights."""
    feats = _features(docs, n_features, salt, mode)
    labels = {d: y for d, _t, y in docs}
    n = len(feats)
    sxy = W_SCALE * X_SCALE
    wq = [0] * (n_features + 1)
    for _ in range(n_iter):
        a = [0] * (n_features + 1)
        for d, f in feats.items():
            yq = sum(wq[j] * x for j, x in f.items())
            res = yq - labels[d] * sxy
            for j, x in f.items():
                a[j] += res * x
        denom = float(W_SCALE * X_SCALE * X_SCALE * n)
        wq = [
            int(math.floor((v / W_SCALE - lr * (float(a[j]) / denom)) * W_SCALE + 0.5))
            for j, v in enumerate(wq)
        ]
    return wq


def _corpus():
    """60 docs over a tiny vocabulary; positives carry the planted
    token 'aardvark', negatives never do."""
    vocab = ["red", "green", "blue", "cyan", "teal", "plum", "gold", "rust"]
    rows = []
    for i in range(60):
        words = [vocab[(i * 7 + k) % len(vocab)] for k in range(10 + i % 5)]
        y = 1 if i % 3 == 0 else 0
        if y:
            words.insert(i % len(words), "aardvark")
        rows.append((i, " ".join(words), y))
    return rows


@pytest.mark.parametrize("mode,lr", [("binary", 0.0625), ("tf", 0.5)])
def test_fit_matches_independent_reimplementation(spark, mode, lr):
    from fundus_spark.operators import quality_classifier_fit

    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    model = quality_classifier_fit(
        df, n_features=32, n_iter=6, lr=lr, salt="t", feature_mode=mode
    )
    got = {r.j: r.w_q for r in model.collect()}
    want = _py_fit(rows, 32, 6, lr, "t", mode)
    assert got == {j: w for j, w in enumerate(want)}


def test_gram_and_iterative_methods_agree(spark):
    """The one-pass sufficient-statistics fit and the per-iteration
    distributed-gradient fit aggregate the same exact integers, so
    the models must be bit-identical."""
    from fundus_spark.operators import quality_classifier_fit

    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    mg = {r.j: r.w_q for r in quality_classifier_fit(
        df, n_features=16, n_iter=4, salt="t", method="gram").collect()}
    mi = {r.j: r.w_q for r in quality_classifier_fit(
        df, n_features=16, n_iter=4, salt="t", method="iterative").collect()}
    assert mg == mi
    assert any(v != 0 for v in mg.values())


def test_score_learns_planted_token(spark):
    from fundus_spark.operators import (
        quality_classifier_fit,
        quality_classifier_score,
    )

    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    model = quality_classifier_fit(df, n_features=32, n_iter=32, lr=0.0625, salt="t")
    scored = {r.doc_id: r for r in quality_classifier_score(df, model, salt="t").collect()}
    labels = {d: y for d, _t, y in rows}
    acc = sum(1 for d, r in scored.items() if bool(r.predicted) == bool(labels[d])) / len(rows)
    # a planted-token presence signal is linearly separable; 32
    # full-batch steps must get it nearly everywhere
    assert acc >= 0.9
    pos = [r.score for d, r in scored.items() if labels[d]]
    neg = [r.score for d, r in scored.items() if not labels[d]]
    assert sum(pos) / len(pos) > sum(neg) / len(neg) + 0.3


def test_model_is_parallelism_invariant(spark):
    """The fixed-point aggregation makes the learned model independent
    of partitioning — the property that keeps two cluster sizes (the
    north-rule criterion) on the same model."""
    from fundus_spark.operators import quality_classifier_fit

    rows = _corpus()
    df1 = spark.createDataFrame(rows, "doc_id long, text string, y int").repartition(1)
    df13 = spark.createDataFrame(rows, "doc_id long, text string, y int").repartition(13)
    m1 = {r.j: r.w_q for r in quality_classifier_fit(df1, n_features=16, n_iter=4, salt="t").collect()}
    m13 = {r.j: r.w_q for r in quality_classifier_fit(df13, n_features=16, n_iter=4, salt="t").collect()}
    assert m1 == m13


def test_score_accepts_weight_sequence_and_empty_docs(spark):
    from fundus_spark.operators import quality_classifier_score

    df = spark.createDataFrame(
        [(1, "red red blue"), (2, "   ")], "doc_id long, text string"
    )
    # bias-only model: every doc scores the bias weight
    wq = [0] * 8 + [W_SCALE]  # n_features=8, bias weight 1.0
    got = {r.doc_id: r for r in quality_classifier_score(df, wq, salt="t").collect()}
    assert set(got) == {1, 2}
    assert got[1].score == pytest.approx(1.0)
    assert got[2].score == pytest.approx(1.0)
    assert bool(got[1].predicted) and bool(got[2].predicted)


def test_fit_rejects_empty_relation_and_bad_mode(spark):
    from fundus_spark.operators import quality_classifier_fit

    df = spark.createDataFrame([], "doc_id long, text string, y int")
    with pytest.raises(ValueError):
        quality_classifier_fit(df, n_features=8, n_iter=1)
    df2 = spark.createDataFrame([(1, "a", 0)], "doc_id long, text string, y int")
    with pytest.raises(ValueError):
        quality_classifier_fit(df2, n_features=8, n_iter=1, feature_mode="idf")
    with pytest.raises(ValueError):
        quality_classifier_fit(df2, n_features=8, n_iter=1, method="newton")


def test_scoring_plan_is_join_free_in_binary_mode(spark):
    """Scoring with a literal weight vector must not join: the model
    rides the projection (same contract as the k-means codebook), and
    binary presence features need no per-doc totals relation."""
    from fundus_spark.operators import quality_classifier_score

    df = spark.createDataFrame([(1, "red blue")], "doc_id long, text string")
    plan = quality_classifier_score(df, [0] * 9, salt="t")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_null_text_scores_bias_only_in_both_plans(spark):
    """Review finding: F.aggregate over a NULL token array returned
    NULL scores in the narrow plan while grouped scored the bias —
    both plans must now agree: null/empty text scores bias-only."""
    from fundus_spark.operators import quality_classifier_score

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "red")],
        "doc_id long, text string",
    )
    wq = [0] * 8 + [W_SCALE]  # bias-only model, weight 1.0
    for plan in ("grouped", "narrow"):
        got = {r.doc_id: r for r in
               quality_classifier_score(df, wq, salt="t", plan=plan).collect()}
        assert set(got) == {1, 2, 3, 4}, plan
        for d in (1, 2, 3, 4):
            assert got[d].score == pytest.approx(1.0), (plan, d)
            assert bool(got[d].predicted), (plan, d)


def test_empty_doc_never_trains_the_empty_token_bucket(spark):
    """Review finding: split(trim(''), '\\s+') yields [''] and the
    phantom token trained/scored bucket md5(salt)%D. Empty docs must
    featurize as bias-only."""
    from fundus_spark.operators import classifier_features

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "red")], "doc_id long, text string"
    )
    rows = classifier_features(df, n_features=8, salt="t").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.j)
    assert by_doc[1] == {8} and by_doc[2] == {8}  # bias only
    assert len(by_doc[3]) == 2  # one real token + bias


def test_fit_rejects_null_labels(spark):
    """Review finding: null labels (e.g. from an outer join) entered
    the Gram matrix and n_docs but vanished from the moment vector —
    silently trained as y=0. Must fail fast instead. (Non-numeric
    label STRINGS already fail at the cast under ANSI mode.)"""
    from fundus_spark.operators import quality_classifier_fit

    df = spark.createDataFrame(
        [(1, "red", None), (2, "blue", 1)],
        "doc_id long, text string, y int",
    )
    with pytest.raises(ValueError, match="cast to NULL"):
        quality_classifier_fit(df, n_features=8, n_iter=1)


def test_narrow_and_grouped_scoring_agree(spark):
    """The zero-shuffle per-row plan and the grouped codegen plan
    compute the same integer dot product — values must be identical,
    and the narrow plan must contain no Exchange at all."""
    from fundus_spark.operators import (
        quality_classifier_fit,
        quality_classifier_score,
    )

    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    model = quality_classifier_fit(df, n_features=32, n_iter=8, salt="t")
    g = {(r.doc_id, r.score, r.predicted)
         for r in quality_classifier_score(df, model, salt="t").collect()}
    n = {(r.doc_id, r.score, r.predicted)
         for r in quality_classifier_score(df, model, salt="t", plan="narrow").collect()}
    assert g == n and len(g) == len(rows)
    plan = quality_classifier_score(
        df, model, salt="t", plan="narrow"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        quality_classifier_score(df, model, salt="t", plan="narrow", feature_mode="tf")
    with pytest.raises(ValueError):
        quality_classifier_score(df, model, salt="t", plan="sorted")
