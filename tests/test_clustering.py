"""kmeans_fit (operators/clustering.py) vs an independent in-test
Lloyd reimplementation over the same fixed-point update — exact model
parity, convergence on planted clusters, empty-cell carry-over, and
the SemDeDup composition with a fitted codebook."""

from __future__ import annotations

import math


def _unit(vals):
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def _py_lloyd(vecs, cents, n_iter):
    """Same algorithm, same fixed-point arithmetic: quantize once to
    int(1e6), argmax dot on dequantized doubles (ties -> HIGHER cell
    id, mirroring the reverse(sort_array) device), integer sums,
    single s/(n*1e6) division."""
    q = {vid: [math.floor(x * 1_000_000 + 0.5) for x in v] for vid, v in vecs}
    counts = [0] * len(cents)
    for _ in range(n_iter):
        assign = {}
        for vid, qv in q.items():
            dv = [x / 1_000_000.0 for x in qv]
            best = max(
                ((sum(a * b for a, b in zip(dv, c)), i) for i, c in enumerate(cents)),
            )
            assign[vid] = best[1]
        new_cents, new_counts = [], []
        for i, c in enumerate(cents):
            members = [q[vid] for vid, cell in assign.items() if cell == i]
            if not members:
                new_cents.append(c)
                new_counts.append(0)
                continue
            n = len(members)
            new_cents.append([sum(m[d] for m in members) / (n * 1_000_000.0) for d in range(len(c))])
            new_counts.append(n)
        cents, counts = new_cents, new_counts
    return cents, counts


def test_kmeans_fit_matches_independent_lloyd(spark):
    from fundus_spark.operators import kmeans_fit
    from fundus_spark.operators.similarity import ivf_centroids

    dim, k, n_iter = 8, 4, 3
    rows = []
    for g in range(3):
        for m in range(7):
            base = [math.sin(5 * g + j) + 0.01 * ((g + m + j) % 5) for j in range(dim)]
            rows.append((10 * g + m, _unit(base)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.cell: (list(r.centroid), r.n_members)
        for r in kmeans_fit(df, k=k, n_iter=n_iter, dim=dim).collect()
    }
    cents, counts = _py_lloyd(rows, ivf_centroids(dim, k, 7), n_iter)
    assert set(got) == set(range(k))
    for i in range(k):
        assert got[i][1] == counts[i]
        # bit-exact: the fixed-point update has ONE float division
        assert got[i][0] == cents[i], f"cell {i}"


def test_kmeans_separates_planted_clusters(spark):
    from fundus_spark.operators import assign_to_centroids, kmeans_fit

    dim = 8
    rows = []
    for g, size in ((0, 10), (1, 20), (2, 30)):
        axis = [0.0] * dim
        axis[g] = 1.0
        for m in range(size):
            jit = [a + 0.02 * ((m + j) % 3) for j, a in enumerate(axis)]
            rows.append((100 * g + m, _unit(jit)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = kmeans_fit(df, k=8, n_iter=4, dim=dim)
    sizes = sorted(r.n_members for r in model.collect() if r.n_members > 0)
    assert sizes == [10, 20, 30]
    # assignments are pure per planted group
    cents = [list(r.centroid) for r in model.orderBy("cell").collect()]
    assigned = assign_to_centroids(df, cents)
    per_group = {}
    for r in assigned.collect():
        per_group.setdefault(r.vec_id // 100, set()).add(r.cell)
    assert all(len(cells) == 1 for cells in per_group.values())
    # empty cells carried their init centroid with zero members
    assert sum(1 for r in model.collect() if r.n_members == 0) == 5


def test_semantic_dedup_accepts_fitted_centroids(spark):
    from fundus_spark.operators import kmeans_fit, semantic_dedup

    dim = 8
    base = _unit([math.sin(j + 2) for j in range(dim)])
    rows = [(i, [b + 1e-5 * ((i + j) % 2) for j, b in enumerate(base)]) for i in range(12)]
    far = _unit([math.cos(3 * j + 1) * ((-1) ** j) for j in range(dim)])
    rows += [(100, far)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = kmeans_fit(df, k=4, n_iter=2, dim=dim)
    cents = [list(r.centroid) for r in model.orderBy("cell").collect()]
    out = {r.vec_id: r for r in semantic_dedup(df, threshold=0.95, centroids=cents).collect()}
    kept = [vid for vid, r in out.items() if r.kept]
    assert kept == [0, 100]  # one survivor of the flood + the outlier
