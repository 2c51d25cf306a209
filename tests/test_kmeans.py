"""Spherical k-means: recovers planted clusters, handles empty cells,
chains into IVF assignment."""

from __future__ import annotations

import numpy as np

from distributed_webcrawler_spark.operators.kmeans import centroids_as_list, kmeans_fit
from distributed_webcrawler_spark.operators.similarity import ivf_assign_broadcast


def _planted(spark, n_per=30, dim=16, seed=5):
    """Three well-separated direction clusters (cosine-separable)."""
    rng = np.random.default_rng(seed)
    bases = [np.eye(dim)[i] * 10 for i in range(3)]
    rows, truth = [], {}
    vid = 0
    for ci, base in enumerate(bases):
        for _ in range(n_per):
            v = base + rng.normal(0, 0.3, dim)
            rows.append((vid, [float(x) for x in v]))
            truth[vid] = ci
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), truth


def test_recovers_planted_clusters(spark):
    df, truth = _planted(spark)
    cents = kmeans_fit(df, k=3, n_iter=4)
    assigned = ivf_assign_broadcast(df, centroids_as_list(cents), nprobe=1)
    got = {r["id"]: r["cell"] for r in assigned.collect()}
    # cluster labels are arbitrary; check the PARTITION matches the truth
    by_truth = {}
    for vid, tc in truth.items():
        by_truth.setdefault(tc, set()).add(got[vid])
    assert all(len(cells) == 1 for cells in by_truth.values())
    assert len({next(iter(c)) for c in by_truth.values()}) == 3


def test_empty_cell_keeps_previous_centroid(spark):
    # 2 distinct directions but k=3: one cell never wins a vector and must
    # keep its init coordinates instead of going NaN/absent
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0]), (3, [0.01, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_fit(df, k=3, n_iter=2)
    out = cents.collect()
    assert len(out) == 3 * 2
    assert all(r["val"] is not None for r in out)


def test_exploded_layout_roundtrip(spark):
    df, _ = _planted(spark, n_per=5)
    cents = kmeans_fit(df, k=3, n_iter=1)
    lst = centroids_as_list(cents)
    assert [c for c, _ in lst] == [0, 1, 2]
    assert all(len(v) == 16 for _, v in lst)
