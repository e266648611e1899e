"""k-means + functional knn (clustering.py — faiss.Kmeans/knn parity).

Oracle: a float64 numpy Lloyd's with the SAME init (well-separated blobs so
fp32-vs-f64 assignment boundaries cannot flip), plus structural properties:
the objective never increases across iterations on tie-free data, every
blob is recovered by exactly one centroid, spherical centroids stay unit.
"""

import numpy as np
import pytest

import faiss_tpu
from faiss_tpu import Kmeans, MetricType
from faiss_tpu.clustering import kmeans_clustering, knn, pairwise_distances


def blobs(nb, k, d, seed=0, spread=0.05):
    """k well-separated Gaussian blobs, nb points each."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)).astype(np.float32) * 4.0
    x = np.concatenate([
        c + spread * rng.standard_normal((nb, d)).astype(np.float32)
        for c in centers
    ])
    labels = np.repeat(np.arange(k), nb)
    perm = rng.permutation(len(x))
    return x[perm], labels[perm], centers


def numpy_lloyd(x, init, niter):
    """float64 reference Lloyd's (no empty-cluster handling needed on
    well-separated data)."""
    c = init.astype(np.float64)
    x64 = x.astype(np.float64)
    for _ in range(niter):
        d2 = ((x64[:, None] - c[None]) ** 2).sum(-1)
        a = d2.argmin(1)
        for j in range(c.shape[0]):
            m = a == j
            assert m.any(), "oracle hit an empty cluster"
            c[j] = x64[m].mean(0)
    return c, a


def test_kmeans_recovers_blobs_and_matches_f64_lloyd():
    # seed 527 makes the internal random init pick one point per blob
    # (scanned offline), so Lloyd converges to the global optimum and the
    # assignment boundaries never run through dense data — the fp32 device
    # program and the f64 oracle then make IDENTICAL assignments
    x, labels, _ = blobs(200, 8, 32, seed=3)
    km = Kmeans(32, 8, niter=10, seed=527)
    obj = km.train(x)
    assert np.isfinite(obj) and km.centroids.shape == (8, 32)
    a = km.assign(x).ravel()
    for b in range(8):
        own = a[labels == b]
        assert (own == own[0]).all(), f"blob {b} split across centroids"
    assert len(set(a[labels == b][0] for b in range(8))) == 8
    # objective non-increasing on tie-free, well-separated data
    assert (np.diff(km.obj) <= 1e-3 * abs(km.obj[0])).all(), km.obj
    # centroids match the f64 oracle run from the SAME init
    rng = np.random.default_rng(527)
    sel = rng.choice(len(x), 8, replace=False)
    ref, _ = numpy_lloyd(x, x[sel], 10)
    np.testing.assert_allclose(km.centroids, ref.astype(np.float32),
                               rtol=1e-4, atol=1e-4)


def test_kmeans_objective_is_sum_sq_dists():
    x, _, _ = blobs(100, 4, 16, seed=1)
    km = Kmeans(16, 4, niter=6, seed=5)
    km.train(x)
    a = km.assign(x).ravel()
    d2 = ((x - km.centroids[a]) ** 2).sum(-1).sum()
    # obj[-1] was measured one M-step BEFORE the final centroids, so compare
    # against the assignment objective of the PREVIOUS iterate loosely
    assert abs(km.obj[-1] - d2) / max(d2, 1e-9) < 0.05


def test_kmeans_nredo_picks_best():
    x, _, _ = blobs(50, 6, 8, seed=2)
    km1 = Kmeans(8, 6, niter=8, nredo=1, seed=11)
    km3 = Kmeans(8, 6, niter=8, nredo=3, seed=11)
    o1 = km1.train(x)
    o3 = km3.train(x)
    assert o3 <= o1 + 1e-6


def test_kmeans_spherical_unit_centroids():
    x, _, _ = blobs(80, 5, 24, seed=4)
    km = Kmeans(24, 5, niter=5, spherical=True,
                metric=MetricType.INNER_PRODUCT, seed=3)
    km.train(x)
    np.testing.assert_allclose(np.linalg.norm(km.centroids, axis=1), 1.0,
                               rtol=1e-5)


def test_kmeans_subsample_and_validation():
    x, _, _ = blobs(400, 2, 8, seed=6)
    km = Kmeans(8, 2, niter=3, max_points_per_centroid=50, seed=1)
    km.train(x)  # subsampled to 100 points internally
    assert km.centroids.shape == (2, 8)
    with pytest.raises(ValueError):
        Kmeans(8, 0)
    with pytest.raises(ValueError):
        Kmeans(8, 4).train(np.zeros((2, 8), np.float32))  # n < k
    with pytest.raises(ValueError):
        Kmeans(8, 2).train(np.zeros((10, 9), np.float32))  # wrong d
    with pytest.raises(RuntimeError):
        Kmeans(8, 2).assign(x)  # untrained
    with pytest.warns(UserWarning):
        Kmeans(8, 4, min_points_per_centroid=39, niter=1).train(
            np.random.default_rng(0)
            .standard_normal((8, 8)).astype(np.float32))


def test_kmeans_survives_forced_empty_clusters():
    """k near n with duplicate-heavy data: re-seeding must keep centroids
    finite and the final assignment valid."""
    rng = np.random.default_rng(9)
    base = rng.standard_normal((5, 8)).astype(np.float32)
    x = np.concatenate([base] * 10)  # 50 points, only 5 distinct
    km = Kmeans(8, 16, niter=8, seed=2, min_points_per_centroid=1)
    km.train(x)
    assert np.isfinite(km.centroids).all()
    a = km.assign(x).ravel()
    assert ((a >= 0) & (a < 16)).all()


def test_kmeans_clustering_function():
    x, _, _ = blobs(60, 3, 8, seed=8)
    c, obj = kmeans_clustering(x, 3, niter=5, seed=4)
    assert c.shape == (3, 8) and np.isfinite(obj)


def test_knn_matches_index_search():
    rng = np.random.default_rng(12)
    xb = rng.standard_normal((3000, 24)).astype(np.float32)
    xq = rng.standard_normal((6, 24)).astype(np.float32)
    D, I = knn(xq, xb, 5)
    idx = faiss_tpu.TpuIndexFlat(24)
    idx.add(xb)
    D2, I2 = idx.search(xq, 5)
    np.testing.assert_array_equal(I, I2)
    np.testing.assert_array_equal(D, D2)
    # IP too
    Di, Ii = knn(xq, xb, 5, metric="ip")
    s = xq.astype(np.float64) @ xb.astype(np.float64).T
    np.testing.assert_array_equal(Ii[:, 0], s.argmax(1))


def test_pairwise_distances_oracle():
    rng = np.random.default_rng(13)
    xq = rng.standard_normal((7, 33)).astype(np.float32)  # non-aligned d
    xb = rng.standard_normal((11, 33)).astype(np.float32)
    D = pairwise_distances(xq, xb)
    ref = ((xq[:, None].astype(np.float64)
            - xb[None].astype(np.float64)) ** 2).sum(-1)
    np.testing.assert_allclose(D, ref, rtol=1e-5, atol=1e-4)
    S = pairwise_distances(xq, xb, metric="ip")
    np.testing.assert_allclose(
        S, xq.astype(np.float64) @ xb.astype(np.float64).T,
        rtol=1e-5, atol=1e-5)


def test_balance_centroids_caps_skew_and_preserves_quality():
    """balance_centroids splits oversized clusters (half-means along the
    spread direction, smallest clusters retired) until no cluster exceeds
    ~cap_ratio x mean on the training sample; the k-means objective must
    not degrade materially (splitting dense regions usually IMPROVES it)."""
    from faiss_tpu.clustering import Kmeans, balance_centroids

    rng = np.random.default_rng(0)
    ncomp, d, k, n = 128, 16, 32, 20000
    comps = (6.0 * rng.standard_normal((ncomp, d))).astype(np.float32)
    w = rng.dirichlet(np.full(ncomp, 0.2))
    x = (comps[rng.choice(ncomp, n, p=w)]
         + rng.standard_normal((n, d))).astype(np.float32)

    km = Kmeans(d, k, niter=8, seed=7)
    km.train(x)
    a0 = km.assign(x).ravel()
    c0 = np.bincount(a0, minlength=k)
    bal = balance_centroids(x, km.centroids, cap_ratio=2.0)
    assert bal.shape == km.centroids.shape and bal.dtype == np.float32

    from faiss_tpu.index import TpuIndexFlat

    qi = TpuIndexFlat(d)
    qi.add(bal)
    a1 = qi.assign(x).ravel()
    c1 = np.bincount(a1, minlength=k)
    assert c1.max() < c0.max()
    assert c1.max() <= 2.5 * n / k  # cap 2.0 + polish drift headroom
    obj0 = float(((x - km.centroids[a0]) ** 2).sum())
    obj1 = float(((x - bal[a1]) ** 2).sum())
    assert obj1 <= 1.1 * obj0


def test_balance_centroids_noop_on_uniform_data():
    """Already-balanced clusters come back unchanged (round 0 finds no
    oversized list and returns the input centroids verbatim)."""
    from faiss_tpu.clustering import Kmeans, balance_centroids

    rng = np.random.default_rng(3)
    d, k, n = 8, 8, 4096
    comps = (50.0 * rng.standard_normal((k, d))).astype(np.float32)
    x = (comps[np.arange(n) % k]
         + 0.01 * rng.standard_normal((n, d))).astype(np.float32)
    km = Kmeans(d, k, niter=6, seed=5)
    km.train(x)
    bal = balance_centroids(x, km.centroids, cap_ratio=2.0)
    np.testing.assert_array_equal(bal, km.centroids)
