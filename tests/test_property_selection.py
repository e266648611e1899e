"""Property-style randomized differential tests for the selection paths
(SURVEY.md §5.2: the reference argues its SIMD-shuffle selection correct in
comments; here every path is hammered against the oracle across random
shapes, ks, metrics, duplicates and extreme values)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faiss_tpu import TpuIndexFlat
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused, topk

from common import numpy_search, recall_at_k


RNG = np.random.default_rng(1234)


def _random_case(i):
    nv = int(RNG.integers(1, 6000))
    nq = int(RNG.integers(1, 20))
    d = int(RNG.integers(1, 200))
    k = int(RNG.integers(1, 2 * nv + 4))
    metric = "l2" if i % 2 == 0 else "ip"
    xb = RNG.standard_normal((nv, d)).astype(np.float32)
    xq = RNG.standard_normal((nq, d)).astype(np.float32)
    if i % 3 == 0 and nv > 4:  # inject duplicates → score ties
        xb[nv // 2 :] = xb[: nv - nv // 2]
    if i % 5 == 0:  # extreme magnitudes
        xb *= 1e3
    return nv, nq, d, k, metric, xb, xq


@pytest.mark.parametrize("i", range(12))
def test_index_random_configs(i):
    nv, nq, d, k, metric, xb, xq = _random_case(i)
    idx = TpuIndexFlat(d, metric=metric)
    idx.add(xb)
    D, I = idx.search(xq, k)
    Dr, Ir = numpy_search(xb, xq, k, metric=metric)
    k_eff = min(k, nv)
    assert recall_at_k(I, Ir, k_eff) == 1.0, (nv, nq, d, k, metric)
    # sentinel structure beyond nv
    if k > nv:
        assert (I[:, nv:] == -1).all()
    finite = np.isfinite(Dr)
    np.testing.assert_allclose(D[finite], Dr[finite], rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("seed", range(6))
def test_chunked_equals_plain_random(seed):
    rng = np.random.default_rng(seed)
    nq = int(rng.integers(1, 12))
    nv = int(rng.integers(2, 40)) * 128
    chunk = int(rng.integers(1, 6)) * 128
    k = int(rng.integers(1, min(nv, 300)))
    scores = rng.standard_normal((nq, nv)).astype(np.float32)
    if seed % 2:
        scores = np.round(scores, 1)  # many ties
    sj = jnp.asarray(scores)
    nfull = max(1, nv // chunk)
    prefix = nfull * chunk
    v, i = topk.chunked_topk_scores(
        lambda s: jax.lax.dynamic_slice_in_dim(sj, s, chunk, axis=1),
        prefix, chunk, min(k, prefix),
    )
    vp, ip_ = jax.lax.top_k(sj[:, :prefix], min(k, prefix))
    scores = scores[:, :prefix]
    np.testing.assert_array_equal(np.asarray(v), np.asarray(vp))
    # ids may differ only where values tie across chunk boundaries in a way
    # top_k also permits; values at our ids must equal top_k values
    np.testing.assert_array_equal(
        np.take_along_axis(scores, np.asarray(i), axis=1), np.asarray(vp)
    )


@pytest.mark.parametrize("seed", range(4))
def test_fused_random_configs(seed):
    rng = np.random.default_rng(100 + seed)
    nv = int(rng.integers(64, 200)) * 128       # GROUP-aligned
    nq = int(rng.integers(1, 3)) * 8
    d = int(rng.integers(1, 5)) * 128
    k = int(rng.integers(1, 40))
    xb = rng.standard_normal((nv, d)).astype(np.float32)
    xq = rng.standard_normal((nq, d)).astype(np.float32)
    if seed % 2:
        xb[nv // 2 :] = xb[: nv - nv // 2]      # ties
    db, q = jnp.asarray(xb), jnp.asarray(xq)
    norms = jnp.sum(db * db, axis=-1)
    vals, ids, cert = pallas_fused.fused_search(
        q, db, norms, jnp.int32(nv), k=k, metric=MetricType.L2,
        nv_eff=nv, interpret=True,
    )
    s = 2 * (xq.astype(np.float64) @ xb.astype(np.float64).T)
    s -= np.asarray(norms, np.float64)[None, :]
    order = np.argsort(-s, axis=1, kind="stable")[:, :k]
    got = np.sort(np.asarray(ids), axis=1)
    want = np.sort(order, axis=1)
    # sets must match even under massive duplication
    sv = np.take_along_axis(s, order, 1)
    gv = np.take_along_axis(s, np.asarray(ids), 1)
    np.testing.assert_allclose(gv, sv, rtol=1e-5, atol=1e-5)
    # certified queries must match the oracle EXACTLY (ids, not just values)
    c = np.asarray(cert)
    np.testing.assert_array_equal(np.asarray(ids)[c], order[c])
