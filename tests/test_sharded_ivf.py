"""ShardedIndexIVFFlat (parallel/sharded_ivf.py — VERDICT r3 #5).

Invariant under test everywhere: sharding is an IMPLEMENTATION detail —
for the same adds, the sharded index must reproduce the single-chip
TpuIndexIVFFlat's result sets exactly (same quantizer, same probed lists,
union of per-shard members == single-chip probe set, tie-exact merge)."""

import numpy as np
import pytest

import faiss_tpu
from faiss_tpu import (IDSelectorRange, MetricType, SearchParams,
                       ShardedIndexIVFFlat, TpuIndexIVFFlat)

from common import make_data


def int_data(nv, nq, d, seed=0, hi=64):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, hi, (nv, d)).astype(np.float32),
            rng.integers(0, hi, (nq, d)).astype(np.float32))


def _pair(nv=4000, nq=6, d=16, nlist=16, nprobe=4, storage="f32", seed=1,
          shards=4, metric=MetricType.L2):
    xb, xq = int_data(nv, nq, d, seed=seed)
    sh = ShardedIndexIVFFlat(d, nlist, metric=metric, storage=storage,
                             nprobe=nprobe, num_shards=shards, seed=3)
    sh.train(xb)
    sh.add(xb)
    single = TpuIndexIVFFlat(d, nlist, metric=metric, storage=storage,
                             nprobe=nprobe, seed=3)
    single.train(xb)
    single.add(xb)
    return xb, xq, sh, single


@pytest.mark.parametrize("storage", ["f32", "bf16", "int8"])
def test_sharded_ivf_matches_single_chip(storage):
    xb, xq, sh, single = _pair(storage=storage)
    D, I = sh.search(xq, 7)
    Ds, Is = single.search(xq, 7)
    np.testing.assert_array_equal(I, Is)   # tie-exact merge (gid asc)
    np.testing.assert_allclose(D, Ds, rtol=1e-6, atol=1e-6)
    assert I.dtype == np.int64


def test_sharded_ivf_exhaustive_and_uneven_batches():
    xb, xq = int_data(3000, 5, 16, seed=7)
    sh = ShardedIndexIVFFlat(16, 8, nprobe=8, num_shards=3, seed=5)
    sh.train(xb)
    for i in range(0, 3000, 700):  # uneven batches force cap growth
        sh.add(xb[i: i + 700])
    single = TpuIndexIVFFlat(16, 8, nprobe=8, seed=5)
    single.train(xb)
    single.add(xb)
    assert sh.ntotal == 3000
    np.testing.assert_array_equal(sh.list_sizes(), single.list_sizes())
    D, I = sh.search(xq, 10)
    Ds, Is = single.search(xq, 10)
    np.testing.assert_array_equal(I, Is)
    np.testing.assert_allclose(D, Ds, rtol=1e-6)
    # reconstruct by global id across shards
    for key in (0, 1234, 2999):
        np.testing.assert_allclose(sh.reconstruct(key), xb[key], rtol=1e-6)


def test_sharded_ivf_async_selector_and_nprobe_override():
    xb, xq, sh, single = _pair(nv=4000, nlist=16, nprobe=16)  # exhaustive
    sel = SearchParams(IDSelectorRange(1000, 3000))
    tok = sh.search_async(xq, 6, params=sel)
    D, I = tok.wait()
    Ds, Is = single.search(xq, 6, params=sel)
    np.testing.assert_array_equal(I, Is)
    assert ((I >= 1000) & (I < 3000)).all()
    # per-query nprobe override rides SearchParams like the single chip
    D2, I2 = sh.search(xq, 6, params=SearchParams(nprobe=2))
    Ds2, Is2 = single.search(xq, 6, params=SearchParams(nprobe=2))
    np.testing.assert_array_equal(I2, Is2)


def test_sharded_ivf_ip_metric_and_empty():
    xb, xq, sh, single = _pair(metric=MetricType.INNER_PRODUCT, nprobe=8)
    D, I = sh.search(xq, 5)
    Ds, Is = single.search(xq, 5)
    np.testing.assert_array_equal(I, Is)
    sh.reset()
    assert sh.ntotal == 0 and sh.is_trained
    tok = sh.search_async(xq, 4)
    assert tok.is_ready()
    De, Ie = tok.wait()
    assert (Ie == -1).all() and (De == -np.inf).all()
    sh.add(xb[:500])  # add-after-reset
    assert sh.ntotal == 500


def test_sharded_ivf_untrained_and_validation():
    sh = ShardedIndexIVFFlat(16, 8, num_shards=2)
    with pytest.raises(RuntimeError):
        sh.add(np.zeros((4, 16), np.float32))
    with pytest.raises(RuntimeError):
        sh.search(np.zeros((2, 16), np.float32), 3)
    xb, _ = make_data(600, 1, 16)
    sh.train(xb)
    sh.add(xb)
    with pytest.raises(ValueError):
        sh.search(np.zeros((2, 8), np.float32), 3)  # wrong d
    with pytest.raises(ValueError):
        sh.search(np.zeros((2, 16), np.float32), 0)  # bad k
    assert "shards=2" in sh.describe()


@pytest.mark.parametrize("storage", ["bf16", "int8"])
def test_sharded_ivf_kernel_fine_scan_path(storage):
    """The Pallas gather/rescore fine scan engages inside shard_map
    (interpret mode here) — parity with single-chip."""
    xb, xq = int_data(12000, 5, 16, seed=53)
    sh = ShardedIndexIVFFlat(16, 8, nprobe=3, storage=storage,
                             num_shards=2, seed=5)
    sh.train(xb)
    sh.add(xb)
    assert min(s._used_chunks for s in sh.shards) >= 1  # pool populated
    single = TpuIndexIVFFlat(16, 8, nprobe=3, storage=storage, seed=5)
    single.train(xb)
    single.add(xb)
    D, I = sh.search(xq, 7)
    Ds, Is = single.search(xq, 7)
    np.testing.assert_array_equal(I, Is)
    np.testing.assert_allclose(D, Ds, rtol=1e-6, atol=1e-6)


def test_sharded_ivf_batch_split_matches_unsplit(monkeypatch):
    """Oversized query batches split on the per-shard gather-budget cap
    (ADVICE r4) and reassemble bit-identically via ConcatSearchToken."""
    from faiss_tpu.parallel import sharded_ivf as sivf_mod
    from faiss_tpu.index import ConcatSearchToken

    xb, xq = int_data(6000, 24, 16, seed=83)
    sh = ShardedIndexIVFFlat(16, 8, nprobe=3, num_shards=2, seed=5)
    sh.train(xb)
    sh.add(xb)
    D0, I0 = sh.search(xq, 5)
    nbudget = max(sivf_mod._chunk_budget(s._counts, 3, sivf_mod._CHUNK)
                  for s in sh.shards)
    monkeypatch.setattr(sivf_mod, "_GATHER_BUDGET",
                        nbudget * sivf_mod._CHUNK * 4 * 8)
    assert sh._nq_cap(3) == 8
    tok = sh.search_async(xq, 5)
    assert isinstance(tok, ConcatSearchToken)
    D1, I1 = tok.wait()
    np.testing.assert_array_equal(I0, I1)
    np.testing.assert_array_equal(D0, D1)
