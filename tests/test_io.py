"""Persistence tests: save/load must round-trip search results bit-exactly
(including reduced-precision storage bits and pre-quantization fp32 norms)."""

import os

import numpy as np
import pytest

import faiss_tpu
from faiss_tpu import ShardedIndexFlat, TpuIndexFlat

from common import make_data


@pytest.mark.parametrize("storage", ["f32", "bf16", "f16"])
def test_roundtrip_single(tmp_path, storage):
    xb, xq = make_data(3000, 8, 72)
    idx = TpuIndexFlat(72, storage=storage)
    idx.add(xb)
    D1, I1 = idx.search(xq, 10)
    p = os.path.join(tmp_path, "idx.npz")
    faiss_tpu.save_index(idx, p)
    idx2 = faiss_tpu.load_index(p)
    assert idx2.ntotal == idx.ntotal
    assert idx2.storage_type is idx.storage_type
    D2, I2 = idx2.search(xq, 10)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_array_equal(D1, D2)  # bit-exact round trip


def test_roundtrip_sharded_to_single(tmp_path):
    xb, xq = make_data(2000, 8, 48)
    idx = ShardedIndexFlat(48)
    idx.add(xb)
    D1, I1 = idx.search(xq, 10)
    p = os.path.join(tmp_path, "sharded.npz")
    faiss_tpu.save_index(idx, p)
    # reload as single-device: same results (ids are insertion order)
    idx2 = faiss_tpu.load_index(p)
    D2, I2 = idx2.search(xq, 10)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, rtol=1e-5, atol=1e-5)
    # and back as sharded
    idx3 = faiss_tpu.load_index(p, sharded=True)
    D3, I3 = idx3.search(xq, 10)
    np.testing.assert_array_equal(I1, I3)


def test_roundtrip_sharded_bf16(tmp_path):
    xb, xq = make_data(2000, 4, 64)
    idx = ShardedIndexFlat(64, storage="bf16")
    idx.add(xb)
    D1, I1 = idx.search(xq, 5)
    p = os.path.join(tmp_path, "s16.npz")
    faiss_tpu.save_index(idx, p)
    idx2 = faiss_tpu.load_index(p, sharded=True)
    D2, I2 = idx2.search(xq, 5)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_array_equal(D1, D2)


def test_empty_roundtrip(tmp_path):
    idx = TpuIndexFlat(32, metric="ip")
    p = os.path.join(tmp_path, "empty.npz")
    faiss_tpu.save_index(idx, p)
    idx2 = faiss_tpu.load_index(p)
    assert idx2.ntotal == 0 and idx2.metric.value == "ip"
    D, I = idx2.search(np.zeros((2, 32), np.float32), 3)
    assert (I == -1).all()


def test_idmap_roundtrip(tmp_path):
    """TpuIndexIDMap(2) wrappers persist: id map + inner bits round-trip."""
    xb, xq = make_data(600, 4, 16)
    im = faiss_tpu.TpuIndexIDMap2(TpuIndexFlat(16, storage="bf16"))
    ids = np.arange(600, dtype=np.int64) * 7 + 3
    im.add_with_ids(xb, ids)
    im.remove_ids(ids[::5])  # persistence after mutation too
    D1, I1 = im.search(xq, 5)
    p = os.path.join(tmp_path, "idmap.npz")
    faiss_tpu.save_index(im, p)
    im2 = faiss_tpu.load_index(p)
    assert isinstance(im2, faiss_tpu.TpuIndexIDMap2)
    D2, I2 = im2.search(xq, 5)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_array_equal(D1, D2)
    # IDMap2 reverse map works on the reloaded index
    key = int(I1[0, 0])
    np.testing.assert_array_equal(im.reconstruct(key), im2.reconstruct(key))
    # plain IDMap reloads as plain (no reconstruct-by-id)
    im3 = faiss_tpu.TpuIndexIDMap(TpuIndexFlat(16))
    im3.add_with_ids(xb, ids)
    p3 = os.path.join(tmp_path, "idmap1.npz")
    faiss_tpu.save_index(im3, p3)
    im4 = faiss_tpu.load_index(p3)
    assert isinstance(im4, faiss_tpu.TpuIndexIDMap)
    assert not isinstance(im4, faiss_tpu.TpuIndexIDMap2)


def test_ivf_roundtrip(tmp_path):
    """IVF save/load: stored routing + raw bits reload bit-exactly, no
    re-assignment (both storage modes)."""
    import warnings
    for storage in ("f32", "bf16"):
        xb, xq = make_data(3000, 8, 16)
        ix = faiss_tpu.TpuIndexIVFFlat(16, 8, nprobe=3, storage=storage,
                                       seed=5)
        ix.train(xb)
        ix.add(xb)
        D1, I1 = ix.search(xq, 6)
        p = os.path.join(tmp_path, f"ivf_{storage}.npz")
        faiss_tpu.save_index(ix, p)
        ix2 = faiss_tpu.load_index(p)
        assert isinstance(ix2, faiss_tpu.TpuIndexIVFFlat)
        assert ix2.nprobe == 3 and ix2.ntotal == 3000
        np.testing.assert_array_equal(ix2.list_sizes(), ix.list_sizes())
        D2, I2 = ix2.search(xq, 6)
        np.testing.assert_array_equal(I1, I2)
        np.testing.assert_array_equal(D1, D2)
        np.testing.assert_allclose(ix2.reconstruct(100), ix.reconstruct(100))
    # untrained IVF cannot be saved
    with pytest.raises(ValueError):
        faiss_tpu.save_index(faiss_tpu.TpuIndexIVFFlat(16, 4),
                             os.path.join(tmp_path, "bad.npz"))


def test_sharded_ivf_roundtrip(tmp_path):
    """ShardedIndexIVFFlat save -> load (both single-device and sharded):
    global ids, routing, and bits transfer exactly — results match the
    source index on integer data (r4: closes the io.py:161 hard error)."""
    from faiss_tpu import ShardedIndexIVFFlat

    rng = np.random.default_rng(71)
    xb = rng.integers(0, 32, (3000, 16)).astype(np.float32)
    xq = rng.integers(0, 32, (5, 16)).astype(np.float32)
    for storage in ("bf16", "int8"):
        sh = ShardedIndexIVFFlat(16, 8, nprobe=8, storage=storage,
                                 num_shards=2, seed=5)
        sh.train(xb)
        sh.add(xb)
        D1, I1 = sh.search(xq, 6)
        p = os.path.join(tmp_path, f"sivf_{storage}.npz")
        faiss_tpu.save_index(sh, p)
        # reload sharded: shard-count may differ from the saved index
        sh2 = faiss_tpu.load_index(p, sharded=True)
        assert isinstance(sh2, ShardedIndexIVFFlat)
        assert sh2.ntotal == 3000
        D2, I2 = sh2.search(xq, 6)
        np.testing.assert_array_equal(I1, I2)
        np.testing.assert_array_equal(D1, D2)
        # reload single-device: same results again
        one = faiss_tpu.load_index(p)
        assert isinstance(one, faiss_tpu.TpuIndexIVFFlat)
        D3, I3 = one.search(xq, 6)
        np.testing.assert_array_equal(I1, I3)
        np.testing.assert_allclose(one.reconstruct(2999),
                                   sh.reconstruct(2999))
