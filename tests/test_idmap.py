"""TpuIndexIDMap / TpuIndexIDMap2 — faiss custom-id mapping contract.

faiss::IndexIDMap semantics (faiss/IndexIDMap.h): add_with_ids stores caller
ids, plain add throws, search labels come back translated (sentinel -1 passes
through), remove_ids selects by custom id, IDMap2 adds reconstruct-by-id with
last-added-wins on duplicates. The reference never implements any of this
(MetalIndexFlat emits positional labels only, src/MetalIndexFlat.mm:384-400).
"""

import numpy as np
import pytest

import faiss_tpu
from faiss_tpu import (
    ShardedIndexFlat,
    TpuIndexFlat,
    TpuIndexIDMap,
    TpuIndexIDMap2,
)

from common import SEED


def int_data(nv, nq, d, seed=SEED):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 16, (nv, d)).astype(np.float32),
            rng.integers(0, 16, (nq, d)).astype(np.float32))


def make_ids(n, seed=SEED):
    # sparse, shuffled, 64-bit-large custom ids
    rng = np.random.default_rng(seed + 1)
    ids = rng.choice(np.int64(1) << 40, size=n, replace=False)
    return ids.astype(np.int64)


def test_add_requires_ids():
    idx = TpuIndexIDMap(TpuIndexFlat(16))
    with pytest.raises(RuntimeError):
        idx.add(np.zeros((4, 16), np.float32))


def test_search_translates_labels():
    xb, xq = int_data(2000, 8, 24)
    ids = make_ids(2000)
    idx = TpuIndexIDMap(TpuIndexFlat(24))
    idx.add_with_ids(xb, ids)
    assert idx.ntotal == 2000

    plain = TpuIndexFlat(24)
    plain.add(xb)
    D0, I0 = plain.search(xq, 10)
    D, I = idx.search(xq, 10)
    np.testing.assert_array_equal(D, D0)
    np.testing.assert_array_equal(I, ids[I0])
    np.testing.assert_array_equal(idx.assign(xq, 3), ids[I0[:, :3]])


def test_async_and_range_translate():
    xb, xq = int_data(1500, 4, 16)
    ids = make_ids(1500)
    idx = TpuIndexIDMap(TpuIndexFlat(16))
    idx.add_with_ids(xb, ids)

    tok = idx.search_async(xq, 5)
    D, I = tok.wait()
    D0, I0 = idx.search(xq, 5)
    np.testing.assert_array_equal(D, D0)
    np.testing.assert_array_equal(I, I0)

    inner = TpuIndexFlat(16)
    inner.add(xb)
    lims0, rD0, rI0 = inner.range_search(xq, 40.0)
    lims, rD, rI = idx.range_search(xq, 40.0)
    np.testing.assert_array_equal(lims, lims0)
    np.testing.assert_array_equal(rD, rD0)
    np.testing.assert_array_equal(rI, ids[rI0])


def test_sentinel_passthrough():
    # k > ntotal pads with -1 labels; translation must keep them -1
    xb, xq = int_data(5, 3, 8)
    idx = TpuIndexIDMap(TpuIndexFlat(8))
    idx.add_with_ids(xb, make_ids(5))
    D, I = idx.search(xq, 8)
    assert (I[:, 5:] == -1).all()
    assert (I[:, :5] >= 0).all()


def test_remove_by_custom_id():
    xb, xq = int_data(800, 6, 16)
    ids = make_ids(800)
    idx = TpuIndexIDMap(TpuIndexFlat(16))
    idx.add_with_ids(xb, ids)

    rm = np.concatenate([ids[100:200], np.int64([12345])])  # 12345 unknown
    assert idx.remove_ids(rm) == 100
    assert idx.ntotal == 700

    keep = np.ones(800, bool)
    keep[100:200] = False
    fresh = TpuIndexIDMap(TpuIndexFlat(16))
    fresh.add_with_ids(xb[keep], ids[keep])
    D0, I0 = fresh.search(xq, 10)
    D, I = idx.search(xq, 10)
    np.testing.assert_array_equal(D, D0)
    np.testing.assert_array_equal(I, I0)


def test_duplicate_ids_each_count():
    xb, _ = int_data(6, 1, 8)
    ids = np.int64([7, 8, 7, 9, 7, 8])
    idx = TpuIndexIDMap(TpuIndexFlat(8))
    idx.add_with_ids(xb, ids)
    assert idx.remove_ids(np.int64([7])) == 3
    assert idx.ntotal == 3
    np.testing.assert_array_equal(idx.id_map, np.int64([8, 9, 8]))


def test_idmap2_reconstruct():
    xb, _ = int_data(300, 1, 16)
    ids = make_ids(300)
    idx = TpuIndexIDMap2(TpuIndexFlat(16))
    idx.add_with_ids(xb, ids)
    for key in [0, 150, 299]:
        np.testing.assert_array_equal(idx.reconstruct(ids[key]), xb[key])
    with pytest.raises(KeyError):
        idx.reconstruct(-42)
    # rev map invalidates across mutations
    assert idx.remove_ids(ids[:10]) == 10
    np.testing.assert_array_equal(idx.reconstruct(ids[10]), xb[10])
    # IDMap (non-2) refuses reconstruct
    with pytest.raises(RuntimeError):
        TpuIndexIDMap(TpuIndexFlat(16)).reconstruct(0)


def test_idmap2_duplicate_last_wins():
    xb, _ = int_data(4, 1, 8)
    idx = TpuIndexIDMap2(TpuIndexFlat(8))
    idx.add_with_ids(xb, np.int64([1, 2, 1, 3]))
    np.testing.assert_array_equal(idx.reconstruct(1), xb[2])


def test_idmap_over_sharded():
    xb, xq = int_data(4096, 8, 32)
    ids = make_ids(4096)
    idx = TpuIndexIDMap(ShardedIndexFlat(32, num_shards=4))
    idx.add_with_ids(xb, ids)
    plain = TpuIndexFlat(32)
    plain.add(xb)
    D0, I0 = plain.search(xq, 10)
    D, I = idx.search(xq, 10)
    np.testing.assert_allclose(D, D0, rtol=1e-6)
    for q in range(8):  # fp ties may reorder equal distances across paths
        assert set(I[q].tolist()) == set(ids[I0[q]].tolist())
    assert idx.remove_ids(ids[:1000]) == 1000
    assert idx.ntotal == 3096


def test_search_and_reconstruct():
    xb, xq = int_data(500, 4, 16)
    idx = TpuIndexFlat(16)
    idx.add(xb)
    D, I, R = idx.search_and_reconstruct(xq, 6)
    D0, I0 = idx.search(xq, 6)
    np.testing.assert_array_equal(D, D0)
    np.testing.assert_array_equal(I, I0)
    for q in range(4):
        for j in range(6):
            np.testing.assert_array_equal(R[q, j], xb[I[q, j]])
    # sentinel rows zero-fill
    small = TpuIndexFlat(16)
    small.add(xb[:3])
    _, I2, R2 = small.search_and_reconstruct(xq, 5)
    assert (I2[:, 3:] == -1).all()
    assert (R2[:, 3:] == 0).all()


def test_reset_clears_map():
    xb, _ = int_data(50, 1, 8)
    idx = TpuIndexIDMap2(TpuIndexFlat(8))
    idx.add_with_ids(xb, make_ids(50))
    idx.reset()
    assert idx.ntotal == 0 and idx.id_map.size == 0
    idx.add_with_ids(xb, np.arange(50, dtype=np.int64))
    np.testing.assert_array_equal(idx.reconstruct(7), xb[7])
