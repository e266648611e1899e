"""remove_ids — faiss stable-renumbering contract on all three index classes.

Beyond the reference surface: MetalIndexFlat never implements removal (its
faiss::Index base throws), but faiss::IndexFlat users have remove_ids with
stable renumbering (survivors keep order, ids shift down). Integer-valued
data makes every storage mode's arithmetic exact, so post-removal searches
are compared strictly against a numpy oracle over the surviving rows.
"""

import numpy as np
import pytest

import faiss_tpu
from faiss_tpu import ShardedIndexFlat, TpuIndexFlat
from faiss_tpu.multi import IndexShardsHost

from common import SEED


def int_data(nv, nq, d, seed=SEED):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 16, (nv, d)).astype(np.float32),
            rng.integers(0, 16, (nq, d)).astype(np.float32))


def oracle_topk(xb, xq, k):
    d2 = ((xq.astype(np.float64) ** 2).sum(1)[:, None]
          - 2.0 * xq.astype(np.float64) @ xb.astype(np.float64).T
          + (xb.astype(np.float64) ** 2).sum(1)[None, :])
    I = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d2, I, 1), I


def check_removed(idx, xb, rm, xq, k=10):
    """Post-removal searches + reconstructs must match the compacted oracle."""
    keep = np.setdiff1d(np.arange(xb.shape[0]), rm)
    xs = xb[keep]
    assert idx.ntotal == xs.shape[0]
    oD, oI = oracle_topk(xs, xq, k)
    D, I = idx.search(xq, k)
    for q in range(xq.shape[0]):  # set equality (fp ties may swap ranks)
        assert set(I[q].tolist()) == set(oI[q].tolist()), q
    np.testing.assert_allclose(D, oD.astype(np.float32), rtol=1e-6)
    for key in [0, idx.ntotal // 2, idx.ntotal - 1]:
        np.testing.assert_allclose(idx.reconstruct(key), xs[key], atol=0)


def test_flat_remove_then_search_and_add():
    xb, xq = int_data(3000, 8, 24)
    idx = TpuIndexFlat(24)
    idx.add(xb)
    rng = np.random.default_rng(3)
    rm = rng.choice(3000, 700, replace=False)
    assert idx.remove_ids(rm) == 700
    check_removed(idx, xb, rm, xq)
    # duplicate ids count once; empty removal is a no-op
    assert idx.remove_ids(np.array([0, 0, 1])) == 2
    assert idx.remove_ids(np.array([], np.int64)) == 0
    assert idx.ntotal == 3000 - 702
    # add after remove: appended rows take the next sequential ids
    extra = int_data(64, 1, 24, seed=9)[0]
    idx.add(extra)
    keep = np.setdiff1d(np.arange(3000), rm)[2:]
    check_removed(idx, np.concatenate([xb[keep], extra]),
                  np.array([], np.int64), xq)


@pytest.mark.parametrize("storage,kw", [
    ("bf16", {}), ("f16", {}), ("int8", {}),
    ("f32", {"keep_master": False}),  # pair-only HBM layout
])
def test_flat_remove_per_storage(storage, kw):
    # removal must compact EVERY stored plane consistently: search results
    # and reconstructs after removal equal those of a fresh index built from
    # the surviving rows (same quantization grid → bit-identical)
    xb, xq = int_data(2000, 6, 16)
    idx = TpuIndexFlat(16, storage=storage, **kw)
    fresh = TpuIndexFlat(16, storage=storage, **kw)
    if storage == "int8":
        idx.train(xb)
        fresh.train(xb)
    idx.add(xb)
    rm = np.arange(0, 2000, 3)
    idx.remove_ids(rm)
    keep = np.setdiff1d(np.arange(2000), rm)
    fresh.add(xb[keep])
    D1, I1 = idx.search(xq, 12)
    D2, I2 = fresh.search(xq, 12)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_array_equal(D1, D2)
    np.testing.assert_array_equal(idx.reconstruct(5), fresh.reconstruct(5))


def test_flat_remove_errors_and_remove_all():
    idx = TpuIndexFlat(8, storage="int8")
    idx.add(np.ones((100, 8), np.float32))
    with pytest.raises(IndexError):
        idx.remove_ids([100])
    with pytest.raises(IndexError):
        idx.remove_ids([-1])
    assert idx.remove_ids(np.arange(100)) == 100
    assert idx.ntotal == 0
    assert idx.is_trained  # int8 scales survive, like reset()
    idx.add(np.ones((4, 8), np.float32))  # usable again without retrain
    assert idx.ntotal == 4


def test_flat_remove_range_search_consistent():
    # the certificate-stat conservation argument: removal keeps split stats
    # as sound upper bounds, so post-removal range/search stay exact
    xb, xq = int_data(2500, 5, 16)
    idx = TpuIndexFlat(16)
    idx.add(xb)
    rm = np.arange(100, 1100)
    idx.remove_ids(rm)
    keep = np.setdiff1d(np.arange(2500), rm)
    lims, D, I = idx.range_search(xq, 400.0)
    xs64 = xb[keep].astype(np.float64)
    d2 = ((xq.astype(np.float64) ** 2).sum(1)[:, None]
          - 2.0 * xq.astype(np.float64) @ xs64.T + (xs64 ** 2).sum(1)[None, :])
    for q in range(5):
        want = set(np.nonzero(d2[q] < 400.0)[0].tolist())
        assert set(I[lims[q]:lims[q + 1]].tolist()) == want, q


def test_remove_then_save_load_roundtrip(tmp_path):
    # removal compacts every plane; a save → load round-trip of the
    # compacted index must reproduce searches bit-identically (flat and
    # sharded share the io format, id order = dense renumbered gids)
    from faiss_tpu.io import load_index, save_index

    xb, xq = int_data(2600, 5, 16)
    for make, sharded in [(lambda: TpuIndexFlat(16, storage="bf16"), False),
                          (lambda: ShardedIndexFlat(16, storage="bf16"),
                           True)]:
        idx = make()
        idx.add(xb)
        idx.remove_ids(np.arange(0, 2600, 2))
        p = str(tmp_path / f"rm_{sharded}.npz")
        save_index(idx, p)
        back = load_index(p, sharded=sharded)
        D1, I1 = idx.search(xq, 8)
        D2, I2 = back.search(xq, 8)
        np.testing.assert_array_equal(I1, I2)
        np.testing.assert_array_equal(D1, D2)


@pytest.mark.parametrize("storage,replicas", [
    ("f32", 1), ("bf16", 1), ("int8", 1), ("f32", 2),
])
def test_sharded_remove_matches_flat(storage, replicas):
    xb, xq = int_data(4000, 7, 16)
    sh = ShardedIndexFlat(16, storage=storage, num_replicas=replicas)
    flat = TpuIndexFlat(16, storage=storage)
    if storage == "int8":
        sh.train(xb)
        flat.train(xb)
    for i in range(0, 4000, 1100):  # uneven adds → multiple extents/shard
        sh.add(xb[i:i + 1100])
    flat.add(xb)
    rng = np.random.default_rng(5)
    rm = rng.choice(4000, 1500, replace=False)
    assert sh.remove_ids(rm) == 1500 and flat.remove_ids(rm) == 1500
    assert sh.ntotal == flat.ntotal == 2500
    D1, I1 = sh.search(xq, 10)
    D2, I2 = flat.search(xq, 10)
    np.testing.assert_array_equal(I1, I2)  # identical renumbering + grids
    np.testing.assert_array_equal(D1, D2)
    for key in [0, 1234, 2499]:
        np.testing.assert_array_equal(sh.reconstruct(key),
                                      flat.reconstruct(key))
    # removal then add keeps the id spaces aligned
    extra = int_data(128, 1, 16, seed=11)[0]
    sh.add(extra)
    flat.add(extra)
    D1, I1 = sh.search(xq, 10)
    D2, I2 = flat.search(xq, 10)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_array_equal(D1, D2)


def test_sharded_remove_empties_one_shard():
    # removing every row of one shard must leave the others searchable
    sh = ShardedIndexFlat(16, num_shards=4)
    xb, xq = int_data(400, 3, 16)
    sh.add(xb)
    # shard 0 owns gids [0, 100) after one balanced contiguous add
    sh.remove_ids(np.arange(100))
    flat = TpuIndexFlat(16)
    flat.add(xb[100:])
    D1, I1 = sh.search(xq, 5)
    D2, I2 = flat.search(xq, 5)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_array_equal(D1, D2)


def test_shards_host_remove_matches_flat():
    xb, xq = int_data(3000, 6, 16)
    sh = IndexShardsHost([TpuIndexFlat(16), TpuIndexFlat(16),
                          TpuIndexFlat(16)])
    for i in range(0, 3000, 700):
        sh.add(xb[i:i + 700])
    flat = TpuIndexFlat(16)
    flat.add(xb)
    rng = np.random.default_rng(7)
    rm = rng.choice(3000, 900, replace=False)
    assert sh.remove_ids(rm) == 900 and flat.remove_ids(rm) == 900

    def same_topk(a, b):
        # host merge breaks exact-distance ties in sub-index order, flat in
        # id order — compare distances positionally and ids as per-row sets
        # (the repo-wide cross-path criterion for integer-data ties)
        (D1, I1), (D2, I2) = a, b
        np.testing.assert_array_equal(D1, D2)
        for q in range(D1.shape[0]):
            assert set(I1[q].tolist()) == set(I2[q].tolist()), q

    same_topk(sh.search(xq, 10), flat.search(xq, 10))
    lims1, rD1, rI1 = sh.range_search(xq, 350.0)
    lims2, rD2, rI2 = flat.range_search(xq, 350.0)
    np.testing.assert_array_equal(lims1, lims2)
    np.testing.assert_array_equal(rI1, rI2)
    sh.add(xb[:50])  # appended ids continue from the compacted ntotal
    flat.add(xb[:50])
    same_topk(sh.search(xq, 10), flat.search(xq, 10))
