"""range_search — faiss CSR-contract tests vs the float64 numpy oracle.

Beyond the reference surface: MetalIndexFlat never implements range_search
(its faiss::Index base throws), but faiss::IndexFlat users have it, so the
TPU index provides it with faiss semantics — strict dist < radius (L2) /
dist > radius (IP), (lims, D, I) CSR layout. Integer-valued data makes every
storage mode's arithmetic exact, so set comparisons against the oracle are
strict (no tolerance band at the radius boundary).
"""

import numpy as np
import pytest

import faiss_tpu
from faiss_tpu import TpuIndexFlat
from faiss_tpu.multi import IndexShardsHost
from faiss_tpu.resources import KernelTuning, TpuResources

from common import SEED, make_data


def int_data(nv, nq, d, lo=0, hi=16, seed=SEED):
    rng = np.random.default_rng(seed)
    xb = rng.integers(lo, hi, (nv, d)).astype(np.float32)
    xq = rng.integers(lo, hi, (nq, d)).astype(np.float32)
    return xb, xq


def oracle_range(xb, xq, radius, metric):
    """Per-query hit sets + exact distances (float64, strict criterion)."""
    xb64, xq64 = np.asarray(xb, np.float64), np.asarray(xq, np.float64)
    if metric == "l2":
        dm = ((xq64 * xq64).sum(1)[:, None] - 2.0 * (xq64 @ xb64.T)
              + (xb64 * xb64).sum(1)[None, :])
        hit = dm < radius
    else:
        dm = xq64 @ xb64.T
        hit = dm > radius
    return [set(np.nonzero(hit[q])[0].tolist()) for q in range(xq.shape[0])], dm


def check_csr(lims, D, I, nq):
    assert lims.shape == (nq + 1,) and lims[0] == 0
    assert np.all(np.diff(lims) >= 0)
    assert D.shape == I.shape == (lims[-1],)
    assert D.dtype == np.float32 and I.dtype == np.int64


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_range_vs_oracle(metric):
    xb, xq = int_data(3000, 9, 16)
    idx = TpuIndexFlat(16, metric=metric)
    idx.add(xb)
    # radii spanning empty → sparse → dense result sets
    radii = ([0.0, 200.0, 400.0, 1e9] if metric == "l2"
             else [1e9, 1300.0, 1100.0, -1e9])
    for radius in radii:
        lims, D, I = idx.range_search(xq, radius)
        check_csr(lims, D, I, 9)
        want, dm = oracle_range(xb, xq, radius, metric)
        for q in range(9):
            got = I[lims[q]:lims[q + 1]]
            assert set(got.tolist()) == want[q], (metric, radius, q)
            # distances exact (integer data) and sorted best-first
            seg = D[lims[q]:lims[q + 1]]
            np.testing.assert_array_equal(seg, dm[q, got].astype(np.float32))
            key = seg if metric == "l2" else -seg
            assert np.all(np.diff(key) >= 0)
    assert idx.range_search(xq, 0.0 if metric == "l2" else 1e9)[0][-1] == 0


def test_boundary_is_strict():
    # a row at EXACTLY the radius must be excluded (faiss: dist < radius)
    xb = np.zeros((4, 8), np.float32)
    xb[1, 0] = 2.0   # dist 4 to the zero query
    xb[2, 0] = 3.0   # dist 9
    xb[3, 0] = 4.0   # dist 16
    idx = TpuIndexFlat(8)
    idx.add(xb)
    lims, D, I = idx.range_search(np.zeros((1, 8), np.float32), 9.0)
    assert set(I.tolist()) == {0, 1}  # dist 0 and 4; the dist-9 row excluded
    np.testing.assert_array_equal(D, [0.0, 4.0])


def test_multi_chunk_and_cap_growth(monkeypatch):
    # private resources: monkeypatched/odd-tuning programs must not leak into
    # the shared shape-keyed compiled-fn cache (CLAUDE.md gotcha)
    res = TpuResources()
    tuning = KernelTuning(chunk_v=1024)  # 4096 rows → 4 chunks
    monkeypatch.setattr(faiss_tpu.index, "RANGE_CAP0", 4)
    xb, xq = int_data(4096, 5, 16)
    idx = TpuIndexFlat(16, resources=res, tuning=tuning)
    idx.add(xb)
    radius = 420.0  # hundreds of hits/query ≫ cap0=4 → exercises the re-run
    lims, D, I = idx.range_search(xq, radius)
    check_csr(lims, D, I, 5)
    want, dm = oracle_range(xb, xq, radius, "l2")
    assert sum(len(w) for w in want) > 4 * 5  # the re-run actually triggered
    for q in range(5):
        got = I[lims[q]:lims[q + 1]]
        assert set(got.tolist()) == want[q]
        np.testing.assert_array_equal(
            D[lims[q]:lims[q + 1]], dm[q, got].astype(np.float32))


@pytest.mark.parametrize("storage,kw", [
    ("bf16", {}), ("f16", {}), ("int8", {}),
    ("f32", {"keep_master": False}),  # pair-only HBM layout
])
def test_range_matches_search_per_storage(storage, kw):
    # same hit criterion as search(): filtering an exhaustive k=nv search by
    # the radius must reproduce range_search exactly (sets AND distances) —
    # the cross-path discipline of MetalDistance.mm:121-123 applied to the
    # range API, per storage mode's scoring class (stored/decoded vectors)
    nv = 1500
    xb, xq = int_data(nv, 6, 16)
    idx = TpuIndexFlat(16, storage=storage, **kw)
    idx.add(xb)
    Dk, Ik = idx.search(xq, nv)
    for radius in [250.0, 450.0]:
        lims, D, I = idx.range_search(xq, radius)
        check_csr(lims, D, I, 6)
        for q in range(6):
            sel = Dk[q] < radius
            assert set(I[lims[q]:lims[q + 1]].tolist()) == \
                set(Ik[q, sel].tolist()), (storage, radius, q)
            np.testing.assert_array_equal(
                np.sort(D[lims[q]:lims[q + 1]]), np.sort(Dk[q, sel]))


def test_empty_index_and_input_shapes():
    idx = TpuIndexFlat(8)
    lims, D, I = idx.range_search(np.zeros((3, 8), np.float32), 10.0)
    assert lims.tolist() == [0, 0, 0, 0] and D.size == 0 and I.size == 0
    idx.add(np.ones((4, 8), np.float32))
    lims, D, I = idx.range_search(np.ones(8, np.float32), 1.0)  # 1-D query
    assert lims.tolist() == [0, 4]
    with pytest.raises(ValueError):
        idx.range_search(np.zeros((2, 9), np.float32), 1.0)


@pytest.mark.parametrize("storage,replicas", [
    ("f32", 1), ("bf16", 1), ("int8", 1), ("f32", 2),
])
def test_sharded_range_search(storage, replicas):
    from faiss_tpu import ShardedIndexFlat

    xb, xq = int_data(4000, 9, 16)
    sh = ShardedIndexFlat(16, storage=storage, num_replicas=replicas)
    flat = faiss_tpu.TpuIndexFlat(16, storage=storage)
    if storage == "int8":
        sh.train(xb)    # identical scale grids → identical decoded dbs,
        flat.train(xb)  # so sharded and flat results match bit-for-bit
    for i in range(0, 4000, 1300):   # uneven adds → capacity equalization
        sh.add(xb[i:i + 1300])
    flat.add(xb)
    for radius in [300.0, 500.0]:
        lims, D, I = sh.range_search(xq, radius)
        fl, fD, fI = flat.range_search(xq, radius)
        np.testing.assert_array_equal(lims, fl)
        np.testing.assert_array_equal(I, fI)
        np.testing.assert_array_equal(D, fD)


def test_shards_host_range_search():
    xb, xq = int_data(2000, 7, 16)
    sh = IndexShardsHost([TpuIndexFlat(16), TpuIndexFlat(16)])
    for i in range(0, 2000, 500):
        sh.add(xb[i:i + 500])
    flat = TpuIndexFlat(16)
    flat.add(xb)
    for radius in [300.0, 500.0]:
        lims, D, I = sh.range_search(xq, radius)
        fl, fD, fI = flat.range_search(xq, radius)
        np.testing.assert_array_equal(lims, fl)
        np.testing.assert_array_equal(I, fI)   # global insertion-order ids
        np.testing.assert_array_equal(D, fD)


def test_dense_range_search_vectorized_assembly():
    """~50k-hit range search: the CSR assembly is loop-free numpy
    (VERDICT r3 weak #7) — exact hit-set parity with the oracle and
    best-first (distance asc, id-asc ties) segment order."""
    xb, xq = make_data(20000, nq=8, d=8, seed=91)
    ix = faiss_tpu.TpuIndexFlat(8)
    ix.add(xb)
    d2 = ((xq[:, None].astype(np.float64)
           - xb[None].astype(np.float64)) ** 2).sum(-1)
    r = float(np.quantile(d2, 0.3))
    lims, D, I = ix.range_search(xq, r)
    assert lims[-1] > 10_000  # genuinely dense
    for q in range(8):
        want = np.nonzero(d2[q] < r)[0]
        got = I[lims[q]:lims[q + 1]]
        assert set(got.tolist()) == set(want.tolist())
        seg = D[lims[q]:lims[q + 1]]
        assert (np.diff(seg) >= 0).all()
        # id-ascending within exact distance ties
        same = np.diff(seg) == 0
        assert (np.diff(got)[same] > 0).all()


@pytest.mark.parametrize("storage", ["f32", "bf16", "f16", "int8"])
def test_reconstruct_batch_matches_reconstruct(storage):
    import faiss_tpu as ft
    xb, _ = make_data(3000, nq=1, d=20, seed=17)
    ix = faiss_tpu.TpuIndexFlat(20, storage=storage)
    ix.add(xb)
    keys = np.asarray([0, 7, 2999, 7, 1500])  # duplicates allowed
    rows = ix.store.reconstruct_batch(keys)
    for i, kk in enumerate(keys):
        np.testing.assert_array_equal(rows[i], ix.reconstruct(int(kk)))
    with pytest.raises(IndexError):
        ix.store.reconstruct_batch([3000])
    assert ix.store.reconstruct_batch([]).shape == (0, 20)
