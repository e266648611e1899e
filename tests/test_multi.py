"""Host-level index composition tests (multi.IndexShardsHost + merge)."""

import numpy as np
import pytest

from faiss_tpu import TpuIndexFlat
from faiss_tpu.multi import IndexShardsHost, merge_search_results

from common import compare_results, make_data, numpy_search, recall_at_k


def test_merge_results_l2():
    xb, xq = make_data(2000, 8, 32)
    full = TpuIndexFlat(32)
    full.add(xb)
    D_full, I_full = full.search(xq, 10)
    # split into two halves with globally-correct labels
    a, b = TpuIndexFlat(32), TpuIndexFlat(32)
    a.add(xb[:1200]); b.add(xb[1200:])
    Da, Ia = a.search(xq, 10)
    Db, Ib = b.search(xq, 10)
    D, I = merge_search_results([(Da, Ia), (Db, Ib + 1200)], 10, "l2")
    np.testing.assert_array_equal(I, I_full)
    np.testing.assert_allclose(D, D_full, rtol=1e-5, atol=1e-5)


def test_index_shards_host():
    xb, xq = make_data(4000, 12, 48)
    shards = IndexShardsHost([TpuIndexFlat(48) for _ in range(3)])
    for lo in range(0, 4000, 700):  # uneven batches round-robin by load
        shards.add(xb[lo : lo + 700])
    assert shards.ntotal == 4000
    D, I = shards.search(xq, 10)
    Dr, Ir = numpy_search(xb, xq, 10)
    compare_results(D, I, Dr, Ir, dist_tol=1e-3, k=10, label="shards-host")
    assert recall_at_k(I, Ir, 10) == 1.0


def test_index_shards_host_k_gt_ntotal():
    xb, xq = make_data(5, 2, 16)
    shards = IndexShardsHost([TpuIndexFlat(16) for _ in range(2)])
    shards.add(xb)
    D, I = shards.search(xq, 12)
    assert (I[:, 5:] == -1).all()
    Dr, Ir = numpy_search(xb, xq, 12)
    compare_results(D, I, Dr, Ir, dist_tol=1e-3, k=12, label="host k>n")


def test_index_shards_validation():
    a = TpuIndexFlat(16)
    a.add(np.zeros((4, 16), np.float32))
    with pytest.raises(ValueError):
        IndexShardsHost([a])  # must start empty
    with pytest.raises(ValueError):
        IndexShardsHost([TpuIndexFlat(16), TpuIndexFlat(32)])
