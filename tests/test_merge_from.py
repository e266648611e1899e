"""merge_from — faiss::IndexFlat::merge_from contract, bit-exact per storage.

The merge happens at the storage level (raw planes + PRE-quantization norms
+ certificate statistics), so a merged index is indistinguishable from one
built by the same add() sequence — including for reduced-precision storage,
where a reconstruct+re-add merge would silently re-derive norms from the
decoded vectors and change reported distances.
"""

import numpy as np
import pytest

from faiss_tpu import TpuIndexFlat

from common import SEED


def gauss(n, d, seed):
    return np.random.default_rng(seed).standard_normal((n, d)) \
        .astype(np.float32)


@pytest.mark.parametrize("storage,kw", [
    ("f32", {}), ("bf16", {}), ("f16", {}), ("int8", {}),
    ("f32", {"keep_master": False}),
])
def test_merge_equals_sequential_add(storage, kw):
    # Gaussian data exercises the nonzero-split-stats path (lo planes real)
    xa, xb = gauss(1500, 24, SEED), gauss(900, 24, SEED + 1)
    xq = gauss(8, 24, SEED + 2)
    a = TpuIndexFlat(24, storage=storage, **kw)
    b = TpuIndexFlat(24, storage=storage, **kw)
    ref = TpuIndexFlat(24, storage=storage, **kw)
    if storage == "int8":
        a.train(xa)
        b.train(xa)   # shared grid — merge requires it
        ref.train(xa)
    a.add(xa)
    b.add(xb)
    ref.add(xa)
    ref.add(xb)
    a.merge_from(b)
    assert a.ntotal == 2400 and b.ntotal == 0  # other is emptied (faiss)
    D1, I1 = a.search(xq, 10)
    D2, I2 = ref.search(xq, 10)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_array_equal(D1, D2)
    # stored planes + norms identical → reconstructs identical too
    for key in [0, 1499, 1500, 2399]:
        np.testing.assert_array_equal(a.reconstruct(key),
                                      ref.reconstruct(key))
    # certificate statistics transferred exactly (running maxima)
    assert a.store.split_stats_host() == ref.store.split_stats_host()
    # the emptied donor is immediately reusable
    b.add(xq)
    assert b.ntotal == 8


def test_merge_int8_adopts_or_rejects_grid():
    xa, xb = gauss(400, 16, 1), gauss(400, 16, 2)
    b = TpuIndexFlat(16, storage="int8")
    b.add(xb)  # auto-trains on xb
    # empty untrained self adopts the donor's grid
    a = TpuIndexFlat(16, storage="int8")
    a.merge_from(b)
    assert a.ntotal == 400 and a.is_trained
    # differently-trained grids must refuse (requantization isn't exact)
    c = TpuIndexFlat(16, storage="int8")
    c.train(xa)
    c.add(xa)
    with pytest.raises(ValueError):
        a.merge_from(c)


def test_merge_errors():
    a = TpuIndexFlat(16)
    with pytest.raises(ValueError):
        a.merge_from(a)
    with pytest.raises(ValueError):
        a.merge_from(TpuIndexFlat(32))
    with pytest.raises(ValueError):
        a.merge_from(TpuIndexFlat(16, metric="ip"))
    with pytest.raises(ValueError):
        a.merge_from(TpuIndexFlat(16, storage="bf16"))
    b = TpuIndexFlat(16)
    a.merge_from(b)  # both empty: a no-op, not an error
    assert a.ntotal == 0


def test_merge_then_remove_then_search():
    # mutation ops compose: merge, remove across the old boundary, search
    xa, xb = gauss(800, 16, 3), gauss(800, 16, 4)
    xq = gauss(6, 16, 5)
    a = TpuIndexFlat(16, storage="bf16")
    b = TpuIndexFlat(16, storage="bf16")
    a.add(xa)
    b.add(xb)
    a.merge_from(b)
    a.remove_ids(np.arange(700, 900))  # straddles the merge seam
    ref = TpuIndexFlat(16, storage="bf16")
    ref.add(np.concatenate([xa, xb])[np.r_[0:700, 900:1600]])
    D1, I1 = a.search(xq, 10)
    D2, I2 = ref.search(xq, 10)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_array_equal(D1, D2)
