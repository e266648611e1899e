"""IVF-Flat index (ivf.py — faiss::IndexIVFFlat parity, beyond the
reference's flat-only surface).

Oracle: a numpy IVF simulation that probes the SAME lists (assignments
come from the index's own quantizer, so coarse routing is identical by
construction) and computes float64 distances within them. Integer-valued
data makes fp32 distances exact, so result equality is exact, not
recall-bounded. Exhaustive equivalence: nprobe == nlist must reproduce
TpuIndexFlat's result sets.
"""

import numpy as np
import pytest

import faiss_tpu
from faiss_tpu import MetricType, TpuIndexIVFFlat

from common import make_data


def int_data(nv, nq, d, seed=0, lo=0, hi=32):
    rng = np.random.default_rng(seed)
    xb = rng.integers(lo, hi, (nv, d)).astype(np.float32)
    xq = rng.integers(lo, hi, (nq, d)).astype(np.float32)
    return xb, xq


def ivf_oracle(index, xb, xq, k, nprobe):
    """Probe the same lists as the index, score in float64."""
    assign = index.quantizer.assign(xb).ravel()
    cents = np.zeros((index.nlist, index.d), np.float32)
    for j in range(index.nlist):
        cents[j] = index.quantizer.reconstruct(j)
    cq = ((xq.astype(np.float64)[:, None] - cents[None]) ** 2).sum(-1)
    probe = np.argsort(cq, axis=1, kind="stable")[:, :nprobe]
    D = np.full((len(xq), k), np.inf)
    I = np.full((len(xq), k), -1, np.int64)
    for qi in range(len(xq)):
        cand = np.nonzero(np.isin(assign, probe[qi]))[0]
        if cand.size == 0:
            continue
        d2 = ((xq[qi].astype(np.float64) - xb[cand].astype(np.float64)) ** 2
              ).sum(-1)
        order = np.lexsort((cand, d2))[:k]
        D[qi, : len(order)] = d2[order]
        I[qi, : len(order)] = cand[order]
    return D, I


def test_untrained_add_raises():
    ix = TpuIndexIVFFlat(16, 4)
    with pytest.raises(RuntimeError):
        ix.add(np.zeros((10, 16), np.float32))
    with pytest.raises(RuntimeError):
        ix.search(np.zeros((2, 16), np.float32), 3)
    with pytest.raises(ValueError):
        TpuIndexIVFFlat(16, 4, storage="int8")


def test_ivf_matches_numpy_oracle_exactly_on_integer_data():
    xb, xq = int_data(4000, 8, 16, seed=1)
    ix = TpuIndexIVFFlat(16, 16, nprobe=4, seed=3)
    ix.train(xb)
    ix.add(xb)
    D, I = ix.search(xq, 5)
    refD, refI = ivf_oracle(ix, xb, xq, 5, 4)
    # integer data -> fp32 distances are exact -> per-row sets must match
    for qi in range(8):
        assert set(I[qi]) == set(refI[qi]), qi
    got = np.sort(np.where(np.isinf(D), np.inf, D), axis=1)
    want = np.sort(refD, axis=1)
    np.testing.assert_allclose(got[~np.isinf(want)], want[~np.isinf(want)])


def test_nprobe_full_equals_flat():
    xb, xq = make_data(3000, nq=6, d=24)
    ix = TpuIndexIVFFlat(24, 8, nprobe=8, seed=2)
    ix.train(xb)
    ix.add(xb)
    D, I = ix.search(xq, 10)
    flat = faiss_tpu.TpuIndexFlat(24)
    flat.add(xb)
    Df, If = flat.search(xq, 10)
    for qi in range(6):  # near-tie order may differ across paths: sets
        assert set(I[qi]) == set(If[qi]), qi
    np.testing.assert_allclose(np.sort(D, 1), np.sort(Df, 1),
                               rtol=1e-5, atol=1e-4)


def test_recall_increases_with_nprobe():
    xb, xq = make_data(8000, nq=16, d=32, seed=5)
    ix = TpuIndexIVFFlat(32, 32, seed=7)
    ix.train(xb)
    ix.add(xb)
    flat = faiss_tpu.TpuIndexFlat(32)
    flat.add(xb)
    _, If = flat.search(xq, 10)
    recalls = []
    for npb in (1, 4, 32):
        ix.nprobe = npb
        _, I = ix.search(xq, 10)
        recalls.append(np.mean([
            len(set(I[q]) & set(If[q])) / 10 for q in range(16)]))
    assert recalls[0] <= recalls[1] <= recalls[2] + 1e-9, recalls
    assert recalls[2] >= 0.999, recalls  # nprobe=nlist is exhaustive
    assert recalls[1] >= 0.5, recalls    # sane mid-probe recall


def test_batched_add_equals_single_add():
    xb, xq = int_data(2000, 5, 8, seed=9)
    a = TpuIndexIVFFlat(8, 8, nprobe=3, seed=1)
    a.train(xb)
    a.add(xb)
    b = TpuIndexIVFFlat(8, 8, nprobe=3, seed=1)
    b.train(xb)
    for i in range(0, 2000, 300):  # uneven batches force cap growth
        b.add(xb[i: i + 300])
    assert a.ntotal == b.ntotal == 2000
    Da, Ia = a.search(xq, 7)
    Db, Ib = b.search(xq, 7)
    for qi in range(5):
        assert set(Ia[qi]) == set(Ib[qi]), qi
    np.testing.assert_allclose(np.sort(Da, 1), np.sort(Db, 1))


def test_reconstruct_reset_and_observability():
    xb, _ = make_data(500, nq=1, d=16, seed=11)
    ix = TpuIndexIVFFlat(16, 4, seed=5)
    ix.train(xb)
    ix.add(xb)
    np.testing.assert_allclose(ix.reconstruct(123), xb[123], rtol=1e-6)
    with pytest.raises(IndexError):
        ix.reconstruct(500)
    assert ix.list_sizes().sum() == 500
    assert "nlist=4" in ix.describe()
    ix.reset()
    assert ix.ntotal == 0 and ix.is_trained  # quantizer survives reset
    D, I = ix.search(xb[:2], 3)
    assert (I == -1).all()
    ix.add(xb[:100])  # add-after-reset works
    assert ix.ntotal == 100


def test_bf16_storage_mode():
    xb, xq = int_data(3000, 6, 16, seed=13, hi=16)  # small ints: bf16-exact
    ix = TpuIndexIVFFlat(16, 8, nprobe=8, storage="bf16", seed=3)
    ix.train(xb)
    ix.add(xb)
    flat = faiss_tpu.TpuIndexFlat(16, storage="bf16")
    flat.add(xb)
    D, I = ix.search(xq, 5)
    Df, If = flat.search(xq, 5)
    for qi in range(6):
        assert set(I[qi]) == set(If[qi]), qi
    np.testing.assert_allclose(np.sort(D, 1), np.sort(Df, 1), rtol=1e-6)


@pytest.mark.filterwarnings("ignore::UserWarning")  # tiny train set on purpose
def test_sentinels_when_probed_lists_have_too_few():
    xb, xq = make_data(64, nq=3, d=8, seed=15)
    ix = TpuIndexIVFFlat(8, 16, nprobe=1, seed=9, train_niter=4)
    ix.train(xb)
    ix.add(xb)
    D, I = ix.search(xq, 20)  # k > any single list
    assert (I[:, -1] == -1).all()
    assert (D[I == -1] == np.inf).all()
    valid = I >= 0
    assert valid.any()
