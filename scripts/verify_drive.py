import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, faiss_tpu
import jax.numpy as jnp
rng = np.random.default_rng(0)
xb = rng.standard_normal((50_000, 128)).astype(np.float32)
xq = np.random.default_rng(1).standard_normal((32, 128)).astype(np.float32)
idx = faiss_tpu.TpuIndexFlat(128); idx.add(xb)
D, I = idx.search(xq, 10)
d2 = ((xq**2).sum(1)[:,None] - 2*xq@xb.T + (xb**2).sum(1)[None,:])
assert (I[:,0] == d2.argmin(1)).all(), "top-1 mismatch"
# full set equality at k=10 vs f64 oracle
o = np.argsort(d2.astype(np.float64), axis=1)[:, :10]
for r in range(32):
    assert set(I[r].tolist()) == set(o[r].tolist()), r
print("fp32 50k OK, fallbacks:", idx.fused_fallbacks)
# bf16 storage top-1 parity + big-nq reduced sweep path (nq>=32 -> 1-pass)
idx16 = faiss_tpu.TpuIndexFlat(128, storage="bf16"); idx16.add(xb)
xq2 = np.random.default_rng(2).standard_normal((100, 128)).astype(np.float32)
D2, I2 = idx16.search(xq2, 10)
dq = ((xq2**2).sum(1)[:,None] - 2*xq2@xb.T + (xb**2).sum(1)[None,:])
top1 = dq.argmin(1)
agree = (I2[:,0] == top1).mean()
assert agree > 0.95, agree  # bf16 quantization can flip near-ties
print("bf16 100q OK, top1 agree:", agree, "fallbacks:", idx16.fused_fallbacks)
# edge cases
e = faiss_tpu.TpuIndexFlat(64)
De, Ie = e.search(np.zeros((2, 64), np.float32), 5)
assert (Ie == -1).all() and np.isinf(De).all()
try:
    idx.search(xq[:, :64], 10); raise SystemExit("no dim check")
except ValueError: pass
try:
    idx.search(xq, 0); raise SystemExit("no k check")
except ValueError: pass
Dk, Ik = idx.search(xq[:2], 50_005)  # k > ntotal
assert (Ik[:, -1] == -1).all()
# add-after-search + reconstruct
idx.add(xb[:1000]); assert idx.ntotal == 51_000
r = idx.reconstruct(50_100); np.testing.assert_allclose(r, xb[100], rtol=1e-6)
# d=100 non-aligned, 1-D query
nl = faiss_tpu.TpuIndexFlat(100); nl.add(xb[:, :100].copy())
Dn, In = nl.search(xb[3, :100], 1)
assert In.reshape(-1)[0] == 3
print("edges OK")
# int8 storage: new surface — drive end-to-end on the real TPU
idx8 = faiss_tpu.TpuIndexFlat(128, storage="int8")
idx8.add(xb)
D8, I8 = idx8.search(xq2, 10)
dec = idx8.reconstruct_n(0, 1000)  # decode sanity
d8 = ((xq2**2).sum(1)[:,None] - 2*xq2@xb.T + (xb**2).sum(1)[None,:])
agree8 = (I8[:,0] == d8.argmin(1)).mean()
assert agree8 > 0.9, agree8
print("int8 100q OK, top1 agree:", agree8, "fallbacks:", idx8.fused_fallbacks)
# f16 storage (2 B/elem bit patterns, clean-bits in-kernel decode on chip)
idxh = faiss_tpu.TpuIndexFlat(128, storage="f16")
idxh.add(xb)
assert "f16_clean=True" in idxh.describe()
Dh, Ih = idxh.search(xq2, 10)
agreeh = (Ih[:, 0] == top1).mean()
assert agreeh > 0.98, agreeh  # f16 keeps ~3 decimal digits
print("f16 100q OK, top1 agree:", agreeh, "fallbacks:", idxh.fused_fallbacks)
# hi_exact: integer-valued fp32 data (SIFT regime) must be BIT-identical
# to the forced-XLA fp32 path via the hi-plane-only Mosaic program
xbi = rng.integers(0, 256, (50_000, 128)).astype(np.float32)
xqi = rng.integers(0, 256, (32, 128)).astype(np.float32)
idxi = faiss_tpu.TpuIndexFlat(128, storage="f32")
idxi.add(xbi)
assert "hi_exact=True" in idxi.describe()
Di, Ii = idxi.search(xqi, 10)
idxi.set_force_xla(True)
Dix, Iix = idxi.search(xqi, 10)
idxi.set_force_xla(False)
np.testing.assert_array_equal(Ii, Iix)
np.testing.assert_array_equal(Di, Dix)
print("hi_exact OK (bit-identical to plain), fallbacks:",
      idxi.fused_fallbacks)
# range_search (faiss CSR contract) on the real chip: strict dist<radius,
# complete vs the f64 oracle, distances fp32-exact on integer data
d2i = ((xqi.astype(np.float64)**2).sum(1)[:, None]
       - 2.0 * xqi.astype(np.float64) @ xbi.astype(np.float64).T
       + (xbi.astype(np.float64)**2).sum(1)[None, :])
# ~1.6k expected hits; integer-data distances sit near 1.4e6, so a fixed
# radius silently collects nothing (caught by the CPU dry-run of this drive)
rad = float(np.quantile(d2i, 1e-3))
lims, Dr, Ir = idxi.range_search(xqi, rad)
for r in range(32):
    want = set(np.nonzero(d2i[r] < rad)[0].tolist())
    assert set(Ir[lims[r]:lims[r+1]].tolist()) == want, r
assert lims[-1] > 0, "radius too tight to exercise extraction"
print("range_search OK:", int(lims[-1]), "hits over 32 queries")
# filtered search (SearchParams selector — new surface), remove_ids,
# merge_from, IDMap: drive the mutation + custom-id path on the chip
half = 25_000
selp = faiss_tpu.SearchParams(faiss_tpu.IDSelectorRange(0, half))
Ds, Is = idxi.search(xqi, 10, params=selp)
assert (Is < half).all() and (Is >= 0).all()
subtop1 = d2i[:, :half].argmin(1)
assert (Is[:, 0] == subtop1).all()
print("selector OK (top-1 exact on admitted rows)")
n0 = idxi.ntotal
assert idxi.remove_ids(np.arange(0, n0, 5)) == len(range(0, n0, 5))
fresh = faiss_tpu.TpuIndexFlat(128, storage="f32")
keep = np.setdiff1d(np.arange(n0), np.arange(0, n0, 5))
fresh.add(xbi[keep])
Dr1, Ir1 = idxi.search(xqi, 10)
Dr2, Ir2 = fresh.search(xqi, 10)
np.testing.assert_array_equal(Ir1, Ir2)
np.testing.assert_array_equal(Dr1, Dr2)
print("remove_ids OK (bit-identical to fresh index on survivors)")
im = faiss_tpu.TpuIndexIDMap(faiss_tpu.TpuIndexFlat(128, storage="f32"))
im.add_with_ids(xbi[:10_000], np.arange(10_000, dtype=np.int64) * 3 + 7)
Dm, Im = im.search(xqi, 5)
assert ((Im - 7) % 3 == 0).all()
assert (Im[:, 0] == d2i[:, :10_000].argmin(1) * 3 + 7).all()
print("idmap OK (custom-id translation, top-1 exact)")
print("VERIFY DRIVE COMPLETE")
# IVF-Flat on the chunk-paged pool layout (r4): skewed mixture, Pallas
# gather fine scan, selector, merge_from, save/load, async tokens, and the
# chunked+pipelined bulk assign — the whole new surface on the real chip
ncomp = 64
cents = (8.0 * rng.standard_normal((ncomp, 128))).astype(np.float32)
comp = rng.integers(0, ncomp, 60_000)
xm = (cents[comp] + rng.standard_normal((60_000, 128))).astype(np.float32)
qm = (cents[rng.integers(0, ncomp, 16)]
      + rng.standard_normal((16, 128))).astype(np.float32)
ivf = faiss_tpu.TpuIndexIVFFlat(128, 64, nprobe=8, storage="bf16",
                                train_niter=8, seed=11)
ivf.train(xm[:20_000])
ivf.add(xm[:40_000])
ivf2 = faiss_tpu.TpuIndexIVFFlat(128, 64, nprobe=8, storage="bf16", seed=11)
ivf2.quantizer = None
ivf2._set_centroids(
    np.stack([ivf.quantizer.reconstruct(j) for j in range(64)]),
    quantizer=ivf.quantizer)
ivf2.add(xm[40_000:])
ivf.merge_from(ivf2)
assert ivf.ntotal == 60_000 and ivf2.ntotal == 0
tok = ivf.search_async(qm, 10)
Dv, Iv = tok.wait()
# numpy IVF oracle probing the SAME lists, scored on the STORED rows (the
# documented contract: exact-within-probed-lists w.r.t. the quantized bits
# + pre-quantization norms — an unquantized-xm oracle legitimately loses
# ~25% of top-10 hits at this mixture scale, where bf16's relative error
# is ~16 absolute on ~8000-scale scores). quantizer.assign still runs for
# the chunked bulk-assign coverage; the oracle probes the index's OWN
# routing (they agree up to near-ties across arithmetic paths).
assign_bulk = ivf.quantizer.assign(xm).ravel()
assign_all = ivf._assignments()
agree = float((assign_bulk == assign_all).mean())
assert agree >= 0.999, agree  # coarse routers: matmul argmax vs flat search
xm16 = np.asarray(jnp.asarray(xm).astype(jnp.bfloat16).astype(jnp.float32))
n_pre = (xm.astype(np.float64) ** 2).sum(1)
cq = ((qm.astype(np.float64)[:, None]
       - np.stack([ivf.quantizer.reconstruct(j)
                   for j in range(64)])[None]) ** 2).sum(-1)
probe = np.argsort(cq, axis=1)[:, :8]
hits = 0
for qi in range(16):
    cand = np.nonzero(np.isin(assign_all, probe[qi]))[0]
    s = (2.0 * (xm16[cand].astype(np.float64) @ qm[qi].astype(np.float64))
         - n_pre[cand])
    want = set(cand[np.argsort(-s, kind="stable")[:10]].tolist())
    hits += len(want & set(Iv[qi].tolist()))
assert hits >= 156, hits  # fp32-true vs f64 oracle: rank-boundary ties only
print("ivf OK (merged, async, paged pool):", ivf.describe(), "hits", hits)
selp2 = faiss_tpu.SearchParams(faiss_tpu.IDSelectorRange(0, 30_000),
                               nprobe=64)
Dvs, Ivs = ivf.search(qm, 10, params=selp2)
assert ((Ivs >= 0) & (Ivs < 30_000)).all()
import tempfile, os as _os
with tempfile.TemporaryDirectory() as td:
    pth = _os.path.join(td, "ivf.npz")
    faiss_tpu.save_index(ivf, pth)
    ivf3 = faiss_tpu.load_index(pth)
    Dv3, Iv3 = ivf3.search(qm, 10)
    np.testing.assert_array_equal(Iv, Iv3)
    np.testing.assert_array_equal(Dv, Dv3)
print("ivf selector + save/load OK (reload bit-exact)")
print("VERIFY DRIVE COMPLETE (ivf)")
