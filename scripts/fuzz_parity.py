"""Fuzz the f32 cross-path contract at the index layer: fused (two-stage,
hi_exact, reduced) vs forced-XLA plain path — ids EXACTLY equal, distances
within a few ulp (accumulation order differs across paths/backends; on TPU
the two-stage values measured bit-identical, but that is arithmetic luck,
not the contract)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from faiss_tpu import TpuIndexFlat
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.resources import TpuResources

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30
rng0 = np.random.default_rng(31337)
pf_gate = pf.fused_path_eligible
for t in range(N):
    rng = np.random.default_rng(rng0.integers(1 << 62))
    nv = int(rng.integers(64, 220)) * 128
    d = int(rng.choice([32, 64, 128, 200]))
    nq = int(rng.integers(1, 20))
    k = int(rng.integers(1, 64))
    integer = rng.random() < 0.4
    xb = rng.standard_normal((nv, d)).astype(np.float32)
    xq = rng.standard_normal((nq, d)).astype(np.float32)
    if integer:
        xb = np.round(xb * 40).astype(np.float32)
        xq = np.round(xq * 40).astype(np.float32)
    idx = TpuIndexFlat(d, storage="f32", resources=TpuResources())
    # force fused eligibility regardless of the cost model
    pf.fused_path_eligible = lambda **kw: True
    try:
        idx.add(xb)
        D1, I1 = idx.search(xq, k)
        fb = idx.fused_fallbacks
        idx.set_force_xla(True)
        D2, I2 = idx.search(xq, k)
    finally:
        pf.fused_path_eligible = pf_gate
    dmax = np.abs(D1) + np.abs(D2) + 1.0
    tol = 4 * np.spacing(np.float32(dmax.max()))
    sets_ok = all(set(I1[i].tolist()) == set(I2[i].tolist())
                  for i in range(nq))
    # positions may swap where the two paths' f32 scores straddle within
    # ~1 ulp (different accumulation order) — sets must always agree
    if not (sets_ok and np.array_equal(I1[:, 0], I2[:, 0])
            and np.allclose(np.sort(D1, 1), np.sort(D2, 1),
                            rtol=0, atol=tol)):
        bad = np.nonzero((I1 != I2).any(1) | (D1 != D2).any(1))[0]
        print(f"TRIAL {t} PARITY MISMATCH: nv={nv} d={d} nq={nq} k={k} "
              f"integer={integer} fallbacks={fb} rows={bad[:4]}")
        for r in bad[:2]:
            print("  I1", I1[r][:8], "\n  I2", I2[r][:8])
            print("  D1", D1[r][:4], "\n  D2", D2[r][:4])
        sys.exit(1)
    print(f"trial {t} ok (nv={nv} d={d} nq={nq} k={k} int={integer} "
          f"fallbacks={fb})", flush=True)
print(f"ALL {N} PARITY TRIALS PASS")
