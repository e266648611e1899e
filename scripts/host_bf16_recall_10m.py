"""Host-side: flat bf16-scored recall@10 vs f64 oracle on the EXACT
ivf10m_v4 data (same make_data seed) — isolates the storage ceiling from
IVF routing at 10M. Pure numpy + ml_dtypes; no device."""
import numpy as np, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.bench_ivf_r4 import make_data, exact_oracle, recall_at_k
import ml_dtypes

NV, NQ, K, D = 10_000_000, 104, 10, 128
xb, xq = make_data("mix", NV, NQ)
t0=time.time()
oracle = exact_oracle(xb, xq, K)
print(f"oracle {time.time()-t0:.0f}s", flush=True)
# flat-index bf16 contract: scores = 2 q.v16 - ||v||^2_pre (f32-true dots on
# bf16 rows, pre-quantization norms)
xq64 = xq.astype(np.float64)
best_s = np.full((NQ, K), -np.inf); best_i = np.full((NQ, K), -1, np.int64)
t0=time.time()
for i0 in range(0, NV, 1_000_000):
    c = xb[i0:i0+1_000_000]
    c16 = c.astype(ml_dtypes.bfloat16).astype(np.float64)
    n_pre = (c.astype(np.float64)**2).sum(1)
    s = 2.0 * xq64 @ c16.T - n_pre[None, :]
    part = np.argpartition(-s, K-1, axis=1)[:, :K]
    ps = np.take_along_axis(s, part, axis=1)
    cs = np.concatenate([best_s, ps], 1); ci = np.concatenate([best_i, part+i0], 1)
    sel = np.argsort(-cs, axis=1, kind="stable")[:, :K]
    best_s = np.take_along_axis(cs, sel, 1); best_i = np.take_along_axis(ci, sel, 1)
print(f"bf16 scan {time.time()-t0:.0f}s", flush=True)
r = recall_at_k(best_i, oracle)
print(f"FLAT bf16-scored recall@10 at 10M mixture: {r:.4f}", flush=True)
