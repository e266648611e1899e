"""r5k: the 5x bar, int8 edition (10M, nlist=4096).

r5j found the fine scan latency-floor-bound (~0.7-0.9 ms at 10M
regardless of 24-vs-40-chunk budgets) — so the storage that halves the
FLAT sweep's competitor bytes changes nothing for IVF but doubles the
ratio target: int8's flat control is ~5.7 ms (r5h F12M 7.07 scaled) and
its recall ceiling is HIGHER than bf16's (0.9144 vs 0.9000 at this
mixture, ivf10m_v4.log). Slope-measures FLAT-int8 (true control, raw
fused program on a real int8 flat index) vs IVF-int8 np1/np2/np4
head-to-head; recall per nprobe through the production path.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

import faiss_tpu
from faiss_tpu import ivf as ivf_mod
from faiss_tpu import SearchParams
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

NV, NLIST = 10_000_000, 4096
D, NQ, K = 128, 104, 10
N1, N2 = 4, 24
REPS = 8


def chain(n, fn):
    @jax.jit
    def run(x, q, *arrs):
        def step(c, _):
            d_, i_ = fn(*arrs, q + (x + c))
            return (jnp.sum(d_) + jnp.sum(i_.astype(jnp.float32))) * 1e-20, 0.
        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return c
    return run


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    from scripts.bench_ivf_r4 import exact_oracle, recall_at_k

    rng = np.random.default_rng(42)
    ncomp = 4096
    cents = (5.0 * rng.standard_normal((ncomp, D))).astype(np.float32)
    comp = rng.integers(0, ncomp, NV)
    xb = (cents[comp] + rng.standard_normal((NV, D), dtype=np.float32))
    qcomp = rng.integers(0, ncomp, NQ)
    q = (cents[qcomp] + rng.standard_normal((NQ, D), dtype=np.float32))
    sub = xb[np.random.default_rng(3).choice(NV, 262_144, replace=False)]
    t0 = time.time()
    oracle = exact_oracle(xb, q, K)
    print(f"oracle ({time.time()-t0:.0f}s)", flush=True)

    # true flat int8 control
    t0 = time.time()
    flat = faiss_tpu.TpuIndexFlat(D, storage="int8")
    cap = ((NV + pf.DIRECT_BV - 1) // pf.DIRECT_BV) * pf.DIRECT_BV
    flat.store._ensure_capacity(cap, exact=True)
    for i0 in range(0, NV, 1_000_000):
        flat.add(xb[i0:i0 + 1_000_000])
    Df, If_ = flat.search(q, K)
    rf = recall_at_k(If_, oracle)
    print(f"flat int8 built ({time.time()-t0:.0f}s) recall@10 {rf:.4f}",
          flush=True)

    t0 = time.time()
    idx = faiss_tpu.TpuIndexIVFFlat(D, NLIST, storage="int8", nprobe=1,
                                    seed=1234)
    idx.train(sub)
    for i0 in range(0, NV, 1_000_000):
        idx.add(xb[i0:i0 + 1_000_000])
    print(f"ivf built ({time.time()-t0:.0f}s) {idx.describe()}", flush=True)
    for nprobe in (1, 2, 4):
        D_, I_ = idx.search(q, K, params=SearchParams(nprobe=nprobe))
        r = recall_at_k(I_, oracle)
        print(f"recall@10 np{nprobe}: {r:.4f} ({r/rf:.4f} of flat)",
              flush=True)
    del xb

    from faiss_tpu.storage import _round_up
    nq_pad = _round_up(NQ, 8)
    qp = np.zeros((nq_pad, idx.d_pad), np.float32)
    qp[:NQ, :D] = q
    qp = jnp.asarray(qp)
    nv_eff = _round_up(NV, pf.DIRECT_BV)
    fl_scales, fl_inorm = flat.store.scales, flat.store.int_norm_max

    def flat_fn(db, vn, qq):
        v_, i_, _ = pf.fused_search(qq, db, vn, jnp.int32(NV), k=K,
                                    metric=MetricType.L2, nv_eff=nv_eff,
                                    scales=fl_scales, int_norm_max=fl_inorm)
        return v_, i_

    ivf_arrs = (idx._data, idx._norms, idx._counts_dev, idx._ids,
                idx._ctable, idx._cents, idx._cnorms)
    sc = idx._scales

    def build_fn(nprobe):
        nb = ivf_mod._chunk_budget(idx._counts, nprobe, ivf_mod._CHUNK)
        f = ivf_mod._build_ivf_search_fn(
            nlist=idx.nlist, nprobe=nprobe, nq_pad=nq_pad, k=K,
            d_pad=idx.d_pad, metric=MetricType.L2, kind="int8", nbudget=nb)
        print(f"  np{nprobe} budget={nb}", flush=True)
        return lambda *a: f(*a, None, sc)

    specs = [("FLAT int8 fused control", flat_fn,
              (flat.store.db, flat.store.norms))]
    for nprobe in (1, 2, 4):
        specs.append((f"I{nprobe} int8 np{nprobe}", build_fn(nprobe),
                      ivf_arrs))
    fns = {}
    for name, f, arrs in specs:
        t0 = time.time()
        try:
            c1, c2 = chain(N1, f), chain(N2, f)
            np.asarray(c1(jnp.float32(0.0), qp, *arrs))
            np.asarray(c2(jnp.float32(0.0), qp, *arrs))
            fns[name] = (c1, c2, arrs)
            print(f"compiled {name} ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"FAILED {name}: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    times = {n: [] for n in fns}
    for rep in range(REPS):
        for name, (c1, c2, arrs) in fns.items():
            t0 = time.perf_counter()
            np.asarray(c1(jnp.float32(rep), qp, *arrs))
            t1 = time.perf_counter()
            np.asarray(c2(jnp.float32(rep), qp, *arrs))
            t2 = time.perf_counter()
            times[name].append(((t2 - t1) - (t1 - t0)) / (N2 - N1) * 1e3)
        print(f"rep {rep} done", flush=True)
    print(f"== on-device ms/batch (nq={NQ}, k={K}, 10M, int8, "
          f"nlist={NLIST}) ==", flush=True)
    for name in times:
        v = np.asarray(times[name])
        print(f"{name}: median {np.median(v):7.3f} ms "
              f"(min {v.min():7.3f} max {v.max():7.3f})", flush=True)


if __name__ == "__main__":
    main()
