"""r5j: the 5x-vs-flat close — nlist=8192 at 10M (half the per-probe
budget of nlist=4096; r5i showed rank depth is NOT the lever: the fine
scan is ~150 GB/s DMA-latency-bound per 32 KB chunk, so fewer candidate
chunks is). Slope-measured with the flat bf16 control IN-PROCESS, plus
recall@10 vs the f64 oracle at each nprobe (the QPS-grid bench is
tunnel-bound; recall comes cheap here).
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

NV, NLIST = 10_000_000, 8192
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

    t0 = time.time()
    idx = faiss_tpu.TpuIndexIVFFlat(D, NLIST, storage="bf16", nprobe=1,
                                    seed=1234)
    idx.train(sub)
    for i0 in range(0, NV, 1_000_000):
        idx.add(xb[i0:i0 + 1_000_000])
    ls = idx.list_sizes()
    print(f"built ({time.time()-t0:.0f}s) {idx.describe()}", flush=True)
    print(f"list sizes: max {ls.max()} p99 {int(np.percentile(ls, 99))} "
          f"mean {int(ls.mean())}", flush=True)

    # recall per nprobe through the real search path
    for nprobe in (1, 2, 4):
        D_, I_ = idx.search(q, K, params=SearchParams(nprobe=nprobe))
        print(f"recall@10 np{nprobe}: "
              f"{recall_at_k(I_, oracle):.4f}", flush=True)
    del xb

    # flat bf16 control on the ORIGINAL rows, in-process
    from faiss_tpu.storage import _round_up
    nq_pad = _round_up(NQ, 8)
    qp = np.zeros((nq_pad, idx.d_pad), np.float32)
    qp[:NQ, :D] = q
    qp = jnp.asarray(qp)
    arrs = (idx._data, idx._norms, idx._counts_dev, idx._ids,
            idx._ctable, idx._cents, idx._cnorms)

    nv_eff_flat = _round_up(NV, pf.DIRECT_BV)

    def build_fn(nprobe):
        nb = ivf_mod._chunk_budget(idx._counts, nprobe, ivf_mod._CHUNK)
        f = ivf_mod._build_ivf_search_fn(
            nlist=idx.nlist, nprobe=nprobe, nq_pad=nq_pad, k=K,
            d_pad=idx.d_pad, metric=MetricType.L2, kind="bf16", nbudget=nb)
        print(f"  np{nprobe} budget={nb}", flush=True)
        return f

    # flat sweeps the POOL PREFIX (quantized rows, same bytes class as the
    # production flat index at 10M; r4d_10m's true flat control measured
    # 3.945 ms on the raw rows — quote both)
    nslots = ivf_mod._round_budget(idx._used_chunks) * ivf_mod._CHUNK

    def flat_fn(data, norms, counts, ids, ctable, cents_, cnorms_, qq):
        v_, i_, _ = pf.fused_search(
            qq, data, norms, jnp.int32(nslots), k=K, metric=MetricType.L2,
            nv_eff=nslots, sweep_passes=1, sel=ids >= 0)
        return v_, i_

    specs = [("FLATP pool-prefix sweep", flat_fn)]
    for nprobe in (1, 2, 4):
        specs.append((f"B{nprobe} bf16 np{nprobe}", build_fn(nprobe)))
    fns = {}
    for name, f in specs:
        t0 = time.time()
        try:
            c1, c2 = chain(N1, f), chain(N2, f)
            np.asarray(c1(jnp.float32(0.0), qp, *arrs))
            np.asarray(c2(jnp.float32(0.0), qp, *arrs))
            fns[name] = (c1, c2)
            print(f"compiled {name} ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"FAILED {name}: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    times = {n: [] for n in fns}
    for rep in range(REPS):
        for name, (c1, c2) in fns.items():
            t0 = time.perf_counter()
            np.asarray(c1(jnp.float32(rep), qp, *arrs))
            t1 = time.perf_counter()
            np.asarray(c2(jnp.float32(rep), qp, *arrs))
            t2 = time.perf_counter()
            times[name].append(((t2 - t1) - (t1 - t0)) / (N2 - N1) * 1e3)
        print(f"rep {rep} done", flush=True)
    print(f"== on-device ms/batch (nq={NQ}, k={K}, 10M, bf16, "
          f"nlist={NLIST}) ==  [r4d_10m true-flat control: 3.945 ms]",
          flush=True)
    for name in times:
        v = np.asarray(times[name])
        print(f"{name}: median {np.median(v):7.3f} ms "
              f"(min {v.min():7.3f} max {v.max():7.3f})", flush=True)


if __name__ == "__main__":
    main()
