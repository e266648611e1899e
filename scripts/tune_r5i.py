"""r5i: fine-scan rank-depth A/B at 10M (the 5x-vs-flat lever).

r4d_10m: np1 = 1.03 ms against a 0.15 ms gather roofline — with 13
query-stripes x (nbudget/rj) grid steps, the ~15 us/step fixed cost
dominates at rj=8 (65 steps at np1). Deeper rj cuts steps linearly;
VMEM per step grows as rj x 256 KB (8 queries x one 32 KB chunk each,
double-buffered). Variants patch ivf._SCAN_RANKS (read at trace time)
and slope-measure np1/np4 head-to-head, flat control in-process.
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
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

NV = int(os.environ.get("FT_NV", 10_000_000))
NLIST = int(os.environ.get("FT_NLIST", 4096))
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
    rng = np.random.default_rng(42)
    ncomp = 4096
    cents = (5.0 * rng.standard_normal((ncomp, D))).astype(np.float32)
    comp = rng.integers(0, ncomp, NV)
    xb = (cents[comp] + rng.standard_normal((NV, D), dtype=np.float32))
    qcomp = rng.integers(0, ncomp, NQ)
    q = (cents[qcomp] + rng.standard_normal((NQ, D), dtype=np.float32))
    sub = xb[np.random.default_rng(3).choice(NV, 262_144, replace=False)]

    t0 = time.time()
    idx = faiss_tpu.TpuIndexIVFFlat(D, NLIST, storage="bf16", nprobe=1,
                                    seed=1234)
    idx.train(sub)
    for i0 in range(0, NV, 1_000_000):
        idx.add(xb[i0:i0 + 1_000_000])
    print(f"built ({time.time()-t0:.0f}s) {idx.describe()}", flush=True)
    del xb

    from faiss_tpu.storage import _round_up
    nq_pad = _round_up(NQ, 8)
    d_pad = idx.d_pad
    qp = np.zeros((nq_pad, d_pad), np.float32)
    qp[:NQ, :D] = q
    qp = jnp.asarray(qp)
    arrs = (idx._data, idx._norms, idx._counts_dev, idx._ids,
            idx._ctable, idx._cents, idx._cnorms)

    def build_fn(nprobe):
        nb = ivf_mod._chunk_budget(idx._counts, nprobe, ivf_mod._CHUNK)
        f = ivf_mod._build_ivf_search_fn(
            nlist=idx.nlist, nprobe=nprobe, nq_pad=nq_pad, k=K,
            d_pad=d_pad, metric=MetricType.L2, kind="bf16", nbudget=nb)
        print(f"  np{nprobe} budget={nb}", flush=True)
        return f

    # flat control cross-reference: the r4d_10m flat row (3.945 ms, same
    # data/process class). NOTE: _SCAN_RANKS is read at TRACE time inside
    # the fine scan, so each variant patches it across its chain compile
    # (the fn itself is rebuilt per variant so nothing is cached stale).
    specs = []
    for nprobe in (1, 4):
        for rj in (8, 16, 20, 40):
            specs.append((f"np{nprobe}/rj{rj}", nprobe, rj))
    fns = {}
    for name, nprobe, rj in specs:
        t0 = time.time()
        old = ivf_mod._SCAN_RANKS
        ivf_mod._SCAN_RANKS = rj
        try:
            f = build_fn(nprobe)
            c1, c2 = chain(N1, f), chain(N2, f)
            np.asarray(c1(jnp.float32(0.0), qp, *arrs))
            np.asarray(c2(jnp.float32(0.0), qp, *arrs))
            fns[name] = (c1, c2)
            print(f"compiled {name} ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"FAILED {name}: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        finally:
            ivf_mod._SCAN_RANKS = old
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
    print(f"== on-device ms/batch (nq={NQ}, k={K}, {NV} rows, bf16, "
          f"nlist={NLIST}) ==", flush=True)
    for name in times:
        v = np.asarray(times[name])
        print(f"{name}: median {np.median(v):7.3f} ms "
              f"(min {v.min():7.3f} max {v.max():7.3f})", flush=True)


if __name__ == "__main__":
    main()
