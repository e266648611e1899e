"""Round-4d: on-device IVF search time on the chunk-paged pool layout
(VERDICT r3 #1 — the BENCHMARKS table row source).

Slope-measures the jitted IVF search program head-to-head with the flat
fused program IN ONE PROCESS (CLAUDE.md: isolated micro-benchmarks and
second processes both corrupt numbers), on the REAL skewed 1M mixture
(k-means nlist=1024: max list 9263 at mean 977).

Variants:
  FLAT   flat fused bf16 (control — the 0.52 ms headline program)
  P      coarse probe only (GEMM + top-nprobe)
  B np{1,4,16}     bf16 nlist=1024, Pallas fine scan
  DENSE  nprobe == nlist -> pool sweep (the paged layout's exhaustive path)
  I np4  int8 nlist=1024 (1 B/elem gather)
  B4k np{4,16}     bf16 nlist=4096 (smaller lists, smaller budgets)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

import faiss_tpu
from faiss_tpu import ivf as ivf_mod
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import distance as dist_ops
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import _round_up

NV = int(os.environ.get("FT_NV", 1_000_000))
NLIST = int(os.environ.get("FT_NLIST", 1024))
NLIST2 = int(os.environ.get("FT_NLIST2", 4096))  # 0 = skip second nlist
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
    xb = (cents[comp] + rng.standard_normal((NV, D))).astype(np.float32)
    qcomp = rng.integers(0, ncomp, NQ)
    q = (cents[qcomp] + rng.standard_normal((NQ, D))).astype(np.float32)
    sub = xb[np.random.default_rng(3).choice(NV, 262_144, replace=False)]

    def build_index(nlist, storage):
        t0 = time.time()
        idx = faiss_tpu.TpuIndexIVFFlat(D, nlist, storage=storage, nprobe=1,
                                        train_niter=10, seed=7)
        idx.train(sub)
        for i0 in range(0, NV, 1_000_000):  # bound the device-side quantize
            idx.add(xb[i0:i0 + 1_000_000])
        print(f"built {storage}/nlist={nlist} ({time.time()-t0:.0f}s) "
              f"{idx.describe()}", flush=True)
        return idx

    idx16 = build_index(NLIST, "bf16")
    sizes = idx16.list_sizes()
    print(f"list sizes: max {sizes.max()}, p99 {np.percentile(sizes, 99):.0f}"
          f", mean {sizes.mean():.0f}, p50 {np.percentile(sizes, 50):.0f}",
          flush=True)
    idx8 = build_index(NLIST, "int8")
    idx4k = build_index(NLIST2, "bf16") if NLIST2 else None

    nq_pad = max(ivf_mod._QB, _round_up(NQ, ivf_mod._QB))
    d_pad = idx16.d_pad
    qp = np.zeros((nq_pad, d_pad), np.float32)
    qp[:NQ, :D] = q
    qp = jnp.asarray(qp)

    def arrs_of(idx):
        return (idx._data, idx._norms, idx._counts_dev, idx._ids,
                idx._ctable, idx._cents, idx._cnorms)

    def build_fn(idx, nprobe, kind):
        nb = ivf_mod._chunk_budget(idx._counts, min(nprobe, idx.nlist),
                                   ivf_mod._CHUNK)
        # mirror _search_device's dispatch: nprobe==nlist rides the flat
        # fused program over the pool prefix when eligible (r5 — the first
        # r4d2 DENSE row measured the bypassed XLA sweep at 16.9 ms)
        nsweep = (ivf_mod._round_budget(idx._used_chunks) * ivf_mod._CHUNK
                  if nprobe >= idx.nlist else 0)
        dense_fused = bool(nsweep) and idx._dense_fused_ok(nsweep)
        f = ivf_mod._build_ivf_search_fn(
            nlist=idx.nlist, nprobe=nprobe, nq_pad=nq_pad, k=K,
            d_pad=d_pad, metric=MetricType.L2, kind=kind, nbudget=nb,
            nsweep=nsweep, dense_fused=dense_fused)
        print(f"  {kind}/nlist={idx.nlist} nprobe={nprobe} budget={nb} "
              f"ncand={nb * ivf_mod._CHUNK} dense_fused={dense_fused}",
              flush=True)
        sc = idx._scales
        inorm = idx._int8_qn
        if dense_fused:
            return lambda *a: f(*a, None, sc, inorm)[:2]
        if kind == "int8":
            return lambda *a: f(*a, None, sc)
        return f

    def probe_only(data, norms, counts, ids, ctable, cents_, cnorms_, qq):
        cs = dist_ops.matmul_scores(qq, cents_, cnorms_, MetricType.L2)
        return jax.lax.top_k(cs, 4)

    # flat fused control on the same data (bf16, single-pass sweep)
    NV_EFF = ((NV + pf.DIRECT_BV - 1) // pf.DIRECT_BV) * pf.DIRECT_BV
    xg = np.zeros((NV_EFF, D), np.float32)
    xg[:NV] = xb
    vn_flat = jnp.asarray((xg ** 2).sum(1).astype(np.float32))
    db16 = jnp.asarray(xg).astype(jnp.bfloat16)
    del xg
    nt = jnp.int32(NV)

    def flat_fn(db, vn, qq):
        v_, i_, c_ = pf.fused_search(qq, db, vn, nt, k=K,
                                     metric=MetricType.L2, nv_eff=NV_EFF,
                                     sweep_passes=1)
        return v_, i_

    specs = [
        ("FLAT  bf16 fused control", flat_fn, (db16, vn_flat)),
        ("P     probe only", probe_only, arrs_of(idx16)),
        (f"B1    bf16 {NLIST} np1", build_fn(idx16, 1, "bf16"),
         arrs_of(idx16)),
        (f"B4    bf16 {NLIST} np4", build_fn(idx16, 4, "bf16"),
         arrs_of(idx16)),
        (f"B16   bf16 {NLIST} np16", build_fn(idx16, 16, "bf16"),
         arrs_of(idx16)),
        (f"DENSE bf16 {NLIST} np=nlist", build_fn(idx16, NLIST, "bf16"),
         arrs_of(idx16)),
        (f"I4    int8 {NLIST} np4", build_fn(idx8, 4, "int8"),
         arrs_of(idx8)),
    ]
    if idx4k is not None:
        specs += [
            (f"C4    bf16 {NLIST2} np4", build_fn(idx4k, 4, "bf16"),
             arrs_of(idx4k)),
            (f"C16   bf16 {NLIST2} np16", build_fn(idx4k, 16, "bf16"),
             arrs_of(idx4k)),
        ]
    variants = {}
    for name, f, arrs in specs:
        t0 = time.time()
        try:
            r1, r2 = chain(N1, f), chain(N2, f)
            _ = np.asarray(r1(jnp.float32(0.0), qp, *arrs))
            _ = np.asarray(r2(jnp.float32(0.0), qp, *arrs))
            print(f"compiled {name} ({time.time()-t0:.1f}s)", flush=True)
            variants[name] = (r1, r2, arrs)
        except Exception as e:
            print(f"FAILED {name}: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
    res = {n: [] for n in variants}
    for rep in range(REPS):
        for n, (r1, r2, arrs) in variants.items():
            t0 = time.perf_counter()
            _ = np.asarray(r1(jnp.float32(0.0), qp, *arrs))
            t1 = time.perf_counter()
            _ = np.asarray(r2(jnp.float32(0.0), qp, *arrs))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
        print(f"rep {rep} done", flush=True)
    print(f"== on-device ms/batch (nq={NQ}, k={K}, 1M mixture, paged pool)"
          f" ==", flush=True)
    for n in variants:
        ts = sorted(res[n])
        print(f"{n}: median {ts[len(ts)//2]*1e3:.3f} ms "
              f"(min {min(ts)*1e3:.3f} max {max(ts)*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
