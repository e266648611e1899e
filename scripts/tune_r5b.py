"""Round-5b: f32 IVF fine scan on the Pallas scalar-prefetch gather kernel
(VERDICT r4 task #5 — the XLA chunk-take it replaces measured 2-13 GB/s,
r4c.log).

Slope-measures the f32 IVF search program head-to-head with the bf16 one
IN ONE PROCESS on the real skewed 1M mixture. f32 rows move 4x bf16's
gather bytes, so ~4x the bf16 fine-scan time is the honest roofline
target. Also checks exactness on-device: IVF f32 results vs a float64
numpy oracle probing the SAME lists (fp32-true arithmetic: the kernel's
in-register 3-way split — set equality at k=10 on 16 sample queries).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

import faiss_tpu
from faiss_tpu import ivf as ivf_mod
from faiss_tpu.dtypes import MetricType
from faiss_tpu.storage import _round_up

NV = int(os.environ.get("FT_NV", 1_000_000))
NLIST = int(os.environ.get("FT_NLIST", 1024))
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

    def build_index(storage):
        t0 = time.time()
        idx = faiss_tpu.TpuIndexIVFFlat(D, NLIST, storage=storage, nprobe=4,
                                        train_niter=10, seed=7)
        idx.train(sub)
        for i0 in range(0, NV, 1_000_000):
            idx.add(xb[i0:i0 + 1_000_000])
        print(f"built {storage} ({time.time()-t0:.0f}s) {idx.describe()}",
              flush=True)
        return idx

    idx32 = build_index("f32")
    idx16 = build_index("bf16")

    # on-device exactness first (f32 arithmetic class: fp32-true 3-way
    # split; oracle probes the SAME lists via the index's own centroids)
    nq_chk = 16
    Dd, Ii = idx32.search(q[:nq_chk], K)
    assign = idx32._chunk_list[idx32._slot_of // ivf_mod._CHUNK]
    cents_np = np.asarray(jax.device_get(idx32._cents))[:NLIST, :D]
    cq = ((q[:nq_chk, None, :].astype(np.float64)
           - cents_np[None].astype(np.float64)) ** 2).sum(-1)
    probe = np.argsort(cq, axis=1, kind="stable")[:, :4]
    bad = 0
    for qi in range(nq_chk):
        cand = np.nonzero(np.isin(assign, probe[qi]))[0]
        d2 = ((q[qi].astype(np.float64) - xb[cand].astype(np.float64)) ** 2
              ).sum(-1)
        want = set(cand[np.argsort(d2, kind="stable")[:K]].tolist())
        if set(Ii[qi].tolist()) != want:
            bad += 1
            print(f"  query {qi}: got {sorted(Ii[qi].tolist())[:5]}... "
                  f"want {sorted(want)[:5]}...", flush=True)
    print(f"exactness: {nq_chk - bad}/{nq_chk} queries match the f64 "
          f"same-probe oracle exactly", flush=True)

    nq_pad = max(ivf_mod._QB, _round_up(NQ, ivf_mod._QB))
    qp = np.zeros((nq_pad, idx32.d_pad), np.float32)
    qp[:NQ, :D] = q
    qp = jnp.asarray(qp)

    def arrs_of(idx):
        return (idx._data, idx._norms, idx._counts_dev, idx._ids,
                idx._ctable, idx._cents, idx._cnorms)

    def build_fn(idx, nprobe, kind):
        nb = ivf_mod._chunk_budget(idx._counts, min(nprobe, idx.nlist),
                                   ivf_mod._CHUNK)
        f = ivf_mod._build_ivf_search_fn(
            nlist=idx.nlist, nprobe=nprobe, nq_pad=nq_pad, k=K,
            d_pad=idx.d_pad, metric=MetricType.L2, kind=kind, nbudget=nb)
        gb = nb * ivf_mod._CHUNK * idx.d_pad * (4 if kind == "f32" else 2)
        print(f"  {kind} np{nprobe}: budget={nb} gather "
              f"{gb * nq_pad >> 20} MB/batch -> roofline "
              f"{gb * nq_pad / 911e9 * 1e3:.3f} ms", flush=True)
        return f

    specs = [
        ("F1   f32 np1", build_fn(idx32, 1, "f32"), arrs_of(idx32)),
        ("F4   f32 np4", build_fn(idx32, 4, "f32"), arrs_of(idx32)),
        ("F16  f32 np16", build_fn(idx32, 16, "f32"), arrs_of(idx32)),
        ("B4   bf16 np4 (control)", build_fn(idx16, 4, "bf16"),
         arrs_of(idx16)),
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
    print(f"== on-device ms/batch (nq={NQ}, k={K}, 1M mixture, "
          f"nlist={NLIST}) ==", flush=True)
    for n in variants:
        ts = sorted(res[n])
        print(f"{n}: median {ts[len(ts)//2]*1e3:.3f} ms "
              f"(min {min(ts)*1e3:.3f} max {max(ts)*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
