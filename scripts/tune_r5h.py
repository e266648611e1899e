"""r5h: localize the 50M serial anomaly (r5d: 234 ms/batch device time for
a 6.4 GB int8 sweep whose 14M-scaled expectation is ~30 ms).

One 50M int8 database; the SAME program measured at nv_eff = {12.5M, 25M,
50M} (the array always passes WHOLE — grid + nv_eff restrict coverage,
CLAUDE.md) x stages {S sweep-only, ST +phase-2 top-groups, F full fused
search}. If ms/row is flat in nv, the cost is per-row (bandwidth class);
if it bends upward, the culprit is whichever stage bends.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

import faiss_tpu
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

NV, D, NQ, K = 50_000_000, 128, 100, 10
BATCH = 1_000_000
M = MetricType.L2
N1, N2 = 2, 6
REPS = 6


def chain(n, body):
    @jax.jit
    def run(x, q, *arrs):
        def step(c, _):
            return body(q + (x + c), *arrs) * 1e-20, 0.0
        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return c
    return run


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    rng = np.random.default_rng(42)
    xq = rng.integers(0, 256, (NQ, D)).astype(np.float32)

    idx = faiss_tpu.TpuIndexFlat(D, metric="l2", storage="int8")
    cap = ((NV + pf.DIRECT_BV - 1) // pf.DIRECT_BV) * pf.DIRECT_BV
    idx.store._ensure_capacity(cap, exact=True)
    t0 = time.time()
    for b in range(NV // BATCH):
        idx.add(rng.integers(0, 256, (BATCH, D)).astype(np.float32))
    print(f"add {time.time()-t0:.0f}s; cap {idx.store.capacity}", flush=True)

    db = idx.store.db
    vn = idx.store.norms
    scales = idx.store.scales
    inorm = idx.store.int_norm_max
    qp, nq, nq_pad = idx._prep_queries(xq)
    qd = jnp.asarray(qp)

    sizes = [cap // 4, cap // 2, cap]
    for s in sizes:
        assert s % pf.DIRECT_BV == 0, s

    def sweep_at(nv_eff):
        nt = jnp.int32(nv_eff)

        def body(qq, db_, vn_, sc_):
            g = pf.groupmax_scores(qq, db_, vn_, nt, None, metric=M,
                                   nv_eff=nv_eff, sweep_passes=2,
                                   scales=sc_)
            return jnp.sum(g)
        return body

    def sweep_top_at(nv_eff):
        nt = jnp.int32(nv_eff)
        ng = nv_eff // pf.GROUP
        kg = min(K + pf.GROUP_PAD, ng)

        def body(qq, db_, vn_, sc_):
            g = pf.groupmax_scores(qq, db_, vn_, nt, None, metric=M,
                                   nv_eff=nv_eff, sweep_passes=2,
                                   scales=sc_)
            gidx, t = pf._top_groups(g, kg, ng)
            return (jnp.sum(jnp.sort(gidx, axis=-1).astype(jnp.float32))
                    + jnp.sum(t))
        return body

    def full_at(nv_eff):
        nt = jnp.int32(nv_eff)

        def body(qq, db_, vn_, sc_):
            v_, i_, c_ = pf.fused_search(
                qq, db_, vn_, nt, k=K, metric=M, nv_eff=nv_eff,
                scales=sc_, int_norm_max=inorm)
            return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                    + jnp.sum(c_.astype(jnp.float32)))
        return body

    A = (db, vn, scales)
    specs = []
    for s in sizes:
        mm = s // 1_000_000
        specs += [(f"S{mm:02d}M", sweep_at(s)),
                  (f"T{mm:02d}M", sweep_top_at(s)),
                  (f"F{mm:02d}M", full_at(s))]
    fns = {}
    for name, body in specs:
        t0 = time.time()
        try:
            c1, c2 = chain(N1, body), chain(N2, body)
            np.asarray(c1(jnp.float32(0.0), qd, *A))
            np.asarray(c2(jnp.float32(0.0), qd, *A))
            fns[name] = (c1, c2)
            print(f"compiled {name} ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"FAILED {name}: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    times = {n: [] for n in fns}
    for rep in range(REPS):
        for name, (c1, c2) in fns.items():
            t0 = time.perf_counter()
            np.asarray(c1(jnp.float32(rep), qd, *A))
            t1 = time.perf_counter()
            np.asarray(c2(jnp.float32(rep), qd, *A))
            t2 = time.perf_counter()
            times[name].append(((t2 - t1) - (t1 - t0)) / (N2 - N1) * 1e3)
        print(f"rep {rep} done", flush=True)
    print(f"== on-device ms/batch (nq={NQ}, k={K}, int8, L2) ==", flush=True)
    for name in times:
        v = np.asarray(times[name])
        print(f"{name}: median {np.median(v):8.2f} ms "
              f"(min {v.min():8.2f} max {v.max():8.2f})", flush=True)


if __name__ == "__main__":
    main()
