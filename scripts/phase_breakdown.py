"""Phase breakdown of the fused path at the headline shape (real TPU).

Slope-measured, head-to-head in ONE process with interleaved reps
(CLAUDE.md). Every phase's outputs are consumed so XLA can't DCE the cone.
Phases (bf16 1M x 128, nq=104, k=10):
  sweep      phase 1 only (group-max Pallas sweep)
  +topg      + phase 2 (_top_groups + sort)
  +rescore   + phase 3 (scalar-prefetch rescore kernel)
  full       fused_search (all phases + final top_k + certificate)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

NV, D, NQ, K = 1_000_000, 128, 104, 10
M = MetricType.L2


def mk(n, body):
    @jax.jit
    def run(q, *arrs):
        def step(c, _):
            return body(q + c, *arrs) * 1e-20, 0.0
        c, _ = jax.lax.scan(step, 0.0, None, length=n)
        return c
    return run


def main():
    assert jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(42)
    nv_eff = 1_000_448
    xb = np.pad(rng.standard_normal((NV, D), dtype=np.float32),
                ((0, nv_eff - NV), (0, 0)))
    q = jnp.asarray(rng.standard_normal((NQ, D), dtype=np.float32))
    db16 = jnp.asarray(xb).astype(jnp.bfloat16)
    normsj = jnp.asarray((xb ** 2).sum(1).astype(np.float32))
    nt = jnp.int32(NV)
    ngroups = nv_eff // pf.GROUP
    kg = min(K + pf.GROUP_PAD, ngroups)
    if False:
        kg += 1

    def sweep(qq, db, vn):
        gm = pf.groupmax_scores(qq, db, vn, nt, None, metric=M, nv_eff=nv_eff)
        return jnp.sum(gm)

    def topg(qq, db, vn):
        gm = pf.groupmax_scores(qq, db, vn, nt, None, metric=M, nv_eff=nv_eff)
        gidx, t = pf._top_groups(gm, kg, ngroups)
        gidx = jnp.sort(gidx, axis=-1)
        return jnp.sum(gidx.astype(jnp.float32)) + jnp.sum(t)

    def resc(qq, db, vn):
        gm = pf.groupmax_scores(qq, db, vn, nt, None, metric=M, nv_eff=nv_eff)
        gidx, t = pf._top_groups(gm, kg, ngroups)
        gidx = jnp.sort(gidx, axis=-1)
        s = pf.rescore_groups_pallas(qq, db, vn, gidx, nt,
                                     metric=M, nv_eff=nv_eff)
        return jnp.sum(s) + jnp.sum(t)

    def full(qq, db, vn):
        v, i, c = pf.fused_search(qq, db, vn, nt, k=K, metric=M,
                                  nv_eff=nv_eff)
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    cfgs = {"sweep": sweep, "+topg": topg, "+rescore": resc, "full": full}
    args = (q, db16, normsj)
    N1, N2 = 4, 104  # 100-iteration delta: signal >> tunnel RPC jitter
    rs = {n: (mk(N1, b), mk(N2, b)) for n, b in cfgs.items()}
    for n, (r1, r2) in rs.items():
        _ = np.asarray(r1(*args)); _ = np.asarray(r2(*args))
        print("compiled", n, flush=True)
    res = {n: [] for n in rs}
    for rep in range(6):
        for n, (r1, r2) in rs.items():
            t0 = time.perf_counter(); _ = np.asarray(r1(*args))
            t1 = time.perf_counter(); _ = np.asarray(r2(*args))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
    prev = 0.0
    for n in cfgs:
        ts = sorted(res[n])
        t = ts[len(ts) // 2] * 1e3  # median: min lands on favorable jitter
        print(f"{n}: {t:.3f} ms/batch (delta {t - prev:+.3f}, "
              f"min {min(ts)*1e3:.3f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
