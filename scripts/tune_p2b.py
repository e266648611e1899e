"""Low-noise re-measure of sweep vs sweep+phase2 vs e2e (real TPU).

N1=8 / N2=88 scan chains: one RPC pays for 80 on-device iterations, so the
slope noise is ~10x smaller than the N1=4/N2=24 harness (which produced
non-monotonic medians and negative mins through the tunnel).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

NV, D, NQ, K = 1_000_000, 128, 104, 10
M = MetricType.L2
N1, N2 = 8, 88


def mk(n, body):
    @jax.jit
    def run(x, *arrs):
        def step(c, _):
            return body(x + c, *arrs) * 1e-20, 0.0
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
    db = jnp.asarray(xb).astype(jnp.bfloat16)
    vn = jnp.asarray((xb ** 2).sum(1).astype(np.float32))
    nt = jnp.int32(NV)
    ngroups = nv_eff // pf.GROUP
    kg = min(K + pf.GROUP_PAD, ngroups)

    def sweep(x, qq, dbx, vnx):
        gm = pf.groupmax_scores(qq + x, dbx, vnx, nt, None, metric=M,
                                nv_eff=nv_eff, sweep_passes=1)
        return jnp.sum(gm)

    def sweep_p2(x, qq, dbx, vnx):
        gm = pf.groupmax_scores(qq + x, dbx, vnx, nt, None, metric=M,
                                nv_eff=nv_eff, sweep_passes=1)
        gidx, t = pf._top_groups(gm, kg, ngroups)
        gidx = jnp.sort(gidx, axis=-1)
        return jnp.sum(gidx.astype(jnp.float32)) + jnp.sum(t)

    def sweep_p2_resc(x, qq, dbx, vnx):
        gm = pf.groupmax_scores(qq + x, dbx, vnx, nt, None, metric=M,
                                nv_eff=nv_eff, sweep_passes=1)
        gidx, t = pf._top_groups(gm, kg, ngroups)
        gidx = jnp.sort(gidx, axis=-1)
        s = pf.rescore_groups_pallas(qq + x, dbx, vnx, gidx, nt,
                                     metric=M, nv_eff=nv_eff)
        return jnp.sum(s) + jnp.sum(t)

    def e2e(x, qq, dbx, vnx):
        v, i, c = pf.fused_search(qq + x, dbx, vnx, nt, k=K, metric=M,
                                  nv_eff=nv_eff, sweep_passes=1)
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    cfgs = {"A sweep": sweep, "B +topg": sweep_p2,
            "C +rescore": sweep_p2_resc, "E full": e2e}
    arrs = (q, db, vn)
    built = {}
    for n, b in cfgs.items():
        r1, r2 = mk(N1, b), mk(N2, b)
        _ = np.asarray(r1(jnp.float32(0.0), *arrs))
        _ = np.asarray(r2(jnp.float32(0.0), *arrs))
        built[n] = (r1, r2)
        print("compiled", n, flush=True)
    res = {n: [] for n in built}
    for rep in range(8):
        for n, (r1, r2) in built.items():
            t0 = time.perf_counter()
            _ = np.asarray(r1(jnp.float32(0.0), *arrs))
            t1 = time.perf_counter()
            _ = np.asarray(r2(jnp.float32(0.0), *arrs))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
    for n in built:
        ts = sorted(res[n])
        print(f"{n}: {ts[len(ts)//2]*1e3:.3f} ms (min {min(ts)*1e3:.3f} "
              f"max {max(ts)*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
