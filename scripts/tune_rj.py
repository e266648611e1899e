"""Rescore ranks-per-step (8 vs 16 in-flight gather DMAs) + e2e (real TPU)."""
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
    kg = 14

    @jax.jit
    def prep(qq, dbx, vnx):
        gm = pf.groupmax_scores(qq, dbx, vnx, nt, None, metric=M,
                                nv_eff=nv_eff, sweep_passes=1)
        gidx, _ = pf._top_groups(gm, kg, nv_eff // pf.GROUP)
        return jnp.sort(gidx, axis=-1)

    gidx0 = jax.block_until_ready(prep(q, db, vn))

    def resc(rj):
        def body(x, qq, dbx, vnx, gx):
            s = pf.rescore_groups_pallas(qq + x, dbx, vnx, gx, nt,
                                         metric=M, nv_eff=nv_eff,
                                         ranks_per_step=rj)
            return jnp.sum(s)
        return body

    cfgs = {"rescore rj=1": resc(1), "rescore rj=2": resc(2)}
    arrs = (q, db, vn, gidx0)
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
