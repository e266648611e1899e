"""Measure the stripe-grid rescore kernel + best e2e composition (real TPU)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

NV, D, NQ, K = 1_000_000, 128, 104, 10
M = MetricType.L2
N1, N2 = 4, 104


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
    gmax = pf.groupmax_scores(q, db, vn, nt, None, metric=M, nv_eff=nv_eff)
    gidx0, _ = pf._top_groups(gmax, kg, nv_eff // pf.GROUP)
    gidx0 = jax.block_until_ready(jnp.sort(gidx0, axis=-1))

    def resc(x):
        s = pf.rescore_groups_pallas(q + x, db, vn, gidx0, nt,
                                     metric=M, nv_eff=nv_eff)
        return jnp.sum(s)

    def consume(v, i, c):
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    def full(sp):
        def body(qq):
            return consume(*pf.fused_search(
                qq, db, vn, nt, k=K, metric=M, nv_eff=nv_eff,
                sweep_passes=sp))
        return body

    cfgs = {
        "rescore stripe-grid": resc,
        "full 2p stripe": full(2),
        "full 1p stripe": full(1),
    }
    built = {n: (mk(N1, b), mk(N2, b)) for n, b in cfgs.items()}
    # args differ: rescore takes scalar x, fulls take q
    argmap = {n: (jnp.float32(0.0) if n == "rescore stripe-grid" else q)
              for n in built}
    for n, (r1, r2) in built.items():
        _ = np.asarray(r1(argmap[n])); _ = np.asarray(r2(argmap[n]))
        print("compiled", n, flush=True)
    res = {n: [] for n in built}
    for rep in range(6):
        for n, (r1, r2) in built.items():
            a = argmap[n]
            t0 = time.perf_counter(); _ = np.asarray(r1(a))
            t1 = time.perf_counter(); _ = np.asarray(r2(a))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
    for n in built:
        ts = sorted(res[n])
        print(f"{n}: {ts[len(ts)//2]*1e3:.3f} ms (min {min(ts)*1e3:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
