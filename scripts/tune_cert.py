"""Bisect the certificate cone cost: t vs eps vs nmax reduce."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import split_f32_bf16

NV, D, NQ, K = 1_000_000, 128, 104, 10

def mk(n, body):
    @jax.jit
    def run(q, db, vn):
        def step(c, _):
            return body(q + c, db, vn) * 1e-20, 0.0
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
    pf.DIRECT_BV = 1 << 40
    pf.RESCORE_GPJ = 2
    ngroups = nv_eff // pf.GROUP
    kg = 14

    def pieces(qq, db, vn):
        gmax = pf.groupmax_scores(qq, db, vn, jnp.int32(NV),
                                  metric=MetricType.L2, nv_eff=nv_eff)
        gidx, t = pf._top_groups(gmax, kg, ngroups)
        gidx = jnp.sort(gidx, axis=-1)
        s = pf.rescore_groups_pallas(qq, db, vn, gidx, jnp.int32(NV),
                                     metric=MetricType.L2, nv_eff=nv_eff)
        vals, pos = jax.lax.top_k(s, K)
        return gmax, gidx, t, s, vals

    bodies = {
        "v only": lambda qq, db, vn: jnp.sum(pieces(qq, db, vn)[4]),
        "v + t": lambda qq, db, vn: (lambda p: jnp.sum(p[4]) + jnp.sum(p[2]))(pieces(qq, db, vn)),
        "v + eps(no nmax)": lambda qq, db, vn: (lambda p: jnp.sum(p[4]) + jnp.sum(
            pf._sweep_eps(qq, vn, nv_eff, metric=MetricType.L2,
                          pair_sweep=False, d_pad=D) * 0 + 1))(pieces(qq, db, vn)),
        "v + nmax only": lambda qq, db, vn: (lambda p: jnp.sum(p[4]) + jnp.sqrt(jnp.max(vn)))(pieces(qq, db, vn)),
        "v + t + eps": lambda qq, db, vn: (lambda p: jnp.sum(p[4]) + jnp.sum(
            (p[4][:, K - 1] >= p[2] + pf._sweep_eps(
                qq, vn, nv_eff, metric=MetricType.L2, pair_sweep=False,
                d_pad=D)).astype(jnp.float32)))(pieces(qq, db, vn)),
    }
    rs = {n: (mk(4, b), mk(24, b)) for n, b in bodies.items()}
    for n, (r1, r2) in rs.items():
        _ = np.asarray(r1(q, db16, normsj)); _ = np.asarray(r2(q, db16, normsj))
        print("compiled", n, flush=True)
    res = {n: [] for n in rs}
    for rep in range(8):
        for n, (r1, r2) in rs.items():
            t0 = time.perf_counter(); _ = np.asarray(r1(q, db16, normsj))
            t1 = time.perf_counter(); _ = np.asarray(r2(q, db16, normsj))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / 20)
    for n, ts in res.items():
        print(f"{n}: {min(ts)*1e3:.3f} ms/batch", flush=True)

if __name__ == "__main__":
    main()
