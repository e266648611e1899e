"""fused_search vs full _build_search_fn head-to-head + finalize bisect."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.index import _build_search_fn
from faiss_tpu.ops import pallas_fused as pf

NV, D, NQ, K = 1_000_000, 128, 104, 10

def mk_runner(n, body):
    @jax.jit
    def run(q, db, vn):
        def step(c, _):
            out = body(q + c, db, vn)
            return jnp.sum(out) * 1e-20, 0.0
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
    pf.DIRECT_BV = 1 << 40  # transposed sweep (e2e winner)

    def f_bare(qq, db, vn):
        v, i, c = pf.fused_search(qq, db, vn, jnp.int32(NV), k=K,
                                  metric=MetricType.L2, nv_eff=nv_eff)
        return v

    def f_bare_all(qq, db, vn):  # consume ALL outputs (defeat DCE)
        v, i, c = pf.fused_search(qq, db, vn, jnp.int32(NV), k=K,
                                  metric=MetricType.L2, nv_eff=nv_eff)
        return v + i.astype(jnp.float32).sum() + c.astype(jnp.float32).sum()

    fn_full = _build_search_fn(nv_eff=nv_eff, d_pad=D, nq_pad=NQ, k=K,
                               metric=MetricType.L2, use_direct=False,
                               use_fused=True, chunk=1 << 18)

    def f_full(qq, db, vn):
        d, i, c = fn_full(db, vn, qq, jnp.int32(NV))
        return d

    configs = {"bare(v only)": f_bare, "bare(all outs)": f_bare_all,
               "full buildfn": f_full}
    rs = {n: (mk_runner(4, f), mk_runner(24, f)) for n, f in configs.items()}
    for n, (r1, r2) in rs.items():
        _ = np.asarray(r1(q, db16, normsj)); _ = np.asarray(r2(q, db16, normsj))
        print("compiled", n, flush=True)
    res = {n: [] for n in rs}
    for rep in range(6):
        for n, (r1, r2) in rs.items():
            t0 = time.perf_counter(); _ = np.asarray(r1(q, db16, normsj))
            t1 = time.perf_counter(); _ = np.asarray(r2(q, db16, normsj))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / 20)
    for n, ts in res.items():
        print(f"{n}: {min(ts)*1e3:.3f} ms/batch", flush=True)

if __name__ == "__main__":
    main()
