"""Head-to-head e2e fused_search configs in ONE process, interleaved reps."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

NV, D, NQ, K = 1_000_000, 128, 104, 10

def mk_runner(n, fn):
    @jax.jit
    def run(q, db, vn):
        def step(c, _):
            v, i, cert = fn(q + c, db, vn)
            return jnp.sum(v) * 1e-20, 0.0
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

    def make(direct, gpj):
        def fn(qq, db, vn):
            old_bv, old_gpj = pf.DIRECT_BV, pf.RESCORE_GPJ
            pf.DIRECT_BV, pf.RESCORE_GPJ = ((16384, gpj) if direct
                                            else (1 << 40, gpj))
            try:
                return pf.fused_search(qq, db, vn, jnp.int32(NV), k=K,
                                       metric=MetricType.L2, nv_eff=nv_eff)
            finally:
                pf.DIRECT_BV, pf.RESCORE_GPJ = old_bv, old_gpj
        return fn

    configs = {}
    for direct in (True, False):
        for gpj in (2, 1):
            name = f"direct={int(direct)} gpj={gpj}"
            fn = make(direct, gpj)
            configs[name] = (mk_runner(4, fn), mk_runner(24, fn))

    # warm all compiles first
    for name, (r1, r2) in configs.items():
        _ = np.asarray(r1(q, db16, normsj)); _ = np.asarray(r2(q, db16, normsj))
        print(f"compiled {name}", flush=True)

    res = {n: [] for n in configs}
    for rep in range(6):  # interleaved: drift hits all configs equally
        for name, (r1, r2) in configs.items():
            t0 = time.perf_counter(); _ = np.asarray(r1(q, db16, normsj))
            t1 = time.perf_counter(); _ = np.asarray(r2(q, db16, normsj))
            t2 = time.perf_counter()
            res[name].append(((t2 - t1) - (t1 - t0)) / 20)
    for name, ts in res.items():
        print(f"{name}: {min(ts)*1e3:.3f} ms/batch", flush=True)

if __name__ == "__main__":
    main()
