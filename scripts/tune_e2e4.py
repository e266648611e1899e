"""Measure full-output e2e after threshold-scatter + indices-only top_k."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

NV, D, NQ, K = 1_000_000, 128, 104, 10

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
    db32 = jnp.asarray(xb)
    from faiss_tpu.storage import split_f32_bf16
    hi, lo = jax.jit(split_f32_bf16)(db32)
    normsj = jnp.asarray((xb ** 2).sum(1).astype(np.float32))

    def consume(v, i, c):
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    def body16(qq, db, vn):
        return consume(*pf.fused_search(qq, db, vn, jnp.int32(NV), k=K,
                                        metric=MetricType.L2, nv_eff=nv_eff))

    def body32(qq, db, vn, h, l):
        return consume(*pf.fused_search(qq, db, vn, jnp.int32(NV), k=K,
                                        metric=MetricType.L2, nv_eff=nv_eff,
                                        db_split=(h, l)))

    cfgs = {
        "bf16 full-out": ((q, db16, normsj), body16),
        "fp32 full-out": ((q, db32, normsj, hi, lo), body32),
    }
    rs = {n: (args, mk(4, b), mk(24, b)) for n, (args, b) in cfgs.items()}
    for n, (args, r1, r2) in rs.items():
        _ = np.asarray(r1(*args)); _ = np.asarray(r2(*args))
        print("compiled", n, flush=True)
    res = {n: [] for n in rs}
    for rep in range(8):
        for n, (args, r1, r2) in rs.items():
            t0 = time.perf_counter(); _ = np.asarray(r1(*args))
            t1 = time.perf_counter(); _ = np.asarray(r2(*args))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / 20)
    for n, ts in res.items():
        print(f"{n}: {min(ts)*1e3:.3f} ms/batch", flush=True)

if __name__ == "__main__":
    main()
