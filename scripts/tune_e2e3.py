"""Definitive in-process matrix: ALL outputs consumed, output-cone bisects."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

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

    def fused(qq, db, vn, direct, gpj):
        pf.DIRECT_BV = 16384 if direct else (1 << 40)
        pf.RESCORE_GPJ = gpj
        return pf.fused_search(qq, db, vn, jnp.int32(NV), k=K,
                               metric=MetricType.L2, nv_eff=nv_eff)

    def consume(v, i, c, what):
        out = jnp.sum(v) if "v" in what else 0.0
        if "i" in what:
            out = out + jnp.sum(i.astype(jnp.float32))
        if "c" in what:
            out = out + jnp.sum(c.astype(jnp.float32))
        return out

    bodies = {}
    for direct in (False, True):
        for gpj in (2,):
            name = f"d{int(direct)}g{gpj}-vic"
            bodies[name] = (lambda qq, db, vn, dd=direct, gg=gpj:
                            consume(*fused(qq, db, vn, dd, gg), "vic"))
    for what in ("v", "vi", "vc"):
        bodies[f"d0g2-{what}"] = (lambda qq, db, vn, w=what:
                                  consume(*fused(qq, db, vn, False, 2), w))
    bodies["d0g1-vic"] = (lambda qq, db, vn:
                          consume(*fused(qq, db, vn, False, 1), "vic"))

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
