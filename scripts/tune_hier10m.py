"""10M×128 bf16: kernel-bmax hierarchical phase 2 vs flat (real TPU)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

D, NQ, K = 128, 104, 10
M = MetricType.L2
N1, N2 = 4, 24


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
    NV10, nv10 = 10_000_000, 10_000_384
    xb10 = rng.standard_normal((nv10, D), dtype=np.float32)
    xb10[NV10:] = 0
    db = jnp.asarray(xb10).astype(jnp.bfloat16)
    vn = jnp.asarray((xb10 ** 2).sum(1).astype(np.float32))
    del xb10
    nt = jnp.int32(NV10)
    q = jnp.asarray(rng.standard_normal((NQ, D), dtype=np.float32))

    # NB: must run under jit — eagerly, the rescore pallas_call's 8
    # repeated db operands are counted as DISTINCT arguments by the AOT
    # compile helper (8 × 2.56 GB "exceeds hbm capacity"); inside jit they
    # are one parameter.
    @jax.jit
    def once(qq, dbx, vnx):
        return pf.fused_search(qq, dbx, vnx, nt, k=K, metric=M,
                               nv_eff=nv10, sweep_passes=1)

    v1, i1, c1 = jax.device_get(once(q, db, vn))
    pf.HIER_MIN_GROUPS = 1 << 30

    @jax.jit
    def once_flat(qq, dbx, vnx):
        return pf.fused_search(qq, dbx, vnx, nt, k=K, metric=M,
                               nv_eff=nv10, sweep_passes=1)

    v2, i2, c2 = jax.device_get(once_flat(q, db, vn))
    pf.HIER_MIN_GROUPS = 65536
    print("ids equal:", (np.asarray(i1) == np.asarray(i2)).all(),
          "cert rate:", float(np.asarray(c1).mean()), flush=True)

    def consume(v, i, c):
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    def e2e_hier(x, qq, dbx, vnx):
        pf.HIER_MIN_GROUPS = 65536
        return consume(*pf.fused_search(
            qq + x, dbx, vnx, nt, k=K, metric=M, nv_eff=nv10,
            sweep_passes=1))

    def e2e_flat(x, qq, dbx, vnx):
        pf.HIER_MIN_GROUPS = 1 << 30
        return consume(*pf.fused_search(
            qq + x, dbx, vnx, nt, k=K, metric=M, nv_eff=nv10,
            sweep_passes=1))

    cfgs = {"10M e2e hier": e2e_hier, "10M e2e flat": e2e_flat}
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
