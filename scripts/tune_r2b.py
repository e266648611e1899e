"""Measure premasked-epilogue sweep + rescore/pass variants e2e (real TPU)."""
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

    def consume(v, i, c):
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    def sweep2(qq):
        return jnp.sum(pf.groupmax_scores(qq, db, vn, nt, None, metric=M,
                                          nv_eff=nv_eff))

    def sweep1(qq):
        return jnp.sum(pf.groupmax_scores(qq, db, vn, nt, None, metric=M,
                                          nv_eff=nv_eff, sweep_passes=1))

    def full(sp, rt):
        def body(qq):
            return consume(*pf.fused_search(
                qq, db, vn, nt, k=K, metric=M, nv_eff=nv_eff,
                sweep_passes=sp, rescore_take=rt))
        return body

    cfgs = {
        "sweep 2pass premask": sweep2,
        "sweep 1pass premask": sweep1,
        "full 2p pallas": full(2, False),
        "full 2p take": full(2, True),
        "full 1p pallas": full(1, False),
        "full 1p take": full(1, True),
    }
    built = {n: (mk(N1, b), mk(N2, b)) for n, b in cfgs.items()}
    for n, (r1, r2) in built.items():
        _ = np.asarray(r1(q)); _ = np.asarray(r2(q))
        print("compiled", n, flush=True)
    res = {n: [] for n in built}
    for rep in range(6):
        for n, (r1, r2) in built.items():
            t0 = time.perf_counter(); _ = np.asarray(r1(q))
            t1 = time.perf_counter(); _ = np.asarray(r2(q))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
    for n in built:
        ts = sorted(res[n])
        print(f"{n}: {ts[len(ts)//2]*1e3:.3f} ms (min {min(ts)*1e3:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
