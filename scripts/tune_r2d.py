"""Refresh the BENCHMARKS on-device table: fp32 full path + 10M scale row
(real TPU, post stripe-rescore/premask).

Slope-measured head-to-head in one process (CLAUDE.md recipe). All big
arrays ride as jit ARGUMENTS — closure-captured arrays are embedded in the
HLO and wedge the remote compiler (HTTP 413 / multi-GB uploads).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import split_f32_bf16

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


def consume(v, i, c):
    return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
            + jnp.sum(c.astype(jnp.float32)))


def main():
    assert jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(42)

    # 1M fp32: sweep over the bf16 (hi, lo) pair; rescore = take + HIGHEST
    NV = 1_000_000
    nv_eff = 1_000_448
    xb = np.pad(rng.standard_normal((NV, D), dtype=np.float32),
                ((0, nv_eff - NV), (0, 0)))
    q = jnp.asarray(rng.standard_normal((NQ, D), dtype=np.float32))
    db32 = jnp.asarray(xb)
    hi, lo = (jax.block_until_ready(a) for a in split_f32_bf16(db32))
    vn = jnp.asarray((xb ** 2).sum(1).astype(np.float32))
    nt = jnp.int32(NV)

    def f32_full(sp):
        def body(x, qq, d32, h, l, v):
            return consume(*pf.fused_search(
                qq + x, d32, v, nt, k=K, metric=M, nv_eff=nv_eff,
                db_split=(h, l), sweep_passes=sp))
        return body, (q, db32, hi, lo, vn)

    # 10M bf16
    NV10 = 10_000_000
    nv10 = 10_000_384
    xb10 = rng.standard_normal((nv10, D), dtype=np.float32)
    xb10[NV10:] = 0
    db10 = jnp.asarray(xb10).astype(jnp.bfloat16)
    vn10 = jnp.asarray((xb10 ** 2).sum(1).astype(np.float32))
    del xb10
    nt10 = jnp.int32(NV10)

    def b10_full(sp):
        def body(x, qq, d10, v10):
            return consume(*pf.fused_search(
                qq + x, d10, v10, nt10, k=K, metric=M, nv_eff=nv10,
                sweep_passes=sp))
        return body, (q, db10, vn10)

    cfgs = {
        "1M f32 full sp2": f32_full(2),
        "1M f32 full sp1": f32_full(1),
        "10M bf16 full sp1": b10_full(1),
        "10M bf16 full sp2": b10_full(2),
    }
    built = {}
    for n, (b, arrs) in cfgs.items():
        try:
            r1, r2 = mk(N1, b), mk(N2, b)
            _ = np.asarray(r1(jnp.float32(0.0), *arrs))
            _ = np.asarray(r2(jnp.float32(0.0), *arrs))
            built[n] = (r1, r2, arrs)
            print("compiled", n, flush=True)
        except Exception as ex:
            print("FAILED", n, repr(ex)[:200], flush=True)
    res = {n: [] for n in built}
    for rep in range(6):
        for n, (r1, r2, arrs) in built.items():
            t0 = time.perf_counter()
            _ = np.asarray(r1(jnp.float32(0.0), *arrs))
            t1 = time.perf_counter()
            _ = np.asarray(r2(jnp.float32(0.0), *arrs))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
    for n in built:
        ts = sorted(res[n])
        print(f"{n}: {ts[len(ts)//2]*1e3:.3f} ms (min {min(ts)*1e3:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
