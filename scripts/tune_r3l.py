"""Round-3l: hi_exact f32 on integer-valued (SIFT-like) data, on-chip.

The exact stored split statistics are zero on integer data, so the f32
fused program sweeps/rescores only the hi bf16 plane (bit-identical, half
the sweep HBM traffic). Expected ≈ bf16-class time.

Variants (1M x 128, nq=104, k=10, L2, SIFT-like integer values ≤ 218):
  H1  f32 hi_exact, 1-pass reduced sweep  (the index dispatch at nq≥32)
  H2  f32 hi_exact, 2-pass sweep
  P   f32 full pair program               (what non-integer data runs)
  B   bf16 1-pass                         (the speed bar)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import split_f32_bf16, _split_stats_fn

NV, D, NQ, K = 1_000_000, 128, 104, 10
M = MetricType.L2
N1, N2 = 8, 88
NV_EFF = ((NV + pf.DIRECT_BV - 1) // pf.DIRECT_BV) * pf.DIRECT_BV


def chain(n, body):
    @jax.jit
    def run(x, q, *arrs):
        def step(c, _):
            return body(q + (x + c), *arrs) * 1e-20, 0.0
        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return c
    return run


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    rng = np.random.default_rng(42)
    xb = np.zeros((NV_EFF, D), np.float32)
    xb[:NV] = rng.gamma(1.1, 20.0, (NV, D)).clip(0, 218).astype(
        np.float32).round()
    q = jnp.asarray(rng.standard_normal((NQ, D), dtype=np.float32))
    vn = jnp.asarray((xb ** 2).sum(1).astype(np.float32))
    nt = jnp.int32(NV)
    xbj = jnp.asarray(xb)
    hi, lo = split_f32_bf16(xbj)
    stats = jnp.asarray(np.asarray(
        _split_stats_fn(jnp.zeros((2,), jnp.float32), xbj, hi, lo)))
    print("split stats:", np.asarray(stats), flush=True)
    db16 = xbj.astype(jnp.bfloat16)
    del xb

    def full_f32(sp, he):
        def body(qq, db, h, l, v, st):
            v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                         nv_eff=NV_EFF, db_split=(h, l),
                                         split_stats=st, sweep_passes=sp,
                                         hi_exact=he)
            return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                    + jnp.sum(c_.astype(jnp.float32)))
        return body

    def full_bf16(qq, db, v):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, sweep_passes=1)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    F32A = (xbj, hi, lo, vn, stats)
    specs = [
        ("H1 f32 hi_exact 1p", full_f32(1, True), F32A),
        ("H2 f32 hi_exact 2p", full_f32(2, True), F32A),
        ("P  f32 pair 2p", full_f32(2, False), F32A),
        ("B  bf16 1p", full_bf16, (db16, vn)),
    ]
    variants = {}
    for name, body, arrs in specs:
        t0 = time.perf_counter()
        try:
            r1, r2 = chain(N1, body), chain(N2, body)
            _ = np.asarray(r1(jnp.float32(0.0), q, *arrs))
            _ = np.asarray(r2(jnp.float32(0.0), q, *arrs))
            print(f"compiled {name} ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
            variants[name] = (r1, r2, arrs)
        except Exception as e:
            print(f"FAILED {name} ({time.perf_counter() - t0:.1f}s): "
                  f"{type(e).__name__}: {str(e)[:600]}", flush=True)

    res = {n: [] for n in variants}
    for rep in range(8):
        for n, (r1, r2, arrs) in variants.items():
            t0 = time.perf_counter()
            _ = np.asarray(r1(jnp.float32(0.0), q, *arrs))
            t1 = time.perf_counter()
            _ = np.asarray(r2(jnp.float32(0.0), q, *arrs))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
        print(f"rep {rep} done", flush=True)
    print("== ms/batch (nq=104, k=10, 1M x 128 SIFT-like, L2) ==", flush=True)
    for n in variants:
        ts = sorted(res[n])
        print(f"{n}: median {ts[len(ts)//2]*1e3:.3f} ms "
              f"(min {min(ts)*1e3:.3f} max {max(ts)*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
