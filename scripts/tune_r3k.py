"""Round-3k: measure the r3 f32 defaults (PAIR_DIRECT_BV=32768,
RESCORE_RANKS_PAIR=4, stage-3b via the phase-2 select kernel) and decide
whether bf16/int8 also want the taller direct tile / deeper rescore.

Variants (1M x 128, nq=104, k=10, L2):
  A    f32 full, new defaults             (r3j best: 1.088)
  B16  bf16 full 1-pass                   (r3h: 0.523)
  B32  bf16 full 1-pass, DIRECT_BV=32768
  BR4  bf16 full 1-pass, RESCORE_RANKS=4
  I16  int8 full                          (r2: 0.86)
  I32  int8 full, DIRECT_BV=32768
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import (split_f32_bf16, _split_stats_fn,
                               _quantize_int8_fn)

NV, D, NQ, K = 1_000_000, 128, 104, 10
M = MetricType.L2
N1, N2 = 8, 88
BV0, RR0 = pf.DIRECT_BV, pf.RESCORE_RANKS
NV_EFF = ((NV + BV0 - 1) // BV0) * BV0


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
    xb = np.pad(rng.standard_normal((NV, D), dtype=np.float32),
                ((0, NV_EFF - NV), (0, 0)))
    q = jnp.asarray(rng.standard_normal((NQ, D), dtype=np.float32))
    vn = jnp.asarray((xb ** 2).sum(1).astype(np.float32))
    nt = jnp.int32(NV)
    xbj = jnp.asarray(xb)
    hi, lo = split_f32_bf16(xbj)
    stats32 = jnp.asarray(np.asarray(
        _split_stats_fn(jnp.zeros((2,), jnp.float32), xbj, hi, lo)))
    db16 = xbj.astype(jnp.bfloat16)
    amax = jnp.max(jnp.abs(xbj), axis=0)
    scales = jnp.where(amax > 0, amax / 127.0, 1.0)
    vq, dnorms, inm, _ = _quantize_int8_fn(xbj, scales)
    del xb

    def full_f32(qq, db, h, l, v, st):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, db_split=(h, l),
                                     split_stats=st)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    def full_bf16(qq, db, v):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, sweep_passes=1)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    def full_int8(qq, db, v, sc, im):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, scales=sc,
                                     int_norm_max=im)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    specs = [
        ("A   f32 new defaults", full_f32,
         (xbj, hi, lo, vn, stats32), {}),
        ("B16 bf16 1-pass", full_bf16, (db16, vn), {}),
        ("B32 bf16 bv=32k", full_bf16, (db16, vn), {"bv": 32768}),
        ("BR4 bf16 ranks=4", full_bf16, (db16, vn), {"rr": 4}),
        ("I16 int8", full_int8, (vq, dnorms, scales, inm), {}),
        ("I32 int8 bv=32k", full_int8, (vq, dnorms, scales, inm),
         {"bv": 32768}),
    ]
    variants = {}
    for name, body, arrs, opts in specs:
        pf.DIRECT_BV = opts.get("bv", BV0)
        pf.RESCORE_RANKS = opts.get("rr", RR0)
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
        finally:
            pf.DIRECT_BV, pf.RESCORE_RANKS = BV0, RR0

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
    print("== ms/batch (nq=104, k=10, 1M x 128, L2) ==", flush=True)
    for n in variants:
        ts = sorted(res[n])
        print(f"{n}: median {ts[len(ts)//2]*1e3:.3f} ms "
              f"(min {min(ts)*1e3:.3f} max {max(ts)*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
