"""Round-3e: head-to-head on-chip slope timing of
  A. f32 e2e two-stage rescore (new default)
  B. f32 e2e single-stage (F32_TWO_STAGE=False — the r3d 1.406 ms config)
  C. bf16 e2e with sweep_passes=1 (the index's actual dispatch at nq=104;
     r3d measured the 2-pass variant by mistake: 0.710 ms)
  D. f16 e2e (r3d: 1.218 ms — diagnose)
  E. f16 SWEEP-ONLY (localize D between sweep and rescore/glue)

One process, interleaved reps, slope N1=8 / N2=88, arrays as arguments.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import (split_f32_bf16, _split_stats_fn,
                               encode_f16_bits)

NV, D, NQ, K = 1_000_000, 128, 104, 10
M = MetricType.L2
N1, N2 = 8, 88
NV_EFF = ((NV + pf.DIRECT_BV - 1) // pf.DIRECT_BV) * pf.DIRECT_BV


def tot(v, i, c):
    return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
            + jnp.sum(c.astype(jnp.float32)))


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
    dbh = encode_f16_bits(xbj)
    del xb

    def e2e_f32(qq, db, h, l, v, st):
        return tot(*pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                    nv_eff=NV_EFF, db_split=(h, l),
                                    split_stats=st))

    def e2e_bf16_1p(qq, db, v):
        return tot(*pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                    nv_eff=NV_EFF, sweep_passes=1))

    def e2e_f16(qq, db, v, st):
        return tot(*pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                    nv_eff=NV_EFF, split_stats=st))

    def sweep_f16(qq, db, v, st):
        g = pf.groupmax_scores(qq, db, v, nt, None, metric=M,
                               nv_eff=NV_EFF, sweep_passes=2)
        return jnp.sum(g)

    z2 = jnp.zeros((2,), jnp.float32)
    specs = [
        ("A f32 two-stage", e2e_f32, (xbj, hi, lo, vn, stats32), True),
        ("B f32 single-stage", e2e_f32, (xbj, hi, lo, vn, stats32), False),
        ("C bf16 1-pass", e2e_bf16_1p, (db16, vn), True),
        ("D f16 e2e", e2e_f16, (dbh, vn, z2), True),
        ("E f16 sweep-only", sweep_f16, (dbh, vn, z2), True),
    ]
    variants = {}
    for name, body, arrs, two_stage in specs:
        pf.F32_TWO_STAGE = two_stage
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
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)

    res = {n: [] for n in variants}
    for rep in range(6):
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


