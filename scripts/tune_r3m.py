"""Round-3m: (a) f32 hi_exact on integer/SIFT-like data (retry of r3l after
a tunnel outage), (b) f16 clean-bits decode e2e/sweep on Gaussian data
(ingest now flushes f16 subnormals, so ordinary real-valued data is clean).

Variants (1M x 128, nq=104, k=10, L2):
  H1  f32 hi_exact + 1-pass reduced sweep (int data — index dispatch)
  H2  f32 hi_exact + 2-pass sweep        (int data)
  P   f32 full pair program              (int data control)
  F1c f16 e2e, clean decode              (gauss)
  F1g f16 e2e, generic decode            (gauss control, r3e: ~1.2)
  FSc f16 SWEEP-only, clean decode       (gauss; generic was 0.995)
  B   bf16 1-pass                        (gauss control, r3k: 0.506)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import split_f32_bf16, split_f16_bits, _split_stats_fn

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
    q = jnp.asarray(rng.standard_normal((NQ, D), dtype=np.float32))

    # integer (SIFT-like) db for the f32 hi_exact variants
    xi = np.zeros((NV_EFF, D), np.float32)
    xi[:NV] = rng.gamma(1.1, 20.0, (NV, D)).clip(0, 218).astype(
        np.float32).round()
    vni = jnp.asarray((xi ** 2).sum(1).astype(np.float32))
    xij = jnp.asarray(xi)
    hi_i, lo_i = split_f32_bf16(xij)
    stats_i = jnp.asarray(np.asarray(
        _split_stats_fn(jnp.zeros((2,), jnp.float32), xij, hi_i, lo_i)))
    print("int-data split stats:", np.asarray(stats_i), flush=True)
    del xi

    # Gaussian db for the f16 / bf16 variants
    xg = np.zeros((NV_EFF, D), np.float32)
    xg[:NV] = rng.standard_normal((NV, D), dtype=np.float32)
    vng = jnp.asarray((xg ** 2).sum(1).astype(np.float32))
    xgj = jnp.asarray(xg)
    bits = jax.lax.bitcast_convert_type(xgj.astype(jnp.float16), jnp.int16)
    sub = ((bits & jnp.int16(0x7C00)) == 0) & ((bits & jnp.int16(0x3FF)) != 0)
    bits = jnp.where(sub, bits & jnp.int16(-0x8000), bits)  # ingest flush
    fh, fl = split_f16_bits(bits)
    stats_g = jnp.asarray(np.asarray(_split_stats_fn(
        jnp.zeros((2,), jnp.float32),
        fh.astype(jnp.float32) + fl.astype(jnp.float32), fh, fl)))
    db16 = xgj.astype(jnp.bfloat16)
    del xg, fh, fl
    nt = jnp.int32(NV)

    def f32_body(sp, he):
        def body(qq, db, h, l, v, st):
            v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                         nv_eff=NV_EFF, db_split=(h, l),
                                         split_stats=st, sweep_passes=sp,
                                         hi_exact=he)
            return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                    + jnp.sum(c_.astype(jnp.float32)))
        return body

    def f16_body(clean):
        def body(qq, db, v, st):
            v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                         nv_eff=NV_EFF, split_stats=st,
                                         f16_clean=clean)
            return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                    + jnp.sum(c_.astype(jnp.float32)))
        return body

    def f16_sweep(qq, db, v):
        g = pf.groupmax_scores(qq, db, v, nt, None, metric=M,
                               nv_eff=NV_EFF, sweep_passes=2, f16_clean=True)
        return jnp.sum(g)

    def full_bf16(qq, db, v):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, sweep_passes=1)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    F32A = (xij, hi_i, lo_i, vni, stats_i)
    specs = [
        ("H1  f32 hi_exact 1p", f32_body(1, True), F32A),
        ("H2  f32 hi_exact 2p", f32_body(2, True), F32A),
        ("P   f32 pair 2p", f32_body(2, False), F32A),
        ("F1c f16 clean", f16_body(True), (bits, vng, stats_g)),
        ("F1g f16 generic", f16_body(False), (bits, vng, stats_g)),
        ("FSc f16 sweep clean", f16_sweep, (bits, vng)),
        ("B   bf16 1p", full_bf16, (db16, vng)),
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
    print("== ms/batch (nq=104, k=10, 1M x 128, L2) ==", flush=True)
    for n in variants:
        ts = sorted(res[n])
        print(f"{n}: median {ts[len(ts)//2]*1e3:.3f} ms "
              f"(min {min(ts)*1e3:.3f} max {max(ts)*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
