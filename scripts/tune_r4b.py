"""Round-4b: fused FILTERED search on-device cost (VERDICT r3 #3 done-bar:
filtered within 1.3× the unfiltered fused time at 1M×128 bf16).

The selector folds into the pre-masked norm stream, so the expected cost is
one extra (nv_eff,) bool AND per search plus the selector stream's HBM read
(1 MB at 1M rows) — noise. Variants, head-to-head in one process:

  F     unfiltered fused bf16 (control; r3k/r4: ~0.52–0.55)
  FS50  50% admitted
  FS99  99% admitted (mask nearly full — same program, different data)
  FI50  int8, 50% admitted (int8 premask branch)
  FP50  fp32 pair two-stage, 50% admitted (XLA-rescore sel re-mask path)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import split_f32_bf16, _split_stats_fn, _quantize_int8_fn

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
    xg = np.zeros((NV_EFF, D), np.float32)
    xg[:NV] = rng.standard_normal((NV, D), dtype=np.float32)
    vn = jnp.asarray((xg ** 2).sum(1).astype(np.float32))
    xj = jnp.asarray(xg)
    db16 = xj.astype(jnp.bfloat16)
    hi, lo = split_f32_bf16(xj)
    stats = jnp.asarray(np.asarray(
        _split_stats_fn(jnp.zeros((2,), jnp.float32), xj, hi, lo)))
    scales = jnp.asarray(np.maximum(
        np.abs(xg[:NV]).max(axis=0) / 127.0, 1e-12).astype(np.float32))
    vq, vn8, qn8, _clip = _quantize_int8_fn(xj, scales)
    inm = jnp.asarray(qn8)
    sel50 = jnp.asarray(rng.random(NV_EFF) < 0.5)
    sel99 = jnp.asarray(rng.random(NV_EFF) < 0.99)
    del xg
    nt = jnp.int32(NV)

    def bf16_body(qq, db, v, s):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, sweep_passes=1, sel=s)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    def bf16_plain(qq, db, v):
        return bf16_body(qq, db, v, None)

    def int8_body(qq, db, v, sc, im, s):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, scales=sc,
                                     int_norm_max=im, sel=s)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    def f32_body(qq, db, h, l, v, st, s):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, db_split=(h, l),
                                     split_stats=st, sweep_passes=2, sel=s)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    specs = [
        ("F    bf16 unfiltered", bf16_plain, (db16, vn)),
        ("FS50 bf16 sel 50%", bf16_body, (db16, vn, sel50)),
        ("FS99 bf16 sel 99%", bf16_body, (db16, vn, sel99)),
        ("FI50 int8 sel 50%", int8_body, (vq, vn8, scales, inm, sel50)),
        ("FP50 f32  sel 50%", f32_body, (xj, hi, lo, vn, stats, sel50)),
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
                  f"{type(e).__name__}: {str(e)[:500]}", flush=True)

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
