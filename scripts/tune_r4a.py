"""Round-4a: fp32 e2e ≤ 1.0 ms attempt (VERDICT r3 #4) + f16 sweep overlap.

r3o settled that rescore depth is a wash; the fp32 budget is sweep 0.71 of
1.11 ms (roofline 0.56). Levers measured here, head-to-head in ONE process:

  SW32 / SW64   fp32 pair sweep-only, PAIR_DIRECT_BV 32768 (control) vs
                65536 (half the grid steps; tail 32768 rides the XLA dot;
                vmem raised to 100 MB)
  E32 / E64     full fp32 e2e at both tiles
  PH2           sweep + phase-2 select kernel only  (isolates select cost)
  PH3a          + stripe pair rescore (rj=2)        (isolates rescore cost)
  F16c32        f16 clean sweep-only at DIRECT_BV=32768 (vs 16384 = 0.758,
                r3m) — probes VPU-decode/DMA overlap vs tile size

A failed Pallas trace can poison later variants in-process (CLAUDE.md), so
risky compiles run LAST and each is guarded.
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
NG = NV_EFF // pf.GROUP
KG = min(K + pf.GROUP_PAD, NG)


def chain(n, body):
    @jax.jit
    def run(x, q, *arrs):
        def step(c, _):
            return body(q + (x + c), *arrs) * 1e-20, 0.0
        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return c
    return run


def set_tiles(pair_bv=32768, direct_bv=16384, vmem=None):
    pf.PAIR_DIRECT_BV = pair_bv
    pf.DIRECT_BV = direct_bv
    if vmem is not None:
        pf.PAIR_DIRECT_VMEM = vmem
    for f in (pf.groupmax_scores,):
        try:
            f._clear_cache()
        except Exception:
            pass


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((NQ, D), dtype=np.float32))
    xg = np.zeros((NV_EFF, D), np.float32)
    xg[:NV] = rng.standard_normal((NV, D), dtype=np.float32)
    vn = jnp.asarray((xg ** 2).sum(1).astype(np.float32))
    xj = jnp.asarray(xg)
    hi, lo = split_f32_bf16(xj)
    stats = jnp.asarray(np.asarray(
        _split_stats_fn(jnp.zeros((2,), jnp.float32), xj, hi, lo)))
    bits = jax.lax.bitcast_convert_type(xj.astype(jnp.float16), jnp.int16)
    sub = ((bits & jnp.int16(0x7C00)) == 0) & ((bits & jnp.int16(0x3FF)) != 0)
    bits = jnp.where(sub, bits & jnp.int16(-0x8000), bits)
    del xg
    nt = jnp.int32(NV)

    def sweep_pair(qq, h, l, v):
        g = pf.groupmax_scores(qq, h, v, nt, (h, l), metric=M,
                               nv_eff=NV_EFF, sweep_passes=2)
        return jnp.sum(g)

    def e2e(qq, db, h, l, v, st):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, db_split=(h, l),
                                     split_stats=st, sweep_passes=2)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    def ph2(qq, h, l, v):
        g = pf.groupmax_scores(qq, h, v, nt, (h, l), metric=M,
                               nv_eff=NV_EFF, sweep_passes=2)
        gidx, t = pf.select_groups_pallas(g, KG, NG)
        return (jnp.sum(gidx.astype(jnp.float32)) + jnp.sum(t)) * 1e-6

    def ph3a(qq, h, l, v):
        g = pf.groupmax_scores(qq, h, v, nt, (h, l), metric=M,
                               nv_eff=NV_EFF, sweep_passes=2)
        gidx, t = pf.select_groups_pallas(g, KG, NG)
        s = pf.rescore_groups_pallas(qq, h, v, gidx, nt, metric=M,
                                     nv_eff=NV_EFF,
                                     ranks_per_step=pf.RESCORE_RANKS_PAIR,
                                     db2=l)
        return jnp.sum(s) * 1e-9 + jnp.sum(t)

    def f16_sweep(qq, b, v):
        g = pf.groupmax_scores(qq, b, v, nt, None, metric=M,
                               nv_eff=NV_EFF, sweep_passes=2, f16_clean=True)
        return jnp.sum(g)

    PAIR = (hi, lo, vn)
    E = (xj, hi, lo, vn, stats)
    specs = [  # (name, body, args, tile kwargs) — risky big-vmem LAST
        ("SW32 f32 sweep bv=32k", sweep_pair, PAIR, dict()),
        ("E32  f32 e2e   bv=32k", e2e, E, dict()),
        ("PH2  sweep+select", ph2, PAIR, dict()),
        ("PH3a sweep+sel+pair-rescore", ph3a, PAIR, dict()),
        ("F16c32 f16 clean sweep bv=32k", f16_sweep, (bits, vn),
         dict(direct_bv=32768)),
        ("SW64 f32 sweep bv=64k", sweep_pair, PAIR,
         dict(pair_bv=65536, vmem=100 * 1024 * 1024)),
        ("E64  f32 e2e   bv=64k", e2e, E,
         dict(pair_bv=65536, vmem=100 * 1024 * 1024)),
    ]
    variants = {}
    for name, body, arrs, tiles in specs:
        set_tiles(**tiles)
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
    set_tiles()  # restore defaults

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
