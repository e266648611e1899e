"""Round-3i: f32 sweep block_v A/B + f32 two-stage phase breakdown.

r3h's sweep-only variants crashed on a harness bug (db=None); this fixes
the call (db=hi with db_split=(hi, lo) — the pair-only calling convention)
and adds the cumulative breakdown of the 1.129 ms f32 two-stage e2e.

Variants (1M x 128, nq=104, k=10, L2):
  W8   f32 sweep-only, direct pair tile block_v=8192  (2x2 MB)
  W16  f32 sweep-only, block_v=16384                  (current default)
  W32  f32 sweep-only, block_v=32768                  (2x8 MB)
  WS   sweep + Pallas select
  WP   sweep + select + stage-3a pair rescore (db2=lo)
  A    f32 two-stage full fused_search                (r3h: 1.129)
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
BV0 = pf.DIRECT_BV
NV_EFF = ((NV + BV0 - 1) // BV0) * BV0          # 1,015,808 (÷ 8192/16384/32768)
NG = NV_EFF // pf.GROUP
KG = K + pf.GROUP_PAD


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
    del xb

    def sweep(qq, h, l, v):
        g = pf.groupmax_scores(qq, h, v, nt, (h, l), metric=M,
                               nv_eff=NV_EFF, sweep_passes=2)
        return jnp.sum(g)

    def sweep_sel(qq, h, l, v):
        g = pf.groupmax_scores(qq, h, v, nt, (h, l), metric=M,
                               nv_eff=NV_EFF, sweep_passes=2)
        gidx, t = pf.select_groups_pallas(g, KG, NG)
        return jnp.sum(gidx.astype(jnp.float32)) + jnp.sum(t)

    def sweep_sel_pair(qq, h, l, v):
        g = pf.groupmax_scores(qq, h, v, nt, (h, l), metric=M,
                               nv_eff=NV_EFF, sweep_passes=2)
        gidx, t = pf.select_groups_pallas(g, KG, NG)
        s = pf.rescore_groups_pallas(qq, h, v, gidx, nt, metric=M,
                                     nv_eff=NV_EFF,
                                     ranks_per_step=pf.RESCORE_RANKS,
                                     db2=l)
        return jnp.sum(s) + jnp.sum(t)

    def full_f32(qq, db, h, l, v, st):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, db_split=(h, l),
                                     split_stats=st)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    specs = [
        ("W16 sweep bv=16k", sweep, (hi, lo, vn), 16384),
        ("W32 sweep bv=32k", sweep, (hi, lo, vn), 32768),
        ("WS  +select", sweep_sel, (hi, lo, vn), BV0),
        ("WP  +pair rescore", sweep_sel_pair, (hi, lo, vn), BV0),
        ("A   f32 2stage full", full_f32, (xbj, hi, lo, vn, stats32), BV0),
    ]
    variants = {}
    for name, body, arrs, bv in specs:
        pf.DIRECT_BV = bv
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
                  f"{type(e).__name__}: {str(e)[:1500]}", flush=True)
        finally:
            pf.DIRECT_BV = BV0

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
