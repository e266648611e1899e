"""Round-3j: f32 two-stage e2e optimization A/B (after r3i's breakdown:
sweep 0.748/0.713@bv32k, select +0.014, pair rescore +0.27, glue +0.13).

Variants (1M x 128, nq=104, k=10, L2):
  A0    f32 full, stage-3b top_k via final-select kernel (new default)
  Atk   f32 full, FINAL_SELECT_ENABLE=False (all-XLA top_k tails)
  A32   f32 full, DIRECT_BV=32768 pair sweep tiles
  AR4   f32 full, RESCORE_RANKS=4 (32 in-flight gather DMAs)
  A32R4 f32 full, both
  W2p   f32 sweep-only, REDUCED pair (sweep_passes=1: RNE q, 2 MXU passes)
        — information only: fp32 reduced nomination is currently
        restricted (cert failures, r2); measures the MXU-bound headroom
  Brs   bf16 full, rescore_select=True (single-kernel rescore+select)
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
    del xb

    def full_f32(qq, db, h, l, v, st):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, db_split=(h, l),
                                     split_stats=st)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    def sweep_2p(qq, h, l, v):
        g = pf.groupmax_scores(qq, h, v, nt, (h, l), metric=M,
                               nv_eff=NV_EFF, sweep_passes=1)
        return jnp.sum(g)

    def full_bf16_rs(qq, db, v):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, sweep_passes=1,
                                     rescore_select=True)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    F32A = (xbj, hi, lo, vn, stats32)
    specs = [
        ("A0    f32 3b-select", full_f32, F32A, {}),
        ("Atk   f32 xla-topk", full_f32, F32A, {"fs": False}),
        ("A32   f32 bv=32k", full_f32, F32A, {"bv": 32768}),
        ("AR4   f32 ranks=4", full_f32, F32A, {"rr": 4}),
        ("A32R4 f32 both", full_f32, F32A, {"bv": 32768, "rr": 4}),
        ("W2p   f32 sweep 2-pass", sweep_2p, (hi, lo, vn), {}),
        ("Brs   bf16 in-k select", full_bf16_rs, (db16, vn), {}),
    ]
    variants = {}
    for name, body, arrs, opts in specs:
        pf.FINAL_SELECT_ENABLE = opts.get("fs", True)
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
            pf.FINAL_SELECT_ENABLE = True
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
