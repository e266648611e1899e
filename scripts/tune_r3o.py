"""Round-3o: pair-rescore pipelining depth A/B after the _ranks_per_step
divisor fix (484da5d).

r3j's "ranks=4" rows monkeypatched the WRONG constant for the pair path
and, at kg=14, the then-current fallback ran rj=1 — so the committed
"RESCORE_RANKS_PAIR=4" configuration had in fact been measured at rj=1.
With the divisor fallback the same constant now yields rj=2 at the
headline shape. Settle it head-to-head in ONE process (interleaved reps):

  P1   f32 full e2e, pair rescore rj=1 (what r3j's best actually ran)
  P2   f32 full e2e, pair rescore rj=2 (what RESCORE_RANKS_PAIR=4 now runs)
  P3   f32 full e2e, GROUP_PAD 4→6 so kg=16 divides rj=4: deeper rescore
       pipelining at +14% rescore DMA (16 vs 14 groups). If P3 < P2 the
       index layer should round kg up to a multiple of the requested rj.
  B0   bf16 full e2e rescore_select (regression check: _ranks_per_step
       keeps the measured rj=2 for RESCORE_RANKS=2 at kg=14)
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
RRP0 = pf.RESCORE_RANKS_PAIR
GP0 = pf.GROUP_PAD
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

    def full_bf16_rs(qq, db, v):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, sweep_passes=1,
                                     rescore_select=True)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    F32A = (xbj, hi, lo, vn, stats32)
    specs = [
        ("P1 f32 pair rj=1", full_f32, F32A, {"rrp": 1}),
        ("P2 f32 pair rj=2", full_f32, F32A, {"rrp": 4}),
        ("P3 f32 kg=16 rj=4", full_f32, F32A, {"rrp": 4, "gp": 6}),
        ("B0 bf16 in-k select", full_bf16_rs, (db16, vn), {}),
    ]
    variants = {}
    for name, body, arrs, opts in specs:
        pf.RESCORE_RANKS_PAIR = opts.get("rrp", RRP0)
        pf.GROUP_PAD = opts.get("gp", GP0)
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
            pf.RESCORE_RANKS_PAIR = RRP0
            pf.GROUP_PAD = GP0

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
