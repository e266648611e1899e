"""Round-3n: large-k breakdown (1M x 128 bf16, nq=8, k=1024 — 4.6 ms e2e).

Hypothesis: at nq=8 the stripe-grid rescore has ONE stripe, so its
kg/rj grid steps serialize on gather-DMA latency (kg=1028, rj=2 → 514
steps). Variants isolate the phases and try deeper ranks-per-step.

  S    sweep-only (1-pass)
  ST   sweep + XLA top-1028 groups (phase 2; kg > SELECT_MAX_KG)
  SR2  + stripe rescore rj=2        (current default)
  SR4  + stripe rescore rj=4        (257 steps, 32 DMAs in flight)
  F    full fused_search k=1024     (adds final top-1024 over 131k cols)
  F4   full with RESCORE_RANKS=4
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

NV, D, NQ, K = 1_000_000, 128, 8, 1024
M = MetricType.L2
N1, N2 = 8, 48
RR0 = pf.RESCORE_RANKS
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


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    rng = np.random.default_rng(42)
    xb = np.pad(rng.standard_normal((NV, D), dtype=np.float32),
                ((0, NV_EFF - NV), (0, 0)))
    q = jnp.asarray(rng.standard_normal((NQ, D), dtype=np.float32))
    vn = jnp.asarray((xb ** 2).sum(1).astype(np.float32))
    nt = jnp.int32(NV)
    db16 = jnp.asarray(xb).astype(jnp.bfloat16)
    del xb

    def sweep(qq, db, v):
        return jnp.sum(pf.groupmax_scores(qq, db, v, nt, None, metric=M,
                                          nv_eff=NV_EFF, sweep_passes=1))

    def sweep_top(qq, db, v):
        g = pf.groupmax_scores(qq, db, v, nt, None, metric=M,
                               nv_eff=NV_EFF, sweep_passes=1)
        gidx, t = pf._top_groups(g, KG, NG)
        return jnp.sum(jnp.sort(gidx, axis=-1).astype(jnp.float32)) \
            + jnp.sum(t)

    def sweep_resc(rj):
        def body(qq, db, v):
            g = pf.groupmax_scores(qq, db, v, nt, None, metric=M,
                                   nv_eff=NV_EFF, sweep_passes=1)
            gidx, t = pf._top_groups(g, KG, NG)
            gidx = jnp.sort(gidx, axis=-1)
            s = pf.rescore_groups_pallas(qq, db, v, gidx, nt, metric=M,
                                         nv_eff=NV_EFF, ranks_per_step=rj)
            return jnp.sum(s) + jnp.sum(t)
        return body

    def full(qq, db, v):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, sweep_passes=1)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    A = (db16, vn)
    specs = [
        ("S   sweep", sweep, A, None),
        ("ST  +top-groups", sweep_top, A, None),
        ("SR2 +rescore rj=2", sweep_resc(2), A, None),
        ("SR4 +rescore rj=4", sweep_resc(4), A, None),
        ("F   full k=1024", full, A, 2),
        ("F4  full ranks=4", full, A, 4),
    ]
    variants = {}
    for name, body, arrs, rr in specs:
        if rr is not None:
            pf.RESCORE_RANKS = rr
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
            pf.RESCORE_RANKS = RR0

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
    print("== ms/batch (nq=8, k=1024, 1M x 128 bf16, L2) ==", flush=True)
    for n in variants:
        ts = sorted(res[n])
        print(f"{n}: median {ts[len(ts)//2]*1e3:.3f} ms "
              f"(min {min(ts)*1e3:.3f} max {max(ts)*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
