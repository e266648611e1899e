"""Round-3c: bisect the remote-compiler crash on the fp32 e2e program.

tune_r3b: f32 e2e DEFAULT (direct-pair sweep + Pallas select + stripe
rescore) reproducibly dies with a remote_compile broken pipe after ~30 min,
while the direct-pair SWEEP alone compiled (r3a, 0.704 ms) and the bf16 e2e
with the select kernel compiled (slow: 1135 s incl. claim / 280 s warm).

Attempts (each try/except; the server recovers between processes and often
between calls):
  A. f32 e2e, select kernel OFF  (direct pair + XLA phase2 + rescore)
  B. f32 e2e, select kernel ON, pair-direct OFF (transposed sweep)
  C. whichever compiled: slope-measure
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


def mk(n, body):
    @jax.jit
    def run(x, *arrs):
        def step(c, _):
            return body(x + c, *arrs) * 1e-20, 0.0
        c, _ = jax.lax.scan(step, 0.0, None, length=n)
        return c
    return run


def main():
    assert jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(42)
    nv_eff = 1_000_448
    xb = np.pad(rng.standard_normal((NV, D), dtype=np.float32),
                ((0, nv_eff - NV), (0, 0)))
    q = jnp.asarray(rng.standard_normal((NQ, D), dtype=np.float32))
    xbj = jnp.asarray(xb)
    hi, lo = split_f32_bf16(xbj)
    stats = _split_stats_fn(jnp.zeros((2,), jnp.float32), xbj, hi, lo)
    vn = jnp.asarray((xb ** 2).sum(1).astype(np.float32))
    nt = jnp.int32(NV)

    def tot(v, i, c):
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    def e2e_f32(x, qq):
        return tot(*pf.fused_search(qq + x, xbj, vn, nt, k=K, metric=M,
                                    nv_eff=nv_eff, db_split=(hi, lo),
                                    split_stats=stats))

    built = {}

    def attempt(name, select_kg, pair_direct):
        pf.SELECT_MAX_KG = select_kg
        pf.PAIR_DIRECT_ENABLE = pair_direct
        try:
            r1, r2 = mk(N1, e2e_f32), mk(N2, e2e_f32)
            t0 = time.perf_counter()
            _ = np.asarray(r1(jnp.float32(0.0), q))
            _ = np.asarray(r2(jnp.float32(0.0), q))
            print(f"compiled {name} ({time.perf_counter()-t0:.1f}s)",
                  flush=True)
            built[name] = (r1, r2, select_kg, pair_direct)
        except Exception as e:
            print(f"FAILED compile {name} ({time.perf_counter()-t0:.1f}s): "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    attempt("A f32 select-OFF pair-direct-ON", 0, True)
    attempt("B f32 select-ON pair-direct-OFF", 40, False)
    res = {n: [] for n in built}
    for rep in range(6):
        for n, (r1, r2, skg, pd) in built.items():
            pf.SELECT_MAX_KG, pf.PAIR_DIRECT_ENABLE = skg, pd
            t0 = time.perf_counter()
            _ = np.asarray(r1(jnp.float32(0.0), q))
            t1 = time.perf_counter()
            _ = np.asarray(r2(jnp.float32(0.0), q))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
        print(f"rep {rep} done", flush=True)
    for n in built:
        ts = sorted(res[n])
        print(f"{n}: {ts[len(ts)//2]*1e3:.3f} ms (min {min(ts)*1e3:.3f} "
              f"max {max(ts)*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
