"""Round-3d: head-to-head e2e slope timing of all four storage modes with
the tail-free sweep (nv_eff aligned to DIRECT_BV -> ONE Mosaic sweep kernel,
no transposed tail; the r3c bisect showed the fp32 e2e with main+tail dying
in the remote compiler).

One process, one device claim, interleaved reps (CLAUDE.md: isolated
micro-benchmarks disagree with in-context times). Slope between N1=8 and
N2=88 lax.scan-chained runs. All big arrays passed as jit ARGUMENTS.

Shapes mirror the driver bench: nv=1M, d=128, nq=104 (bench pads 100->104),
k=10, L2. nv_eff = round_up(1M, 16384) = 1_015_808 (capacity 2^20 covers it).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import (split_f32_bf16, _split_stats_fn,
                               encode_f16_bits, _quantize_int8_fn)

NV, D, NQ, K = 1_000_000, 128, 104, 10
M = MetricType.L2
N1, N2 = 8, 88
NV_EFF = ((NV + pf.DIRECT_BV - 1) // pf.DIRECT_BV) * pf.DIRECT_BV


def tot(v, i, c):
    return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
            + jnp.sum(c.astype(jnp.float32)))


def chain(n, body, nargs):
    """jit a scan-chain of `n` body invocations; arrays are arguments."""
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
    vn_np = (xb ** 2).sum(1).astype(np.float32)
    vn = jnp.asarray(vn_np)
    nt = jnp.int32(NV)

    xbj = jnp.asarray(xb)
    hi, lo = split_f32_bf16(xbj)
    stats32 = np.asarray(_split_stats_fn(jnp.zeros((2,), jnp.float32),
                                         xbj, hi, lo))
    stats32 = jnp.asarray(stats32)
    db16 = xbj.astype(jnp.bfloat16)
    dbh = encode_f16_bits(xbj)
    scales = jnp.asarray(
        np.maximum(np.abs(xb).max(axis=0) / 127.0, 1e-12), jnp.float32)
    db8, n8, vqmax, clip = _quantize_int8_fn(xbj, scales)
    del xb

    variants = {}

    def e2e_f32(qq, db, h, l, v, st):
        return tot(*pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                    nv_eff=NV_EFF, db_split=(h, l),
                                    split_stats=st))

    def e2e_bf16(qq, db, v):
        return tot(*pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                    nv_eff=NV_EFF))

    def e2e_f16(qq, db, v, st):
        return tot(*pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                    nv_eff=NV_EFF, split_stats=st))

    def e2e_int8(qq, db, v, sc, vq):
        return tot(*pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                    nv_eff=NV_EFF, scales=sc,
                                    int_norm_max=vq))

    specs = [
        ("f32", e2e_f32, (xbj, hi, lo, vn, stats32)),
        ("bf16", e2e_bf16, (db16, vn)),
        ("f16", e2e_f16, (dbh, vn, jnp.zeros((2,), jnp.float32))),
        ("int8", e2e_int8, (db8, n8, scales, vqmax)),
    ]
    for name, body, arrs in specs:
        t0 = time.perf_counter()
        try:
            r1 = chain(N1, body, len(arrs))
            r2 = chain(N2, body, len(arrs))
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
    print("== e2e ms/batch (nq=104, k=10, 1M x 128, L2) ==", flush=True)
    for n in variants:
        ts = sorted(res[n])
        print(f"{n}: median {ts[len(ts)//2]*1e3:.3f} ms "
              f"(min {min(ts)*1e3:.3f} max {max(ts)*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
