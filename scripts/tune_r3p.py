"""Round-3p: int8 / f16 stage breakdown at the headline shape (1M x 128,
nq=104, k=10, L2) — int8 e2e measured 0.665 ms (r3k) but its components
(2-pass int8 sweep ~0.30 + select 0.014 + 1 B/elem rescore ~0.09 + final
select) sum to ~0.5; find the missing ~0.15. f16 likewise after the
clean-bits decode (r3m measures e2e only).

  IS    int8 sweep-only (groupmax_scores)
  ISS   int8 sweep + phase-2 select kernel
  IF    int8 full fused_search
  HS    f16 clean sweep-only
  HF    f16 clean full
  BS    bf16 sweep-only (reference point; r3h full = 0.523)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import (_quantize_int8_fn, encode_f16_bits,
                               decode_f16_bits, split_f32_bf16,
                               _split_stats_fn)

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


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    rng = np.random.default_rng(42)
    xb = np.pad(rng.standard_normal((NV, D), dtype=np.float32),
                ((0, NV_EFF - NV), (0, 0)))
    q = jnp.asarray(rng.standard_normal((NQ, D), dtype=np.float32))
    nt = jnp.int32(NV)
    xbj = jnp.asarray(xb)
    vn = jnp.sum(xbj * xbj, axis=-1)
    scales = jnp.asarray(
        np.maximum(np.abs(xb).max(axis=0) / 127.0, 1e-12), jnp.float32)
    db8, n8, vqmax, _ = _quantize_int8_fn(xbj, scales)
    bits = encode_f16_bits(xbj)
    v16 = decode_f16_bits(bits)
    h16, l16 = split_f32_bf16(v16)
    st16 = jnp.asarray(np.asarray(
        _split_stats_fn(jnp.zeros((2,), jnp.float32), v16, h16, l16)))
    db16 = xbj.astype(jnp.bfloat16)
    del xb, v16, h16, l16

    def i_sweep(qq, db, v, sc):
        g = pf.groupmax_scores(qq, db, v, nt, None, metric=M, nv_eff=NV_EFF,
                               scales=sc)
        return jnp.sum(g)

    def i_sweep_sel(qq, db, v, sc):
        g = pf.groupmax_scores(qq, db, v, nt, None, metric=M, nv_eff=NV_EFF,
                               scales=sc)
        gidx, t = pf.select_groups_pallas(g, KG, NG)
        return jnp.sum(gidx.astype(jnp.float32)) + jnp.sum(t)

    def i_full(qq, db, v, sc):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, scales=sc,
                                     int_norm_max=vqmax)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    def h_sweep(qq, db, v, st):
        g = pf.groupmax_scores(qq, db, v, nt, None, metric=M, nv_eff=NV_EFF,
                               sweep_passes=1, f16_clean=True)
        return jnp.sum(g)

    def h_full(qq, db, v, st):
        v_, i_, c_ = pf.fused_search(qq, db, v, nt, k=K, metric=M,
                                     nv_eff=NV_EFF, sweep_passes=1,
                                     split_stats=st, f16_clean=True)
        return (jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
                + jnp.sum(c_.astype(jnp.float32)))

    def b_sweep(qq, db, v):
        g = pf.groupmax_scores(qq, db, v, nt, None, metric=M, nv_eff=NV_EFF,
                               sweep_passes=1)
        return jnp.sum(g)

    specs = [
        ("IS  int8 sweep", i_sweep, (db8, n8, scales)),
        ("ISS int8 sweep+sel", i_sweep_sel, (db8, n8, scales)),
        ("IF  int8 full", i_full, (db8, n8, scales)),
        ("HS  f16 clean sweep", h_sweep, (bits, vn, st16)),
        ("HF  f16 clean full", h_full, (bits, vn, st16)),
        ("BS  bf16 sweep", b_sweep, (db16, vn)),
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
