"""Round-3b: integrated-default measurements (real TPU, slope-timed).

After r3a's findings were wired in (phase-2 select kernel ON, in-kernel
rescore-select opt-in-only, fp32 pair sweep DIRECT w/ raised VMEM, f16-bits
sweep w/ raised VMEM): measure every storage's DEFAULT fused e2e plus the
f16 sweep in isolation.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import split_f32_bf16, _split_stats_fn, \
    encode_f16_bits, _quantize_int8_fn

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
    db16 = xbj.astype(jnp.bfloat16)
    dbf16 = encode_f16_bits(xbj)
    hi, lo = split_f32_bf16(xbj)
    stats = _split_stats_fn(jnp.zeros((2,), jnp.float32), xbj, hi, lo)
    scales = jnp.asarray(
        np.maximum(np.abs(xb).max(axis=0) / 127.0, 1e-12), jnp.float32)
    db8, n8, vqmax, _c = _quantize_int8_fn(xbj, scales)
    vn = jnp.asarray((xb ** 2).sum(1).astype(np.float32))
    nt = jnp.int32(NV)

    def tot(v, i, c):
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    def e2e_bf16(x, qq):
        return tot(*pf.fused_search(qq + x, db16, vn, nt, k=K, metric=M,
                                    nv_eff=nv_eff, sweep_passes=1))

    def e2e_f32(x, qq):
        # db = the fp32 master (phase 3 rescores from it, like the index)
        return tot(*pf.fused_search(qq + x, xbj, vn, nt, k=K, metric=M,
                                    nv_eff=nv_eff, db_split=(hi, lo),
                                    split_stats=stats))

    def sweep_f16(x, qq):
        gm = pf.groupmax_scores(qq + x, dbf16, vn, nt, None, metric=M,
                                nv_eff=nv_eff, sweep_passes=1)
        return jnp.sum(gm)

    def e2e_f16(x, qq):
        return tot(*pf.fused_search(qq + x, dbf16, vn, nt, k=K, metric=M,
                                    nv_eff=nv_eff, sweep_passes=1,
                                    split_stats=stats))

    def e2e_int8(x, qq):
        return tot(*pf.fused_search(qq + x, db8, n8, nt, k=K, metric=M,
                                    nv_eff=nv_eff, scales=scales,
                                    int_norm_max=vqmax))

    def e2e_bf16_k100(x, qq):
        return tot(*pf.fused_search(qq + x, db16, vn, nt, k=100, metric=M,
                                    nv_eff=nv_eff, sweep_passes=1))

    cfgs = [
        ("bf16 e2e DEFAULT", e2e_bf16),
        ("f32 e2e DEFAULT (direct pair)", e2e_f32),
        ("f16 sweep (2B bits)", sweep_f16),
        ("f16 e2e DEFAULT", e2e_f16),
        ("int8 e2e DEFAULT", e2e_int8),
        ("bf16 e2e k=100 (XLA p2)", e2e_bf16_k100),
    ]
    built = {}
    for name, body in cfgs:
        try:
            r1, r2 = mk(N1, body), mk(N2, body)
            t0 = time.perf_counter()
            _ = np.asarray(r1(jnp.float32(0.0), q))
            _ = np.asarray(r2(jnp.float32(0.0), q))
            print(f"compiled {name} ({time.perf_counter()-t0:.1f}s)",
                  flush=True)
            built[name] = (r1, r2)
        except Exception as e:
            print(f"FAILED compile {name}: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    res = {n: [] for n in built}
    for rep in range(8):
        for n, (r1, r2) in built.items():
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
