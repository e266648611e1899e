"""On-device slope measurement of the fused path (real TPU).

Measures ms/batch as the slope between lax.scan-chained runs of n1 vs n2
iterations (the axon tunnel makes block_until_ready meaningless — CLAUDE.md).
One process = one device claim. Usage: python scripts/measure_fused.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from faiss_tpu.dtypes import MetricType
from faiss_tpu.index import _build_search_fn
from faiss_tpu.ops import pallas_fused
from faiss_tpu.storage import split_f32_bf16

NV, D, NQ, K = 1_000_000, 128, 104, 10
assert jax.devices()[0].platform == "tpu", jax.devices()


def slope(body, args, n1=4, n2=16, reps=5):
    """body(q, *args) -> array; returns ms per iteration."""

    def mk(n):
        @jax.jit
        def run(q, *a):
            def step(c, _):
                out = body(q + c, *a)
                return jnp.sum(out[0] if isinstance(out, tuple) else out) * 1e-20, 0.0

            c, _ = jax.lax.scan(step, 0.0, None, length=n)
            return c

        return run

    r1, r2 = mk(n1), mk(n2)
    q = args[0]
    rest = args[1:]
    _ = np.asarray(r1(q, *rest))
    _ = np.asarray(r2(q, *rest))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(r1(q, *rest))
        t1 = time.perf_counter()
        _ = np.asarray(r2(q, *rest))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return min(ts) * 1e3


def main():
    rng = np.random.default_rng(42)
    nv_eff = -(-NV // 1024) * 1024  # ROW_TILE-aligned like DeviceStore
    xb = rng.standard_normal((NV, D), dtype=np.float32)
    xb = np.pad(xb, ((0, nv_eff - NV), (0, 0)))
    xq = rng.standard_normal((NQ, D), dtype=np.float32)
    norms = (xb.astype(np.float64) ** 2).sum(1).astype(np.float32)
    q = jnp.asarray(np.pad(xq, ((0, 104 - NQ), (0, 0))) if NQ % 8 else xq)
    nt = jnp.int32(NV)
    normsj = jnp.asarray(norms)

    # bf16 storage
    db16 = jnp.asarray(xb).astype(jnp.bfloat16)

    def sweep16(qq, db, vn):
        return pallas_fused.groupmax_scores(
            qq, db, vn, nt, metric=MetricType.L2, nv_eff=nv_eff)

    print("compiling sweep bf16 (2-pass qpair)...", flush=True)
    ms = slope(sweep16, (q, db16, normsj))
    bw = NV * D * 2 / (ms / 1e3) / 1e9
    print(f"sweep bf16 2-pass: {ms:.3f} ms/batch  ({bw:.0f} GB/s)", flush=True)

    fn16 = _build_search_fn(nv_eff=nv_eff, d_pad=D, nq_pad=104, k=K,
                            metric=MetricType.L2, use_direct=False,
                            use_fused=True, chunk=1 << 18)

    def e2e16(qq, db, vn):
        d, i, c = fn16(db, vn, qq, nt)
        return d

    print("compiling e2e bf16...", flush=True)
    ms = slope(e2e16, (q, db16, normsj))
    print(f"e2e bf16 fused: {ms:.3f} ms/batch  ({NQ/ms*1e3:.0f} QPS-device)",
          flush=True)

    # fp32 storage (hi/lo pair sweep)
    db32 = jnp.asarray(xb)
    hi, lo = split_f32_bf16(db32)
    hi, lo = jax.device_put(hi), jax.device_put(lo)

    fn32 = _build_search_fn(nv_eff=nv_eff, d_pad=D, nq_pad=104, k=K,
                            metric=MetricType.L2, use_direct=False,
                            use_fused=True, chunk=1 << 18)

    def e2e32(qq, db, vn, h, l):
        d, i, c = fn32(db, vn, qq, nt, h, l)
        return d

    print("compiling e2e fp32...", flush=True)
    ms = slope(e2e32, (q, db32, normsj, hi, lo))
    print(f"e2e fp32 fused: {ms:.3f} ms/batch  ({NQ/ms*1e3:.0f} QPS-device)",
          flush=True)

    # certificate rate on real data shapes (should be all-true)
    d_, i_, c_ = fn16(db16, normsj, q, nt)
    print(f"bf16 certified: {np.asarray(c_).sum()}/{104}", flush=True)
    d_, i_, c_ = fn32(db32, normsj, q, nt, hi, lo)
    print(f"fp32 certified: {np.asarray(c_).sum()}/{104}", flush=True)


if __name__ == "__main__":
    main()
