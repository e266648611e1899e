"""Isolate why module groupmax (direct-16k) is slower than experiment C."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import split_f32_bf16

NV, D, NQ = 1_000_000, 128, 104
GROUP = pf.GROUP

def slope(fn, args, n1=4, n2=16, reps=6):
    def mk(n):
        @jax.jit
        def run(q, *a):
            def step(c, _):
                out = fn(q + c, *a)
                return jnp.sum(out[0] if isinstance(out, tuple) else out) * 1e-20, 0.0
            c, _ = jax.lax.scan(step, 0.0, None, length=n)
            return c
        return run
    r1, r2 = mk(n1), mk(n2)
    q, rest = args[0], args[1:]
    _ = np.asarray(r1(q, *rest)); _ = np.asarray(r2(q, *rest))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); _ = np.asarray(r1(q, *rest))
        t1 = time.perf_counter(); _ = np.asarray(r2(q, *rest))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return min(ts) * 1e3

def main():
    assert jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(42)
    nv_eff = 1_000_448
    xb = np.pad(rng.standard_normal((NV, D), dtype=np.float32),
                ((0, nv_eff - NV), (0, 0)))
    q = jnp.asarray(rng.standard_normal((NQ, D), dtype=np.float32))
    db16 = jnp.asarray(xb).astype(jnp.bfloat16)
    normsj = jnp.asarray((xb ** 2).sum(1).astype(np.float32))
    nt = jnp.asarray(np.int32(NV)).reshape(1, 1)
    main_rows = (nv_eff // pf.DIRECT_BV) * pf.DIRECT_BV

    # variant: module _sweep_call main-only, WITH cost_estimate (as is)
    def vmod_main(qq, db, vn):
        qh, ql = split_f32_bf16(qq)
        v = jax.lax.slice_in_dim(vn, 0, main_rows, axis=0).reshape(1, main_rows)
        return pf._sweep_call(pf._kernel_qpair, (db,), qh, ql, v, nt,
                              nv=main_rows, d_pad=D, block_v=pf.DIRECT_BV,
                              nq_pad=NQ, metric=MetricType.L2, direct=True,
                              interpret=False, passes=2)
    print(f"module main-only       : {slope(vmod_main, (q, db16, normsj)):.3f} ms", flush=True)

    # same but cost_estimate stripped (monkeypatch CostEstimate -> None)
    orig = pl.pallas_call
    def patched(kernel, **kw):
        kw.pop("cost_estimate", None)
        return orig(kernel, **kw)
    pl.pallas_call = patched
    try:
        print(f"module main-only NO CE : {slope(vmod_main, (q, db16, normsj)):.3f} ms", flush=True)
    finally:
        pl.pallas_call = orig

    # full module groupmax (main+tail+concat)
    def vmod_full(qq, db, vn):
        return pf.groupmax_scores(qq, db, vn, jnp.int32(NV),
                                  metric=MetricType.L2, nv_eff=nv_eff)
    print(f"module full (tail+cat) : {slope(vmod_full, (q, db16, normsj)):.3f} ms", flush=True)

if __name__ == "__main__":
    main()
