"""int8 storage on-device numbers at the headline shape (real TPU).

Slope-measured head-to-head (CLAUDE.md recipe): sweep alone, full fused
path, and certificate rates on gaussian vs SIFT-like data.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

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

    def quantize(xb):
        s = np.maximum(np.abs(xb[:NV]).max(axis=0), 1e-12) / 127.0
        q = np.clip(np.round(xb / s[None, :]), -127, 127)
        dec = (q * s[None, :]).astype(np.float32)
        vq = jnp.asarray(q, jnp.int8)
        vn = jnp.asarray((dec ** 2).sum(1).astype(np.float32))
        inm = jnp.float32(np.sqrt((q[:NV] ** 2).sum(1).max()))
        return jnp.asarray(s, jnp.float32), vq, vn, inm

    xb = np.pad(rng.standard_normal((NV, D), dtype=np.float32),
                ((0, nv_eff - NV), (0, 0)))
    q = jnp.asarray(rng.standard_normal((NQ, D), dtype=np.float32))
    scales, vq, vn, inm = quantize(xb)
    nt = jnp.int32(NV)

    # cert rates (gauss + sift-like), k=10 and k=100
    for kind in ("gauss", "sift"):
        if kind == "sift":
            xbs = np.pad(np.minimum(np.floor(
                rng.gamma(0.55, 48.0, (NV, D))), 218.0).astype(np.float32),
                ((0, nv_eff - NV), (0, 0)))
            qs_ = jnp.asarray(np.minimum(np.floor(
                rng.gamma(0.55, 48.0, (NQ, D))), 218.0).astype(np.float32))
            sc, vq_, vn_, inm_ = quantize(xbs)
        else:
            qs_, sc, vq_, vn_, inm_ = q, scales, vq, vn, inm
        for k in (10, 100):
            v, i, c = jax.device_get(pf.fused_search(
                qs_, vq_, vn_, nt, k=k, metric=M, nv_eff=nv_eff,
                scales=sc, int_norm_max=inm_))
            print(f"int8 {kind} k={k}: cert rate "
                  f"{float(np.asarray(c).mean()):.4f}", flush=True)

    def sweep(x, qq, dbx, vnx, sc):
        gm = pf.groupmax_scores(qq + x, dbx, vnx, nt, None, metric=M,
                                nv_eff=nv_eff, scales=sc)
        return jnp.sum(gm)

    def e2e(x, qq, dbx, vnx, sc, inmx):
        v, i, c = pf.fused_search(qq + x, dbx, vnx, nt, k=K, metric=M,
                                  nv_eff=nv_eff, scales=sc, int_norm_max=inmx)
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    cfgs = {
        "int8 sweep": (sweep, (q, vq, vn, scales)),
        "int8 full": (e2e, (q, vq, vn, scales, inm)),
    }
    built = {}
    for n, (b, arrs) in cfgs.items():
        r1, r2 = mk(N1, b), mk(N2, b)
        _ = np.asarray(r1(jnp.float32(0.0), *arrs))
        _ = np.asarray(r2(jnp.float32(0.0), *arrs))
        built[n] = (r1, r2, arrs)
        print("compiled", n, flush=True)
    res = {n: [] for n in built}
    for rep in range(8):
        for n, (r1, r2, arrs) in built.items():
            t0 = time.perf_counter()
            _ = np.asarray(r1(jnp.float32(0.0), *arrs))
            t1 = time.perf_counter()
            _ = np.asarray(r2(jnp.float32(0.0), *arrs))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
    for n in built:
        ts = sorted(res[n])
        print(f"{n}: {ts[len(ts)//2]*1e3:.3f} ms (min {min(ts)*1e3:.3f} "
              f"max {max(ts)*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
