"""r5g: large-k final-select A/B — blocked two-stage vs flat lax.top_k,
HEAD-TO-HEAD in one process (r3n2 measured the blocked form at 3.11 ms
e2e where r3n had measured the flat form at 2.31 — different days, and
tunnel drift makes cross-day comparisons worthless; CLAUDE.md).

Variants (1M x 128 bf16, nq=8, k=1024):
  FB  full fused search, blocked final select (FINAL_BLOCKED_MIN=65536)
  FF  full fused search, flat final select    (FINAL_BLOCKED_MIN huge)
  FB2/FF2 same, interleaved again (drift check)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

NV, D, NQ, K = 1_000_000, 128, 8, 1024
M = MetricType.L2
N1, N2 = 8, 32
REPS = 8


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
    xb = rng.standard_normal((NV, D), dtype=np.float32)
    q = rng.standard_normal((NQ, D), dtype=np.float32)
    nv_eff = ((NV + pf.DIRECT_BV - 1) // pf.DIRECT_BV) * pf.DIRECT_BV
    xg = np.zeros((nv_eff, D), np.float32)
    xg[:NV] = xb
    vn = jnp.asarray((xg ** 2).sum(1).astype(np.float32))
    db = jnp.asarray(xg).astype(jnp.bfloat16)
    del xg
    nt = jnp.int32(NV)
    qp = jnp.asarray(q)

    def full_fn(blocked_min):
        old = pf.FINAL_BLOCKED_MIN

        def body(qq, db_, vn_):
            pf.FINAL_BLOCKED_MIN = blocked_min  # trace-time routing only
            try:
                v_, i_, _ = pf.fused_search(
                    qq, db_, vn_, nt, k=K, metric=M, nv_eff=nv_eff,
                    sweep_passes=1)
            finally:
                pf.FINAL_BLOCKED_MIN = old
            return jnp.sum(v_) + jnp.sum(i_.astype(jnp.float32))
        return body

    specs = [
        ("FB blocked final", full_fn(65536)),
        ("FF flat final", full_fn(1 << 30)),
    ]
    fns = {}
    for name, body in specs:
        t0 = time.time()
        c1, c2 = chain(N1, body), chain(N2, body)
        np.asarray(c1(jnp.float32(0.0), qp, db, vn))
        np.asarray(c2(jnp.float32(0.0), qp, db, vn))
        fns[name] = (c1, c2)
        print(f"compiled {name} ({time.time()-t0:.1f}s)", flush=True)

    times = {n: [] for n, _ in specs}
    for rep in range(REPS):
        for name, _ in specs:
            c1, c2 = fns[name]
            t0 = time.perf_counter()
            np.asarray(c1(jnp.float32(rep), qp, db, vn))
            t1 = time.perf_counter()
            np.asarray(c2(jnp.float32(rep), qp, db, vn))
            t2 = time.perf_counter()
            times[name].append(((t2 - t1) - (t1 - t0)) / (N2 - N1) * 1e3)
        print(f"rep {rep} done", flush=True)
    print(f"== ms/batch (nq={NQ}, k={K}, 1M x 128 bf16, L2) ==", flush=True)
    for name, _ in specs:
        v = np.asarray(times[name])
        print(f"{name}: median {np.median(v):.3f} ms "
              f"(min {v.min():.3f} max {v.max():.3f})", flush=True)


if __name__ == "__main__":
    main()
