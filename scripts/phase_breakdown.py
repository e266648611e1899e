"""Incremental phase breakdown of the fused path (real TPU, r2 config).

Slope-measured, head-to-head in ONE process with interleaved reps
(CLAUDE.md). Every phase's outputs are consumed so XLA can't DCE the cone.
Phases (bf16 1M x 128, nq=104, k=10, sweep_passes=1):
  A sweep        phase 1 only (group-max Pallas sweep)
  B +topg        + phase 2 (_top_groups + threshold + sort)
  C +rescore     + phase 3 (stripe-grid scalar-prefetch rescore)
  D +final       + mask + indices-only top_k + value/id gathers
  E full         fused_search (adds eps + certificate)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

NV, D, NQ, K = 1_000_000, 128, 104, 10
M = MetricType.L2
SP = 1
N1, N2 = 8, 48


def mk(n, body):
    @jax.jit
    def run(x, *arrs):
        def step(c, _):
            return body(x + c) * 1e-20, 0.0
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
    db = jnp.asarray(xb).astype(jnp.bfloat16)
    vn = jnp.asarray((xb ** 2).sum(1).astype(np.float32))
    nt = jnp.int32(NV)
    ngroups = nv_eff // pf.GROUP
    kg = min(K + pf.GROUP_PAD, ngroups)

    def upto(stage):
        def body(x):
            qq = q + x
            gm = pf.groupmax_scores(qq, db, vn, nt, None, metric=M,
                                    nv_eff=nv_eff, sweep_passes=SP)
            if stage == "A":
                return jnp.sum(gm)
            gidx, t = pf._top_groups(gm, kg, ngroups)
            gidx = jnp.sort(gidx, axis=-1)
            if stage == "B":
                return jnp.sum(gidx.astype(jnp.float32)) + jnp.sum(t)
            s = pf.rescore_groups_pallas(qq, db, vn, gidx, nt,
                                         metric=M, nv_eff=nv_eff)
            if stage == "C":
                return jnp.sum(s) + jnp.sum(t)
            offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, pf.GROUP), 2)
            cols = (gidx[:, :, None] * pf.GROUP + offs).reshape(
                NQ, kg * pf.GROUP)
            s = jnp.where(cols < nt, s, pf.NEG_INF)
            _, pos = jax.lax.top_k(s, K)
            vals = jnp.take_along_axis(s, pos, axis=-1)
            ids = jnp.take_along_axis(cols, pos, axis=-1)
            if stage == "D":
                return (jnp.sum(vals) + jnp.sum(ids.astype(jnp.float32))
                        + jnp.sum(t))
            raise AssertionError(stage)
        return body

    def full(x):
        v, i, c = pf.fused_search(q + x, db, vn, nt, k=K, metric=M,
                                  nv_eff=nv_eff, sweep_passes=SP)
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    cfgs = {"A sweep": upto("A"), "B +topg": upto("B"),
            "C +rescore": upto("C"), "D +final": upto("D"), "E full": full}
    built = {}
    for n, b in cfgs.items():
        r1, r2 = mk(N1, b), mk(N2, b)
        _ = np.asarray(r1(jnp.float32(0.0)))
        _ = np.asarray(r2(jnp.float32(0.0)))
        built[n] = (r1, r2)
        print("compiled", n, flush=True)
    res = {n: [] for n in built}
    for rep in range(8):
        for n, (r1, r2) in built.items():
            t0 = time.perf_counter(); _ = np.asarray(r1(jnp.float32(0.0)))
            t1 = time.perf_counter(); _ = np.asarray(r2(jnp.float32(0.0)))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
    for n in built:
        ts = sorted(res[n])
        print(f"{n}: {ts[len(ts)//2]*1e3:.3f} ms (min {min(ts)*1e3:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
