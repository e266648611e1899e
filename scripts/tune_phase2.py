"""Phase-2 (top-groups) variants at the headline shape (real TPU).

After r2's stripe rescore, the fused path is sweep 0.30 + rescore 0.13 +
~0.28 ms of phase 2 + finalization. Measures, head-to-head in one process
(CLAUDE.md slope recipe):
  p2 exact      current: indices-only top_k(7816->14) + scatter+max threshold
  p2 approx     lax.approx_max_k (PartialReduce HW op) + exact scatter+max
                threshold (certificate still exact: a missed group raises t
                and fails the cert -> tiered fallback)
  p2 hier       XLA block-max(8) -> top_k(977) -> refine candidates
  e2e exact/approx  full fused_search (sweep_passes=1) with each phase 2
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

NV, D, NQ, K = 1_000_000, 128, 104, 10
M = MetricType.L2
N1, N2 = 4, 24


def mk(n, body):
    @jax.jit
    def run(x, *arrs):
        def step(c, _):
            return body(x + c, *arrs) * 1e-20, 0.0
        c, _ = jax.lax.scan(step, 0.0, None, length=n)
        return c
    return run


def p2_exact(gmax, kg, ngroups):
    gidx, t = pf._top_groups(gmax, kg, ngroups)
    return jnp.sum(gidx.astype(jnp.float32)) + jnp.sum(t)


def p2_approx(gmax, kg, ngroups):
    _, gidx = jax.lax.approx_max_k(gmax, kg, aggregate_to_topk=True)
    masked = jnp.put_along_axis(gmax, gidx, pf.NEG_INF, axis=-1,
                                inplace=False)
    t = jnp.max(masked, axis=-1)
    return jnp.sum(gidx.astype(jnp.float32)) + jnp.sum(t)


def p2_hier(gmax, kg, ngroups):
    SG = 8
    nq = gmax.shape[0]
    nblocks = ngroups // SG
    bmax = jnp.max(gmax.reshape(nq, nblocks, SG), axis=-1)
    _, bidx = jax.lax.top_k(bmax, kg)
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, SG), 2)
    cand_cols = (bidx[:, :, None] * SG + offs).reshape(nq, kg * SG)
    cand = jnp.take_along_axis(gmax, cand_cols, axis=1)
    _, pos = jax.lax.top_k(cand, kg)
    gidx = jnp.take_along_axis(cand_cols, pos, axis=1)
    t = jnp.max(jnp.put_along_axis(cand, pos, pf.NEG_INF, axis=-1,
                                   inplace=False), axis=-1)
    t_blk = jnp.max(jnp.put_along_axis(bmax, bidx, pf.NEG_INF, axis=-1,
                                       inplace=False), axis=-1)
    return jnp.sum(gidx.astype(jnp.float32)) + jnp.sum(jnp.maximum(t, t_blk))


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
    gmax0 = jax.block_until_ready(pf.groupmax_scores(
        q, db, vn, nt, None, metric=M, nv_eff=nv_eff, sweep_passes=1))

    # sanity: approx vs exact nomination overlap on this data
    _, ge = jax.lax.top_k(gmax0, kg)
    _, ga = jax.lax.approx_max_k(gmax0, kg, aggregate_to_topk=True)
    ge_n, ga_n = np.asarray(ge), np.asarray(ga)
    ov = np.mean([len(set(ge_n[i]) & set(ga_n[i])) / kg
                  for i in range(NQ)])
    print(f"approx/exact nomination overlap: {ov:.4f}", flush=True)

    def sweep_only(x):
        gm = pf.groupmax_scores(q + x, db, vn, nt, None, metric=M,
                                nv_eff=nv_eff, sweep_passes=1)
        return jnp.sum(gm)

    def sweep_p2(fn):
        def body(x):
            gm = pf.groupmax_scores(q + x, db, vn, nt, None, metric=M,
                                    nv_eff=nv_eff, sweep_passes=1)
            return fn(gm, kg, ngroups)
        return body

    def consume(v, i, c):
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    def e2e(approx):
        def body(x):
            return consume(*pf.fused_search(
                q + x, db, vn, nt, k=K, metric=M, nv_eff=nv_eff,
                sweep_passes=1, approx_groups=approx))
        return body

    cfgs = {
        "sweep only 1p": sweep_only,
        "sweep+p2 exact": sweep_p2(p2_exact),
        "sweep+p2 approx": sweep_p2(p2_approx),
        "sweep+p2 hier": sweep_p2(p2_hier),
        "e2e exact": e2e(False),
        "e2e approx": e2e(True),
    }
    built = {}
    for n, b in cfgs.items():
        try:
            r1, r2 = mk(N1, b), mk(N2, b)
            _ = np.asarray(r1(jnp.float32(0.0)))
            _ = np.asarray(r2(jnp.float32(0.0)))
            built[n] = (r1, r2)
            print("compiled", n, flush=True)
        except Exception as ex:
            print("FAILED", n, repr(ex)[:200], flush=True)
    res = {n: [] for n in built}
    for rep in range(6):
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
