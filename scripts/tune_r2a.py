"""Round-2 phase tuning: sweep alignment, bf16 phase-2 keys, rescore gpj.

Head-to-head in ONE process, interleaved reps, median slope (CLAUDE.md).
Phases isolated on fixed device inputs (gmax / gidx precomputed once).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf

NV, D, NQ, K = 1_000_000, 128, 104, 10
M = MetricType.L2
N1, N2 = 4, 104


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
    nv_al = -(-nv_eff // pf.DIRECT_BV) * pf.DIRECT_BV  # 16384-aligned
    xb = np.pad(rng.standard_normal((NV, D), dtype=np.float32),
                ((0, nv_al - NV), (0, 0)))
    q = jnp.asarray(rng.standard_normal((NQ, D), dtype=np.float32))
    db16a = jnp.asarray(xb).astype(jnp.bfloat16)          # (nv_al, D)
    normsa = jnp.asarray((xb ** 2).sum(1).astype(np.float32))
    nt = jnp.int32(NV)
    ngroups = nv_eff // pf.GROUP
    kg = 14

    # fixed phase inputs
    gmax = pf.groupmax_scores(q, db16a, normsa, nt, None, metric=M,
                              nv_eff=nv_eff)
    gidx0, _ = pf._top_groups(gmax, kg, ngroups)
    gidx0 = jnp.sort(gidx0, axis=-1)
    s0 = pf.rescore_groups_pallas(q, db16a, normsa, gidx0, nt,
                                  metric=M, nv_eff=nv_eff)
    gmax, gidx0, s0 = jax.block_until_ready((gmax, gidx0, s0))

    cfgs = {}

    def sweep_cur(qq):
        gm = pf.groupmax_scores(qq, db16a, normsa, nt, None, metric=M,
                                nv_eff=nv_eff)
        return jnp.sum(gm)
    cfgs["sweep cur (tail)"] = (sweep_cur, q)

    def sweep_al(qq):
        gm = pf.groupmax_scores(qq, db16a, normsa, nt, None, metric=M,
                                nv_eff=nv_al)
        return jnp.sum(gm)
    cfgs["sweep 16384-aligned"] = (sweep_al, q)

    def topg_f32(gm):
        gi, t = pf._top_groups(gm, kg, ngroups)
        return jnp.sum(jnp.sort(gi, -1).astype(jnp.float32)) + jnp.sum(t)
    cfgs["topg f32 (cur)"] = (topg_f32, gmax)

    def topg_bf16(gm):
        _, gi = jax.lax.top_k(gm.astype(jnp.bfloat16), kg)
        masked = jnp.put_along_axis(gm, gi, pf.NEG_INF, axis=-1,
                                    inplace=False)
        t = jnp.max(masked, axis=-1)
        return jnp.sum(jnp.sort(gi, -1).astype(jnp.float32)) + jnp.sum(t)
    cfgs["topg bf16 keys"] = (topg_bf16, gmax)

    def topg_f16(gm):
        _, gi = jax.lax.top_k(gm.astype(jnp.float16), kg)
        masked = jnp.put_along_axis(gm, gi, pf.NEG_INF, axis=-1,
                                    inplace=False)
        t = jnp.max(masked, axis=-1)
        return jnp.sum(jnp.sort(gi, -1).astype(jnp.float32)) + jnp.sum(t)
    cfgs["topg f16 keys"] = (topg_f16, gmax)

    def mk_resc(gpj):
        def resc(gi_f):
            gi = gi_f  # already int32; add c upsets dtype — use closure on s0
            s = pf.rescore_groups_pallas(q, db16a, normsa, gi, nt,
                                         metric=M, nv_eff=nv_eff)
            return jnp.sum(s)
        return resc

    # rescore variants need int input; wrap body to take float x and ignore
    def mk_resc_f(gpj):
        def body(x):
            s = pf.rescore_groups_pallas(q + x, db16a, normsa, gidx0, nt,
                                         metric=M, nv_eff=nv_eff)
            return jnp.sum(s)
        return body

    saved = pf.RESCORE_GPJ
    built = {}
    for name, (body, arg) in cfgs.items():
        built[name] = (mk(N1, body), mk(N2, body), arg)
    for gpj in (2, 7, 14):
        pf.RESCORE_GPJ = gpj
        body = mk_resc_f(gpj)
        built[f"rescore gpj={gpj}"] = (mk(N1, body), mk(N2, body),
                                       jnp.float32(0.0))
    pf.RESCORE_GPJ = saved

    def final_topk(s):
        _, pos = jax.lax.top_k(s, K)
        vals = jnp.take_along_axis(s, pos, axis=-1)
        return jnp.sum(vals) + jnp.sum(pos.astype(jnp.float32))
    built["final topk f32"] = (mk(N1, final_topk), mk(N2, final_topk), s0)

    for n, (r1, r2, arg) in built.items():
        _ = np.asarray(r1(arg)); _ = np.asarray(r2(arg))
        print("compiled", n, flush=True)
    res = {n: [] for n in built}
    for rep in range(6):
        for n, (r1, r2, arg) in built.items():
            t0 = time.perf_counter(); _ = np.asarray(r1(arg))
            t1 = time.perf_counter(); _ = np.asarray(r2(arg))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
    for n in built:
        ts = sorted(res[n])
        print(f"{n}: {ts[len(ts)//2]*1e3:.3f} ms (min {min(ts)*1e3:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
