"""Round-3 kernel measurements (real TPU, one process, slope-timed).

Head-to-head in ONE process with interleaved reps (CLAUDE.md: isolated
micro-benchmarks disagree with in-context times). N1=8/N2=88 scan chains.

Configs (1M×128, nq=104, k=10):
  bf16:  sweep-only | sweep+XLA phase2 | sweep+select-kernel |
         OLD e2e (XLA phase2 + 2-stage rescore) | NEW e2e (select kernel +
         in-kernel rescore select)
  fp32:  current transposed 3-pass pair sweep | direct-layout pair tile
         (block_v=16384, vmem_limit raised — the r2 failure hypothesis)
  f16 :  2 B/elem bits sweep (1-pass: decode + 2 dots) | NEW e2e
  int8:  NEW e2e
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import split_f32_bf16, _split_stats_fn, encode_f16_bits

NV, D, NQ, K = 1_000_000, 128, 104, 10
M = MetricType.L2
N1, N2 = 8, 88
VMEM64 = 64 * 1024 * 1024


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
    dbf16 = encode_f16_bits(xbj)                       # int16 bits
    hi, lo = split_f32_bf16(xbj)
    stats = _split_stats_fn(jnp.zeros((2,), jnp.float32), xbj, hi, lo)
    vn = jnp.asarray((xb ** 2).sum(1).astype(np.float32))
    nt = jnp.int32(NV)
    ngroups = nv_eff // pf.GROUP
    kg = min(K + pf.GROUP_PAD, ngroups)
    main_rows = (nv_eff // pf.DIRECT_BV) * pf.DIRECT_BV

    def sweep_bf16(x, qq, dbx, vnx, *a):
        gm = pf.groupmax_scores(qq + x, dbx, vnx, nt, None, metric=M,
                                nv_eff=nv_eff, sweep_passes=1)
        return jnp.sum(gm)

    def sweep_p2_xla(x, qq, dbx, vnx, *a):
        gm = pf.groupmax_scores(qq + x, dbx, vnx, nt, None, metric=M,
                                nv_eff=nv_eff, sweep_passes=1)
        gidx, t = pf._top_groups(gm, kg, ngroups)
        gidx = jnp.sort(gidx, axis=-1)
        return jnp.sum(gidx.astype(jnp.float32)) + jnp.sum(t)

    def sweep_p2_krn(x, qq, dbx, vnx, *a):
        gm = pf.groupmax_scores(qq + x, dbx, vnx, nt, None, metric=M,
                                nv_eff=nv_eff, sweep_passes=1)
        gidx, t = pf.select_groups_pallas(gm, kg, ngroups)
        return jnp.sum(gidx.astype(jnp.float32)) + jnp.sum(t)

    def e2e(x, qq, dbx, vnx, *a):
        v, i, c = pf.fused_search(qq + x, dbx, vnx, nt, k=K, metric=M,
                                  nv_eff=nv_eff, sweep_passes=1)
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    def e2e_f16(x, qq, dbx, vnx, st):
        v, i, c = pf.fused_search(qq + x, dbx, vnx, nt, k=K, metric=M,
                                  nv_eff=nv_eff, sweep_passes=1,
                                  split_stats=st)
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    def sweep_f16(x, qq, dbx, vnx, *a):
        gm = pf.groupmax_scores(qq + x, dbx, vnx, nt, None, metric=M,
                                nv_eff=nv_eff, sweep_passes=1)
        return jnp.sum(gm)

    def sweep_f32_cur(x, qq, hix, lox, vnx):
        gm = pf.groupmax_scores(qq + x, hix, vnx, nt, (hix, lox), metric=M,
                                nv_eff=nv_eff, sweep_passes=2)
        return jnp.sum(gm)

    def sweep_f32_direct(x, qq, hix, lox, vnx):
        qh, ql = split_f32_bf16(qq + x)
        gm = pf._sweep_call(
            pf._kernel_split, (hix, lox), qh, ql,
            vnx[:main_rows].reshape(1, main_rows),
            nv=main_rows, d_pad=D, block_v=pf.DIRECT_BV, nq_pad=NQ,
            metric=M, direct=True, interpret=False, passes=3,
            vmem_limit=VMEM64)
        return jnp.sum(gm)

    def sweep_f32_direct8k(x, qq, hix, lox, vnx):
        # half tile via GROUP-aligned direct? 8192 rows -> 64 groups: not
        # lane-legal for direct; use transposed at 8192 with vmem raise as
        # control instead
        qh, ql = split_f32_bf16(qq + x)
        gm = pf._sweep_call(
            pf._kernel_split, (hix, lox), qh, ql,
            vnx[:main_rows].reshape(1, main_rows),
            nv=main_rows, d_pad=D, block_v=8192, nq_pad=NQ,
            metric=M, direct=False, interpret=False, passes=3,
            vmem_limit=VMEM64)
        return jnp.sum(gm)

    def e2e_int8(x, qq, dbx, vnx, extra):
        sc, inm = extra
        v, i, c = pf.fused_search(qq + x, dbx, vnx, nt, k=K, metric=M,
                                  nv_eff=nv_eff, scales=sc, int_norm_max=inm)
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))

    from faiss_tpu.storage import _quantize_int8_fn
    scales = jnp.asarray(
        np.maximum(np.abs(xb).max(axis=0) / 127.0, 1e-12), jnp.float32)
    db8, n8, vqmax, _clip = _quantize_int8_fn(xbj, scales)

    # (name, body, args, pre(), post())
    saved = {}

    def force_old():
        saved["k"] = pf.RESCORE_SELECT_MAX_K, pf.SELECT_MAX_KG
        pf.RESCORE_SELECT_MAX_K, pf.SELECT_MAX_KG = -1, -1

    def restore():
        pf.RESCORE_SELECT_MAX_K, pf.SELECT_MAX_KG = saved["k"]

    cfgs = [
        ("bf16 sweep",        sweep_bf16,   (q, db16, vn, 0), None, None),
        ("bf16 sw+p2xla",     sweep_p2_xla, (q, db16, vn, 0), None, None),
        ("bf16 sw+p2krn",     sweep_p2_krn, (q, db16, vn, 0), None, None),
        ("bf16 OLD e2e",      e2e,          (q, db16, vn, 0), force_old,
         restore),
        ("bf16 NEW e2e",      e2e,          (q, db16, vn, 0), None, None),
        ("f32 sweep cur",     sweep_f32_cur, (q, hi, lo, vn), None, None),
        ("f32 sweep direct",  sweep_f32_direct, (q, hi, lo, vn), None, None),
        ("f32 sweep 8k+vmem", sweep_f32_direct8k, (q, hi, lo, vn), None,
         None),
        ("f16 sweep",         sweep_f16,    (q, dbf16, vn, 0), None, None),
        ("f16 NEW e2e",       e2e_f16,      (q, dbf16, vn, stats), None,
         None),
        ("int8 NEW e2e",      e2e_int8,     (q, db8, n8, (scales, vqmax)),
         None, None),
    ]
    built = {}
    for name, body, args, pre, post in cfgs:
        if pre:
            pre()
        try:
            r1, r2 = mk(N1, body), mk(N2, body)
            t0 = time.perf_counter()
            _ = np.asarray(r1(jnp.float32(0.0), *args))
            _ = np.asarray(r2(jnp.float32(0.0), *args))
            print(f"compiled {name} ({time.perf_counter()-t0:.1f}s)",
                  flush=True)
            built[name] = (r1, r2, args)
        except Exception as e:
            print(f"FAILED compile {name}: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
        finally:
            if post:
                post()
    res = {n: [] for n in built}
    for rep in range(8):
        for n, (r1, r2, args) in built.items():
            t0 = time.perf_counter()
            _ = np.asarray(r1(jnp.float32(0.0), *args))
            t1 = time.perf_counter()
            _ = np.asarray(r2(jnp.float32(0.0), *args))
            t2 = time.perf_counter()
            res[n].append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
        print(f"rep {rep} done", flush=True)
    for n in built:
        ts = sorted(res[n])
        print(f"{n}: {ts[len(ts)//2]*1e3:.3f} ms (min {min(ts)*1e3:.3f} "
              f"max {max(ts)*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
