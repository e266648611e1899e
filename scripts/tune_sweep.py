"""Sweep/phase tuning experiments on the real TPU (1M×128 bf16, nq=104).

Variants:
  A  current module path (block_v=8192, out transposed (ngroups, nq))
  B  block_v=16384, transposed out
  C  block_v=16384, DIRECT (nq, ngroups) out layout (lane dim = 128 groups
     per block → legal), no .T afterwards
  A+ / C+  same with dimension_semantics=(parallel, arbitrary)
  1p single-pass bf16 (nomination-precision reference point)
Phases timed separately: sweep, phase2 (top groups + sort + threshold),
rescore kernel, full e2e.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import split_f32_bf16

NV, D, NQ, K = 1_000_000, 128, 104, 10
GROUP = pf.GROUP


def slope(fn, args, n1=4, n2=16, reps=5):
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


def sweep_variant(db, vn, nt, nv_eff, nq_pad, *, block_v, direct, semantics,
                  passes=2):
    ngroups_blk = block_v // GROUP
    block_q = min(nq_pad, 128)
    grid = (pl.cdiv(nq_pad, block_q), nv_eff // block_v)

    def kernel(qh_ref, ql_ref, db_ref, vn_ref, nt_ref, out_ref):
        dn = (((1,), (1,)), ((), ()))
        acc = jax.lax.dot_general(qh_ref[:], db_ref[:], dn,
                                  preferred_element_type=jnp.float32)
        if passes == 2:
            acc += jax.lax.dot_general(ql_ref[:], db_ref[:], dn,
                                       preferred_element_type=jnp.float32)
        j = pl.program_id(1)
        s = 2.0 * acc - vn_ref[0, :][None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, block_v), 1) + j * block_v
        s = jnp.where(col < nt_ref[0, 0], s, pf.NEG_INF)
        gm = jnp.max(s.reshape(block_q, ngroups_blk, GROUP), axis=-1)
        out_ref[:] = gm if direct else gm.T

    q_spec = pl.BlockSpec((block_q, D), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((block_v, D), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)
    vn_spec = pl.BlockSpec((1, block_v), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
    nt_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    if direct:
        out_spec = pl.BlockSpec((block_q, ngroups_blk), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nq_pad, nv_eff // GROUP), jnp.float32)
    else:
        out_spec = pl.BlockSpec((ngroups_blk, block_q), lambda i, j: (j, i),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nv_eff // GROUP, nq_pad), jnp.float32)
    kw = {}
    if semantics:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))

    def run(q, db, vn):
        qh, ql = split_f32_bf16(q)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[q_spec, q_spec, db_spec, vn_spec, nt_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            **kw,
        )(qh, ql, db, vn, nt)

    return run


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    rng = np.random.default_rng(42)
    nv_eff = -(-NV // 1024) * 1024
    xb = np.pad(rng.standard_normal((NV, D), dtype=np.float32),
                ((0, nv_eff - NV), (0, 0)))
    xq = rng.standard_normal((NQ, D), dtype=np.float32)
    norms = (xb ** 2).sum(1).astype(np.float32)
    q = jnp.asarray(xq)
    db16 = jnp.asarray(xb).astype(jnp.bfloat16)
    vn = jnp.asarray(norms).reshape(1, nv_eff)
    normsj = jnp.asarray(norms)
    global nt
    nt = jnp.asarray(np.int32(NV)).reshape(1, 1)

    def bw(ms):
        return NV * D * 2 / (ms / 1e3) / 1e9

    for name, kwv in [
        ("A  bv=8192 T", dict(block_v=8192, direct=False, semantics=False)),
        ("A+ bv=8192 T sem", dict(block_v=8192, direct=False, semantics=True)),
        ("B  bv=16384 T", dict(block_v=16384, direct=False, semantics=False)),
        ("C  bv=16384 direct", dict(block_v=16384, direct=True, semantics=False)),
        ("C+ bv=16384 direct sem", dict(block_v=16384, direct=True, semantics=True)),
        ("D  bv=32768 direct sem", dict(block_v=32768, direct=True, semantics=True)),
        ("1p bv=8192 T 1-pass", dict(block_v=8192, direct=False, semantics=False, passes=1)),
        ("1pC bv=16384 direct sem 1-pass", dict(block_v=16384, direct=True, semantics=True, passes=1)),
    ]:
        try:
            fn = sweep_variant(db16, vn, nt, nv_eff, NQ, **kwv)
            ms = slope(fn, (q, db16, vn))
            print(f"{name:34s}: {ms:.3f} ms  ({bw(ms):.0f} GB/s)", flush=True)
        except Exception as e:
            print(f"{name:34s}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    # phase 2: from transposed layout (includes .T) vs direct layout
    ngroups = nv_eff // GROUP
    kg = K + pf.GROUP_PAD

    def phase2_from_T(qq, gmaxT):
        g = gmaxT.T + 0 * qq[0, 0]
        tv, gidx = jax.lax.top_k(g, kg + 1)
        return jnp.sort(gidx[:, :kg], axis=-1).astype(jnp.float32) + tv[:, kg:]

    def phase2_direct(qq, gmax):
        g = gmax + 0 * qq[0, 0]
        tv, gidx = jax.lax.top_k(g, kg + 1)
        return jnp.sort(gidx[:, :kg], axis=-1).astype(jnp.float32) + tv[:, kg:]

    gT = jnp.asarray(rng.standard_normal((ngroups, NQ)), jnp.float32)
    gD = jnp.asarray(rng.standard_normal((NQ, ngroups)), jnp.float32)
    print(f"phase2 from T layout : {slope(phase2_from_T, (q, gT)):.3f} ms", flush=True)
    print(f"phase2 direct layout : {slope(phase2_direct, (q, gD)):.3f} ms", flush=True)

    # rescore kernel alone (current module version)
    gidx = jnp.sort(jnp.asarray(
        rng.integers(0, ngroups, (NQ, kg)), jnp.int32), axis=-1)

    def resc(qq, db, vnv, gi):
        return pf.rescore_groups_pallas(
            qq, db, vnv, gi, jnp.int32(NV), metric=MetricType.L2,
            nv_eff=nv_eff)

    print(f"rescore kernel       : {slope(resc, (q, db16, normsj, gidx)):.3f} ms", flush=True)

    # full e2e current module
    def e2e(qq, db, vnv):
        v, i, c = pf.fused_search(qq, db, vnv, jnp.int32(NV), k=K,
                                  metric=MetricType.L2, nv_eff=nv_eff)
        return v

    print(f"e2e current module   : {slope(e2e, (q, db16, normsj)):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
