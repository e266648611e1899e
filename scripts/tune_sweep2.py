"""Round 2 tuning: direct-layout variants for pair sweeps + rescore variants.

Run with NOTHING else on the chip (claims are exclusive; contention corrupts
slope measurements).
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
from faiss_tpu.storage import split_f32_bf16, split3_f32_bf16

NV, D, NQ, K = 1_000_000, 128, 104, 10
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


def sweep_direct_halves(nv_eff, nq_pad, *, block_v, pair):
    """Direct (nq, ngroups) output with block_v < 16384: two (or more)
    j-steps share one 128-lane out block, each writing its 64-lane half."""
    ngroups_blk = block_v // GROUP           # e.g. 64 for bv=8192
    per_out = 128 // ngroups_blk             # j-steps per out block (2)
    block_q = min(nq_pad, 128)
    grid = (pl.cdiv(nq_pad, block_q), nv_eff // block_v)

    def kernel(*refs):
        if pair:
            qh_ref, ql_ref, dh_ref, dl_ref, vn_ref, nt_ref, out_ref = refs
        else:
            qh_ref, ql_ref, db_ref, vn_ref, nt_ref, out_ref = refs
        dn = (((1,), (1,)), ((), ()))
        if pair:
            acc = jax.lax.dot_general(qh_ref[:], dh_ref[:], dn,
                                      preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(qh_ref[:], dl_ref[:], dn,
                                       preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(ql_ref[:], dh_ref[:], dn,
                                       preferred_element_type=jnp.float32)
        else:
            acc = jax.lax.dot_general(qh_ref[:], db_ref[:], dn,
                                      preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(ql_ref[:], db_ref[:], dn,
                                       preferred_element_type=jnp.float32)
        j = pl.program_id(1)
        s = 2.0 * acc - vn_ref[0, :][None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, block_v), 1) + j * block_v
        s = jnp.where(col < nt_ref[0, 0], s, pf.NEG_INF)
        gm = jnp.max(s.reshape(block_q, ngroups_blk, GROUP), axis=-1)
        half = j % per_out
        out_ref[:, pl.ds(half * ngroups_blk, ngroups_blk)] = gm

    q_spec = pl.BlockSpec((block_q, D), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((block_v, D), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)
    vn_spec = pl.BlockSpec((1, block_v), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
    nt_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((block_q, 128), lambda i, j: (i, j // per_out),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nq_pad, nv_eff // GROUP), jnp.float32)
    n_db = 2 if pair else 1
    in_specs = [q_spec, q_spec] + [db_spec] * n_db + [vn_spec, nt_spec]

    def run(q, *dbs_vn_nt):
        qh, ql = split_f32_bf16(q)
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
            out_shape=out_shape,
        )(qh, ql, *dbs_vn_nt)

    return run


def sweep_direct16k_pair(nv_eff, nq_pad):
    """pair operands at block_v=16384 (VMEM stress test — may not compile)."""
    block_v = 16384
    ngroups_blk = 128
    block_q = min(nq_pad, 128)
    grid = (pl.cdiv(nq_pad, block_q), nv_eff // block_v)

    def kernel(qh_ref, ql_ref, dh_ref, dl_ref, vn_ref, nt_ref, out_ref):
        dn = (((1,), (1,)), ((), ()))
        acc = jax.lax.dot_general(qh_ref[:], dh_ref[:], dn,
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(qh_ref[:], dl_ref[:], dn,
                                   preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(ql_ref[:], dh_ref[:], dn,
                                   preferred_element_type=jnp.float32)
        j = pl.program_id(1)
        s = 2.0 * acc - vn_ref[0, :][None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, block_v), 1) + j * block_v
        s = jnp.where(col < nt_ref[0, 0], s, pf.NEG_INF)
        out_ref[:] = jnp.max(s.reshape(block_q, ngroups_blk, GROUP), axis=-1)

    q_spec = pl.BlockSpec((block_q, D), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((block_v, D), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)
    vn_spec = pl.BlockSpec((1, block_v), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
    nt_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((block_q, ngroups_blk), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nq_pad, nv_eff // GROUP), jnp.float32)

    def run(q, dh, dl, vn, nt):
        qh, ql = split_f32_bf16(q)
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[q_spec, q_spec, db_spec, db_spec, vn_spec, nt_spec],
            out_specs=out_spec, out_shape=out_shape,
        )(qh, ql, dh, dl, vn, nt)

    return run


def rescore_multigroup(nq_pad, kg, gpj, nv_eff):
    """Rescore with gpj groups per grid step (gpj separate prefetched db
    blocks) — fewer steps, more DMA parallelism per step."""
    assert kg % gpj == 0
    steps_per_q = kg // gpj

    def kernel(gidx_ref, nt_ref, q0_ref, q1_ref, q2_ref, *refs):
        db_refs = refs[:gpj]
        vn_refs = refs[gpj:2 * gpj]
        out_ref = refs[-1]
        t = pl.program_id(0)
        i = t // steps_per_q
        jj = t % steps_per_q
        dn = (((1,), (1,)), ((), ()))
        rowsel = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == (i % 8)
        for u in range(gpj):
            g = gidx_ref[i, jj * gpj + u]
            acc = jax.lax.dot_general(q0_ref[:], db_refs[u][:], dn,
                                      preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(q1_ref[:], db_refs[u][:], dn,
                                       preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(q2_ref[:], db_refs[u][:], dn,
                                       preferred_element_type=jnp.float32)
            s = 2.0 * acc - vn_refs[u][0, :][None, :]
            col = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP), 1) + g * GROUP
            s = jnp.where(col < nt_ref[0], s, pf.NEG_INF)
            blk = jnp.where(rowsel, s, 0.0)
            cslice = pl.ds((jj * gpj + u) * GROUP, GROUP)

            @pl.when(i % 8 == 0)
            def _():
                out_ref[:, cslice] = blk

            @pl.when(i % 8 != 0)
            def _():
                out_ref[:, cslice] += blk

    def q_idx(t, gidx_ref, nt_ref):
        return ((t // steps_per_q) // 8, 0)

    def mk_db_idx(u):
        def db_idx(t, gidx_ref, nt_ref):
            return (gidx_ref[t // steps_per_q, (t % steps_per_q) * gpj + u], 0)
        return db_idx

    def mk_vn_idx(u):
        def vn_idx(t, gidx_ref, nt_ref):
            return (0, gidx_ref[t // steps_per_q, (t % steps_per_q) * gpj + u])
        return vn_idx

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq_pad * steps_per_q,),
        in_specs=[pl.BlockSpec((8, D), q_idx, memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((GROUP, D), mk_db_idx(u), memory_space=pltpu.VMEM)
           for u in range(gpj)]
        + [pl.BlockSpec((1, GROUP), mk_vn_idx(u), memory_space=pltpu.VMEM)
           for u in range(gpj)],
        out_specs=pl.BlockSpec(
            (8, kg * GROUP), lambda t, g, n: ((t // steps_per_q) // 8, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def run(q, db, vn_flat, gidx, nt1):
        q0, q1, q2 = split3_f32_bf16(q)
        dbs = jax.lax.slice_in_dim(db, 0, nv_eff, axis=0)
        vn = jax.lax.slice_in_dim(vn_flat, 0, nv_eff, axis=0).reshape(1, nv_eff)
        args = [q0, q1, q2] + [dbs] * gpj + [vn] * gpj
        return pl.pallas_call(
            functools.partial(kernel),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nq_pad, kg * GROUP), jnp.float32),
        )(gidx, nt1, *args)

    return run


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    rng = np.random.default_rng(42)
    nv_eff = 1_000_448  # round_up(1e6, 1024); NOT 16384-aligned!
    nv16 = 983_040      # 16384-aligned ≈1M for direct16k variants (60 tiles)
    xb = np.pad(rng.standard_normal((NV, D), dtype=np.float32),
                ((0, nv_eff - NV), (0, 0)))
    xq = rng.standard_normal((NQ, D), dtype=np.float32)
    norms = (xb ** 2).sum(1).astype(np.float32)
    q = jnp.asarray(xq)
    db16 = jnp.asarray(xb).astype(jnp.bfloat16)
    hi, lo = split_f32_bf16(jnp.asarray(xb))
    normsj = jnp.asarray(norms)
    nt = jnp.asarray(np.int32(NV)).reshape(1, 1)
    vnfull = jnp.asarray(norms).reshape(1, nv_eff)

    def bw(ms, bytes_per_elem=2):
        return NV * D * bytes_per_elem / (ms / 1e3) / 1e9

    # bf16 direct-halves at bv=8192 (works for ANY 8192-aligned nv)
    try:
        fn = sweep_direct_halves(nv_eff, NQ, block_v=8192, pair=False)
        ms = slope(fn, (q, db16, vnfull, nt))
        print(f"bf16 halves bv=8192 direct : {ms:.3f} ms ({bw(ms):.0f} GB/s)", flush=True)
    except Exception as e:
        print(f"bf16 halves bv=8192 direct : FAILED {str(e)[:100]}", flush=True)

    # pair direct-halves at bv=8192
    try:
        fn = sweep_direct_halves(nv_eff, NQ, block_v=8192, pair=True)
        ms = slope(fn, (q, hi, lo, vnfull, nt))
        print(f"pair halves bv=8192 direct : {ms:.3f} ms ({bw(ms, 4):.0f} GB/s)", flush=True)
    except Exception as e:
        print(f"pair halves bv=8192 direct : FAILED {str(e)[:100]}", flush=True)

    # pair direct at bv=16384 (VMEM stress; 16384-aligned subset)
    try:
        hi16 = jax.lax.slice_in_dim(hi, 0, nv16, axis=0)
        lo16 = jax.lax.slice_in_dim(lo, 0, nv16, axis=0)
        vn16 = jax.lax.slice_in_dim(normsj, 0, nv16, axis=0).reshape(1, nv16)
        fn = sweep_direct16k_pair(nv16, NQ)
        ms = slope(fn, (q, hi16, lo16, vn16, nt))
        ms = ms * (nv_eff / nv16)
        print(f"pair direct bv=16384       : {ms:.3f} ms ({bw(ms, 4):.0f} GB/s) (scaled)", flush=True)
    except Exception as e:
        print(f"pair direct bv=16384       : FAILED {str(e)[:100]}", flush=True)

    # rescore variants
    ngroups = nv_eff // GROUP
    kg = 16  # divisible by 1/2/4
    gidx = jnp.sort(jnp.asarray(
        rng.integers(0, ngroups, (NQ, kg)), jnp.int32), axis=-1)
    nt1 = jnp.asarray(np.int32(NV)).reshape(1)
    for gpj in (1, 2, 4):
        try:
            fn = rescore_multigroup(NQ, kg, gpj, nv_eff)
            ms = slope(fn, (q, db16, normsj, gidx, nt1))
            print(f"rescore kg=16 gpj={gpj}        : {ms:.3f} ms", flush=True)
        except Exception as e:
            print(f"rescore kg=16 gpj={gpj}        : FAILED {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
