"""Fused Pallas MXU kernel: distance GEMM + group-max epilogue, no nq×nv.

THE north-star kernel (SURVEY.md §7 / BASELINE.json): the TPU equivalent of
the reference's fully fused ``fused_l2_topk`` shader
(shaders/fused_l2_topk.metal:19-131) and of its fused-epilogue GEMMs
(``simdgroup_gemm_l2_fused*``, simdgroup_gemm.metal:143-253) — the score
matrix is never materialized in HBM, so a database sweep costs one read of
the db tiles instead of read + 4·nq·nv bytes of score traffic.

Exact selection via *grouped* top-k (ops/grouped refactor of MetalSelect):

  phase 1 (this kernel)  per contiguous id-group of G columns, emit
                         max score; L2 uses s' = 2·q·v − ‖v‖² (the per-row
                         −‖q‖² term is rank-invariant and re-added outside)
  phase 2 (XLA)          top-(k+pad) groups per query from the (nq, nv/G)
                         group-max array — all true top-k elements provably
                         live in the top-k groups (a group's max bounds every
                         member, so k better group-maxes ⇒ k better elements)
  phase 3 (XLA/Pallas)   gather those groups' db rows, rescore fp32-true,
                         exact top-k over ≤ (k+pad)·G candidates per query

EXACTNESS IS CERTIFIED, NOT ASSUMED. The sweep's nomination arithmetic
differs from the rescore by a bounded amount (bf16 operand splits; fp32
accumulation order), so ``fused_search`` also returns a per-query
certificate: ``k-th rescored score ≥ (max group-max among NON-nominated
groups) + ε`` where ε is a rigorous upper bound on |sweep − true| + |rescore
− true| (derived below from the split residual norms). When the certificate
holds, no true top-k element can hide in an un-nominated group and the
result is provably the exact (quantized-db) top-k, ties resolved to lowest
id. When it fails (near-ties at the nomination boundary — e.g. duplicated
vectors), the caller falls back to the plain XLA path, which is exact by
construction. GROUP_PAD extra groups keep the failure rate at measured-zero
on non-adversarial data.

Sweep arithmetic (all storage types nominate with fp32-grade precision):
  * bf16 storage: two bf16 MXU passes q_hi·v + q_lo·v over the exact-bf16
    query pair — only the query's double-truncation residual (≲2^-16‖q‖)
    is dropped. The sweep is HBM-bound at these shapes, so the second MXU
    pass is ~free.
  * fp32/f16 storage: three bf16 passes over bit-mask (hi, lo) splits of
    BOTH operands (storage.split_f32_bf16) — drops only lo_q·lo_v
    (≲2^-14‖q‖‖v‖). NEVER use Precision.HIGHEST inside the kernel: the
    remote Mosaic compiler takes 10+ minutes on it.

Related work: this is an EXACT member of the two-stage top-k family
("A Faster Generalized Two-Stage Approximate Top-K", arXiv 2506.04165;
TPU-KNN, arXiv 2206.14286 uses the hardware PartialReduce for the
approximate version) — exactness comes from the group-max bound, the full
gather/rescore of the nominated groups, and the runtime certificate.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import MetricType

GROUP = 128           # columns per candidate group (= one lane row)
GROUP_PAD = 4         # extra groups gathered beyond k (certificate margin)
NEG_INF = float("-inf")

# fused-path eligibility (dispatch heuristics, named like the reference's
# MetalDistance.mm:344-353 gate constants)
FUSED_MIN_NV = 8192             # below this the plain XLA path is already tiny
# At nq_pad below this the sweep is HBM-bound and the extra exact-pair MXU
# pass is free; above it the sweep is at the MXU/DMA roofline crossover and
# the REDUCED single-query-operand sweep (sweep_passes=1) wins measurably —
# bf16 storage only: 0.80 → 0.71 ms at 1M×128, 5.54 → 4.21 ms at 10M×128
# (v5e r2). For fp32/f16 pair storage dropping the third pass measured NO
# win (1.57 vs 1.60 ms — the pair sweep is DMA-bound on 4 B/elem), so pair
# storage always runs the exact split. Exactness of the reduced sweep is
# covered by the runtime certificate + the two-tier fallback (exact-pair
# fused, then plain) in index.py/sharded.py.
REDUCED_SWEEP_MIN_NQ = 32


def pick_sweep_passes(nq_pad: int, pair_storage: bool = False) -> int:
    """Dispatch: 1 (reduced, certified) for large-nq bf16 sweeps, else the
    exact pair (2). Pair storage (fp32/f16) never reduces — no measured win."""
    return 1 if (nq_pad >= REDUCED_SWEEP_MIN_NQ and not pair_storage) else 2
FUSED_GATHER_BUDGET = 1 << 30    # hard cap on phase-3 gather materialization
# Cost-model coefficients, in bytes-of-HBM-traffic-equivalent per element
# (anchored on v5e measurements, 2026-08: plain materializes the nq×nv fp32
# score matrix (write+read ≈ 8 B/score) and its top_k cost grows with k;
# fused pays the gather twice (read rows + batched-dot re-read)).
PLAIN_SCORE_BYTES = 8.0
PLAIN_TOPK_BYTES_PER_K16 = 1.0  # + k/16 bytes/score for lax.top_k

# Certificate error-bound constants (derivation in _sweep_eps):
# bit-mask truncation to bf16 (8 significand bits) loses < 2^-7 relative;
# the RNE-rounded lo term's own residual is < 2^-15 relative.
_LO_REL = 2.0 ** -7
_RESID_REL = 2.0 ** -15
_U32 = 2.0 ** -24      # f32 unit roundoff (RNE)
# max ‖v_stored‖ / ‖v_original‖ for RNE-quantized storage (bf16: each
# element grows ≤ 2^-9 relative under RNE, f16/int8-decode even less);
# stored norms are PRE-quantization, so error terms that multiply by the
# stored vector's norm carry this envelope. Harmless slack for fp32.
_QUANT_V = 1.0 + 2.0 ** -8
# Strictness + computation slack: the certificate comparison must be
# STRICT against the true error bound B (a non-nominated row tied exactly
# at the k-th score must still be excludable — see _sweep_eps notes), and
# eps itself is computed in f32 (~20 ops, each ≤ 2^-24 relative, plus the
# norm inputs' own ≤(d+2)·2^-24 downward rounding ≤ 2^-17). 2^-10 dominates
# every such term plus all second-order u·E cross terms by >100×.
_EPS_SLACK = 1.0 + 2.0 ** -10


def _pick_block_v(d_pad: int, itemsize: int, nv: int) -> int:
    """db tile rows: large enough that the out block (block_v/GROUP rows)
    meets the 8-sublane constraint (→ ≥ 1024), small enough to double-buffer
    in VMEM. The index layer always supplies 1024-aligned nv_eff; direct
    callers may pass any GROUP multiple, so fall back to the largest
    128-multiple divisor — the grid MUST tile nv exactly, or the last
    groups of the out array are never written (uninitialized garbage that
    r3's NaN-strict select kernel surfaced where lax.top_k silently
    tolerated it). Sub-1024 results have <8 out sublanes — never compiled
    on Mosaic; fused_path_eligible routes such shapes to the XLA path, so
    they can only reach a kernel via direct interpret-mode callers."""
    budget = 2 * 1024 * 1024

    for bv in (8192, 4096, 2048, 1024):  # 8192 measured 18% faster at d=128
        if bv * d_pad * itemsize <= budget and nv % bv == 0:
            return bv
    for bv in range(min(nv, 8192), 0, -GROUP):  # odd sizes: exact tiling
        if bv % GROUP == 0 and nv % bv == 0 and (
                bv * d_pad * itemsize <= budget or bv == GROUP):
            return bv
    return GROUP


def _epilogue(dots, vn_ref, out_refs, *, metric, block_v, nq_pad,
              direct=False):
    """Shared group-max epilogue (VPU).

    ``vn_ref`` streams PRE-MASKED norms: ``+inf`` past ntotal (built once per
    search in groupmax_scores), so ``2·dots − vn`` / ``dots − vn`` is −inf on
    masked columns with no per-tile iota/compare/select — the in-kernel mask
    cost ~1.5 µs/tile at block_v=16384 (measured r2, ~0.09 ms/sweep).

    ``direct=False``: out block is (ngroups_blk, nq) — lane-legal for any
    nq_pad but costs a big XLA transpose downstream. ``direct=True``: out
    block is (nq, ngroups_blk) written as-is — only legal when ngroups_blk
    is a lane multiple (block_v = 16384 → 128 groups), measured 878 GB/s vs
    610 for the transposed layout at 1M×128 bf16 AND it feeds phase 2's
    row-major top_k for free (the transpose cost ~0.3 ms).

    ``out_refs`` may carry a SECOND output (direct layout only): the
    per-SUPERGROUP (8-group / 1024-row) max, written TRANSPOSED as a
    (ngroups_blk/8, nq) block (Mosaic requires the minor block dim be a
    lane multiple or the full array dim — nq qualifies). Emitting it here
    is measured FREE (0.368 vs 0.368 ms at 1M×128) and hands phase 2 an
    8× smaller top-k input."""
    if metric is MetricType.L2:
        s = 2.0 * dots - vn_ref[0, :][None, :]
    else:
        s = dots - vn_ref[0, :][None, :]  # vn is 0 / +inf for IP
    gm = jnp.max(s.reshape(nq_pad, block_v // GROUP, GROUP), axis=-1)
    out_refs[0][:] = gm if direct else gm.T
    if len(out_refs) > 1:
        assert direct
        out_refs[1][:] = jnp.max(
            gm.reshape(nq_pad, block_v // GROUP // SUPERGROUP, SUPERGROUP),
            axis=-1).T


def _kernel_qpair(qh_ref, ql_ref, db_ref, vn_ref, *out_refs,
                  metric, block_v, nq_pad, direct=False):
    """One nv tile, bf16 storage: two bf16 MXU passes over the exact query
    (hi, lo) pair — fp32-grade nomination (only the query's double-trunc
    residual is dropped). At small nq the sweep is HBM-bound and pass 2 is
    ~free; at nq≈128 the tile is at the MXU/DMA roofline crossover (see
    _kernel_q1 for the certified single-pass variant)."""
    dn = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(qh_ref[:], db_ref[:], dn,
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(ql_ref[:], db_ref[:], dn,
                               preferred_element_type=jnp.float32)
    _epilogue(acc, vn_ref, out_refs, metric=metric,
              block_v=block_v, nq_pad=nq_pad, direct=direct)


def _kernel_q1(q1_ref, _unused_ref, db_ref, vn_ref, *out_refs,
               metric, block_v, nq_pad, direct=False):
    """One nv tile, bf16 storage, SINGLE bf16 MXU pass over RNE-rounded
    queries. Nomination error grows to ~2^-9·‖q‖·max‖v‖ (vs ~2^-16 for the
    pair) — still covered by the runtime exactness certificate (_sweep_eps
    with single_pass=True); the win is halving MXU work at large nq where
    the 2-pass sweep is compute-bound."""
    dn = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(q1_ref[:], db_ref[:], dn,
                              preferred_element_type=jnp.float32)
    _epilogue(acc, vn_ref, out_refs, metric=metric,
              block_v=block_v, nq_pad=nq_pad, direct=direct)


def _kernel_split2(q1_ref, _unused_ref, dh_ref, dl_ref, vn_ref, *out_refs,
                   metric, block_v, nq_pad, direct=False):
    """fp32/f16 storage, REDUCED sweep: two bf16 MXU passes q_rne·(hi + lo).
    Drops only the query's RNE rounding (~2^-9 rel) relative to the exact
    pair value — certified via _sweep_eps(single_pass=True). Cuts MXU work
    by a third where the 3-pass sweep is compute-bound (large nq)."""
    dn = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(q1_ref[:], dh_ref[:], dn,
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(q1_ref[:], dl_ref[:], dn,
                               preferred_element_type=jnp.float32)
    _epilogue(acc, vn_ref, out_refs, metric=metric,
              block_v=block_v, nq_pad=nq_pad, direct=direct)


def _kernel_int8(q1_ref, q2_ref, db_ref, vn_ref, beta_ref, *out_refs,
                 metric, block_v, nq_pad, direct=False):
    """One nv tile, int8 storage: TWO int8×int8 MXU passes over the
    residual expansion qs ≈ β₁·q₁ + β₂·q₂ (q₂ quantizes the first pass's
    residual — the int8 analog of the bf16 hi/lo pair). Each int32 dot is
    EXACT; Mosaic lowers int8 dots at ≈ bf16 MXU rate on v5e (measured —
    not the nominal 2×), and the nomination error drops from ~2^-6.6 to
    ~2^-12 relative — enough for real margins at 1M rows (single-pass int8
    measured cert-rate ≈ 0 there). ``beta_ref`` cols 0/1 carry β₁/β₂."""
    dn = (((1,), (1,)), ((), ()))
    a1 = jax.lax.dot_general(q1_ref[:], db_ref[:], dn,
                             preferred_element_type=jnp.int32)
    a2 = jax.lax.dot_general(q2_ref[:], db_ref[:], dn,
                             preferred_element_type=jnp.int32)
    dots = (a1.astype(jnp.float32) * beta_ref[:, 0:1]
            + a2.astype(jnp.float32) * beta_ref[:, 1:2])
    _epilogue(dots, vn_ref, out_refs, metric=metric,
              block_v=block_v, nq_pad=nq_pad, direct=direct)


def _kernel_split(qh_ref, ql_ref, dh_ref, dl_ref, vn_ref, *out_refs,
                  metric, block_v, nq_pad, direct=False):
    """One nv tile, fp32/f16 storage: three bf16 MXU passes over the
    pre-split (hi, lo) operands ≈ fp32 ranking (only lo·lo dropped). The
    split MUST happen outside the kernel with the bit-mask trick
    (storage.split_f32_bf16) — Mosaic's own f32/HIGHEST matmul takes
    >10 minutes to compile through the remote compiler, and an arithmetic
    in-kernel split is both slow to compile and elided by XLA's
    excess-precision simplifier."""
    dn = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(qh_ref[:], dh_ref[:], dn,
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(qh_ref[:], dl_ref[:], dn,
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(ql_ref[:], dh_ref[:], dn,
                               preferred_element_type=jnp.float32)
    _epilogue(acc, vn_ref, out_refs, metric=metric,
              block_v=block_v, nq_pad=nq_pad, direct=direct)


def _kernel_f16_pair(qh_ref, ql_ref, db_ref, vn_ref, *out_refs,
                     metric, block_v, nq_pad, direct=False, clean=False):
    """One nv tile, f16-bits storage (2 B/elem), FULL sweep: in-register
    decode of the int16 bit patterns to the exact bf16 (v_hi, v_lo) pair
    (storage.split_f16_bits) + three bf16 MXU passes qh·vh + qh·vl + ql·vh
    — identical arithmetic to _kernel_split but reading HALF the HBM
    (the reference reads f16 directly in its GEMM at the same 2 B/elem,
    simdgroup_gemm.metal:303)."""
    from ..storage import split_f16_bits, split_f16_bits_clean

    vh, vl = (split_f16_bits_clean if clean else split_f16_bits)(db_ref[:])
    dn = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(qh_ref[:], vh, dn,
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(qh_ref[:], vl, dn,
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(ql_ref[:], vh, dn,
                               preferred_element_type=jnp.float32)
    _epilogue(acc, vn_ref, out_refs, metric=metric,
              block_v=block_v, nq_pad=nq_pad, direct=direct)


def _kernel_f16_1(q1_ref, _unused_ref, db_ref, vn_ref, *out_refs,
                  metric, block_v, nq_pad, direct=False, clean=False):
    """f16-bits storage, REDUCED sweep: two passes q_rne·(v_hi + v_lo) over
    the in-register decoded pair (certified via _sweep_eps single_pass)."""
    from ..storage import split_f16_bits, split_f16_bits_clean

    vh, vl = (split_f16_bits_clean if clean else split_f16_bits)(db_ref[:])
    dn = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(q1_ref[:], vh, dn,
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(q1_ref[:], vl, dn,
                               preferred_element_type=jnp.float32)
    _epilogue(acc, vn_ref, out_refs, metric=metric,
              block_v=block_v, nq_pad=nq_pad, direct=direct)


# Direct-layout sweep tile: 16384 rows → 128 groups per out block (one full
# lane row). Measured 878 GB/s vs 610 transposed at 1M×128 bf16, and it
# eliminates the ~0.3 ms (ngroups, nq)→(nq, ngroups) XLA transpose before
# phase 2. Pair operands at this tile (2×4 MB double-buffered) exceed
# Mosaic's DEFAULT ~16 MB scoped-VMEM budget — r2 read that as a compiler
# limitation; raising vmem_limit_bytes makes it compile AND is the fp32
# sweep win of r3 (0.995 → 0.704 ms at 1M×128, slope-measured head-to-
# head). d_pad ≤ 128 keeps the raised budget comfortable.
DIRECT_BV = 16384
PAIR_DIRECT_VMEM = 64 * 1024 * 1024
# fp32 pair sweeps run a 2× taller direct tile (2×8 MB halves): fewer grid
# steps amortize the per-tile MXU ramp better when reading two operands.
# Measured r3 (1M×128 f32 e2e, slope): bv=16384 → 1.16, 32768 → 1.10 ms.
PAIR_DIRECT_BV = 32768
# escape hatch: the direct-layout pair main (fp32 storage) is gated so the
# compile-time bisect harness (scripts/tune_r3c.py) can toggle it without
# code edits — the remote Mosaic compiler has crashed on some e2e program
# combinations that include it
PAIR_DIRECT_ENABLE = True
# fp32 two-stage rescore (phase 3a pair scores in-kernel, phase 3b exact
# HIGHEST on the top-(k+F32_CAND_PAD) masters only); certificate tier 2
# (_pair_rescore_eps) keeps the exactness proof airtight
F32_TWO_STAGE = True
F32_CAND_PAD = 22  # pair-score near-ties beyond k that still get the exact
#                    rescore; certificate tier-2 catches any shortfall


def _sweep_call(kernel, db_args, q_hi, q_lo, vn, *, nv, d_pad, block_v,
                nq_pad, metric, direct, interpret, passes, row_offset=0,
                db_itemsize=None, extra=None, extra_cols=0,
                block_max=False, vmem_limit=None):
    """One sweep pallas_call over rows [row_offset, row_offset+nv) of the
    FULL db operand(s). The offset rides the block index map — slicing the
    db to the covered range would make XLA materialize a copy of the whole
    database (measured: a 256 MB slice copy tripled the sweep time).
    ``vn`` streams the pre-masked norms (+inf past ntotal)."""
    assert row_offset % block_v == 0, (row_offset, block_v)
    j0 = row_offset // block_v
    block_q = min(nq_pad, 128)
    grid = (pl.cdiv(nq_pad, block_q), nv // block_v)
    ngroups_blk = block_v // GROUP
    q_spec = pl.BlockSpec((block_q, d_pad), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((block_v, d_pad), lambda i, j: (j0 + j, 0),
                           memory_space=pltpu.VMEM)
    common = [
        pl.BlockSpec((1, block_v), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    if extra is not None:
        # per-query auxiliary columns (e.g. int8 dequant scales β₁/β₂)
        common.append(pl.BlockSpec((block_q, extra_cols), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM))
    if direct:
        out_spec = pl.BlockSpec((block_q, ngroups_blk), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nq_pad, nv // GROUP), jnp.float32)
    else:
        assert not block_max
        out_spec = pl.BlockSpec((ngroups_blk, block_q), lambda i, j: (j, i),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nv // GROUP, nq_pad), jnp.float32)
    out_specs, out_shapes = out_spec, out_shape
    if block_max:
        # second output: per-1024-row supergroup max, TRANSPOSED
        # (nblocks, nq) — minor block dim = full nq (Mosaic-legal), the
        # caller transposes the tiny result (nblocks·nq·4 B)
        nb_blk = ngroups_blk // SUPERGROUP
        out_specs = [out_spec,
                     pl.BlockSpec((nb_blk, block_q), lambda i, j: (j, i),
                                  memory_space=pltpu.VMEM)]
        out_shapes = [out_shape,
                      jax.ShapeDtypeStruct(
                          (nv // GROUP // SUPERGROUP, nq_pad), jnp.float32)]
    itemsize = db_itemsize if db_itemsize is not None else 2 * len(db_args)
    # Mosaic's default scoped-VMEM budget (~16 MB) rejects the 2×4 MB
    # double-buffered direct pair tile; the chip has more — raise per-call
    compiler_params = (None if vmem_limit is None
                       else pltpu.CompilerParams(vmem_limit_bytes=vmem_limit))
    out = pl.pallas_call(
        functools.partial(kernel, metric=metric, block_v=block_v,
                          nq_pad=block_q, direct=direct),
        compiler_params=compiler_params,
        grid=grid,
        in_specs=[q_spec, q_spec] + [db_spec] * len(db_args) + common,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nq_pad * nv * d_pad * passes,
            bytes_accessed=nv * d_pad * itemsize + nq_pad * d_pad * 4
            + nq_pad * (nv // GROUP) * 4,
            transcendentals=0,
        ),
    )(q_hi, q_lo, *db_args, vn, *(() if extra is None else (extra,)))
    if block_max:
        return out[0], out[1].T
    return out if direct else out.T


_DN = (((1,), (1,)), ((), ()))  # contract d: (nq, d) × (rows, d) → (nq, rows)


def _xla_tail_gm(dots, vn_t, *, metric, nq_pad):
    """Tail group-maxes via plain XLA (rows [main, nv_eff), < DIRECT_BV).

    When the direct-layout main covers the aligned prefix, the remainder
    is under one direct tile: < DIRECT_BV (16384) rows for bf16/f16/int8,
    < PAIR_DIRECT_BV (32768) rows × two planes for the fp32 pair — worst
    case ~17 MB of sliced operand at d=128. r2/early-r3 swept it with a
    SECOND transposed-layout Mosaic kernel, which bloated every e2e
    program — the r3c bisect showed the remote Mosaic compiler dying
    (broken pipe after ~30 min) on the fp32 e2e program containing
    direct-pair main + transposed tail + rescore, while each kernel
    compiled alone. A tail this small is DMA-trivial (tens of µs), so one
    XLA dot + reshape-max replaces the whole kernel. Exactness:
    _sweep_eps budgets accumulation for ANY summation order, so
    nomination may mix Pallas-MXU and XLA-dot arithmetic freely (exact
    boundary ties always fail the strict certificate and fall back).
    Slicing ≤ ~17 MB here is fine — the never-slice-the-db rule guards
    against materializing the multi-hundred-MB main operand; anyone
    raising PAIR_DIRECT_BV further should re-check this ceiling."""
    s = (2.0 * dots if metric is MetricType.L2 else dots) - vn_t[None, :]
    return s.reshape(nq_pad, -1, GROUP).max(axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "nv_eff", "interpret", "sweep_passes",
                     "with_block_max", "f16_clean"),
)
def groupmax_scores(
    queries_f32: jax.Array,    # (nq_pad, d_pad) fp32
    db: jax.Array,             # (capacity, d_pad) storage dtype
    db_norms: jax.Array,       # (capacity,) f32 (‖v‖², all metrics)
    ntotal: jax.Array,         # () or (1,) int32
    db_split=None,             # fp32/f16 storage: (db_hi, db_lo) bf16 pair
    *,
    metric: MetricType,
    nv_eff: int,
    interpret: bool = False,
    sweep_passes: int = 2,
    scales=None,               # int8 storage: (d_pad,) per-dim quant scales
    with_block_max: bool = False,  # also return per-8-group supergroup max
    f16_clean: bool = False,   # int16 db: clean bits → lean in-kernel decode
    sel=None,                  # (capacity,) bool selector stream, or None
) -> jax.Array:
    """(nq_pad, nv_eff/GROUP) per-group max of masked nomination scores.

    ``sel`` (selector.SearchParams stream): excluded rows fold into the SAME
    pre-masked norm stream as padding (+inf norm → −inf score), so filtered
    search rides the fused kernels unchanged — no kernel edits, no extra
    per-tile work (VERDICT r3 #3; the r3 "fused kernels don't take masks"
    rationale was wrong for exactly this reason).

    ``sweep_passes=1``: REDUCED sweep — RNE-rounded queries instead of the
    exact (hi, lo) query pair, cutting one MXU pass everywhere (bf16: 2→1
    passes; fp32/f16 pair: 3→2). Nomination coarsens to ~2^-9 relative,
    still certified by _sweep_eps(single_pass=True); integer-valued data
    ≤256 (e.g. SIFT descriptors) rounds exactly, so nothing is lost.

    int8 storage (``db.dtype == int8``, ``scales`` required): ONE exact
    int8×int8 MXU pass over per-query-quantized q_q = round(q∘s / β);
    nomination error is only the query quantization, certified by
    _sweep_eps_int8."""
    from ..storage import split_f32_bf16

    nq_pad, d_pad = queries_f32.shape
    assert nq_pad % 8 == 0, nq_pad
    assert nv_eff % GROUP == 0, nv_eff

    # validity mask (padding AND selector) pre-folded into the norm stream
    def premask(nt_):
        col = jax.lax.iota(jnp.int32, nv_eff)
        vn_raw = jax.lax.slice_in_dim(db_norms, 0, nv_eff, axis=0)
        ok = col < nt_
        if sel is not None:
            ok = ok & jax.lax.slice_in_dim(sel, 0, nv_eff, axis=0)
        if metric is MetricType.L2:
            return jnp.where(ok, vn_raw, jnp.inf)
        return jnp.where(ok, 0.0, jnp.inf)

    if db.dtype == jnp.int8:
        assert scales is not None, "int8 sweep needs quantization scales"
        nt = jnp.asarray(ntotal, jnp.int32).reshape(())
        vn_m = premask(nt)
        q1, q2, b1, b2 = _int8_query_pair(queries_f32, scales)
        betas = jnp.concatenate(
            [b1[:, None], b2[:, None],
             jnp.zeros((nq_pad, GROUP - 2), jnp.float32)], axis=1)
        main = (nv_eff // DIRECT_BV) * DIRECT_BV if d_pad <= 128 else 0
        parts, bparts = [], []
        if main:
            r = _sweep_call(
                _kernel_int8, (db,), q1, q2,
                vn_m[:main].reshape(1, main),
                nv=main, d_pad=d_pad, block_v=DIRECT_BV, nq_pad=nq_pad,
                metric=metric, direct=True, interpret=interpret, passes=2,
                db_itemsize=1, extra=betas, extra_cols=GROUP,
                block_max=with_block_max)
            if with_block_max:
                parts.append(r[0]); bparts.append(r[1])
            else:
                parts.append(r)
        tail = nv_eff - main
        if tail and main:
            dbt = jax.lax.slice_in_dim(db, main, nv_eff, axis=0)
            a1 = jax.lax.dot_general(q1, dbt, _DN,
                                     preferred_element_type=jnp.int32)
            a2 = jax.lax.dot_general(q2, dbt, _DN,
                                     preferred_element_type=jnp.int32)
            dots = (b1[:, None] * a1.astype(jnp.float32)
                    + b2[:, None] * a2.astype(jnp.float32))
            t = _xla_tail_gm(
                dots, jax.lax.slice_in_dim(vn_m, main, nv_eff, axis=0),
                metric=metric, nq_pad=nq_pad)
            parts.append(t)
            if with_block_max:
                bparts.append(jnp.max(t.reshape(
                    nq_pad, -1, SUPERGROUP), axis=-1))
        elif tail:
            t = _sweep_call(
                _kernel_int8, (db,), q1, q2, vn_m.reshape(1, tail),
                nv=tail, d_pad=d_pad, block_v=_pick_block_v(d_pad, 1, tail),
                nq_pad=nq_pad, metric=metric, direct=False,
                interpret=interpret, passes=2,
                db_itemsize=1, extra=betas, extra_cols=GROUP)
            parts.append(t)
            if with_block_max:
                bparts.append(jnp.max(t.reshape(
                    nq_pad, -1, SUPERGROUP), axis=-1))
        gm = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        if with_block_max:
            bm = (bparts[0] if len(bparts) == 1
                  else jnp.concatenate(bparts, axis=1))
            return gm, bm
        return gm

    if db.dtype == jnp.int16:
        # f16-bits storage (2 B/elem): in-register decode kernels; same
        # direct-layout main + transposed tail structure as bf16
        nt = jnp.asarray(ntotal, jnp.int32).reshape(())
        vn_m = premask(nt)
        if sweep_passes == 1:
            q_hi = queries_f32.astype(jnp.bfloat16)
            q_lo = q_hi
            kernel, npass = _kernel_f16_1, 2
        else:
            q_hi, q_lo = split_f32_bf16(queries_f32)
            kernel, npass = _kernel_f16_pair, 3
        kernel = functools.partial(kernel, clean=f16_clean)
        main = (nv_eff // DIRECT_BV) * DIRECT_BV if d_pad <= 128 else 0
        parts, bparts = [], []
        # raised VMEM budget: the in-register decode's elementwise
        # temporaries are tile-sized on top of the bits tile + decoded pair
        if main:
            r = _sweep_call(
                kernel, (db,), q_hi, q_lo, vn_m[:main].reshape(1, main),
                nv=main, d_pad=d_pad, block_v=DIRECT_BV, nq_pad=nq_pad,
                metric=metric, direct=True, interpret=interpret,
                passes=npass, db_itemsize=2, block_max=with_block_max,
                vmem_limit=PAIR_DIRECT_VMEM)
            if with_block_max:
                parts.append(r[0]); bparts.append(r[1])
            else:
                parts.append(r)
        tail = nv_eff - main
        if tail and main:
            from ..storage import split_f16_bits, split_f16_bits_clean

            vh, vl = (split_f16_bits_clean if f16_clean else split_f16_bits)(
                jax.lax.slice_in_dim(db, main, nv_eff, axis=0))
            dots = jax.lax.dot_general(q_hi, vh, _DN,
                                       preferred_element_type=jnp.float32)
            dots += jax.lax.dot_general(q_hi, vl, _DN,
                                        preferred_element_type=jnp.float32)
            if sweep_passes != 1:
                dots += jax.lax.dot_general(
                    q_lo, vh, _DN, preferred_element_type=jnp.float32)
            t = _xla_tail_gm(
                dots, jax.lax.slice_in_dim(vn_m, main, nv_eff, axis=0),
                metric=metric, nq_pad=nq_pad)
            parts.append(t)
            if with_block_max:
                bparts.append(jnp.max(t.reshape(
                    nq_pad, -1, SUPERGROUP), axis=-1))
        elif tail:
            t = _sweep_call(
                kernel, (db,), q_hi, q_lo, vn_m.reshape(1, tail),
                nv=tail, d_pad=d_pad, block_v=_pick_block_v(d_pad, 2, tail),
                nq_pad=nq_pad, metric=metric, direct=False,
                interpret=interpret, passes=npass,
                db_itemsize=2, vmem_limit=PAIR_DIRECT_VMEM)
            parts.append(t)
            if with_block_max:
                bparts.append(jnp.max(t.reshape(
                    nq_pad, -1, SUPERGROUP), axis=-1))
        gm = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        if with_block_max:
            bm = (bparts[0] if len(bparts) == 1
                  else jnp.concatenate(bparts, axis=1))
            return gm, bm
        return gm

    # pair sweep whenever a split is supplied (fp32 storage AND pair-only
    # HBM modes, where `db` is db_hi) or the dtype demands one
    pair_sweep = db_split is not None or db.dtype != jnp.bfloat16
    if pair_sweep and db_split is None:
        # direct callers without precomputed splits (tests): derive them here
        # (f16→f32 decode is exact, so the pair reproduces stored values)
        db_split = split_f32_bf16(db.astype(jnp.float32))
    nt = jnp.asarray(ntotal, jnp.int32).reshape(())
    if sweep_passes == 1:
        q_hi = queries_f32.astype(jnp.bfloat16)  # RNE: half the trunc error
        q_lo = q_hi                    # unused by _kernel_q1/_kernel_split2
        bf16_kernel, pair_kernel, npass = _kernel_q1, _kernel_split2, 1
    else:
        q_hi, q_lo = split_f32_bf16(queries_f32)
        bf16_kernel, pair_kernel, npass = _kernel_qpair, _kernel_split, 2

    # Pre-masked norms: +inf past ntotal / on filtered rows (L2: s = 2·dots
    # − vn; IP: s = dots − vn with vn 0/+inf) — moves the validity mask out
    # of the kernels' per-tile hot loop (one (nv_eff,) select per search).
    vn_m = premask(nt)

    def vn_of(start, nv):
        v = jax.lax.slice_in_dim(vn_m, start, start + nv, axis=0)
        return v.reshape(1, nv)

    if pair_sweep:
        # direct-layout main (needs the raised VMEM budget for the pair
        # tiles — r3 win, see PAIR_DIRECT_VMEM) + XLA tail. The tile is
        # PAIR_DIRECT_BV when the db is big enough; the ≤(bv−1)-row
        # remainder rides the existing XLA-dot tail.
        bv = PAIR_DIRECT_BV if nv_eff >= PAIR_DIRECT_BV else DIRECT_BV
        main = ((nv_eff // bv) * bv
                if d_pad <= 128 and PAIR_DIRECT_ENABLE else 0)
        parts, bparts = [], []
        if main:
            r = _sweep_call(
                pair_kernel, (db_split[0], db_split[1]), q_hi, q_lo,
                vn_of(0, main),
                nv=main, d_pad=d_pad, block_v=bv, nq_pad=nq_pad,
                metric=metric, direct=True, interpret=interpret,
                passes=npass + 1, vmem_limit=PAIR_DIRECT_VMEM,
                block_max=with_block_max)
            if with_block_max:
                parts.append(r[0]); bparts.append(r[1])
            else:
                parts.append(r)
        tail = nv_eff - main
        if tail and main:
            dh = jax.lax.slice_in_dim(db_split[0], main, nv_eff, axis=0)
            dl = jax.lax.slice_in_dim(db_split[1], main, nv_eff, axis=0)
            dots = jax.lax.dot_general(q_hi, dh, _DN,
                                       preferred_element_type=jnp.float32)
            dots += jax.lax.dot_general(q_hi, dl, _DN,
                                        preferred_element_type=jnp.float32)
            if npass != 1:
                dots += jax.lax.dot_general(
                    q_lo, dh, _DN, preferred_element_type=jnp.float32)
            t = _xla_tail_gm(
                dots, jax.lax.slice_in_dim(vn_m, main, nv_eff, axis=0),
                metric=metric, nq_pad=nq_pad)
            parts.append(t)
            if with_block_max:
                bparts.append(jnp.max(t.reshape(nq_pad, -1, SUPERGROUP),
                                      axis=-1))
        elif tail:
            t = _sweep_call(
                pair_kernel, (db_split[0], db_split[1]), q_hi, q_lo,
                vn_of(0, tail),
                nv=tail, d_pad=d_pad, block_v=_pick_block_v(d_pad, 4, tail),
                nq_pad=nq_pad, metric=metric, direct=False,
                interpret=interpret, passes=npass + 1)
            parts.append(t)
            if with_block_max:
                bparts.append(jnp.max(t.reshape(nq_pad, -1, SUPERGROUP),
                                      axis=-1))
        gm = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        if with_block_max:
            bm = (bparts[0] if len(bparts) == 1
                  else jnp.concatenate(bparts, axis=1))
            return gm, bm
        return gm

    # bf16 native: direct-layout 16384-row tiles over the aligned prefix,
    # transposed-layout tail for the 1024-aligned remainder. The db is
    # passed WHOLE both times (offset index maps, no slice copies).
    main = (nv_eff // DIRECT_BV) * DIRECT_BV if d_pad <= 128 else 0
    parts, bparts = [], []
    if main:
        r = _sweep_call(
            bf16_kernel, (db,), q_hi, q_lo, vn_of(0, main),
            nv=main, d_pad=d_pad, block_v=DIRECT_BV, nq_pad=nq_pad,
            metric=metric, direct=True, interpret=interpret,
            passes=sweep_passes, block_max=with_block_max)
        if with_block_max:
            parts.append(r[0]); bparts.append(r[1])
        else:
            parts.append(r)
    tail = nv_eff - main
    if tail and main:
        dbt = jax.lax.slice_in_dim(db, main, nv_eff, axis=0)
        dots = jax.lax.dot_general(q_hi, dbt, _DN,
                                   preferred_element_type=jnp.float32)
        if sweep_passes != 1:
            dots += jax.lax.dot_general(q_lo, dbt, _DN,
                                        preferred_element_type=jnp.float32)
        t = _xla_tail_gm(
            dots, jax.lax.slice_in_dim(vn_m, main, nv_eff, axis=0),
            metric=metric, nq_pad=nq_pad)
        parts.append(t)
        if with_block_max:
            bparts.append(jnp.max(t.reshape(nq_pad, -1, SUPERGROUP), axis=-1))
    elif tail:
        t = _sweep_call(
            bf16_kernel, (db,), q_hi, q_lo, vn_of(0, tail),
            nv=tail, d_pad=d_pad, block_v=_pick_block_v(d_pad, 2, tail),
            nq_pad=nq_pad, metric=metric, direct=False, interpret=interpret,
            passes=sweep_passes)
        parts.append(t)
        if with_block_max:
            bparts.append(jnp.max(t.reshape(nq_pad, -1, SUPERGROUP), axis=-1))
    gm = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    if with_block_max:
        bm = bparts[0] if len(bparts) == 1 else jnp.concatenate(bparts, axis=1)
        return gm, bm
    return gm


SUPERGROUP = 8  # level-2 fan-in for hierarchical group selection

# Pallas phase-2 select gate: one VMEM block of the group-max array
# (block_q×ngroups×4 B ≤ 8.4 MB) and an unrolled extraction loop. Covers
# the reference's warp_select regime (k ≤ 32 → kg ≤ 36); larger k / more
# groups route to the XLA _top_groups paths.
SELECT_MAX_GROUPS = 16384
SELECT_MAX_KG = 40
FINAL_SELECT_ENABLE = True  # A/B toggle for the final-select kernel


def _select_kernel(gm_ref, gidx_ref, t_ref, *, kg, block_q):
    """Top-kg group ids (ASCENDING) + certificate threshold, in-kernel.

    Replaces phase 2's ``lax.top_k`` + scatter/max threshold + ``jnp.sort``
    (~0.15 ms of XLA glue at 1M×128, nq=104 — VERDICT r3 ask #1) with one
    VPU kernel over the (block_q, ngroups) group-max block:
      loop 1: kg iterative max-extractions, ties to the LOWEST column
              (bit-exact ``lax.top_k`` nomination parity), marking the
              nominated set;
      t     : max over the non-nominated remainder (−inf when every group
              is nominated — certifies trivially, like _top_groups);
      loop 2: ascending re-enumeration of the nominated set (what
              ``jnp.sort`` produced downstream).
    Out blocks are (block_q, 128) lane-aligned; cols ≥ kg are padding."""
    x = gm_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    big = jnp.int32(1 << 30)
    excl = jnp.zeros(x.shape, jnp.bool_)
    for _ in range(kg):
        xm = jnp.where(excl, -jnp.inf, x)
        m = jnp.max(xm, axis=-1, keepdims=True)
        j = jnp.min(jnp.where(xm == m, iota, big), axis=-1, keepdims=True)
        excl = excl | (iota == j)
    t = jnp.max(jnp.where(excl, -jnp.inf, x), axis=-1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_q, 128), 1)
    t_ref[:] = jnp.broadcast_to(t, (block_q, 128))
    out = jnp.zeros((block_q, 128), jnp.int32)
    emitted = jnp.zeros(x.shape, jnp.bool_)
    ng = jnp.int32(x.shape[1] - 1)
    for j in range(kg):
        col = jnp.min(jnp.where(excl & ~emitted, iota, big), axis=-1,
                      keepdims=True)
        emitted = emitted | (iota == col)
        # clamp: NaN-laden input (inf user data) can leave < kg nominated;
        # gidx feeds scalar-prefetch DMA index maps, so indices must stay
        # in-bounds even on garbage (results are then garbage-in-garbage-
        # out like lax.top_k, but memory-safe)
        out = jnp.where(lane == j, jnp.minimum(col, ng), out)
    gidx_ref[:] = out


def select_groups_pallas(
    gmax: jax.Array, kg: int, ngroups: int, *, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """(ascending top-kg group ids, certificate threshold) via the Pallas
    select kernel — drop-in for ``jnp.sort(_top_groups(...)[0])`` +
    threshold at small kg (exact nomination/tie/threshold parity, enforced
    by tests/test_pallas_fused.py)."""
    nq_pad = gmax.shape[0]
    block_q = min(nq_pad, 128)
    out = pl.pallas_call(
        functools.partial(_select_kernel, kg=kg, block_q=block_q),
        grid=(pl.cdiv(nq_pad, block_q),),
        in_specs=[pl.BlockSpec((block_q, ngroups), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((block_q, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad, 128), jnp.int32),
            jax.ShapeDtypeStruct((nq_pad, 128), jnp.float32),
        ],
        interpret=interpret,
    )(gmax)
    return out[0][:, :kg], out[1][:, 0]


def _final_select_kernel(s_ref, vals_ref, pos_ref, *, k, block_q):
    """Final top-k over one (block_q, ncand) rescored-score block: k
    iterative max-extractions emitting DESCENDING values + their columns,
    ties to the LOWEST column (bit-exact ``lax.top_k`` parity — candidate
    columns are id-ascending in every caller). Same VPU idiom as
    _select_kernel; replaces the XLA ``lax.top_k`` + two ``take_along_axis``
    of the common tail (~0.05 ms at 1M×128, nq=104). Out cols ≥ k are
    padding. NaN-laden input degrades garbage-in-garbage-out like
    ``lax.top_k`` (the certificate comparison then fails → exact fallback);
    the column clamp keeps downstream gathers in-bounds regardless."""
    x = s_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    big = jnp.int32(1 << 30)
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_q, 128), 1)
    excl = jnp.zeros(x.shape, jnp.bool_)
    vals = jnp.full((block_q, 128), NEG_INF, jnp.float32)
    pos = jnp.zeros((block_q, 128), jnp.int32)
    ncm = jnp.int32(x.shape[1] - 1)
    for j in range(k):
        xm = jnp.where(excl, -jnp.inf, x)
        m = jnp.max(xm, axis=-1, keepdims=True)
        # & ~excl: on an all-(−inf) row every entry ties with m == −inf,
        # including already-extracted ones — without it column 0 would be
        # re-emitted k times where lax.top_k yields 0,1,2,…
        col = jnp.min(jnp.where((xm == m) & ~excl, iota, big),
                      axis=-1, keepdims=True)
        excl = excl | (iota == col)
        vals = jnp.where(lane == j,
                         jnp.broadcast_to(m, (block_q, 128)), vals)
        pos = jnp.where(lane == j,
                        jnp.broadcast_to(jnp.minimum(col, ncm),
                                         (block_q, 128)), pos)
    vals_ref[:] = vals
    pos_ref[:] = pos


def final_select_pallas(
    s: jax.Array, k: int, *, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """(descending top-k values, their columns) of each row of ``s`` —
    drop-in for ``lax.top_k`` at small k (exact value/tie parity)."""
    nq_pad, nc = s.shape
    block_q = min(nq_pad, 128)
    out = pl.pallas_call(
        functools.partial(_final_select_kernel, k=k, block_q=block_q),
        grid=(pl.cdiv(nq_pad, block_q),),
        in_specs=[pl.BlockSpec((block_q, nc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((block_q, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((nq_pad, 128), jnp.int32),
        ],
        interpret=interpret,
    )(s)
    return out[0][:, :k], out[1][:, :k]


def _top_groups(
    gmax: jax.Array, kg: int, ngroups: int, approx: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """(top-kg group ids, max gmax among NON-nominated groups) per query row.

    The second output is the certificate threshold t: any element of an
    un-nominated group scores ≤ t (+sweep error). −inf when every group is
    nominated.

    ``approx=True`` nominates with ``lax.approx_max_k`` (the TPU
    PartialReduce hardware op). EXACTNESS IS PRESERVED: the threshold t is
    still the exact max over non-nominated groups (scatter −inf + row max
    over the true gmax), so if the approximate nomination misses a group
    that could hold a true top-k element, t stays ≥ that group's max, the
    certificate fails, and the caller's tiered fallback reruns exactly.

    For large ngroups this is hierarchical: the top-kg SUPERGROUP-blocks by
    block-max provably contain the top-kg groups (same bound as phase 1),
    and blocks/groups are id-contiguous so tie order still matches
    lax.top_k. Cuts the big top_k from ngroups to ngroups/8 lanes.
    """
    nq = gmax.shape[0]
    if approx and kg < ngroups:
        _, gidx = jax.lax.approx_max_k(gmax, kg, aggregate_to_topk=True)
        masked = jnp.put_along_axis(gmax, gidx, NEG_INF, axis=-1,
                                    inplace=False)
        return gidx, jnp.max(masked, axis=-1)
    # Negative result (v5e, 1M rows / 8192 groups): the hierarchical path
    # measured SLOWER than one lax.top_k over 8192 lanes (1.10 vs 0.95
    # ms/batch end-to-end) — the block reduce + candidate gather outweigh
    # the smaller sort. Kept for ngroups ≥ 64K (e.g. ≥8M rows per chip),
    # where the single sort's n·log n growth flips the balance.
    if ngroups < 65536 or ngroups % SUPERGROUP or kg * SUPERGROUP > ngroups:
        _, gidx = jax.lax.top_k(gmax, kg)
        if kg >= ngroups:
            return gidx, jnp.full((nq,), NEG_INF, jnp.float32)
        # threshold = max over NON-nominated groups. Scatter −inf at the
        # nominated columns and row-max, instead of consuming top_k's
        # VALUES output — on v5e, using the values of a top_k whose indices
        # are already consumed cost +0.6 ms/batch at 8192 groups (XLA
        # lowers indices-only top-k much faster); the scatter+max rereads
        # only the 3.4 MB group-max array (~20 µs).
        masked = jnp.put_along_axis(gmax, gidx, NEG_INF, axis=-1,
                                    inplace=False)
        return gidx, jnp.max(masked, axis=-1)
    nblocks = ngroups // SUPERGROUP
    bmax = jnp.max(gmax.reshape(nq, nblocks, SUPERGROUP), axis=-1)
    _, bidx = jax.lax.top_k(bmax, kg)          # indices-only (fast lowering)
    bidx_sorted = jnp.sort(bidx, axis=-1)      # id-ascending candidates
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, SUPERGROUP), 2)
    cand_cols = (bidx_sorted[:, :, None] * SUPERGROUP + offs).reshape(
        nq, kg * SUPERGROUP
    )
    cand = jnp.take_along_axis(gmax, cand_cols, axis=1)
    _, pos = jax.lax.top_k(cand, kg)
    gidx = jnp.take_along_axis(cand_cols, pos, axis=1)
    # non-nominated = (candidates \ nominated) ∪ (groups of non-cand blocks);
    # both thresholds via scatter+max (indices-only top_k, see above)
    t = jnp.max(jnp.put_along_axis(cand, pos, NEG_INF, axis=-1,
                                   inplace=False), axis=-1)
    if kg < nblocks:
        t_blk = jnp.max(jnp.put_along_axis(bmax, bidx, NEG_INF, axis=-1,
                                           inplace=False), axis=-1)
        t = jnp.maximum(t, t_blk)
    return gidx, t


def _top_groups_from_bmax(
    gmax: jax.Array, bmax: jax.Array, kg: int, ngroups: int
) -> Tuple[jax.Array, jax.Array]:
    """Hierarchical _top_groups fed by the sweep kernel's FREE supergroup
    maxes (with_block_max): top-kg of (nq, ngroups/8) blocks → refine over
    the kg·8 candidate groups. Same nomination/threshold guarantees as
    _top_groups (a block's max bounds every member group), but the big
    per-query top-k shrinks 8× — at 1M×128 phase 2 measured 0.135 ms with
    the flat 7816-lane top_k and the XLA-reduced hierarchical variant was
    SLOWER (0.64); kernel-emitted bmax removes that reduce entirely."""
    nq = gmax.shape[0]
    nblocks = ngroups // SUPERGROUP
    _, bidx = jax.lax.top_k(bmax, kg)          # indices-only (fast lowering)
    bidx_sorted = jnp.sort(bidx, axis=-1)      # id-ascending candidates
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, SUPERGROUP), 2)
    cand_cols = (bidx_sorted[:, :, None] * SUPERGROUP + offs).reshape(
        nq, kg * SUPERGROUP
    )
    cand = jnp.take_along_axis(gmax, cand_cols, axis=1)
    _, pos = jax.lax.top_k(cand, kg)
    gidx = jnp.take_along_axis(cand_cols, pos, axis=1)
    t = jnp.max(jnp.put_along_axis(cand, pos, NEG_INF, axis=-1,
                                   inplace=False), axis=-1)
    if kg < nblocks:
        t_blk = jnp.max(jnp.put_along_axis(bmax, bidx, NEG_INF, axis=-1,
                                           inplace=False), axis=-1)
        t = jnp.maximum(t, t_blk)
    return gidx, t


# engage the bmax-hierarchical phase 2 only when the flat per-query top_k is
# large enough to dominate. Measured v5e r2 at 1M×128 (7816 groups): flat
# 0.698 vs hier 0.767 ms e2e — the 14-of-7816 indices-only top_k is already
# cheap, so hier only pays at the 64K-group scale (≥8M rows/chip) where
# _top_groups' XLA-reduce hierarchical path used to engage; the kernel's
# free bmax output now replaces that reduce.
HIER_MIN_GROUPS = 65536


def _premask_norms(db_norms, ntotal, nv_eff, metric, sel=None):
    """(nv_eff,) pre-masked norm stream: the raw ‖v‖² (L2) / 0.0 (IP) on
    valid rows, +inf past ``ntotal`` AND on selector-excluded rows — the ONE
    mechanism every sweep/rescore kernel uses to mask, so filtered rows
    score −inf exactly like padding."""
    nt = jnp.asarray(ntotal, jnp.int32).reshape(())
    col = jax.lax.iota(jnp.int32, nv_eff)
    vn_raw = jax.lax.slice_in_dim(db_norms, 0, nv_eff, axis=0)
    ok = col < nt
    if sel is not None:
        ok = ok & jax.lax.slice_in_dim(sel, 0, nv_eff, axis=0)
    if metric is MetricType.L2:
        return jnp.where(ok, vn_raw, jnp.inf)
    return jnp.where(ok, 0.0, jnp.inf)


STRIPE = 8  # queries per rescore grid step (one NQ_PAD-aligned stripe)
RESCORE_RANKS_PAIR = 4  # pair (db2) rescore: twice the operands per rank →
#   request deeper DMA pipelining. NOTE: the requested depth only applies
#   when it divides kg; _ranks_per_step degrades to the largest divisor
#   (kg=14 → 2). r3j's "ranks=4" rows (1.16 → 1.11 ms) actually measured
#   the then-current divisor fallback of 1 at kg=14, within rep noise —
#   re-measured head-to-head by scripts/tune_r3o.py.
RESCORE_RANKS = 2  # group ranks per step (16 in-flight gather DMAs;
#                    measured 0.091 vs 0.117 ms at kg=14, 1M x 128, v5e r2)


def _ranks_per_step(kg: int, requested: int) -> int:
    """Largest divisor of kg that is ≤ the requested pipelining depth (the
    rescore grid must tile kg exactly). Falling all the way to 1 when the
    requested depth didn't divide kg silently discarded the measured-good
    rj=2 default at e.g. kg=14 with RESCORE_RANKS_PAIR=4."""
    return next(r for r in range(min(requested, kg), 0, -1) if kg % r == 0)


def _rescore_dots(q0, q1, q2, v, clean=False):
    """fp32-true dots of the exact 3-way query split against one gathered
    candidate block, for every storage representation:
      bf16 rows: 3 exact-product passes;
      int8 rows: decode to bf16 in-register (ints ≤ 127 are bf16-EXACT);
      int16 rows (f16 bits): decode to the exact (hi, lo) bf16 pair and
        run 6 passes — all products exact, same fp32-true class;
      f32 rows (IVF fine scan): EXACT in-register 3-way split (the same
        bit-mask split the pair sweep kernels use) and 9 passes — every
        product exact in f32, so scores are fp32-true to the stored rows
        (never Precision.HIGHEST in a Pallas kernel — CLAUDE.md)."""
    dn = (((1,), (1,)), ((), ()))

    def dots3(vv):
        acc = jax.lax.dot_general(q0, vv, dn,
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(q1, vv, dn,
                                   preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(q2, vv, dn,
                                   preferred_element_type=jnp.float32)
        return acc

    if v.dtype == jnp.int16:
        from ..storage import split_f16_bits, split_f16_bits_clean

        vh, vl = (split_f16_bits_clean if clean else split_f16_bits)(v)
        return dots3(vh) + dots3(vl)
    if v.dtype == jnp.float32:
        from ..storage import split3_f32_bf16

        vh, vm, vl = split3_f32_bf16(v)
        return dots3(vh) + dots3(vm) + dots3(vl)
    if v.dtype != jnp.bfloat16:
        v = v.astype(jnp.bfloat16)
    return dots3(v)


def _rescore_kernel(gidx_ref, q0_ref, q1_ref, q2_ref, *refs, metric, rj=1,
                    pair=False, clean=False):
    """One grid step = one (8-query stripe, ``rj`` group ranks) pair: the
    stripe's 8 queries each contribute their ranks [jj·rj, (jj+1)·rj) via
    8·rj scalar-prefetched index maps (8·rj in-flight 32 KB gather
    DMAs/step). Query u's scores land in out row u — every out cell is
    written exactly once by static slices (no revisited blocks, no
    predication, and the validity mask rides the pre-masked vn stream
    like the sweep's). ``pair`` gathers a second operand stream (the bf16
    lo halves) and sums both dot sets — the fp32 two-stage rescore."""
    nblk = STRIPE * rj
    db_refs, out_ref = refs[:nblk], refs[-1]
    if pair:
        db2_refs = refs[nblk:2 * nblk]
        vn_refs = refs[2 * nblk:3 * nblk]
    else:
        vn_refs = refs[nblk:2 * nblk]
    rows = []
    for u in range(STRIPE):
        parts = []
        for r in range(rj):
            v = db_refs[u * rj + r][:]
            acc = _rescore_dots(q0_ref[:], q1_ref[:], q2_ref[:], v,
                                clean=clean)
            if pair:
                acc += _rescore_dots(q0_ref[:], q1_ref[:], q2_ref[:],
                                     db2_refs[u * rj + r][:])
            if metric is MetricType.L2:
                s = 2.0 * acc - vn_refs[u * rj + r][0, :][None, :]
            else:
                s = acc - vn_refs[u * rj + r][0, :][None, :]  # vn 0/+inf IP
            parts.append(s[u : u + 1, :])  # static row: query u
        rows.append(parts[0] if rj == 1 else jnp.concatenate(parts, axis=1))
    out_ref[:, :] = jnp.concatenate(rows, axis=0)


def rescore_groups_pallas(
    queries_f32: jax.Array,   # (nq_pad, d_pad) fp32
    db: jax.Array,            # (nv_eff·…, d_pad) bf16 rows
    db_norms: jax.Array,      # (…,) f32
    gidx: jax.Array,          # (nq_pad, kg) int32, id-ascending per row
    ntotal: jax.Array,        # scalar int32
    *,
    metric: MetricType,
    nv_eff: int,
    interpret: bool = False,
    ranks_per_step: int = 1,
    db2: jax.Array = None,    # bf16 lo halves: pair rescore (fp32 storage)
    f16_clean: bool = False,  # int16 db: clean bits → lean in-kernel decode
    sel=None,                 # (capacity,) bool selector stream, or None
) -> jax.Array:
    """(nq_pad, kg·GROUP) fp32-true scores for each query's candidate groups.

    Exactness: bf16×bf16 products are exact in fp32 and the query is split
    3-way exactly (split3_f32_bf16), so scores match an fp32 rescore. VMEM
    holds one (8, rj·GROUP) out block per step, never the whole array
    (ADVICE r1). Grid = (stripes, kg/rj): consecutive steps reuse the
    stripe's query blocks; each step's 8·rj gather DMAs pipeline (measured
    r2: the previous per-query grid with predicated accumulation cost
    0.29 ms at kg=14, nq=104 — ~5× its DMA floor — from per-group
    VPU/branch overhead)."""
    from ..storage import split3_f32_bf16

    nq_pad, d_pad = queries_f32.shape
    kg = gidx.shape[1]
    rj = _ranks_per_step(kg, ranks_per_step)
    q0, q1, q2 = split3_f32_bf16(queries_f32)
    # pre-masked norms: +inf past ntotal / on filtered rows (0/+inf for IP)
    # — same stream the sweep uses, so masked columns are −inf with no
    # in-kernel iota/compare
    vn = _premask_norms(db_norms, ntotal, nv_eff, metric, sel).reshape(
        1, nv_eff)
    # db passed WHOLE: gidx blocks always land below nv_eff; slicing would
    # copy the database when nv_eff < capacity
    dbs = db

    def q_idx(i, jj, gidx_ref):
        return (i, 0)

    def mk_db_idx(u, r):
        def db_idx(i, jj, gidx_ref):
            return (gidx_ref[i * STRIPE + u, jj * rj + r], 0)
        return db_idx

    def mk_vn_idx(u, r):
        def vn_idx(i, jj, gidx_ref):
            return (0, gidx_ref[i * STRIPE + u, jj * rj + r])
        return vn_idx

    db_specs = [pl.BlockSpec((GROUP, d_pad), mk_db_idx(u, r),
                             memory_space=pltpu.VMEM)
                for u in range(STRIPE) for r in range(rj)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nq_pad // STRIPE, kg // rj),
        in_specs=[pl.BlockSpec((STRIPE, d_pad), q_idx,
                               memory_space=pltpu.VMEM)] * 3
        + db_specs * (2 if db2 is not None else 1)
        + [pl.BlockSpec((1, GROUP), mk_vn_idx(u, r),
                        memory_space=pltpu.VMEM)
           for u in range(STRIPE) for r in range(rj)],
        out_specs=pl.BlockSpec(
            (STRIPE, rj * GROUP), lambda i, jj, g: (i, jj),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(_rescore_kernel, metric=metric, rj=rj,
                               clean=f16_clean,
                               pair=db2 is not None)
    args = [q0, q1, q2] + [dbs] * (STRIPE * rj) \
        + ([db2] * (STRIPE * rj) if db2 is not None else []) \
        + [vn] * (STRIPE * rj)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq_pad, kg * GROUP), jnp.float32),
        interpret=interpret,
    )(gidx, *args)


# in-kernel final select: k must fit one padded 128-lane state row and the
# unrolled extraction loop must stay small — the reference's warp_select
# regime (k ≤ 32, shaders/warp_select.metal:11-67). Larger k keeps the
# two-stage rescore → lax.top_k pipeline (which, unlike the reference's
# block_select, is exact at any k).
# NEGATIVE RESULT (v5e r3, slope-measured head-to-head): carrying the
# running top-k inside the rescore kernel cost 0.35 ms at 1M×128 k=10
# where the two-stage rescore + indices-only lax.top_k costs 0.12 — the
# per-step extraction reductions dominate. Kept OPT-IN
# (fused_search(rescore_select=True)) like approx_groups/rescore_take;
# the measured win of the same idea at phase 2 (select_groups_pallas,
# +0.012 vs +0.176 ms) IS on by default.
RESCORE_SELECT_MAX_K = 32
# final selection: candidate rows at least this wide route to the exact
# two-stage blocked top-k (topk.blocked_topk_scores) instead of one flat
# lax.top_k. MEASURED NEGATIVE (r5): head-to-head in one process at
# nq=8/k=1024/131k columns the blocked form is 32% SLOWER e2e (2.978 vs
# 2.252 ms — measurements_r5/r5g.log; XLA's batched top-1024-of-8192
# stage-1 costs more than the single wide top_k it replaces). Routing
# disabled; the code + its exactness tests stay for narrower future k/m
# shapes where stage-1 selects a smaller fraction.
FINAL_BLOCKED_MIN = 1 << 30
_BIG_ID = np.int32(1 << 30)  # plain numpy: a jnp const would be captured


def _rescore_select_kernel(gidx_ref, q0_ref, q1_ref, q2_ref, *refs,
                           metric, rj, k, clean=False):
    """_rescore_kernel + running in-kernel top-k: the TPU answer to the
    reference's single-kernel fused_l2_topk (fused_l2_topk.metal:59-124).

    Each (8-query stripe, rj-ranks) step rescores 8·rj candidate groups
    (same gather DMAs / exact 3-pass split arithmetic as _rescore_kernel)
    and folds the rj·GROUP new candidates into a per-stripe running top-k
    carried in the revisited out block (grid iterates ranks innermost, so
    the final write per stripe is the complete top-k). Extraction is k
    unrolled max-reductions with ties broken to the LOWEST candidate id —
    bit-exact parity with ``lax.top_k`` over id-ascending candidates.
    Out: vals (8, 128) f32 / ids (8, 128) int32; lanes ≥ k stay −inf/BIG."""
    nblk = STRIPE * rj
    db_refs, vn_refs = refs[:nblk], refs[nblk:2 * nblk]
    vout_ref, iout_ref = refs[-2], refs[-1]
    jj = pl.program_id(1)
    i = pl.program_id(0)
    lane_g = jax.lax.iota(jnp.int32, GROUP)[None, :]
    rows, idrows = [], []
    for u in range(STRIPE):
        parts, idparts = [], []
        for r in range(rj):
            v = db_refs[u * rj + r][:]
            acc = _rescore_dots(q0_ref[:], q1_ref[:], q2_ref[:], v,
                                clean=clean)
            if metric is MetricType.L2:
                s = 2.0 * acc - vn_refs[u * rj + r][0, :][None, :]
            else:
                s = acc - vn_refs[u * rj + r][0, :][None, :]
            parts.append(s[u : u + 1, :])
            g = gidx_ref[i * STRIPE + u, jj * rj + r]
            idparts.append(g * GROUP + lane_g)
        rows.append(parts[0] if rj == 1 else jnp.concatenate(parts, axis=1))
        idrows.append(idparts[0] if rj == 1
                      else jnp.concatenate(idparts, axis=1))
    new_v = jnp.concatenate(rows, axis=0)           # (STRIPE, rj*GROUP)
    new_i = jnp.concatenate(idrows, axis=0)

    @pl.when(jj == 0)
    def _init():
        vout_ref[:] = jnp.full((STRIPE, 128), NEG_INF, jnp.float32)
        iout_ref[:] = jnp.full((STRIPE, 128), _BIG_ID, jnp.int32)

    cand_v = jnp.concatenate([vout_ref[:], new_v], axis=1)
    cand_i = jnp.concatenate([iout_ref[:], new_i], axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (STRIPE, 128), 1)
    st_v = jnp.full((STRIPE, 128), NEG_INF, jnp.float32)
    st_i = jnp.full((STRIPE, 128), _BIG_ID, jnp.int32)
    for j in range(k):
        m = jnp.max(cand_v, axis=-1, keepdims=True)
        sel = jnp.min(jnp.where(cand_v == m, cand_i, _BIG_ID), axis=-1,
                      keepdims=True)
        st_v = jnp.where(lane == j, m, st_v)
        st_i = jnp.where(lane == j, sel, st_i)
        cand_v = jnp.where(cand_i == sel, NEG_INF, cand_v)
    vout_ref[:] = st_v
    iout_ref[:] = st_i


def rescore_select_groups_pallas(
    queries_f32: jax.Array,   # (nq_pad, d_pad) fp32
    db: jax.Array,            # (nv_eff·…, d_pad) bf16/int8 rows
    db_norms: jax.Array,      # (…,) f32
    gidx: jax.Array,          # (nq_pad, kg) int32, id-ascending per row
    ntotal: jax.Array,        # scalar int32
    *,
    k: int,
    metric: MetricType,
    nv_eff: int,
    interpret: bool = False,
    ranks_per_step: int = 1,
    f16_clean: bool = False,  # int16 db: clean bits → lean in-kernel decode
    sel=None,                 # (capacity,) bool selector stream, or None
) -> Tuple[jax.Array, jax.Array]:
    """Fused phase 3 + final selection: (vals (nq_pad, k) desc, ids
    (nq_pad, k) int32) — no (nq_pad, kg·GROUP) score array, no XLA top_k,
    no id gather. Exact parity with rescore_groups_pallas → masked top_k
    (tests); k ≤ RESCORE_SELECT_MAX_K."""
    from ..storage import split3_f32_bf16

    nq_pad, d_pad = queries_f32.shape
    kg = gidx.shape[1]
    rj = _ranks_per_step(kg, ranks_per_step)
    q0, q1, q2 = split3_f32_bf16(queries_f32)
    vn = _premask_norms(db_norms, ntotal, nv_eff, metric, sel).reshape(
        1, nv_eff)

    def q_idx(i, jj, gidx_ref):
        return (i, 0)

    def mk_db_idx(u, r):
        def db_idx(i, jj, gidx_ref):
            return (gidx_ref[i * STRIPE + u, jj * rj + r], 0)
        return db_idx

    def mk_vn_idx(u, r):
        def vn_idx(i, jj, gidx_ref):
            return (0, gidx_ref[i * STRIPE + u, jj * rj + r])
        return vn_idx

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nq_pad // STRIPE, kg // rj),
        in_specs=[pl.BlockSpec((STRIPE, d_pad), q_idx,
                               memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((GROUP, d_pad), mk_db_idx(u, r),
                        memory_space=pltpu.VMEM)
           for u in range(STRIPE) for r in range(rj)]
        + [pl.BlockSpec((1, GROUP), mk_vn_idx(u, r),
                        memory_space=pltpu.VMEM)
           for u in range(STRIPE) for r in range(rj)],
        out_specs=[
            pl.BlockSpec((STRIPE, 128), lambda i, jj, g: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STRIPE, 128), lambda i, jj, g: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_rescore_select_kernel, metric=metric, rj=rj,
                               k=k, clean=f16_clean)
    args = [q0, q1, q2] + [db] * (STRIPE * rj) + [vn] * (STRIPE * rj)
    vals, ids = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((nq_pad, 128), jnp.int32),
        ],
        interpret=interpret,
    )(gidx, *args)
    return vals[:, :k], ids[:, :k]


def rescore_groups_take(
    queries_f32: jax.Array,   # (nq_pad, d_pad) fp32
    db: jax.Array,            # (nv_eff·…, d_pad) bf16 rows
    db_norms: jax.Array,      # (…,) f32
    gidx: jax.Array,          # (nq_pad, kg) int32
    ntotal: jax.Array,        # scalar int32 (unused: caller masks by cols)
    *,
    metric: MetricType,
    nv_eff: int,
    interpret: bool = False,
) -> jax.Array:
    """XLA variant of rescore_groups_pallas: contiguous group-slice gather
    (``take`` on the group-major reshape, like the fp32 path) + ONE batched
    bf16 dot over the stacked exact 3-way query split. Same fp32-true
    scores; rows are read once because the three split passes ride one
    dot_general with M=3."""
    from ..storage import split3_f32_bf16

    nq_pad, d_pad = queries_f32.shape
    kg = gidx.shape[1]
    db_g = db.reshape(db.shape[0] // GROUP, GROUP * d_pad)
    rows = jnp.take(db_g, gidx.reshape(-1), axis=0)
    rows = rows.reshape(nq_pad, kg * GROUP, d_pad)
    q3 = jnp.stack(split3_f32_bf16(queries_f32), axis=1)  # (nq, 3, d) bf16
    dn = (((2,), (2,)), ((0,), (0,)))
    dots3 = jax.lax.dot_general(q3, rows, dn,
                                preferred_element_type=jnp.float32)
    dots = jnp.sum(dots3, axis=1)                         # (nq, kg*GROUP)
    if metric is MetricType.L2:
        vn_g = db_norms.reshape(db_norms.shape[0] // GROUP, GROUP)
        vn = jnp.take(vn_g, gidx.reshape(-1), axis=0)
        return 2.0 * dots - vn.reshape(nq_pad, kg * GROUP)
    return dots


def _sweep_eps(queries_f32: jax.Array, db_norms: jax.Array, nv_eff: int,
               *, metric: MetricType, pair_sweep: bool, d_pad: int,
               single_pass: bool = False, split_stats=None):
    """Per-query rigorous upper bound ε on |nomination score − rescored
    score| for ANY stored row (module docstring "EXACTNESS IS CERTIFIED").

    Soundness statement. Let s_resc(x) be the score phase 3 would assign row
    x and s_swp(x) the sweep's nomination score (both computed f32 values).
    This function returns ε with ε > |s_resc(x) − s_swp(x)| STRICTLY, for
    every stored x. Then for any row x of a non-nominated group,
    s_resc(x) < s_swp(x) + ε ≤ t + ε, and the comparison
    ``vals[k-1] ≥ fl(t + ε)`` (whose own rounding is budgeted below)
    proves no non-nominated row can displace — or even TIE, thanks to
    strictness — any of the returned top-k.

    Notation: u = 2^-24 (f32 unit roundoff); Q = ‖q‖; R = ‖q − Σq_parts‖
    (the query residual the sweep drops, COMPUTED EXACTLY: the bit-mask
    split makes q − q_hi and (q − q_hi) − q_lo exact f32 subtractions);
    L = ‖q_lo‖; V = max‖v_stored‖ ≤ √(max norms)·(1+2^-8) (stored norms are
    pre-quantization; RNE bf16/f16 quantization grows each element ≤ 2^-9
    relative); N = max ‖v‖² (the stored f32 norm actually subtracted);
    s0 ≥ max‖v_lo‖ and s1 ≥ max‖v − v_hi − v_lo‖ (EXACT running statistics
    over stored rows, storage._split_stats_fn; generic envelopes
    s0 ≤ 2^-7·V, s1 ≤ 2^-15·V when stats are absent — wildly loose on
    integer data, where the true stats are 0).

    Error budget (every term an upper bound valid for ANY summation order,
    since k f32 additions of terms t_i err ≤ (k−1)·u·Σ|t_i| regardless of
    association, and bf16×bf16 / int8×int8 products are EXACT in f32/int32):

      (1) dropped split terms (sweep targets a subset of the exact product
          expansion q·v = Σ_parts):
            R·V                      (q-residual · v   — all variants)
            + L·s0 + (Q+R)·s1        (pair sweeps: dropped q_lo·v_lo and
                                      (q−resid)·v_residual)
      (2) sweep accumulation: ≤ (d+2)·u·[(Q+R)·(V+s0) + L·V]
          (each MXU pass p=a·b errs ≤ d·u·‖a‖‖b‖; pass operand norms are
          bounded by Q+R / L on the query side and V / s0 on the v side;
          +2 covers the f32 adds combining ≤3 passes)
      (3) rescore accumulation: ≤ 2·d·u·Q·V
          (HIGHEST fp32 dot, 3-pass exact bf16 split, and the pair-only
          reconstruct+dot all err ≤ ~1.1·d·u·Q·V; 2d·u is the envelope)
      (4) L2 epilogue + comparison rounding: scores are fl(2·dot − ‖v‖²)
          with bit-identical ‖v‖² on both sides; each side's subtraction
          rounds ≤ u·(2·Q·V + N), and fl(t+ε) in the certificate comparison
          rounds ≤ u·(|t| + ε) ≤ u·(2·Q·V + N) + u·(E + ε)   → 3·u·(2QV+N)
          (the u·(E+ε) part is second-order, covered by the slack).
          IP epilogue subtracts literal 0.0 (exact); only the fl(t+ε)
          rounding remains → 2·u·Q·V.
      (5) ×2 on (1)-(3) for L2 (score = 2·dot − ‖v‖²).
      (×) final ×(1+2^-10) slack: makes the bound STRICT and dominates
          (by >100×) the f32 rounding of this ε computation itself
          (~20 ops ≤ 20·u), the ≤2^-17 relative downward rounding of the
          computed norms Q/R/L, and every second-order u·E cross term.

    There is NO undefended safety factor: each contribution above is tied
    to a specific arithmetic step of the sweep (_kernel_*), the rescore
    (rescore_groups_*/HIGHEST dots), or the certificate comparison, and
    tests/test_property_selection.py adversarially validates the bound on
    norm-skewed and near-tie data (ADVICE r2 medium).
    """
    from ..storage import split_f32_bf16

    if single_pass:
        # single-pass sweeps use RNE-rounded queries: the only query error
        # is RNE rounding, computed exactly per query (no lo pass)
        resid = queries_f32 - queries_f32.astype(jnp.bfloat16).astype(
            jnp.float32)
        lo32 = jnp.zeros_like(queries_f32)
    else:
        qh, ql = split_f32_bf16(queries_f32)
        resid = queries_f32 - qh.astype(jnp.float32) - ql.astype(jnp.float32)
        lo32 = ql.astype(jnp.float32)
    R = jnp.sqrt(jnp.sum(resid * resid, axis=-1))
    L = jnp.sqrt(jnp.sum(lo32 * lo32, axis=-1))
    Q = jnp.sqrt(jnp.sum(queries_f32 * queries_f32, axis=-1))
    # norms are ≥ 0 and padding rows are 0, so no validity mask is needed
    N = jnp.max(jax.lax.slice_in_dim(db_norms, 0, nv_eff, axis=0))
    V = jnp.sqrt(N) * _QUANT_V
    if pair_sweep:
        if split_stats is not None:
            s0, s1 = split_stats[0], split_stats[1]
        else:
            s0, s1 = _LO_REL * V, _RESID_REL * V
        drop = R * V + L * s0 + (Q + R) * s1
    else:
        s0 = 0.0
        drop = R * V
    acc_sweep = (d_pad + 2.0) * _U32 * ((Q + R) * (V + s0) + L * V)
    acc_resc = 2.0 * d_pad * _U32 * Q * V
    eps = drop + acc_sweep + acc_resc
    if metric is MetricType.L2:
        eps = 2.0 * eps + 3.0 * _U32 * (2.0 * Q * V + N)
    else:
        eps = eps + 2.0 * _U32 * Q * V
    return _EPS_SLACK * eps


def _pair_rescore_eps(queries_f32: jax.Array, db_norms: jax.Array,
                      nv_eff: int, *, metric: MetricType, d_pad: int,
                      split_stats=None):
    """Tier-2 certificate bound for the fp32 two-stage rescore: strict upper
    bound ε₂ on |pair_rescore(x) − exact_rescore(x)| for any stored row x,
    where pair_rescore is the in-kernel 6-pass dot of the exact 3-way query
    split against the stored bf16 (hi, lo) halves, and exact_rescore the
    HIGHEST fp32 dot against the f32 master (phase 3b).

    Same budgeting discipline as _sweep_eps (all products exact in f32,
    any-order accumulation, both epilogues + the fl(t₂+ε₂) comparison):
      dropped term:        Q·s₁           (q·(v − v_hi − v_lo); the query
                                           split is exact, nothing dropped
                                           on the q side)
      pair accumulation:   (d+6)·u·Q·(V + s₀ + s₁)
      exact accumulation:  2·d·u·Q·V      (HIGHEST dot envelope)
      epilogue/comparison: 3·u·(2·Q·V + N) for L2, 2·u·Q·V for IP
    """
    Q = jnp.sqrt(jnp.sum(queries_f32 * queries_f32, axis=-1))
    N = jnp.max(jax.lax.slice_in_dim(db_norms, 0, nv_eff, axis=0))
    V = jnp.sqrt(N) * _QUANT_V
    if split_stats is not None:
        s0, s1 = split_stats[0], split_stats[1]
    else:
        s0, s1 = _LO_REL * V, _RESID_REL * V
    eps = (Q * s1
           + (d_pad + 6.0) * _U32 * Q * (V + s0 + s1)
           + 2.0 * d_pad * _U32 * Q * V)
    if metric is MetricType.L2:
        eps = 2.0 * eps + 3.0 * _U32 * (2.0 * Q * V + N)
    else:
        eps = eps + 2.0 * _U32 * Q * V
    return _EPS_SLACK * eps


def _int8_query_pair(queries_f32: jax.Array, scales: jax.Array):
    """qs = q∘s ≈ β₁·q₁ + β₂·q₂ with q₁/q₂ int8 — the residual expansion
    the int8 sweep kernel consumes (q₂ quantizes the first residual, the
    int8 analog of the bf16 hi/lo pair; relative error ~2^-12)."""
    qs = queries_f32 * scales[None, :]
    b1 = jnp.maximum(jnp.max(jnp.abs(qs), axis=1), 1e-30) / 127.0
    q1 = jnp.clip(jnp.round(qs / b1[:, None]), -127.0, 127.0)
    r = qs - b1[:, None] * q1
    b2 = jnp.maximum(jnp.max(jnp.abs(r), axis=1), 1e-30) / 127.0
    q2 = jnp.clip(jnp.round(r / b2[:, None]), -127.0, 127.0)
    return q1.astype(jnp.int8), q2.astype(jnp.int8), b1, b2


def _sweep_eps_int8(queries_f32: jax.Array, scales: jax.Array,
                    int_norm_max: jax.Array, db_norms: jax.Array,
                    nv_eff: int, *, metric: MetricType, d_pad: int):
    """Rigorous per-query ε for the int8 sweep vs the fp32-true rescore
    (same soundness statement and budgeting discipline as _sweep_eps).

    Both sides score against the SAME stored v_q with the same stored
    decoded-norm values N_v = fl‖v̂‖² (bit-identical f32 subtracted on both
    sides), and both consume the SAME computed qs = fl(q∘s) — so the common
    real-valued target is qs·v_q and the per-element q∘s rounding cancels:
      sweep   = fl(β₁·fl(a₁) + β₂·fl(a₂)), a_i = q_i·v_q EXACT int32 dots
                (|a_i| ≤ 127²·d < 2^24 → the int32→f32 converts are exact)
      rescore = 3-pass exact-bf16-split dot of qs against v_q decoded to
                bf16 in-kernel (ints ≤ 127 are bf16-exact)
    Budget (u = 2^-24, Qs = ‖qs‖, Vq = max‖v_q‖ exact running statistic,
    Rs = ‖qs − β₁q₁ − β₂q₂‖ and R1 = ‖qs − β₁q₁‖ computed per query,
    N = max stored decoded norm):
      (1) dropped residual:        Rs·Vq
      (2) sweep β-multiplies/add:  ≤ 3·u·(Qs + 2·R1 + Rs)·Vq
          (‖β₁q₁‖ ≤ Qs + R1, ‖β₂q₂‖ ≤ R1 + Rs; 3 roundings)
      (3) rescore accumulation:    ≤ 2·d·u·Qs·Vq (envelope, as _sweep_eps)
      (4) L2 epilogue ×2 sides + fl(t+ε):  3·u·(2·Qs·Vq + N)
          (IP: 2·u·Qs·Vq for the comparison rounding only)
      (5) ×2 on (1)-(3) for L2;  ×(1+2^-10) strictness/computation slack
          (covers the ~u·Rs-relative rounding of computing Rs/R1 itself).
    """
    q1, q2, b1, b2 = _int8_query_pair(queries_f32, scales)
    qs = queries_f32 * scales[None, :]
    r1 = qs - b1[:, None] * q1.astype(jnp.float32)
    resid = r1 - b2[:, None] * q2.astype(jnp.float32)
    Rs = jnp.sqrt(jnp.sum(resid * resid, axis=-1))
    R1 = jnp.sqrt(jnp.sum(r1 * r1, axis=-1))
    Qs = jnp.sqrt(jnp.sum(qs * qs, axis=-1))
    N = jnp.max(jax.lax.slice_in_dim(db_norms, 0, nv_eff, axis=0))
    Vq = int_norm_max
    eps = (Rs * Vq
           + 3.0 * _U32 * (Qs + 2.0 * R1 + Rs) * Vq
           + 2.0 * d_pad * _U32 * Qs * Vq)
    if metric is MetricType.L2:
        eps = 2.0 * eps + 3.0 * _U32 * (2.0 * Qs * Vq + N)
    else:
        eps = eps + 2.0 * _U32 * Qs * Vq
    return _EPS_SLACK * eps


def fused_search(
    queries_f32: jax.Array,    # (nq_pad, d_pad) fp32
    db: jax.Array,             # (capacity, d_pad) storage dtype
    db_norms: jax.Array,       # (capacity,) f32 (‖v‖² for all metrics)
    ntotal: jax.Array,         # scalar int32 (traced)
    *,
    k: int,
    metric: MetricType,
    nv_eff: int,
    interpret: bool = False,
    db_split=None,             # fp32/f16 storage: (db_hi, db_lo) bf16 pair
    pair_only: bool = False,   # HBM holds ONLY the pair (db is db_hi)
    sweep_passes: int = 2,     # bf16 storage: 1 = RNE single-pass nomination
    rescore_take: bool = False,  # bf16: XLA take+batched-dot rescore variant
    rescore_select: bool = False,  # opt-in single-kernel rescore+select
    approx_groups: bool = False,  # phase 2 via approx_max_k (certified)
    split_stats=None,          # (2,) f32 exact v-side split maxima (storage)
    scales=None,               # int8 storage: (d_pad,) per-dim quant scales
    int_norm_max=None,         # int8 storage: () f32 max ‖v_q‖ (certificate)
    hi_exact: bool = False,    # caller-proven max‖v_lo‖ == max‖resid‖ == 0
    f16_clean: bool = False,   # f16 bits proven subnormal/inf/NaN-free
    sel=None,                  # (capacity,) bool selector stream, or None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full fused path: kernel group-max → top groups → gather+rescore.

    Returns (scores (nq_pad, k_eff) descending, ids (nq_pad, k_eff) int32
    −1-free, certified (nq_pad,) bool). ``certified[i]`` proves query i's
    result is the exact top-k of the stored (possibly quantized) database;
    the caller MUST fall back to an exact path for uncertified queries
    (index.py / sharded.py rerun the plain XLA path — the forceMPS-style
    cross-path, MetalDistance.mm:121-123). k_eff = min(k, nv_eff).

    ``sel`` (selector.SearchParams stream): filtered rows mask to −inf via
    the SAME pre-masked norm stream as padding, in the sweep AND every
    rescore, so results/certificate semantics are those of the admitted
    sub-database (VERDICT r3 #3 — filtered search stays on the fused path).
    Soundness is unchanged: t is the max masked group-max over non-nominated
    groups, ε bounds |sweep − rescore| per stored row (masked rows are −inf
    on both sides), so certified results are the exact filtered top-k.
    """
    nq_pad, d_pad = queries_f32.shape
    k_eff = min(k, nv_eff)
    is_int8 = db.dtype == jnp.int8
    pair_sweep = not is_int8 and (
        pair_only or db_split is not None or db.dtype != jnp.bfloat16)
    # hi_exact (fp32/pair storage whose EXACT stored split statistics are
    # zero — integer-valued data like SIFT descriptors, where v == v_hi and
    # v_lo/residual are all-zero planes): sweep and stage-3a rescore read
    # ONLY the hi bf16 plane. Bit-identical to the pair program (every
    # dropped term is an exact f32 +0.0) at HALF the sweep HBM traffic, and
    # the certificate needs no new analysis: _sweep_eps with stats (0, 0)
    # already charges the dropped lo/residual passes exactly 0.
    if hi_exact:
        assert db_split is not None, "hi_exact requires the (hi, lo) pair"
        sweep_db, sweep_split = db_split[0], None
    else:
        sweep_db, sweep_split = db, db_split

    # phase 1 — the Pallas sweep (fp32-grade nomination for every storage).
    # At large ngroups it also emits the per-supergroup maxes (free second
    # kernel output) so phase 2's big top-k shrinks 8×.
    ngroups = nv_eff // GROUP
    kg = min(k_eff + GROUP_PAD, ngroups)
    hier = (not approx_groups and ngroups >= HIER_MIN_GROUPS
            and ngroups % SUPERGROUP == 0
            and kg < ngroups // SUPERGROUP
            and kg * SUPERGROUP <= ngroups)
    if hier:
        gmax, bmax = groupmax_scores(
            queries_f32, sweep_db, db_norms, ntotal, sweep_split,
            metric=metric, nv_eff=nv_eff, interpret=interpret,
            sweep_passes=sweep_passes, scales=scales, with_block_max=True,
            f16_clean=f16_clean, sel=sel,
        )
        gidx, t = _top_groups_from_bmax(gmax, bmax, kg, ngroups)
        gidx = jnp.sort(gidx, axis=-1)
    else:
        gmax = groupmax_scores(
            queries_f32, sweep_db, db_norms, ntotal, sweep_split,
            metric=metric, nv_eff=nv_eff, interpret=interpret,
            sweep_passes=sweep_passes, scales=scales, f16_clean=f16_clean,
            sel=sel,
        )
        # phase 2 — top-(k+pad) groups; t is the certificate threshold
        # (max un-nominated group-max). Small kg runs the Pallas select
        # kernel (ids already ascending); larger shapes keep the XLA path.
        if (not approx_groups and kg <= SELECT_MAX_KG
                and ngroups <= SELECT_MAX_GROUPS):
            gidx, t = select_groups_pallas(gmax, kg, ngroups,
                                           interpret=interpret)
        else:
            gidx, t = _top_groups(gmax, kg, ngroups, approx=approx_groups)
            gidx = jnp.sort(gidx, axis=-1)

    # phase 3 — gather candidate groups and rescore exactly w.r.t. the
    # *stored* (possibly quantized) vectors — strictly more accurate than
    # the sweep, whose only job is nominating groups.
    #
    # Small k on bf16/int8 rows runs the SINGLE-KERNEL rescore+select
    # (in-kernel running top-k, ≈ the reference's fused_l2_topk keeping
    # selection on-device in-kernel, fused_l2_topk.metal:59-124): no
    # (nq, kg·GROUP) score array, no XLA top_k, no gathers.
    in_kernel_select = (
        rescore_select
        and k_eff <= RESCORE_SELECT_MAX_K
        and not rescore_take
        and not pair_only
        and (is_int8 or db.dtype in (jnp.bfloat16, jnp.int16))
    )
    if in_kernel_select:
        qq = queries_f32 * scales[None, :] if is_int8 else queries_f32
        vals, ids = rescore_select_groups_pallas(
            qq, db, db_norms, gidx, ntotal,
            k=k_eff, metric=metric, nv_eff=nv_eff, interpret=interpret,
            ranks_per_step=RESCORE_RANKS, f16_clean=f16_clean, sel=sel,
        )
        if is_int8:
            eps = _sweep_eps_int8(queries_f32, scales, int_norm_max,
                                  db_norms, nv_eff, metric=metric,
                                  d_pad=d_pad)
        else:
            eps = _sweep_eps(queries_f32, db_norms, nv_eff, metric=metric,
                             pair_sweep=pair_sweep, d_pad=d_pad,
                             single_pass=sweep_passes == 1,
                             split_stats=split_stats)
        certified = (t == NEG_INF) | (vals[:, k_eff - 1] >= t + eps)
        return vals, ids, certified

    offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, GROUP), 2)
    cols = (gidx[:, :, None] * GROUP + offs).reshape(nq_pad, kg * GROUP)
    t2 = None  # fp32 two-stage sets the tier-2 certificate threshold
    # selector re-mask is needed only where the rescore ran WITHOUT the
    # pre-masked vn stream (XLA variants gathering raw norms). The Pallas
    # rescores already emit -inf on filtered rows; re-masking them through
    # jnp.take(sel, cols) cost ~1.5 ms at 1M x 128 (XLA's element gather
    # runs at 2-13 GB/s on TPU, measurements_r4/r4b.log: bf16 filtered
    # 2.04 ms vs 0.545 unfiltered — the whole cliff was this one line).
    sel_remask = sel is not None
    if pair_only:
        # pair-only HBM (f32 keep_master=False ONLY — since the 2 B/elem
        # bit-pattern mode landed, f16 takes the int16 branch below):
        # gather both halves' group slices, reconstruct fp32 rows (exact
        # hi+lo sum), HIGHEST dot — fp32-true w.r.t. the pair database.
        def g_rows(part):
            # reshape the WHOLE buffer (metadata-only; a slice would copy
            # the database whenever nv_eff < capacity)
            pg = part.reshape(part.shape[0] // GROUP, GROUP * d_pad)
            r = jnp.take(pg, gidx.reshape(-1), axis=0)
            return r.reshape(nq_pad, kg * GROUP, d_pad).astype(jnp.float32)

        rows = g_rows(db_split[0])
        if not hi_exact:
            rows = rows + g_rows(db_split[1])
        dn = (((1,), (2,)), ((0,), (0,)))
        dots = jax.lax.dot_general(
            queries_f32, rows, dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if metric is MetricType.L2:
            vn_g = db_norms.reshape(db_norms.shape[0] // GROUP, GROUP)
            vn = jnp.take(vn_g, gidx.reshape(-1), axis=0)
            s = 2.0 * dots - vn.reshape(nq_pad, kg * GROUP)
        else:
            s = dots
    elif is_int8:
        # int8 rows: same stripe-grid gather kernel; rows decode to bf16
        # IN KERNEL (ints ≤ 127 are bf16-exact) and the query side is the
        # exact 3-way split of q∘s, so scores are fp32-true values of
        # (q∘s)·v_q — the decoded-database scores the norms belong to.
        qs = queries_f32 * scales[None, :]
        s = rescore_groups_pallas(
            qs, db, db_norms, gidx, ntotal,
            metric=metric, nv_eff=nv_eff, interpret=interpret,
            ranks_per_step=RESCORE_RANKS, sel=sel,
        )
        sel_remask = False  # kernel rescore pre-masked via the vn stream
    elif db.dtype in (jnp.bfloat16, jnp.int16):
        # bf16 rows (and f16-bits rows, decoded in-register): the
        # scalar-prefetch Pallas kernel pipelines the group gather as
        # contiguous block DMAs and rescores in-kernel with an exact 3-way
        # query split (fp32-true; all products exact in fp32).
        use_take = rescore_take and db.dtype == jnp.bfloat16
        rescore = rescore_groups_take \
            if use_take else \
            functools.partial(rescore_groups_pallas,
                              ranks_per_step=RESCORE_RANKS,
                              f16_clean=f16_clean, sel=sel)
        s = rescore(
            queries_f32, db, db_norms, gidx, ntotal,
            metric=metric, nv_eff=nv_eff, interpret=interpret,
        )
        if not use_take:
            sel_remask = False  # kernel rescore pre-masked via vn stream
    elif (db_split is not None and F32_TWO_STAGE
          and nq_pad % STRIPE == 0
          and k_eff + F32_CAND_PAD < kg * GROUP):
        # fp32 rows, master + pair: TWO-STAGE rescore (r3). Stage 3a scores
        # every candidate in-kernel against the stored bf16 (hi, lo) halves
        # (6 exact-product passes — reads the same 4 B/elem the old XLA
        # gather read, but never materializes the (nq, kg·G, d) row array:
        # at 1M×128 nq=104 that array was ~95 MB written+reread, ~0.45 ms
        # of pure glue). Stage 3b gathers ONLY the top-(k+pad) rows' f32
        # masters (≤1 MB) and rescores them with the HIGHEST dot. Returned
        # values/ids measured bit-identical to the plain fp32 path on v5e
        # (same arithmetic per element); across BACKENDS the guarantee is
        # exact ids + last-ulp-close values (accumulation order of the
        # batched stage-3b dot vs the plain matmul may differ — observed
        # on the CPU backend, scripts/fuzz_parity note).
        # Soundness: tier-2 certificate — any candidate NOT selected by the
        # pair scores has exact score < t₂ + ε₂ (_pair_rescore_eps);
        # certified queries are therefore still provably exact top-k.
        s_pair = rescore_groups_pallas(
            queries_f32, db_split[0], db_norms, gidx, ntotal,
            metric=metric, nv_eff=nv_eff, interpret=interpret,
            ranks_per_step=RESCORE_RANKS_PAIR,
            db2=None if hi_exact else db_split[1], sel=sel,
        )
        m = k_eff + F32_CAND_PAD
        if (FINAL_SELECT_ENABLE and m <= SELECT_MAX_KG
                and m < s_pair.shape[-1] <= SELECT_MAX_GROUPS):
            # phase-2's extraction kernel: ASCENDING top-m positions (same
            # selected set and final id order as top_k + sort) and the max
            # UNSELECTED pair score — a strictly tighter tier-2 threshold
            # than the m-th selected value, same soundness direction (any
            # non-rescored candidate's pair score ≤ t2 by construction)
            ppos, t2 = select_groups_pallas(s_pair, m, s_pair.shape[-1],
                                            interpret=interpret)
            ccols = jnp.take_along_axis(cols, ppos, axis=-1)
        else:
            if s_pair.shape[-1] >= FINAL_BLOCKED_MIN:
                from . import topk as topk_ops

                _, ppos = topk_ops.blocked_topk_scores(s_pair, m)
            else:
                _, ppos = jax.lax.top_k(s_pair, m)
            t2 = jnp.take_along_axis(
                s_pair, ppos[:, m - 1:m], axis=-1)[:, 0]
            # ascending candidate ids → stable top_k keeps the plain
            # path's lowest-id tie order
            ccols = jnp.sort(jnp.take_along_axis(cols, ppos, axis=-1),
                             axis=-1)
        rows = jnp.take(db, ccols.reshape(-1), axis=0).reshape(
            nq_pad, m, d_pad)
        dn = (((1,), (2,)), ((0,), (0,)))
        dots = jax.lax.dot_general(
            queries_f32, rows, dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                           # (nq_pad, m)
        if metric is MetricType.L2:
            vnc = jnp.take(db_norms, ccols.reshape(-1), axis=0)
            s = 2.0 * dots - vnc.reshape(nq_pad, m)
        else:
            s = dots
        cols = ccols
    else:
        # fp32 rows, single-stage fallback (tiny kg or pair disabled):
        # gather contiguous group slices (db reshaped one-row-per-group:
        # ~6× faster than a row-granular take) + HIGHEST XLA dot so ids
        # match the plain fp32 path bit-for-bit. (Negative result, v5e:
        # a scalar-prefetch Pallas block-copy gather measured SLOWER —
        # 1.64 vs 1.50 ms end-to-end — the extra buffer round trip outweighs
        # the DMA win, unlike the bf16 case where rescoring happens in-kernel.)
        db_g = db.reshape(db.shape[0] // GROUP, GROUP * d_pad)
        rows = jnp.take(db_g, gidx.reshape(-1), axis=0)
        rows = rows.reshape(nq_pad, kg * GROUP, d_pad)
        dn = (((1,), (2,)), ((0,), (0,)))
        dots = jax.lax.dot_general(
            queries_f32, rows.astype(jnp.float32), dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                           # (nq_pad, kg*GROUP)
        if metric is MetricType.L2:
            vn_g = db_norms.reshape(db_norms.shape[0] // GROUP, GROUP)
            vn = jnp.take(vn_g, gidx.reshape(-1), axis=0)
            s = 2.0 * dots - vn.reshape(nq_pad, kg * GROUP)
        else:
            s = dots
    ok_cols = cols < ntotal
    if sel_remask:
        # XLA rescore variants gather RAW rows/norms, so the selector must
        # ride the final candidate mask. On the f32 two-stage path cols is
        # the m-wide stage-3b set (a filtered row can reach it only when
        # sel leaves < m live candidates — stage 3a scored it -inf but the
        # raw HIGHEST re-dot would resurrect it), so the take is tiny.
        ok_cols &= jnp.take(sel, cols, axis=0)
    s = jnp.where(ok_cols, s, NEG_INF)
    if (FINAL_SELECT_ENABLE and k_eff <= SELECT_MAX_KG
            and k_eff < s.shape[-1] <= SELECT_MAX_GROUPS):
        # final top-k in-kernel (same extraction idiom as phase 2's select)
        vals, pos = final_select_pallas(s, k_eff, interpret=interpret)
        ids = jnp.take_along_axis(cols, pos, axis=-1)
    elif s.shape[-1] >= FINAL_BLOCKED_MIN:
        # large-k over a wide candidate row: exact two-stage blocked top-k
        # (r3n: the flat top-1024 over 131k columns was ~1.2 of 2.31 ms)
        from . import topk as topk_ops

        vals, pos = topk_ops.blocked_topk_scores(s, k_eff)
        ids = jnp.take_along_axis(cols, pos, axis=-1)
    else:
        # indices-only top_k + value gather: consuming BOTH top_k outputs
        # costs ~0.2 ms extra at this shape (slower XLA lowering); the
        # gather from the tiny (nq, kg·G) score block reproduces the values
        # exactly
        _, pos = jax.lax.top_k(s, k_eff)
        vals = jnp.take_along_axis(s, pos, axis=-1)
        ids = jnp.take_along_axis(cols, pos, axis=-1)

    # certificate: the k-th rescored score strictly dominates anything a
    # non-nominated group could hold (its sweep max + ε) → provably exact.
    # −inf threshold (all groups nominated / empty shard) certifies trivially.
    if is_int8:
        eps = _sweep_eps_int8(queries_f32, scales, int_norm_max, db_norms,
                              nv_eff, metric=metric, d_pad=d_pad)
    else:
        eps = _sweep_eps(queries_f32, db_norms, nv_eff, metric=metric,
                         pair_sweep=pair_sweep, d_pad=d_pad,
                         single_pass=sweep_passes == 1,
                         split_stats=split_stats)
    certified = (t == NEG_INF) | (vals[:, k_eff - 1] >= t + eps)
    if t2 is not None:
        eps2 = _pair_rescore_eps(queries_f32, db_norms, nv_eff,
                                 metric=metric, d_pad=d_pad,
                                 split_stats=split_stats)
        certified &= (t2 == NEG_INF) | (vals[:, k_eff - 1] >= t2 + eps2)
    return vals, ids, certified


def fused_path_eligible(*, metric: MetricType, k: int, nv_eff: int,
                        d_pad: int, nq_pad: int = 128,
                        itemsize: int = 2, dtype=None) -> bool:
    """Dispatch gate (≈ MetalDistance::encodeFused gate, mm:346-353 — but our
    fused kernel handles all nq, both metrics and large k; the gate is about
    phase-3 gather volume). The decision is a traffic cost model (v5e
    measured): the plain path's extra cost is materializing the nq×nv fp32
    score matrix plus a k-scaled lax.top_k over it; the fused path's extra
    cost is the candidate gather + rescore. Large-k passes for small query
    batches; large-d/small-nv shapes (where the gather rivals the sweep)
    route to the XLA paths. VMEM never gates: the sweep tile is bounded by
    _pick_block_v and the rescore holds one 8-query stripe (ADVICE r1)."""
    # fp32 storage sweeps over the bf16 (hi, lo) pair (Mosaic f32 matmuls
    # are banned — 10+ min compiles) — 4 sweep/gather bytes/element and a
    # d ≤ 1024 VMEM bound for the double tile. bf16 sweeps natively to
    # 2048. f16 stores 2 B/elem bit patterns decoded in-register: bf16-
    # class traffic, but the decoded pair doubles the tile's VMEM → 1024.
    is_f16 = dtype is not None and jnp.dtype(dtype) == jnp.float16
    pair_sweep = itemsize == 4 and not is_f16
    d_cap = 1024 if (pair_sweep or is_f16) else 2048
    if nv_eff < FUSED_MIN_NV or d_pad > d_cap:
        return False
    if d_pad > 128:
        # d > 128 runs the transposed-layout sweep, whose (block_v/GROUP,
        # nq) out block needs ≥ 8 sublanes — only guaranteed when a
        # 1024-row multiple fits _pick_block_v's VMEM budget (fails for
        # e.g. pair sweeps at d_pad > 512, bf16 at d_pad > 1024). Route
        # those to the XLA path: a sub-8-sublane tile has never compiled
        # on Mosaic, and a failed trace poisons the process (CLAUDE.md).
        if _pick_block_v(d_pad, itemsize, nv_eff) % 1024 != 0:
            return False
    ngroups = nv_eff // GROUP
    kg = min(k + GROUP_PAD, ngroups)
    gather_bytes = nq_pad * kg * GROUP * d_pad * (4 if pair_sweep else 2)
    if gather_bytes > FUSED_GATHER_BUDGET:
        return False
    plain_extra = nq_pad * nv_eff * (
        PLAIN_SCORE_BYTES + PLAIN_TOPK_BYTES_PER_K16 * k / 16.0
    )
    fused_extra = 2.0 * gather_bytes + nq_pad * ngroups * 8.0
    return fused_extra < plain_extra
