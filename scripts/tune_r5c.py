"""r5c: where do IVF add()'s seconds go? (VERDICT r4 task 4: 1M bf16 add
was 51 s vs flat's ~3 s — bar is <=3x flat.)

Phases of one 1M-row bf16 add, timed host-side (each phase is seconds-
scale, so ~25 ms tunnel RTT noise is irrelevant):
  pad     host zero-pad + f64 norm pass
  xfer    jnp.asarray(xp) host->device (512 MB f32)
  assign  device coarse route + device_get of (n,) ids
  pages   host page-table arithmetic (bincount/argsort/slot math)
  ctable  page-table device_put
  scatter rows cast + 3 donated scatters (data/norms/ids), blocked
Run twice (cold compile vs warm) on fresh same-shape indexes, plus the
flat-index control.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

import faiss_tpu
from faiss_tpu import TpuIndexFlat, TpuIndexIVFFlat
from faiss_tpu import ivf as ivf_mod

NV, D, NLIST = 1_000_000, 128, 1024
rng = np.random.default_rng(42)
ncomp = 4096
cents = (5.0 * rng.standard_normal((ncomp, D))).astype(np.float32)
comp = rng.integers(0, ncomp, NV)
xb = (cents[comp] + rng.standard_normal((NV, D), dtype=np.float32))
print(f"data ready", flush=True)

flat = TpuIndexFlat(D, storage="bf16")
t = time.monotonic()
flat.add(xb)
print(f"flat add: {time.monotonic()-t:.1f}s", flush=True)
flat.reset()

base = TpuIndexIVFFlat(D, NLIST, storage="bf16", seed=1234)
t = time.monotonic()
base.train(xb[:262_144])
print(f"train: {time.monotonic()-t:.1f}s", flush=True)


def timed_add(ivf, x, tag):
    n = x.shape[0]
    ts = {}
    t0 = time.monotonic()
    norms = (x.astype(np.float64) ** 2).sum(1).astype(np.float32)
    from faiss_tpu.storage import _round_up
    blk = min(ivf_mod._ASSIGN_BLK,
              max(ivf_mod._QB, _round_up(n, ivf_mod._QB)))
    n_pad = _round_up(n, blk)
    xp = np.zeros((n_pad, ivf.d_pad), np.float32)
    xp[:n, : ivf.d] = x
    ts["pad"] = time.monotonic() - t0

    t0 = time.monotonic()
    xd = jnp.asarray(xp)
    xd.block_until_ready()
    ts["xfer"] = time.monotonic() - t0

    t0 = time.monotonic()
    fn = ivf.res.cached(
        ("ivf_assign", n_pad, ivf.d_pad, ivf._cents.shape[0], ivf.metric),
        lambda: ivf_mod._build_assign_fn(n_pad=n_pad, metric=ivf.metric))
    assign = np.asarray(jax.device_get(
        fn(xd, ivf._cents, ivf._cnorms)))[:n].astype(np.int64)
    ts["assign"] = time.monotonic() - t0

    t0 = time.monotonic()
    add_per_list = np.bincount(assign, minlength=ivf.nlist)
    new_counts = ivf._counts.astype(np.int64) + add_per_list
    need_c = -(-new_counts // ivf_mod._CHUNK)
    grow = (need_c - ivf._list_nchunks).astype(np.int64)
    total_new = int(grow.sum())
    ivf._ensure_pool(ivf._used_chunks + total_new, int(need_c.max()))
    if total_new:
        ll = np.repeat(np.arange(ivf.nlist, dtype=np.int64), grow)
        j = (np.arange(total_new)
             - np.repeat(np.cumsum(grow) - grow, grow))
        new_chunks = ivf._used_chunks + np.arange(total_new, dtype=np.int64)
        ivf._ctable_host[ll, ivf._list_nchunks[ll] + j] = new_chunks
        ivf._chunk_list[new_chunks] = ll
        ivf._used_chunks += total_new
        ivf._list_nchunks = need_c.astype(np.int32)
    order = np.argsort(assign, kind="stable")
    sa = assign[order]
    rank = np.arange(n) - np.searchsorted(sa, sa)
    pos = ivf._counts.astype(np.int64)[sa] + rank
    slots = np.empty(n, np.int64)
    slots[order] = (ivf._ctable_host[sa, pos // ivf_mod._CHUNK]
                    .astype(np.int64) * ivf_mod._CHUNK
                    + pos % ivf_mod._CHUNK)
    ts["pages"] = time.monotonic() - t0

    t0 = time.monotonic()
    ivf._ctable = jax.device_put(jnp.asarray(ivf._ctable_host))
    ivf._ctable.block_until_ready()
    ts["ctable"] = time.monotonic() - t0

    t0 = time.monotonic()
    rows = xd[:n].astype(ivf._dtype)  # the real add() passes xd[:n] too
    sl = jnp.asarray(slots.astype(np.int32))
    ivf._data = ivf_mod._scatter_rows(ivf._data, rows, sl)
    ivf._norms = ivf_mod._scatter_rows(ivf._norms, jnp.asarray(norms), sl)
    new_ids = np.arange(ivf.ntotal, ivf.ntotal + n, dtype=np.int32)
    ivf._ids = ivf_mod._scatter_rows(ivf._ids, jnp.asarray(new_ids), sl)
    jax.block_until_ready((ivf._data, ivf._norms, ivf._ids))
    ts["scatter"] = time.monotonic() - t0

    ivf._counts = new_counts.astype(np.int32)
    ivf._counts_dev = jax.device_put(ivf._counts)
    ivf._slot_of = np.concatenate([ivf._slot_of, slots])
    ivf.ntotal += n
    tot = sum(ts.values())
    print(f"{tag}: " + " ".join(f"{k}={v:.2f}s" for k, v in ts.items())
          + f" total={tot:.1f}s", flush=True)


for run in ("cold", "warm"):
    ivf = TpuIndexIVFFlat(D, NLIST, storage="bf16", seed=1234)
    ivf.quantizer = base.quantizer
    ivf._set_centroids(np.ascontiguousarray(
        np.asarray(jax.device_get(base._cents))[: NLIST, : D]),
        quantizer=base.quantizer)
    timed_add(ivf, xb, run)
    # sanity: stock add on a fresh index matches this path's timing class
    if run == "warm":
        ivf2 = TpuIndexIVFFlat(D, NLIST, storage="bf16", seed=1234)
        ivf2._set_centroids(np.ascontiguousarray(
            np.asarray(jax.device_get(base._cents))[: NLIST, : D]),
            quantizer=base.quantizer)
        t = time.monotonic()
        ivf2.add(xb)
        print(f"stock ivf.add (warm): {time.monotonic()-t:.1f}s", flush=True)
        D_, I_ = ivf.search(xb[:8], 5)
        D2_, I2_ = ivf2.search(xb[:8], 5)
        assert np.array_equal(I_, I2_), "phase-timed add diverged from stock"
        print("parity with stock add OK", flush=True)
