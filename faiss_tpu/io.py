"""Index persistence.

The reference has no native I/O: persistence = convert to CPU FAISS and use
faiss's own writer (SURVEY.md §5.4, index_metal_to_cpu —
src/MetalIndexFlat.mm:567-587). Here persistence is first-class: the exact
storage bits (including bf16/f16 quantized vectors and the fp32
pre-quantization norms) round-trip through one ``.npz`` file, so a reloaded
index returns bit-identical search results.

faiss interchange still exists via index_cpu_to_tpu / index_tpu_to_cpu
(index.py) when faiss is installed.
"""

from __future__ import annotations

import json
from typing import Union

import jax
import numpy as np

from .dtypes import MetricType, StorageType
from .idmap import TpuIndexIDMap, TpuIndexIDMap2
from .index import TpuIndexFlat
from .ivf import TpuIndexIVFFlat
from .parallel.sharded import ShardedIndexFlat
from .parallel.sharded_ivf import ShardedIndexIVFFlat

_FORMAT_VERSION = 1


def _raw_bits(store, nt: int) -> np.ndarray:
    """Exact storage bits of rows [0, nt) as float32 / uint16 patterns.

    Pair-only HBM modes have no stored-dtype array; the decode is exact
    (f16: hi+lo reproduces the value bit-for-bit; f32 keep_master=False:
    the host master is the source of truth), so saved bits are identical
    to what a master-keeping store would save."""
    from .dtypes import StorageType

    d = store.d
    if store.db is not None:
        a = np.asarray(jax.device_get(store.db))[:nt, :d]
        if a.dtype in (np.float32, np.int8):
            return a  # exact bits as-is (int8: the quantized codes)
        return a.view(np.uint16)  # bf16/f16 bit pattern (numpy has no bf16)
    rows = store._master_rows(0, nt)  # exact fp32 decode
    if store.storage is StorageType.FLOAT32:
        return rows
    return rows.astype(np.float16).view(np.uint16)  # exact: value IS f16


def save_index(index, path: str) -> None:
    """Write the index to ``path`` (.npz). Exact: stores raw storage bits and
    the fp32 norms, not a decoded copy. TpuIndexIDMap(2) wrappers persist
    too (the custom id map rides alongside the inner index's bits — faiss's
    write_index covers IndexIDMap the same way, faiss/index_io.h)."""
    wrapper = None
    id_map = None
    if isinstance(index, TpuIndexIDMap):
        wrapper = "idmap2" if isinstance(index, TpuIndexIDMap2) else "idmap"
        id_map = index.id_map
        index = index.index
    meta = {
        "format": _FORMAT_VERSION,
        "d": index.d,
        "metric": index.metric.value,
        "storage": index.storage_type.value,
        "ntotal": index.ntotal,
        "wrapper": wrapper,
    }
    if isinstance(index, (TpuIndexIVFFlat, ShardedIndexIVFFlat)):
        # IVF: centroids + the saved coarse ASSIGNMENT (a reload re-routes
        # with the stored routing, never a fp32 re-assignment) + the raw
        # stored bits and pre-quantization norms in insertion-id order.
        # ShardedIndexIVFFlat flattens to the same format in GLOBAL id
        # order — results are shard-count invariant by construction, so
        # the file needs no shard structure.
        if not index.is_trained:
            raise ValueError("cannot save an untrained IVF index")
        meta.update(kind="ivf", nlist=index.nlist, nprobe=index.nprobe)
        extra = {"centroids": np.zeros((index.nlist, index.d), np.float32)}
        for j in range(index.nlist):
            extra["centroids"][j] = index.quantizer.reconstruct(j)
        scale_src = (index.shards[0] if isinstance(index, ShardedIndexIVFFlat)
                     else index)
        if index.storage_type is StorageType.INT8:
            extra["scales"] = np.asarray(
                jax.device_get(scale_src._scales), np.float32)[: index.d]
        if index.ntotal and isinstance(index, ShardedIndexIVFFlat):
            vec = None
            nrm = np.zeros((index.ntotal,), np.float32)
            assign = np.zeros((index.ntotal,), np.int64)
            for si, sh in enumerate(index.shards):
                g = np.nonzero(index._id_shard == si)[0]
                if g.size == 0:
                    continue
                rows_s, nrm_s = sh._rows_by_id()
                if vec is None:
                    vec = np.zeros((index.ntotal,) + rows_s.shape[1:],
                                   rows_s.dtype)
                loc = index._id_local[g]
                vec[g] = rows_s[loc]
                nrm[g] = nrm_s[loc]
                assign[g] = sh._assignments()[loc]
            extra["assign"] = assign
        elif index.ntotal:
            vec, nrm = index._rows_by_id()
            extra["assign"] = index._assignments()
        else:
            vec = np.zeros((0, index.d), np.float32)
            nrm = np.zeros((0,), np.float32)
            extra["assign"] = np.zeros((0,), np.int64)
        if id_map is not None:
            extra["id_map"] = np.asarray(id_map, np.int64)
        np.savez_compressed(path, meta=json.dumps(meta), vectors=vec,
                            norms=nrm, **extra)
        return
    if isinstance(index, ShardedIndexFlat):
        parts = []
        norms = []
        gids = []
        for s in index.shards:
            nt = s.store.ntotal
            if nt == 0:
                continue
            parts.append(_raw_bits(s.store, nt))
            norms.append(np.asarray(jax.device_get(s.store.norms))[:nt])
            gids.append(np.asarray(jax.device_get(s.gids))[:nt])
        if parts:
            order = np.argsort(np.concatenate(gids), kind="stable")
            vec = np.concatenate(parts)[order]
            nrm = np.concatenate(norms)[order]
        else:
            vec = np.zeros((0, index.d), np.float32)
            nrm = np.zeros((0,), np.float32)
    else:
        nt = index.ntotal
        if nt:
            vec = _raw_bits(index.store, nt)
            nrm = np.asarray(jax.device_get(index.store.norms))[:nt]
        else:
            vec = np.zeros((0, index.d), np.float32)
            nrm = np.zeros((0,), np.float32)
    extra = {}
    if index.storage_type is StorageType.INT8:
        st = (index.store if isinstance(index, TpuIndexFlat)
              else index.shards[0].store)
        extra["scales"] = np.asarray(jax.device_get(st.scales), np.float32)
    if id_map is not None:
        extra["id_map"] = np.asarray(id_map, np.int64)
    np.savez_compressed(path, meta=json.dumps(meta), vectors=vec, norms=nrm,
                        **extra)


def load_index(path: str, sharded: bool = False, resources=None,
               keep_master: bool = True):
    """Load an index saved by save_index. ``sharded=True`` redistributes the
    vectors across the current mesh (ids preserved: insertion order).
    ``keep_master=False`` loads fp32 data in pair-only HBM mode (4 B/elem)."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        vec = z["vectors"]
        nrm = z["norms"]
        z_scales = z["scales"] if "scales" in z.files else None
        z_idmap = z["id_map"] if "id_map" in z.files else None
        z_cents = z["centroids"] if "centroids" in z.files else None
        z_assign = z["assign"] if "assign" in z.files else None
    if meta["format"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported index format {meta['format']}")

    def _wrap(inner):
        w = meta.get("wrapper")
        if w is None:
            return inner
        out = (TpuIndexIDMap2 if w == "idmap2" else TpuIndexIDMap)(inner)
        out.id_map = np.asarray(z_idmap, np.int64)
        return out

    metric = MetricType.coerce(meta["metric"])
    storage = StorageType.coerce(meta["storage"])
    if meta.get("kind") == "ivf":
        if meta["ntotal"]:
            if vec.dtype == np.int8:
                pass  # raw codes land bit-exactly (no re-quantization)
            elif vec.dtype != np.float32:
                import ml_dtypes

                vec = np.asarray(vec.view(ml_dtypes.bfloat16), np.float32)
        if sharded:
            # redistribute in contiguous balanced splits; ids stay GLOBAL
            # and the routing transfers, so the reloaded mesh index returns
            # the single-chip results (shard-count invariance)
            idx = ShardedIndexIVFFlat(
                meta["d"], meta["nlist"], metric=metric, storage=storage,
                nprobe=meta["nprobe"], resources=resources)
            s0 = idx.shards[0]
            if storage is StorageType.INT8:
                s0._set_scales(np.asarray(z_scales, np.float32)[: meta["d"]])
            s0._set_centroids(np.asarray(z_cents, np.float32))
            for s in idx.shards[1:]:
                if storage is StorageType.INT8:
                    s._scales = s0._scales
                s._set_centroids(np.asarray(z_cents, np.float32),
                                 quantizer=s0.quantizer)
            n = int(meta["ntotal"])
            if n:
                assign = np.asarray(z_assign, np.int64)
                p = idx.num_shards
                base, rem = divmod(n, p)
                off = 0
                id_shard = np.empty(n, np.int16)
                id_local = np.empty(n, np.int64)
                for si in range(p):
                    c = base + (1 if si < rem else 0)
                    if c == 0:
                        continue
                    sh = idx.shards[si]
                    gids = np.arange(off, off + c, dtype=np.int32)
                    sh._add_preassigned(
                        vec[off: off + c],
                        np.asarray(nrm[off: off + c], np.float32),
                        assign[off: off + c], global_ids=gids)
                    id_shard[off: off + c] = si
                    id_local[off: off + c] = np.arange(c)
                    off += c
                idx._id_shard = id_shard
                idx._id_local = id_local
                idx.ntotal = n
            return _wrap(idx)
        idx = TpuIndexIVFFlat(meta["d"], meta["nlist"], metric=metric,
                              storage=storage, nprobe=meta["nprobe"],
                              resources=resources)
        if storage is StorageType.INT8:
            idx._set_scales(np.asarray(z_scales, np.float32)[: meta["d"]])
        idx._set_centroids(np.asarray(z_cents, np.float32))
        if meta["ntotal"]:
            idx._add_preassigned(vec, np.asarray(nrm, np.float32),
                                 np.asarray(z_assign, np.int64))
        return _wrap(idx)
    cls = ShardedIndexFlat if sharded else TpuIndexFlat
    idx = cls(meta["d"], metric=metric, storage=storage, resources=resources,
              keep_master=keep_master)
    if storage is StorageType.INT8:
        # restore the frozen scales exactly, then the quantized codes
        scales = np.asarray(z_scales, np.float32)
        stores = ([idx.store] if not sharded
                  else [s.store for s in idx.shards])
        for st in stores:
            sp = np.ones((st.d_pad,), np.float32)
            sp[: st.d] = scales[: st.d]
            with st._ctx():
                st.scales = st._put(sp)
            st._trained = True
    if meta["ntotal"] == 0:
        return _wrap(idx)
    if storage is StorageType.FLOAT32:
        idx.add(vec)
        return _wrap(idx)
    if storage is StorageType.INT8:
        _add_raw(idx, vec.astype(np.int8), nrm)
        return _wrap(idx)
    # reduced precision: restore the exact bits + the original fp32 norms,
    # bypassing re-quantization
    import ml_dtypes

    np_dtype = (ml_dtypes.bfloat16 if storage is StorageType.BFLOAT16
                else np.float16)
    rows = vec.view(np_dtype)
    _add_raw(idx, rows, nrm)
    return _wrap(idx)


def _add_raw(idx, rows: np.ndarray, norms: np.ndarray) -> None:
    """Append pre-quantized rows + their fp32 norms without conversion."""
    n, d = rows.shape

    def raw_into(store, rows, norms):
        old_cap = store.capacity
        store._ensure_capacity(store.ntotal + rows.shape[0])
        x = rows
        if store.d_pad != d:
            pad = np.zeros((rows.shape[0], store.d_pad), rows.dtype)
            pad[:, :d] = rows
            x = pad
        with store._ctx():
            vecs = store._put(np.ascontiguousarray(x))
            nj = store._put(np.asarray(norms, np.float32))
            store._append(vecs, nj)  # pair-aware (storage modes)
            if rows.dtype == np.int8:
                qn = np.sqrt(
                    (rows.astype(np.float32) ** 2).sum(axis=1).max())
                store._bump_int_norm(store._put(np.float32(qn)))
        store.ntotal += rows.shape[0]
        return store.capacity != old_cap

    if isinstance(idx, ShardedIndexFlat):
        p = idx.num_shards
        base, rem = divmod(n, p)
        off = 0
        for i in range(p):
            c = base + (1 if i < rem else 0)
            if c == 0:
                continue
            gids = np.arange(off, off + c, dtype=np.int32)
            sh = idx.shards[i]
            idx._extents.append((off, off + c, i, sh.store.ntotal))
            grew = raw_into(sh.store, rows[off : off + c], norms[off : off + c])
            sh._append_gids(gids, sh.store.ntotal - c, grew=grew)
            off += c
        idx.ntotal = n
        idx._assembled = None
    else:
        raw_into(idx.store, rows, norms)
