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
from .index import TpuIndexFlat
from .parallel.sharded import ShardedIndexFlat

_FORMAT_VERSION = 1


def _raw_bits(arr: jax.Array, d: int) -> np.ndarray:
    """Storage rows as uint16/float32 bits, trimmed to (ntotal, d)."""
    a = np.asarray(jax.device_get(arr))
    if a.dtype == np.float32:
        return a[:, :d]
    # bf16/f16 → uint16 bit pattern (numpy has no bfloat16)
    return a[:, :d].view(np.uint16)


def save_index(index: Union[TpuIndexFlat, ShardedIndexFlat], path: str) -> None:
    """Write the index to ``path`` (.npz). Exact: stores raw storage bits and
    the fp32 norms, not a decoded copy."""
    meta = {
        "format": _FORMAT_VERSION,
        "d": index.d,
        "metric": index.metric.value,
        "storage": index.storage_type.value,
        "ntotal": index.ntotal,
    }
    if isinstance(index, ShardedIndexFlat):
        parts = []
        norms = []
        gids = []
        for s in index.shards:
            nt = s.store.ntotal
            if nt == 0:
                continue
            parts.append(_raw_bits(s.store.db, index.d)[:nt])
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
            vec = _raw_bits(index.store.db, index.d)[:nt]
            nrm = np.asarray(jax.device_get(index.store.norms))[:nt]
        else:
            vec = np.zeros((0, index.d), np.float32)
            nrm = np.zeros((0,), np.float32)
    np.savez_compressed(path, meta=json.dumps(meta), vectors=vec, norms=nrm)


def load_index(path: str, sharded: bool = False, resources=None):
    """Load an index saved by save_index. ``sharded=True`` redistributes the
    vectors across the current mesh (ids preserved: insertion order)."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        vec = z["vectors"]
        nrm = z["norms"]
    if meta["format"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported index format {meta['format']}")
    metric = MetricType.coerce(meta["metric"])
    storage = StorageType.coerce(meta["storage"])
    cls = ShardedIndexFlat if sharded else TpuIndexFlat
    idx = cls(meta["d"], metric=metric, storage=storage, resources=resources)
    if meta["ntotal"] == 0:
        return idx
    if storage is StorageType.FLOAT32:
        idx.add(vec)
        return idx
    # reduced precision: restore the exact bits + the original fp32 norms,
    # bypassing re-quantization
    import ml_dtypes

    np_dtype = (ml_dtypes.bfloat16 if storage is StorageType.BFLOAT16
                else np.float16)
    rows = vec.view(np_dtype)
    _add_raw(idx, rows, nrm)
    return idx


def _add_raw(idx, rows: np.ndarray, norms: np.ndarray) -> None:
    """Append pre-quantized rows + their fp32 norms without conversion."""
    from .storage import _append_jit

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
            store._update_split(vecs, store.ntotal)  # fp32/f16: keep hi/lo pair
            store.db, store.norms = _append_jit(
                store.db, store.norms, vecs, nj, store.ntotal
            )
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
            grew = raw_into(sh.store, rows[off : off + c], norms[off : off + c])
            sh._append_gids(gids, sh.store.ntotal - c, grew=grew)
            off += c
        idx.ntotal = n
        idx._assembled = None
    else:
        raw_into(idx.store, rows, norms)
