"""Bulk-ingestion tests (.npy / .fvecs / .bvecs streaming loaders)."""

import os

import numpy as np
import pytest

import faiss_tpu
from faiss_tpu import loader

from common import make_data, numpy_search, recall_at_k


def _write_fvecs(path, x):
    n, d = x.shape
    rows = np.empty((n, d + 1), np.float32)
    rows[:, 0] = np.frombuffer(np.full(n, d, np.int32).tobytes(), np.float32)
    rows[:, 1:] = x
    rows.tofile(path)


def _write_bvecs(path, x):
    n, d = x.shape
    out = np.empty((n, 4 + d), np.uint8)
    out[:, :4] = np.frombuffer(np.int32(d).tobytes(), np.uint8)[None, :]
    out[:, 4:] = x
    out.tofile(path)


def test_npy_stream(tmp_path):
    xb, xq = make_data(5000, 8, 32)
    p = os.path.join(tmp_path, "base.npy")
    np.save(p, xb)
    idx = loader.build_index_from_file(p, batch_rows=700)
    assert idx.ntotal == 5000
    D, I = idx.search(xq, 10)
    Dr, Ir = numpy_search(xb, xq, 10)
    assert recall_at_k(I, Ir, 10) == 1.0


def test_fvecs_stream(tmp_path):
    xb, xq = make_data(3000, 4, 24)
    p = os.path.join(tmp_path, "base.fvecs")
    _write_fvecs(p, xb)
    got = np.concatenate(list(loader.iter_fvecs_batches(p, 999)))
    np.testing.assert_array_equal(got, xb)
    idx = loader.build_index_from_file(p, batch_rows=999)
    D, I = idx.search(xq, 5)
    Dr, Ir = numpy_search(xb, xq, 5)
    assert recall_at_k(I, Ir, 5) == 1.0


def test_bvecs_stream(tmp_path):
    rng = np.random.default_rng(0)
    xb = rng.integers(0, 256, (2000, 16)).astype(np.uint8)
    p = os.path.join(tmp_path, "base.bvecs")
    _write_bvecs(p, xb)
    got = np.concatenate(list(loader.iter_bvecs_batches(p, 512)))
    np.testing.assert_array_equal(got, xb.astype(np.float32))


def test_stream_into_sharded(tmp_path):
    xb, xq = make_data(4000, 4, 40)
    p = os.path.join(tmp_path, "base.npy")
    np.save(p, xb)
    idx = loader.build_index_from_file(p, sharded=True, batch_rows=1500)
    assert idx.ntotal == 4000
    D, I = idx.search(xq, 10)
    Dr, Ir = numpy_search(xb, xq, 10)
    assert recall_at_k(I, Ir, 10) == 1.0


def test_bad_format(tmp_path):
    p = os.path.join(tmp_path, "x.bin")
    open(p, "wb").write(b"xx")
    with pytest.raises(ValueError):
        list(loader.iter_file_batches(p))


def test_integer_file_ingest_dispatches_hi_exact(tmp_path):
    """SIFT-like integer descriptors streamed from disk prove zero split
    statistics, so the fp32 index dispatches the hi_exact fused path — and
    multi-batch ingest must preserve the property (the stats are a running
    max across add() calls)."""
    rng = np.random.default_rng(4)
    xb = rng.integers(0, 218, (3000, 32)).astype(np.float32)
    p = os.path.join(tmp_path, "sift.fvecs")
    _write_fvecs(p, xb)
    idx = loader.build_index_from_file(p, batch_rows=700)  # 5 add batches
    assert idx.store.split_stats_host() == (0.0, 0.0)
    xq = rng.standard_normal((8, 32)).astype(np.float32)
    D, I = idx.search(xq, 5)
    Dr, Ir = numpy_search(xb, xq, 5)
    assert recall_at_k(I, Ir, 5) == 1.0
