"""Native C++ runtime tests (faiss_tpu/native).

Bit-exactness bars:
  * f32→bf16 must equal XLA's RNE ``astype(bfloat16)`` bit-for-bit
    (the reference does the same RNE bit trick on host, MetalIndexFlat.mm:226-243);
  * f32→f16 must equal numpy's RNE f16 cast bit-for-bit;
  * merge_topk must equal lax.top_k over the concatenated lists.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from faiss_tpu import native


def _special_floats():
    rng = np.random.default_rng(0)
    vals = rng.standard_normal(200_000).astype(np.float32) * 1e3
    specials = np.array(
        [0.0, -0.0, 1.0, -1.0, np.inf, -np.inf, np.nan,
         1e-40, -1e-40, 65504.0, 65520.0, 70000.0, 6.1e-5, 5.9e-8, 2.9e-8,
         1e-45, 3.4e38, -3.4e38],
        np.float32,
    )
    return np.concatenate([vals, specials])


def test_native_builds():
    assert native.available(), "g++ toolchain present in this image"


def test_bf16_bit_exact_vs_xla():
    x = _special_floats()
    bits = native.f32_to_bf16(x)
    ref = np.asarray(jnp.asarray(x).astype(jnp.bfloat16)).view(np.uint16)
    # NaNs: any quiet-NaN encoding is fine; compare non-NaN bit-exactly
    nan = np.isnan(x)
    np.testing.assert_array_equal(bits[~nan], ref[~nan])
    import ml_dtypes
    assert np.isnan(bits.view(ml_dtypes.bfloat16)[nan].astype(np.float32)).all()


def test_f16_bit_exact_vs_numpy():
    x = _special_floats()
    got = native.f32_to_f16(x).view(np.uint16)
    ref = x.astype(np.float16).view(np.uint16)
    nan = np.isnan(x)
    np.testing.assert_array_equal(got[~nan], ref[~nan])
    assert np.isnan(got.view(np.float16)[nan].astype(np.float32)).all()


def test_l2_norms():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3000, 96)).astype(np.float32)
    got = native.l2_norms(x)
    ref = (x.astype(np.float64) ** 2).sum(1)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_merge_topk_host():
    rng = np.random.default_rng(2)
    nq, ka, kb, k = 64, 10, 14, 12
    va = -np.sort(-rng.standard_normal((nq, ka)).astype(np.float32), axis=1)
    vb = -np.sort(-rng.standard_normal((nq, kb)).astype(np.float32), axis=1)
    ia = rng.integers(0, 1000, (nq, ka)).astype(np.int64)
    ib = rng.integers(1000, 2000, (nq, kb)).astype(np.int64)
    vo, io = native.merge_topk(va, ia, vb, ib, k, largest=True)
    allv = np.concatenate([va, vb], 1)
    alli = np.concatenate([ia, ib], 1)
    order = np.argsort(-allv, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(vo, np.take_along_axis(allv, order, 1))
    np.testing.assert_array_equal(io, np.take_along_axis(alli, order, 1))
    # smallest-first mode (distances): negating descending lists gives
    # ascending (best-first for smallest) with ids still aligned
    vo2, io2 = native.merge_topk(-va, ia, -vb, ib, k, largest=False)
    np.testing.assert_array_equal(vo2, -vo)
    np.testing.assert_array_equal(io2, io)


def test_aligned_buffer():
    buf = native.AlignedBuffer(1 << 16)
    v = buf.view(np.float32, (128, 128))
    v[:] = 1.5
    assert float(v.sum()) == 128 * 128 * 1.5
    if buf._ptr:
        assert buf._ptr % 4096 == 0
    buf.close()


def test_host_convert_ingest_path():
    """DeviceStore uses the native host-convert path for big reduced-precision
    adds; result must be identical to the device-convert path."""
    from faiss_tpu import storage as st
    from faiss_tpu.dtypes import MetricType, StorageType

    rng = np.random.default_rng(3)
    x = rng.standard_normal((10_000, 128)).astype(np.float32)

    a = st.DeviceStore(128, StorageType.BFLOAT16, MetricType.L2)
    orig = st.NATIVE_CONVERT_MIN_ELEMS
    st.NATIVE_CONVERT_MIN_ELEMS = 1  # force the native path
    try:
        a.add(x)
    finally:
        st.NATIVE_CONVERT_MIN_ELEMS = orig
    b = st.DeviceStore(128, StorageType.BFLOAT16, MetricType.L2)
    b.add(x)
    np.testing.assert_array_equal(
        np.asarray(a.db.astype(jnp.float32)), np.asarray(b.db.astype(jnp.float32))
    )
    np.testing.assert_allclose(
        np.asarray(a.norms), np.asarray(b.norms), rtol=1e-6
    )
