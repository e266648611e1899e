"""Bisect which op of the f16-bits in-kernel decode breaks Mosaic.

Each probe is a tiny standalone kernel on a (256, 128) int16 tile; compile
failures print per-probe so the offending lowering is identified without
the remote compiler's opaque HTTP 500.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_dtype=jnp.float32):
    bits = jnp.asarray(
        np.random.default_rng(0).integers(-2**15, 2**15, (256, 128),
                                          dtype=np.int16))
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 128), out_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = np.asarray(jax.jit(f)(bits))
        print(f"OK   {name}  sum={np.float64(r.astype(np.float64).sum()):.3e}",
              flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)


def k_passthrough(i, o):
    o[:] = i[:].astype(jnp.float32)


def k_astype_mask(i, o):
    o[:] = (i[:].astype(jnp.int32) & 0xFFFF).astype(jnp.float32)


def k_shift(i, o):
    h = i[:].astype(jnp.int32) & 0xFFFF
    o[:] = ((h & 0x7FFF) << 13).astype(jnp.float32)


def k_bitcast(i, o):
    h = i[:].astype(jnp.int32) & 0xFFFF
    m = (h & 0x7FFF) << 13
    o[:] = jax.lax.bitcast_convert_type(m, jnp.float32)


def k_norm(i, o):
    h = i[:].astype(jnp.int32) & 0xFFFF
    m = (h & 0x7FFF) << 13
    o[:] = jax.lax.bitcast_convert_type(m, jnp.float32) * jnp.float32(
        2.0 ** 112)


def k_sub(i, o):
    h = i[:].astype(jnp.int32) & 0xFFFF
    m = h & 0x7FFF
    o_ = m << 13
    o[:] = (jax.lax.bitcast_convert_type(o_ + (113 << 23), jnp.float32)
            - jnp.float32(2.0 ** -14))


def k_where(i, o):
    h = i[:].astype(jnp.int32) & 0xFFFF
    m = h & 0x7FFF
    o_ = m << 13
    fn = jax.lax.bitcast_convert_type(o_, jnp.float32) * jnp.float32(2.0**112)
    fs = (jax.lax.bitcast_convert_type(o_ + (113 << 23), jnp.float32)
          - jnp.float32(2.0 ** -14))
    o[:] = jnp.where(m < (1 << 10), fs, fn)


def k_inf(i, o):
    h = i[:].astype(jnp.int32) & 0xFFFF
    m = h & 0x7FFF
    f = jax.lax.bitcast_convert_type(m << 13, jnp.float32)
    o[:] = jnp.where(m >= 0x7C00, jnp.float32(jnp.inf), f)


def k_sign(i, o):
    h = i[:].astype(jnp.int32) & 0xFFFF
    f = jax.lax.bitcast_convert_type(h << 13, jnp.float32)
    u = jax.lax.bitcast_convert_type(f, jnp.int32) | ((h & 0x8000) << 16)
    o[:] = jax.lax.bitcast_convert_type(u, jnp.float32)


def k_full_decode(i, o):
    from faiss_tpu.storage import decode_f16_bits
    o[:] = decode_f16_bits(i[:])


def k_split_hi(i, o):
    from faiss_tpu.storage import split_f16_bits
    hi, lo = split_f16_bits(i[:])
    o[:] = hi.astype(jnp.float32) + lo.astype(jnp.float32)


def k_isfinite(i, o):
    f = i[:].astype(jnp.float32)
    o[:] = jnp.where(jnp.isfinite(f), f, 0.0)


def k_uint32(i, o):
    h = i[:].astype(jnp.int32)
    f = h.astype(jnp.float32)
    uf = jax.lax.bitcast_convert_type(f, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(uf & jnp.uint32(0xFFFF0000),
                                      jnp.float32)
    o[:] = hi


def main():
    assert jax.devices()[0].platform == "tpu"
    for name, k in [
        ("passthrough int16->f32", k_passthrough),
        ("astype+mask", k_astype_mask),
        ("shift<<13", k_shift),
        ("bitcast i32->f32", k_bitcast),
        ("normal path (*2^112)", k_norm),
        ("subnormal path (+magic)", k_sub),
        ("where(normal,sub)", k_where),
        ("inf clamp", k_inf),
        ("sign or", k_sign),
        ("isfinite/where", k_isfinite),
        ("uint32 mask trunc", k_uint32),
        ("FULL decode_f16_bits", k_full_decode),
        ("FULL split hi+lo", k_split_hi),
    ]:
        run(name, k)


if __name__ == "__main__":
    main()
