"""One-off extended fuzz: fused_search vs float64 numpy oracle, interpret
mode, random shapes/storages/metrics/k. Certified rows must match the
oracle top-k EXACTLY (set + order by (score, id)); uncertified rows are
allowed (they'd re-run via fallback at the index layer) but counted."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from faiss_tpu.dtypes import MetricType
from faiss_tpu.ops import pallas_fused as pf
from faiss_tpu.storage import (split_f32_bf16, _split_stats_fn,
                               _quantize_int8_fn, encode_f16_bits,
                               decode_f16_bits)

N_TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 60
rng0 = np.random.default_rng(20260818)
uncert_total = 0
for trial in range(N_TRIALS):
    rng = np.random.default_rng(rng0.integers(1 << 62))
    nv = int(rng.integers(16, 160)) * 128
    d = int(rng.integers(1, 3)) * 128
    nq = int(rng.integers(1, 4)) * 8
    k = int(rng.integers(1, min(nv, 1200)))
    metric = MetricType.L2 if rng.random() < 0.6 else MetricType.INNER_PRODUCT
    storage = rng.choice(["f32", "bf16", "f16", "int8"])
    passes = int(rng.integers(1, 3))
    scale = float(rng.choice([1.0, 1e-3, 1e3]))
    xb = (rng.standard_normal((nv, d)) * scale).astype(np.float32)
    if rng.random() < 0.3:  # ties / duplicates
        xb[nv // 2:] = xb[: nv - nv // 2]
    if rng.random() < 0.2:  # integer-valued (hi_exact-like)
        xb = np.round(xb).astype(np.float32)
    xq = (rng.standard_normal((nq, d)) * scale).astype(np.float32)
    q = jnp.asarray(xq)
    kwargs = dict(k=k, metric=metric, nv_eff=nv, interpret=True,
                  sweep_passes=passes)
    if storage == "f32":
        db = jnp.asarray(xb)
        hi, lo = split_f32_bf16(db)
        stats = _split_stats_fn(jnp.zeros((2,), jnp.float32), db, hi, lo)
        kwargs.update(db_split=(hi, lo), split_stats=stats)
        stored = xb.astype(np.float64)
        norms = jnp.asarray((xb.astype(np.float64) ** 2).sum(1)
                            .astype(np.float32))
    elif storage == "bf16":
        db = jnp.asarray(xb).astype(jnp.bfloat16)
        stored = np.asarray(db.astype(jnp.float32)).astype(np.float64)
        norms = jnp.asarray((xb.astype(np.float64) ** 2).sum(1)
                            .astype(np.float32))
    elif storage == "f16":
        bits = encode_f16_bits(jnp.asarray(xb))
        v32 = decode_f16_bits(bits)
        hi, lo = split_f32_bf16(v32)
        stats = _split_stats_fn(jnp.zeros((2,), jnp.float32), v32, hi, lo)
        db = bits
        kwargs.update(split_stats=stats)
        stored = np.asarray(v32).astype(np.float64)
        norms = jnp.asarray((xb.astype(np.float64) ** 2).sum(1)
                            .astype(np.float32))
    else:
        scales = jnp.asarray(
            np.maximum(np.abs(xb).max(axis=0) / 127.0, 1e-12), jnp.float32)
        db, norms, vqmax, _ = _quantize_int8_fn(jnp.asarray(xb), scales)
        kwargs.update(scales=scales, int_norm_max=vqmax)
        stored = (np.asarray(db, np.float64)
                  * np.asarray(scales, np.float64)[None, :])
    vals, ids, cert = pf.fused_search(q, db, norms, jnp.int32(nv), **kwargs)
    vals, ids, cert = map(np.asarray, (vals, ids, cert))
    # float64 oracle on the STORED values with the index's norm convention
    nrm = np.asarray(norms, np.float64)
    if metric is MetricType.L2:
        s = 2.0 * xq.astype(np.float64) @ stored.T - nrm[None, :]
    else:
        s = xq.astype(np.float64) @ stored.T
    # oracle order: score desc, id asc (the library's tie rule)
    order = np.lexsort((np.arange(nv)[None, :].repeat(nq, 0),
                        -s), axis=1)[:, :k]
    bad = 0
    for i in range(nq):
        if not cert[i]:
            uncert_total += 1
            continue
        if not np.array_equal(ids[i], order[i]):
            # the library's contract is exactness w.r.t. its f32-computed
            # scores (bit-identical to the plain fp32 path): rows whose
            # float64-oracle scores differ by < ~1 f32 ulp of |s| are
            # legitimate f32 ties and may swap vs the f64 order
            si, so = s[i][ids[i]], s[i][order[i]]
            tol = 2.0 * np.spacing(np.float32(np.abs(so).max()))
            if not (np.array_equal(np.sort(ids[i]), np.sort(order[i]))
                    or np.allclose(si, so, rtol=0, atol=tol)):
                bad += 1
                print(f"TRIAL {trial} MISMATCH q{i}: "
                      f"{storage} {metric} nv={nv} d={d} k={k} "
                      f"passes={passes} scale={scale}")
                print("  ids ", ids[i][:12], "oracle", order[i][:12])
                print("  s(ids)   ", si[:6])
                print("  s(oracle)", so[:6])
    if bad:
        print("FAILURE in trial", trial)
        sys.exit(1)
    if trial % 10 == 9:
        print(f"{trial + 1}/{N_TRIALS} ok (uncertified so far: "
              f"{uncert_total})", flush=True)
print(f"ALL {N_TRIALS} TRIALS PASS; uncertified rows: {uncert_total}")
