"""One-off fuzz: ShardedIndexFlat on the emulated 8-device CPU mesh vs the
float64 oracle — random shard/replica factorizations, uneven add batches,
random storages/metrics/k, save/load round trip every few trials."""
import os, sys, tempfile
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from faiss_tpu.parallel.sharded import ShardedIndexFlat
from faiss_tpu import io as ft_io

N_TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
rng0 = np.random.default_rng(77)
for trial in range(N_TRIALS):
    rng = np.random.default_rng(rng0.integers(1 << 62))
    shards, reps = rng.choice([(8, 1), (4, 2), (2, 4), (4, 1), (2, 1)])
    d = int(rng.integers(1, 3)) * 64
    nv = int(rng.integers(4, 40)) * 256
    nq = int(rng.integers(1, 3)) * 8
    k = int(rng.integers(1, 120))
    metric = "l2" if rng.random() < 0.6 else "ip"
    storage = rng.choice(["f32", "bf16", "f16", "int8"])
    xb = rng.standard_normal((nv, d)).astype(np.float32)
    if rng.random() < 0.25:
        xb[nv // 3:] = xb[: nv - nv // 3]  # heavy duplicates / ties
    if rng.random() < 0.2:
        xb = np.round(xb * 3).astype(np.float32)  # integer-valued
    xq = rng.standard_normal((nq, d)).astype(np.float32)
    idx = ShardedIndexFlat(d, metric=metric, storage=storage,
                           num_shards=int(shards), num_replicas=int(reps))
    # uneven adds
    cuts = np.sort(rng.integers(0, nv, rng.integers(1, 4)))
    prev = 0
    for c in list(cuts) + [nv]:
        if c > prev:
            idx.add(xb[prev:c])
            prev = c
    D, I = idx.search(xq, k)
    # oracle on the DECODED stored values
    dec = np.stack([idx.reconstruct(i) for i in range(nv)]).astype(np.float64)
    if metric == "l2":
        nrm = (dec ** 2).sum(1)
        if storage in ("f32", "bf16", "f16"):
            nrm = (xb.astype(np.float64) ** 2).sum(1)  # pre-quant norms
        s = 2.0 * xq.astype(np.float64) @ dec.T - nrm[None, :]
    else:
        s = xq.astype(np.float64) @ dec.T
    k_eff = min(k, nv)
    order = np.lexsort((np.arange(nv)[None, :].repeat(nq, 0), -s),
                       axis=1)[:, :k_eff]
    for i in range(nq):
        got, want = I[i, :k_eff].astype(int), order[i]
        if not np.array_equal(got, want):
            sg, sw = s[i][got], s[i][want]
            if not np.allclose(sg, sw, rtol=0, atol=1e-6 * max(1, abs(sw).max())):
                print(f"TRIAL {trial} MISMATCH q{i}: {storage} {metric} "
                      f"nv={nv} d={d} k={k} shards={shards} reps={reps}")
                print("  got ", got[:10]); print("  want", want[:10])
                print("  s(got) ", sg[:6]); print("  s(want)", sw[:6])
                sys.exit(1)
    if trial % 3 == 2:  # io round trip
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "idx.npz")
            ft_io.save_index(idx, p)
            idx2 = ft_io.load_index(p, sharded=True)  # default mesh layout:
            # results must be layout-invariant (global-id tie order)
            D2, I2 = idx2.search(xq, k)
            assert np.array_equal(np.asarray(I), np.asarray(I2)), trial
            assert np.array_equal(np.asarray(D), np.asarray(D2)), trial
    print(f"trial {trial}: ok ({storage} {metric} nv={nv} d={d} k={k} "
          f"{shards}x{reps}, fallbacks={idx.fused_fallbacks})", flush=True)
print(f"ALL {N_TRIALS} SHARDED TRIALS PASS")
